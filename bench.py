"""Throughput benchmark: audio-seconds processed per wall-second per chip
for the full nonlinear-speedup pipeline at 3.5x on batched 16 kHz speech.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline is value / 1000 (the BASELINE.json north star: >1000x real-time
per chip).

Measurement notes (relayed TPU backend):
  * block_until_ready does NOT synchronize and identical inputs can be
    served from a result cache (each inflates numbers ~1000x) — so every
    iteration gets a DISTINCT pre-staged input and the wall-clock window
    closes only after a device-computed checksum of EVERY iteration's
    output has been fetched to the host.
  * Steady-state throughput is measured by issuing all iterations
    back-to-back (as a production pipeline would) so the ~23 ms relay
    round-trip latency is paid once per window, not once per step; inputs
    are staged on device before the window opens. SPEEDY_BENCH_SERIAL=1
    restores the one-step-at-a-time latency measurement.
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from speedy_tpu.config import SpeedyConfig
    from speedy_tpu.parallel.batch import batched_nonlinear_speedup

    sample_rate = 16000
    seconds = 10.0
    cfg = SpeedyConfig(sample_rate)
    L = int(sample_rate * seconds)
    n_dev = jax.device_count()
    B = int(os.environ.get("SPEEDY_BENCH_BATCH", "128")) * max(n_dev, 1)
    iters = int(os.environ.get("SPEEDY_BENCH_ITERS", "8"))
    serial = os.environ.get("SPEEDY_BENCH_SERIAL", "0") == "1"

    # Speech-like test signal: pitch-modulated harmonics with syllabic
    # envelope, amplitude-varied per utterance and iteration.
    rng = np.random.default_rng(0)
    t = np.arange(L) / sample_rate
    f0 = 110.0 + 30.0 * np.sin(2 * np.pi * 0.7 * t)
    phase = np.cumsum(2 * np.pi * f0 / sample_rate)
    voiced = sum(np.sin(k * phase) / k for k in range(1, 6))
    envelope = np.clip(np.sin(2 * np.pi * 2.5 * t), 0, None)
    base = (voiced * envelope * 0.2).astype(np.float32)

    mesh = None
    if n_dev > 1:
        from speedy_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(tp=1)

    def fn(xs, lengths):
        out = batched_nonlinear_speedup(
            xs, lengths, cfg, 3.5, 1.0, 0.1, mesh=mesh
        )
        return jnp.sum(out.output), jnp.sum(out.valid_length)

    step_fn = jax.jit(fn)
    lengths = jnp.asarray(np.full((B,), L, np.int32))

    def fresh():
        amp = rng.uniform(0.5, 1.0, size=(B, 1)).astype(np.float32)
        return jnp.asarray(np.tile(base, (B, 1)) * amp)

    # Warmup / compile.
    s, v = step_fn(fresh(), lengths)
    float(s)

    if serial:
        times = []
        for _ in range(iters):
            xs = fresh()
            float(jnp.sum(xs))  # ensure input transfer is complete
            t0 = time.perf_counter()
            s, v = step_fn(xs, lengths)
            float(s)  # value fetch = true synchronization barrier
            times.append(time.perf_counter() - t0)
        dt = min(times)
    else:
        # Steady-state: distinct inputs staged on device, all steps issued
        # back-to-back, every checksum fetched before the window closes.
        # Each timing window gets its OWN fresh inputs — re-running the
        # same device buffers would let the relay result-cache serve the
        # second window instantly and min() would pick the bogus one.
        windows = [[fresh() for _ in range(iters)] for _ in range(2)]
        for inputs in windows:
            for xs in inputs:
                float(jnp.sum(xs))
        best = None
        for inputs in windows:
            t0 = time.perf_counter()
            outs = [step_fn(xs, lengths) for xs in inputs]
            checksums = [float(s) for s, v in outs]
            dt_total = time.perf_counter() - t0
            assert len(set(checksums)) == iters, "distinct inputs, equal sums?"
            best = dt_total if best is None else min(best, dt_total)
        dt = best / iters

    audio_seconds = B * seconds
    value = audio_seconds / dt / max(n_dev, 1)
    print(
        json.dumps(
            {
                "metric": "audio-seconds/sec/chip at 3.5x nonlinear speedup (16 kHz, batched)",
                "value": round(value, 1),
                "unit": "audio-s/s/chip",
                "vs_baseline": round(value / 1000.0, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
