"""Measure the throughput headroom of a rate-derived output capacity.

The grid planner sizes capacity for worst-case speed 1.0 (cap ~= L), so at
a 3.5x rate ~5/8 of output blocks are dead. The kernels already SKIP dead
blocks' DMAs, but every K-proportional XLA stage still pays for them:
time-map inversion, phase snap, synthesis control packing, and the final
repack/zero-mask pass over [B, cap]. This probe runs the production bench
program twice — default capacity vs capacity = ceil(1.5 * L/rate) — to
bound the win before committing to a truncation contract.

Run on the real chip: python experiments/capacity_probe.py
"""
import os, sys, time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
import jax.numpy as jnp

from speedy_tpu.profiling import enable_compile_cache

enable_compile_cache()

from speedy_tpu.config import SpeedyConfig
from speedy_tpu.parallel.batch import batched_nonlinear_speedup
from speedy_tpu.parallel.mesh import make_mesh

SR = 16000
SECONDS = 10.0
L = int(SR * SECONDS)
B = 128
ITERS = int(os.environ.get("NIT", "96"))
RATE = 3.5
cfg = SpeedyConfig(SR)
mesh = make_mesh(tp=1)

rng = np.random.default_rng(0)
t = np.arange(L) / SR


def speechlike(f0_base, f0_mod, f0_rate, syll_hz, n_harm):
    f0 = f0_base + f0_mod * np.sin(2 * np.pi * f0_rate * t)
    phase = np.cumsum(2 * np.pi * f0 / SR)
    voiced = sum(np.sin(k * phase) / k for k in range(1, n_harm + 1))
    envelope = np.clip(np.sin(2 * np.pi * syll_hz * t), 0, None)
    return (voiced * envelope * 0.2).astype(np.float32)


fam0 = speechlike(110.0, 30.0, 0.7, 2.5, 5)
fam1 = speechlike(210.0, 45.0, 1.3, 4.0, 7)
bursts = (np.sin(2 * np.pi * 3.1 * t) > 0.3).astype(np.float32)
fam2 = (rng.standard_normal(L) * 0.12 * bursts).astype(np.float32)
chirp_f0 = 90.0 + 160.0 * (0.5 + 0.5 * np.sin(2 * np.pi * 0.11 * t))
phase_c = np.cumsum(2 * np.pi * chirp_f0 / SR)
fam3 = (
    (np.sin(phase_c) + 0.5 * np.sin(2 * phase_c))
    * np.clip(np.sin(2 * np.pi * 1.8 * t + 0.7), 0, None)
    * 0.2
).astype(np.float32)
families = np.stack([fam0, fam1, fam2, fam3])
base_rows = families[np.arange(B) % 4]
base_d = jnp.asarray(base_rows)
lengths = jnp.asarray(np.full((B,), L, np.int32))


def run(capacity, label):
    def fn(xs, lens, gamp):
        out = batched_nonlinear_speedup(
            xs, lens, cfg, RATE, 1.0, 0.1, mesh=mesh, gain=gamp,
            capacity=capacity,
        )
        return jnp.sum(out.output), jnp.max(out.valid_length)

    def scan_fn(amps, lens):
        def body(_, amp):
            s, v = fn(base_d, lens, amp[:, 0])
            return 0, (s, v)

        _, (sums, vmaxes) = jax.lax.scan(body, 0, amps)
        return sums, vmaxes

    scan_jit = jax.jit(scan_fn)

    def fresh_amps():
        return jnp.asarray(
            rng.uniform(0.5, 1.0, size=(ITERS, B, 1)).astype(np.float32)
        )

    s, v = scan_jit(fresh_amps(), lengths)
    float(jnp.sum(s))  # compile + run
    vmax = int(np.max(np.asarray(v)))
    best = None
    for _ in range(2):
        amps = fresh_amps()
        float(jnp.sum(amps))
        t0 = time.perf_counter()
        s, v = scan_jit(amps, lengths)
        cs = [float(x) for x in np.asarray(s)]
        dt = time.perf_counter() - t0
        assert len(set(cs)) == ITERS
        best = dt if best is None else min(best, dt)
    rate = B * SECONDS / (best / ITERS)
    print(
        f"{label:28s} cap={capacity or 'default'}  max valid={vmax}"
        f"  {best / ITERS * 1e3:7.2f} ms/step  {rate:9.0f} audio-s/s"
    )
    return rate


if __name__ == "__main__":
    hop = 160
    r0 = run(None, "default (speed-1.0 plan)")
    tight = int(np.ceil(1.5 * L / RATE / hop)) * hop
    r1 = run(tight, "rate-derived (1.5x L/rate)")
    print(f"headroom: {r1 / r0 - 1.0:+.1%}")
