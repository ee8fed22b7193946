"""Standalone timing of gather_synth_block_pallas at the bench operating
point: scan NIT iterations inside ONE dispatched program (per-iteration
gain + device checksum per the measurement rules), sweeping
rows-per-block R and the live-block count. run on the real chip:
  python experiments/synth_sweep.py
Purpose: attribute the ~2.7 ms/step synthesis cost (per-program overhead
vs per-live-block cost) now that span DMAs, select FLOPs, and select
passes are all proven non-dominant.
"""
import os, sys, time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
import jax.numpy as jnp

from speedy_tpu.ops.pallas_kernels import gather_synth_block_pallas

SR = 16000
B = 96
L = SR * 10
NIT = int(os.environ.get("NIT", "24"))
hop = 160
width = 2 * hop + 1
maxp = 246
MAXSP = 6.0
rng = np.random.default_rng(0)

x = jnp.asarray((rng.standard_normal((B, L)) * 0.1).astype(np.float32))
sync = jax.jit(lambda v: jnp.sum(v))


def starts_for(K):
    step = 160 * 3.5
    jit = rng.uniform(-123, 123, (B, K))
    s = np.clip(np.arange(K) * step + jit, 0, L - 2).astype(np.int32)
    return jnp.asarray(s)


def run(R, frac_live):
    need = (R - 1) * int(np.ceil(hop * MAXSP)) + maxp + width + 32
    w_span = -(-need // 1024) * 1024
    K = -(-int(np.ceil(L / hop + 1)) // R) * R
    starts = starts_for(K)
    af = jnp.asarray(rng.uniform(0, 1, (B, K)).astype(np.float32))
    nv = jnp.full((B,), max(1, int(K * frac_live)), jnp.int32)
    amps = jnp.asarray(
        rng.uniform(0.5, 1.0, (NIT, B)).astype(np.float32)
    )

    @jax.jit
    def window(x, starts, af, nv, amps):
        def body(carry, amp):
            out = gather_synth_block_pallas(
                x, starts, af, hop, width, R, w_span, nv, gain=amp
            )
            # Sum only the first block's slots: always live (nv >= 1),
            # amp-dependent (distinct per iteration for the relay), and
            # never the NaN/Inf garbage of skipped blocks.
            return carry + jnp.sum(out[:, :64]), 0.0

        acc, _ = jax.lax.scan(body, 0.0, amps)
        return acc

    r = float(window(x, starts, af, nv, amps))  # compile + run
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        r2 = float(window(x, starts, af, nv, amps))
        dt = (time.perf_counter() - t0) / NIT * 1e3
        best = dt if best is None else min(best, dt)
    live_blocks = (max(1, int(K * frac_live)) + R - 1) // R * B
    print(
        f"R={R:4d} K={K:5d} frac={frac_live:4.2f} live_blocks={live_blocks:6d}"
        f"  {best:7.3f} ms/step  ({best * 1e3 / max(live_blocks,1):6.2f} us/blk)"
    )
    return best


if __name__ == "__main__":
    for R in (32, 64, 128):
        for frac in (0.0, 0.29, 1.0):
            run(R, frac)
