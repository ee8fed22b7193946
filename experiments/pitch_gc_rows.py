"""MXU row-utilization probe for the standalone pitch kernel: its
matmuls are [GC, *]-row — GC=64 fills only half the MXU's 128 systolic
rows. The old GC=128 sweep was UNFAIR: n_cells rounded to 64, so the
kernel concat-padded the whole [B, n_cells, G] grid per step. Here each
GC gets a grid PRE-BUILT at its own multiple (the extra zero cells cost
only pad bytes + dead-cell MACs), isolating the row-count effect:
  GC=64 : 320 cells, matmuls half-row
  GC=128: 384 cells (+20% MACs on dead cells), matmuls full-row
Run on the real chip: python experiments/pitch_gc_rows.py
"""
import os, sys, time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
import jax.numpy as jnp

from speedy_tpu.config import SpeedyConfig
from speedy_tpu.ops import pallas_kernels as pk

SR = 16000
B = int(os.environ.get("B", "128"))
L = SR * 10
NIT = int(os.environ.get("NIT", "24"))
cfg = SpeedyConfig(SR)
taps = maxp = cfg.wsola_max_period
minp = cfg.wsola_min_period
G = 512
seg_w = taps + maxp
n_grid = -(-(L + seg_w) // G)

rng = np.random.default_rng(0)
t = np.arange(L) / SR
f0 = 110.0 + 30.0 * np.sin(2 * np.pi * 0.7 * t)
voiced = sum(np.sin(k * np.cumsum(2 * np.pi * f0 / SR)) / k for k in range(1, 6))
env = np.clip(np.sin(2 * np.pi * 2.5 * t), 0, None)
base = np.broadcast_to((voiced * env * 0.2).astype(np.float32), (B, L)).copy()
sync = jax.jit(lambda x: jnp.sum(x))


def grid_for(gc):
    n_cells = -(-n_grid // gc) * gc
    pad = np.zeros((B, n_cells * G), np.float32)
    pad[:, :L] = base
    return jnp.asarray(pad.reshape(B, n_cells, G))


def pitch_at(gc, grid_d):
    def f(amp):
        p = pk.pitch_ssd_pallas(grid_d, taps, minp, maxp, gc_cells=gc,
                                gain=amp[:, 0])
        return jnp.sum(p)

    return f


def run(name, f):
    def scanned(amps):
        def body(carry, amp):
            return carry + f(amp), 0.0
        s, _ = jax.lax.scan(body, jnp.float32(0), amps)
        return s

    fj = jax.jit(scanned)
    fresh = lambda: jnp.asarray(
        rng.uniform(0.5, 1.0, (NIT, B, 1)).astype(np.float32)
    )
    float(sync(fj(fresh())))
    best = None
    for _ in range(2):
        amps = fresh()
        float(sync(amps))
        t0 = time.perf_counter()
        float(fj(amps))
        dt = (time.perf_counter() - t0) / NIT
        best = dt if best is None else min(best, dt)
    print(f"{name:30s} {best * 1e3:8.2f} ms/step", flush=True)
    return best


run("noop", lambda a: jnp.sum(a))
for gc in (64, 128, 256):
    g = grid_for(gc)
    n_cells = g.shape[1]
    run(f"pitch GC={gc} ({n_cells} cells)", pitch_at(gc, g))
