"""A/B the fused analysis+pitch front-end against the split kernels at
the bench operating point: same scan-window protocol as
inprog_pipeline.py, measuring (a) analysis kernel alone, (b) pitch
kernel alone, (c) analysis + pitch as two kernels, (d) the fused
single-read kernel. Run on the real chip:
  python experiments/fused_frontend_probe.py
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
W, step = cfg.window_size, cfg.frame_step_int
T = cfg.num_frames(L, integer_step=True)
taps = maxp = cfg.wsola_max_period
minp = cfg.wsola_min_period
G = 512
seg_w = taps + maxp
n_grid = -(-(L + seg_w) // G)
n_cells = -(-n_grid // 64) * 64

rng = np.random.default_rng(0)
t = np.arange(L) / SR
f0 = 110.0 + 30.0 * np.sin(2 * np.pi * 0.7 * t)
voiced = sum(np.sin(k * np.cumsum(2 * np.pi * f0 / SR)) / k for k in range(1, 6))
env = np.clip(np.sin(2 * np.pi * 2.5 * t), 0, None)
base = np.broadcast_to((voiced * env * 0.2).astype(np.float32), (B, L)).copy()
base_d = jnp.asarray(base)
pad = np.zeros((B, n_cells * G), np.float32)
pad[:, :L] = base
grid_d = jnp.asarray(pad.reshape(B, n_cells, G))
sync = jax.jit(lambda x: jnp.sum(x))


def an_only(amp):
    e, l = pk.analysis_energy_lsd_pallas(base_d, T, W, step, gain=amp[:, 0],
                                         precision="high")
    return jnp.sum(e) + jnp.sum(l)


def pitch_only(amp):
    p = pk.pitch_ssd_pallas(grid_d, taps, minp, maxp, gain=amp[:, 0])
    return jnp.sum(p)


def split(amp):
    return an_only(amp) + pitch_only(amp)


def fused(amp):
    e, l, p = pk.analysis_energy_lsd_pallas(
        base_d, T, W, step, gain=amp[:, 0], precision="high",
        pitch_geom=(taps, minp, maxp, G),
    )
    return jnp.sum(e) + jnp.sum(l) + jnp.sum(p)


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
    print(f"{name:22s} {best * 1e3:8.2f} ms/step", flush=True)
    return best


run("noop", lambda a: jnp.sum(a))
run("analysis only", an_only)
run("pitch only", pitch_only)
run("split (two kernels)", split)
run("fused (one kernel)", fused)
