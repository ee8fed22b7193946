"""Split the fused analysis kernel's cost into MXU (DFT matmuls) vs
VPU/extraction work by sweeping the DFT precision: the manual bf16
splits make MXU passes 1 (default) / 3 (high) / 6 (highest), so the
per-pass MXU cost is the slope of time vs passes and the intercept is
the extraction + preemphasis + magnitude/energy/lsd VPU work (plus the
input DMA stream). Same scan-window protocol as fused_frontend_probe.
Run on the real chip: python experiments/analysis_cost_split.py
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

rng = np.random.default_rng(0)
t = np.arange(L) / SR
f0 = 110.0 + 30.0 * np.sin(2 * np.pi * 0.7 * t)
voiced = sum(np.sin(k * np.cumsum(2 * np.pi * f0 / SR)) / k for k in range(1, 6))
env = np.clip(np.sin(2 * np.pi * 2.5 * t), 0, None)
base = np.broadcast_to((voiced * env * 0.2).astype(np.float32), (B, L)).copy()
base_d = jnp.asarray(base)
sync = jax.jit(lambda x: jnp.sum(x))


def an(prec):
    def f(amp):
        e, l = pk.analysis_energy_lsd_pallas(
            base_d, T, W, step, gain=amp[:, 0], precision=prec
        )
        return jnp.sum(e) + jnp.sum(l)

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
    print(f"{name:26s} {best * 1e3:8.2f} ms/step", flush=True)
    return best


t_noop = run("noop", lambda a: jnp.sum(a))
t_def = run("analysis DEFAULT (1 pass)", an("default"))
t_high = run("analysis HIGH (3 passes)", an("high"))
t_hst = run("analysis HIGHEST (6 pass)", an("highest"))
per_pass = (t_hst - t_def) / 5.0
print()
print(f"  per-MXU-pass cost   {per_pass * 1e3:6.3f} ms")
print(f"  HIGH MXU (3 passes) {3 * per_pass * 1e3:6.3f} ms")
print(f"  VPU+extract+DMA     {(t_high - t_noop - 3 * per_pass) * 1e3:6.3f} ms "
      f"(HIGH net {(t_high - t_noop) * 1e3:.3f})")
