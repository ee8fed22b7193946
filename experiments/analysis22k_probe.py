"""A/B the 22.05 kHz analysis front-end on the real chip: the fused
kernel (gf = 32 sparse-phase lattice, round 3) vs the XLA chain it
replaces at that rate. Same scan-window protocol as analysis_cost_split.
Run: python experiments/analysis22k_probe.py
"""
import os, sys, time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
import jax.numpy as jnp

from speedy_tpu.config import SpeedyConfig
from speedy_tpu.ops import pallas_kernels as pk
from speedy_tpu.ops import dft, framing
from speedy_tpu import config as C

SR = 22050
B = int(os.environ.get("B", "128"))
L = SR * 10
NIT = int(os.environ.get("NIT", "24"))
cfg = SpeedyConfig(SR)
W, step = cfg.window_size, cfg.frame_step_int
T = cfg.num_frames(L, integer_step=True)

rng = np.random.default_rng(0)
t = np.arange(L) / SR
f0 = 150.0 + 35.0 * np.sin(2 * np.pi * 0.7 * t)
voiced = sum(np.sin(k * np.cumsum(2 * np.pi * f0 / SR)) / k for k in range(1, 6))
env = np.clip(np.sin(2 * np.pi * 2.5 * t), 0, None)
base = np.broadcast_to((voiced * env * 0.2).astype(np.float32), (B, L)).copy()
base_d = jnp.asarray(base)
sync = jax.jit(lambda x: jnp.sum(x))


def kernel(prec):
    def f(amp):
        e, l = pk.analysis_energy_lsd_pallas(
            base_d, T, W, step, gain=amp[:, 0], precision=prec
        )
        return jnp.sum(e) + jnp.sum(l)

    return f


def xla_chain(prec_name):
    prec = {
        "high": jax.lax.Precision.HIGH,
        "highest": jax.lax.Precision.HIGHEST,
    }[prec_name]
    win = jnp.asarray(dft.hamming_window(W))
    cos_m, sin_m = dft.dft_matrices(W)
    cos_d, sin_d = jnp.asarray(cos_m), jnp.asarray(sin_m)
    starts = np.asarray(framing.frame_starts(cfg, T, integer_step=True))

    def f(amp):
        m = -(-W // step)
        n_cells = T + m
        xs_pad = jnp.concatenate(
            [base_d, jnp.zeros((B, n_cells * step - L), jnp.float32)], axis=1
        )
        y = xs_pad.reshape(B, n_cells, step)
        frames = jnp.concatenate(
            [y[:, j : j + T] for j in range(m)], axis=-1
        )[:, :, :W]
        prev_last = jnp.take(
            base_d, jnp.asarray(starts[:-1] + (W - 1)), axis=1, mode="clip"
        )
        state = jnp.concatenate(
            [jnp.zeros((B, 1), jnp.float32), prev_last], axis=1
        )
        prev = jnp.concatenate([state[:, :, None], frames[:, :, :-1]], axis=2)
        pre = frames - jnp.asarray(C.PREEMPHASIS_COEF, jnp.float32) * prev
        fw = pre * win[None, None, :] * amp[:, :1, None]
        re = jnp.dot(fw, cos_d, precision=prec)
        im = jnp.dot(fw, sin_d, precision=prec)
        half = jnp.sqrt(re * re + im * im)[:, :, :W]
        energy = jnp.sum(half[:, :, 1:] ** 2, axis=-1)
        eps = jnp.asarray(2.220446049250313e-16, jnp.float32)
        last = jnp.concatenate(
            [jnp.zeros((B, 1, W), jnp.float32), half[:, :-1]], axis=1
        )
        e_l = jnp.sum(last[:, :, 1:] ** 2, axis=-1)
        nc = half / (jnp.sqrt(energy)[..., None] + eps)
        nl = last / (jnp.sqrt(e_l)[..., None] + eps)
        th = jnp.max(half[:, :, 1:], axis=-1, keepdims=True) / 100.0
        mask = (half[:, :, 1:] > th) & (last[:, :, 1:] > th)
        lr = jnp.abs(jnp.log((nc[:, :, 1:] + eps) / (nl[:, :, 1:] + eps)))
        lsd = jnp.sum(jnp.where(mask, lr, 0.0), axis=-1)
        return jnp.sum(energy) + jnp.sum(lsd)

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
run("kernel HIGH (gf=32)", kernel("high"))
run("xla chain HIGH", xla_chain("high"))
run("kernel HIGHEST", kernel("highest"))
run("xla chain HIGHEST", xla_chain("highest"))
