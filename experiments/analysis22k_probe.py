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


def xla_chain_dft_only(prec_name):
    """Prefix: stop at the DFT magnitudes (checksum on re/im). The delta
    vs the full chain is the post-DFT feature chain's cost."""
    prec = {
        "default": jax.lax.Precision.DEFAULT,
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
        return jnp.sum(re) + jnp.sum(im)

    return f


def split_cell_chain(prec_name, dft_only=False):
    """Reformulated chain for the m=2 lattice (22.05 k / 44.1 k / 16 k):
    fold preemphasis + Hamming into the DFT matrices so the [B, T, W]
    frames/prev/pre/fw intermediates NEVER materialize — the two dots
    read the strided-reshape cell views of xs_pad directly:

      fw = (f - a*prev) * win;  re|im = fw @ [cos|-sin]
        == c0 @ K0 + c1 @ K1 + t0 fixup

    with K[j] = win[j]M[j] - a*win[j+1]M[j+1] (the preemphasis shifted
    INTO the matrix), the cross-frame state sample folded into K0's row
    (W - 1 - step) (state_t = x[(t-1)step + W-1] lives at cell-t offset
    W-1-step), and the frame-0 no-state correction applied post-hoc to
    one [B, nb] slice. Gain is linear -> applied to the dot output."""
    prec = {
        "default": jax.lax.Precision.DEFAULT,
        "high": jax.lax.Precision.HIGH,
        "highest": jax.lax.Precision.HIGHEST,
    }[prec_name]
    a = float(C.PREEMPHASIS_COEF)
    win = dft.hamming_window(W).astype(np.float64)
    cos_m, sin_m = dft.dft_matrices(W)
    M = np.concatenate([cos_m, sin_m], axis=1).astype(np.float64)  # [W+? , 2nb]
    nb = cos_m.shape[1]
    # K[j] = win[j]M[j] - a*win[j+1]M[j+1]  (j+1 < W)
    K = win[:, None] * M
    K[: W - 1] -= a * (win[1:, None] * M[1:])
    K0 = K[:step].astype(np.float32)              # cell t rows 0..step-1
    K1f = np.zeros((step, 2 * nb), np.float64)    # cell t+1 rows
    K1f[: W - step] = K[step:]
    # state sample: cell-t offset W-1-step contributes -a*win[0]*M[0]
    K0s = K0.copy()
    K0s[W - 1 - step] += (-a * win[0] * M[0]).astype(np.float32)
    K0_d = jnp.asarray(K0s)
    K1_d = jnp.asarray(K1f.astype(np.float32))
    fix_row = jnp.asarray((a * win[0] * M[0]).astype(np.float32))

    def f(amp):
        m = 2
        n_cells = T + m
        xs_pad = jnp.concatenate(
            [base_d, jnp.zeros((B, n_cells * step - L), jnp.float32)], axis=1
        )
        y = xs_pad.reshape(B, n_cells, step)
        c0 = y[:, :T]
        c1 = y[:, 1 : 1 + T]
        out = jnp.dot(c0, K0_d, precision=prec) + jnp.dot(
            c1, K1_d, precision=prec
        )
        # frame 0 has no previous frame: remove the folded state term.
        fix = base_d[:, W - 1 - step][:, None] * fix_row[None, :]
        out = out.at[:, 0, :].add(fix)
        g = amp[:, :1, None]
        re = out[:, :, :nb] * g
        im = out[:, :, nb:] * g
        if dft_only:
            return jnp.sum(re) + jnp.sum(im)
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
if os.environ.get("SPLIT_ONLY", "0") != "1":
    run("kernel HIGH (gf=32)", kernel("high"))
    run("xla chain HIGH", xla_chain("high"))
    run("kernel HIGHEST", kernel("highest"))
    run("xla chain HIGHEST", xla_chain("highest"))
# Round-4 cost split + reformulation (SPLIT_ONLY=1 runs just these):
t_dft_d = run("chain DFT-only DEFAULT", xla_chain_dft_only("default"))
t_dft_h = run("chain DFT-only HIGH", xla_chain_dft_only("high"))
t_dft_hh = run("chain DFT-only HIGHEST", xla_chain_dft_only("highest"))
print(f"  chain per-MXU-pass {(t_dft_hh - t_dft_d) / 5 * 1e3:6.3f} ms; "
      f"DFT-only HIGH non-MXU {(t_dft_h - 3 * (t_dft_hh - t_dft_d) / 5) * 1e3:6.3f} ms",
      flush=True)
t_sc_dft = run("split-cell DFT-only HIGH", split_cell_chain("high", dft_only=True))
t_sc = run("split-cell chain HIGH", split_cell_chain("high"))
t_sc_hh = run("split-cell chain HIGHEST", split_cell_chain("highest"))
