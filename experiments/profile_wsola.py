"""Fine-grained breakdown of _wsola_grid_batch stages at production shapes.

Replicates each stage of speedy_tpu/ops/wsola_fast.py as a separate jitted
function and times it with fresh inputs + checksum sync.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from speedy_tpu.config import SpeedyConfig
from speedy_tpu.ops import wsola, wsola_fast
from speedy_tpu.ops.pallas_kernels import gather_rows

SR = 16000
B = 128
L = SR * 10
cfg = SpeedyConfig(SR)
rng = np.random.default_rng(0)

minp, maxp, _, _ = wsola.plan(cfg, L, 1.0)
hop, gcap, K = wsola_fast.plan_grid(cfg, L, 1.0)
Hs = hop
Wn = 2 * Hs
frame_step = cfg.frame_step_int
dtype = jnp.float32
T = cfg.num_frames(L, integer_step=True)
taps = maxp
pad_front = maxp
Lp = pad_front + L + 2 * maxp + taps + Wn
n_frames = T

print(f"shapes: B={B} L={L} K={K} hop={hop} minp={minp} maxp={maxp} T={T}")


def fresh_x():
    return jnp.asarray(rng.standard_normal((B, Lp)).astype(np.float32) * 0.1)


def fresh_speeds():
    return jnp.asarray(
        (3.5 + rng.uniform(-1, 1, size=(B, T))).astype(np.float32)
    )


def timeit(name, fn, *args, iters=3):
    r = fn(*args)
    leaves = jax.tree_util.tree_leaves(r)
    float(jnp.sum(leaves[0]))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        r = fn(*args)
        leaves = jax.tree_util.tree_leaves(r)
        float(jnp.sum(leaves[0]))
        ts.append(time.perf_counter() - t0)
    print(f"{name:38s} {min(ts)*1e3:8.2f} ms")
    return min(ts)


# ---- stage 1: time map ----
@jax.jit
def time_map(speeds, input_lengths):
    inv_s = jnp.asarray(frame_step, dtype) / speeds
    obnd = jnp.concatenate(
        [jnp.zeros((B, 1), dtype), jnp.cumsum(inv_s, axis=1)], axis=1
    )
    lens_f = input_lengths.astype(dtype)
    p = jnp.arange(K, dtype=dtype) * Hs
    f = jax.vmap(lambda ob: jnp.searchsorted(ob, p, side="right") - 1)(obnd)
    f = jnp.clip(f, 0, n_frames - 1)
    sp_f = jnp.take_along_axis(speeds, f, axis=1)
    ob_f = jnp.take_along_axis(obnd, f, axis=1)
    c = f.astype(dtype) * frame_step + (p[None, :] - ob_f) * sp_f
    return jnp.clip(c, 0.0, jnp.maximum(lens_f - 1.0, 0.0)[:, None])


lengths = jnp.asarray(np.full((B,), L, np.int32))
timeit("1. time map", time_map, fresh_speeds(), lengths)


# ---- stage 2a: seg build ----
seg_w = taps + maxp
G = Hs
m_strides = -(-seg_w // G)
n_cells = (Lp - pad_front) // G
n_grid = n_cells - m_strides + 1


@jax.jit
def seg_build(x_pad):
    y = x_pad[:, pad_front : pad_front + n_cells * G].reshape(B, n_cells, G)
    return jnp.concatenate(
        [y[:, j : j + n_grid] for j in range(m_strides)], axis=-1
    )[:, :, :seg_w]


timeit("2a. seg build (strided reshape)", seg_build, fresh_x())

# ---- stage 2b: pitch_of over the grid (chunked FFT corr) ----
n_lags = maxp - minp + 1
nfft = 1
while nfft < seg_w + taps:
    nfft *= 2
print(f"pitch: n_grid={n_grid} seg_w={seg_w} nfft={nfft} n_lags={n_lags}")


def pitch_of(seg_c):
    a0 = seg_c[:, :, :taps]
    cs = jnp.cumsum(seg_c * seg_c, axis=2)
    cs = jnp.concatenate([jnp.zeros(cs.shape[:2] + (1,), dtype), cs], axis=2)
    e_lag = (
        jax.lax.slice_in_dim(cs, minp + taps, minp + taps + n_lags, axis=2)
        - jax.lax.slice_in_dim(cs, minp, minp + n_lags, axis=2)
    )
    e0 = (cs[:, :, taps] - cs[:, :, 0])[:, :, None]
    fa = jnp.fft.rfft(a0, n=nfft, axis=2)
    fs = jnp.fft.rfft(seg_c, n=nfft, axis=2)
    cc = jnp.fft.irfft(jnp.conj(fa) * fs, n=nfft, axis=2)[:, :, : maxp + 1]
    ssd = e0 + e_lag - 2.0 * cc[:, :, minp : maxp + 1]
    jmin = jnp.argmin(ssd, axis=-1)
    jc = jnp.clip(jmin, 1, n_lags - 2)
    take = lambda off: jnp.take_along_axis(ssd, (jc + off)[..., None], axis=2)[..., 0]
    l, m, r = take(-1), take(0), take(1)
    denom = l - 2.0 * m + r
    frac = jnp.where(jnp.abs(denom) > 1e-12, 0.5 * (l - r) / denom, 0.0)
    return (minp + jc).astype(dtype) + jnp.clip(frac, -0.5, 0.5)


GSEG = 128


@jax.jit
def pitch_grid(seg):
    n_gpad = -(-n_grid // GSEG) * GSEG
    seg_p = jnp.concatenate(
        [seg, jnp.zeros((B, n_gpad - n_grid, seg_w), dtype)], axis=1
    )
    seg_p = seg_p.reshape(B, n_gpad // GSEG, GSEG, seg_w).transpose(1, 0, 2, 3)
    pg = jax.lax.map(pitch_of, seg_p)
    return pg.transpose(1, 0, 2).reshape(B, n_gpad)[:, :n_grid]


seg0 = jax.jit(seg_build)(fresh_x())
timeit("2b. pitch grid (chunked FFT corr)", pitch_grid, seg0)

# sub-ablations of pitch_of: cumsum only, fft only
@jax.jit
def pitch_cumsum_only(seg):
    n_gpad = -(-n_grid // GSEG) * GSEG
    seg_p = jnp.concatenate(
        [seg, jnp.zeros((B, n_gpad - n_grid, seg_w), dtype)], axis=1
    )
    seg_p = seg_p.reshape(B, n_gpad // GSEG, GSEG, seg_w).transpose(1, 0, 2, 3)
    f = lambda s: jnp.cumsum(s * s, axis=2)[:, :, -1]
    return jax.lax.map(f, seg_p)


timeit("2b-i. pitch cumsum only", pitch_cumsum_only, seg0)


@jax.jit
def pitch_fft_only(seg):
    n_gpad = -(-n_grid // GSEG) * GSEG
    seg_p = jnp.concatenate(
        [seg, jnp.zeros((B, n_gpad - n_grid, seg_w), dtype)], axis=1
    )
    seg_p = seg_p.reshape(B, n_gpad // GSEG, GSEG, seg_w).transpose(1, 0, 2, 3)

    def f(seg_c):
        a0 = seg_c[:, :, :taps]
        fa = jnp.fft.rfft(a0, n=nfft, axis=2)
        fs = jnp.fft.rfft(seg_c, n=nfft, axis=2)
        cc = jnp.fft.irfft(jnp.conj(fa) * fs, n=nfft, axis=2)[:, :, : maxp + 1]
        return cc

    return jax.lax.map(f, seg_p)


timeit("2b-ii. pitch fft only", pitch_fft_only, seg0)

# ---- stage 2c: period lookup ----
@jax.jit
def period_lookup(period_grid, c):
    g_idx = jnp.clip(jnp.round(c / G).astype(jnp.int32), 0, n_grid - 1)
    return jnp.take_along_axis(period_grid, g_idx, axis=1)


pg0 = jnp.asarray(rng.uniform(minp, maxp, size=(B, n_grid)).astype(np.float32))
c0 = jnp.asarray(
    np.sort(rng.uniform(0, L - 1, size=(B, K)).astype(np.float32), axis=1)
)
timeit("2c. period lookup (take_along)", period_lookup, pg0, c0)

# ---- stage 3: phase snap ----
@jax.jit
def phase_snap(c, period, input_lengths):
    lens_f = input_lengths.astype(dtype)
    kk = jnp.arange(K, dtype=dtype)[None, :]
    delta = c[:, :1] + kk * Hs - c
    o = delta - jnp.round(delta / period) * period
    return jnp.clip(c + o, 0.0, (lens_f - 1.0)[:, None])


per0 = jnp.asarray(rng.uniform(minp, maxp, size=(B, K)).astype(np.float32))
timeit("3. phase snap", phase_snap, c0, per0, lengths)

# ---- stage 4: gather / interp+OLA ----
width = Wn + 1
starts0 = jnp.asarray(
    np.sort(rng.integers(0, L - width, size=(B, K)).astype(np.int32), axis=1)
)
g = jax.jit(lambda x, s: gather_rows(x, s, width))
timeit("4a. gather", g, fresh_x(), starts0)

win = jnp.asarray(wsola_fast._cola_hann(Wn))
cap = gcap


@jax.jit
def interp_ola(wide, a_f, valid):
    af = a_f[:, :, None]
    raw = wide[:, :, :-1] * (1.0 - af) + wide[:, :, 1:] * af
    rows = raw * win[None, None, :]
    firsts = rows[:, :, :Hs]
    seconds = rows[:, :, Hs:]
    slots = firsts + jnp.concatenate(
        [jnp.zeros((B, 1, Hs), dtype), seconds[:, :-1]], axis=1
    )
    slots = jnp.concatenate([raw[:, :1, :Hs], slots[:, 1:]], axis=1)
    out_full = slots.reshape(B, K * Hs)
    idx = jnp.arange(cap, dtype=jnp.int32)
    return jnp.where(idx[None, :] < valid[:, None], out_full[:, :cap], 0.0)


wide0 = jnp.asarray(rng.standard_normal((B, K, width)).astype(np.float32))
af0 = jnp.asarray(rng.uniform(0, 1, size=(B, K)).astype(np.float32))
valid0 = jnp.asarray(np.full((B,), 51000, np.int32))
timeit("4b. interp + OLA", interp_ola, wide0, af0, valid0)
