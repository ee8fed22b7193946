"""Splice-quality metric for the pitch grid stride on REAL SPEECH.

For each synthesis chunk k, the OLA blends x[a_k : a_k+Hs] (chunk k's
firsts) with x[a_{k-1}+Hs : a_{k-1}+2Hs] (chunk k-1's seconds). When the
phase snap picks good periods these two segments agree; disagreement
energy / signal energy is the audible splice error. Compare G = 2*Hs vs
3*Hs on tapestry.wav at 3.5x (the worse the period estimate at chunk k's
position, the worse the wrap)."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
from speedy_tpu.config import SpeedyConfig
from speedy_tpu.io.wave import read_wave
from speedy_tpu.ops import wsola, wsola_fast
from speedy_tpu.ops.wsola_fast import _pitch_corr_matrices

s, sr = read_wave("/root/reference/test_data/tapestry.wav")
x = s.astype(np.float32) / 32768.0
cfg = SpeedyConfig(sr)
L = len(x)
minp, maxp, _, _ = wsola.plan(cfg, L, 1.0)
hop, cap, K = wsola_fast.plan_grid(cfg, L, 1.0)
Hs = hop
taps = maxp
pad_front = maxp
speed = 3.5
dtype = jnp.float32
B = 1
xs = jnp.asarray(x[None, :])


def positions(G_mult):
    G = G_mult * Hs
    Wn = 2 * Hs
    x_pad = jnp.concatenate(
        [jnp.zeros((B, pad_front), dtype), xs,
         jnp.zeros((B, 2 * maxp + taps + Wn), dtype)], axis=1)
    seg_w = taps + maxp
    m_strides = -(-seg_w // G)
    n_cells = (x_pad.shape[1] - pad_front) // G
    n_grid = n_cells - m_strides + 1
    y = x_pad[:, pad_front: pad_front + n_cells * G].reshape(B, n_cells, G)
    seg = jnp.concatenate([y[:, j: j + n_grid] for j in range(m_strides)], axis=-1)[:, :, :seg_w]
    w = seg.shape[-1]
    M = -(-max(w, taps + maxp) // 128) * 128
    nb = M // 2 + 1
    n_lags = maxp - minp + 1
    prec = jax.lax.Precision.HIGHEST
    Ea, Es, Inv, Band = (jnp.asarray(m) for m in _pitch_corr_matrices(taps, w, minp, maxp, M))
    a0 = seg[..., :taps]
    FA = jnp.einsum("bgt,tk->bgk", a0, Ea, precision=prec)
    FS = jnp.einsum("bgt,tk->bgk", seg, Es, precision=prec)
    AR, AI = FA[..., :nb], FA[..., nb:]; SRr, SI = FS[..., :nb], FS[..., nb:]
    prod = jnp.concatenate([AR * SRr + AI * SI, AR * SI - AI * SRr], axis=-1)
    cc = jnp.einsum("bgk,kl->bgl", prod, Inv, precision=prec)
    E = jnp.einsum("bgt,tl->bgl", seg * seg, Band, precision=prec)
    ssd = E[..., n_lags:] + E[..., :n_lags] - 2.0 * cc
    jmin = jnp.argmin(ssd, axis=-1); jc = jnp.clip(jmin, 1, maxp - minp - 1)
    take = lambda off: jnp.take_along_axis(ssd, (jc + off)[..., None], axis=2)[..., 0]
    l_, m_, r_ = take(-1), take(0), take(1)
    den = l_ - 2 * m_ + r_
    frac = jnp.where(jnp.abs(den) > 1e-12, 0.5 * (l_ - r_) / den, 0.0)
    period_grid = (minp + jc).astype(dtype) + jnp.clip(frac, -0.5, 0.5)
    # fixed-speed time map
    Kv = int(L / speed / Hs) - 2
    c = jnp.arange(Kv, dtype=dtype) * (Hs * speed)
    c = jnp.clip(c, 0.0, L - 1.0)[None, :]
    g_idx = jnp.clip(jnp.round(c / G).astype(jnp.int32), 0, n_grid - 1)
    period = jnp.take_along_axis(period_grid, g_idx, axis=1)
    kk = jnp.arange(Kv, dtype=dtype)[None, :]
    delta = c[:, :1] + kk * Hs - c
    o = delta - jnp.round(delta / period) * period
    a = jnp.clip(c + o, 0.0, L - 1.0)
    return np.asarray(a[0])


def splice_error(a):
    num = 0.0
    den = 0.0
    for k in range(1, len(a)):
        i1 = int(a[k])
        i0 = int(a[k - 1]) + Hs
        if max(i1, i0) + Hs >= L:
            break
        w1 = x[i1: i1 + Hs]
        w2 = x[i0: i0 + Hs]
        num += float(np.sum((w1 - w2) ** 2))
        den += float(np.sum(w1 ** 2) + np.sum(w2 ** 2))
    return num / den


for g in (3, 4):
    a = positions(g)
    print(f"G={g}*Hs: splice disagreement ratio = {splice_error(a):.4f}")
