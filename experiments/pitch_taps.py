"""Quality + speed evidence for shrinking the pitch SSD template.

taps=maxp (246 @16 kHz) -> taps=128 shrinks M 512->384 and cuts the pitch
matmul FLOPs ~38%. Risk: shorter template = noisier SSD minimum. Evidence
gathered on REAL SPEECH (tapestry.wav):
  * fraction of grid cells whose chosen period moves > 1 sample,
  * restricted to voiced cells (where the splice quality is audible),
  * end-to-end DTW warp-slope + Teager gates run separately via pytest.
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, jax, jax.numpy as jnp
from speedy_tpu.config import SpeedyConfig
from speedy_tpu.io.wave import read_wave
from speedy_tpu.ops import wsola, wsola_fast
from speedy_tpu.ops.wsola_fast import _pitch_corr_matrices

s, sr = read_wave("/root/reference/test_data/tapestry.wav")
x = (s.astype(np.float32) / 32768.0)
cfg = SpeedyConfig(sr)
L = len(x)
minp, maxp, _, _ = wsola.plan(cfg, L, 1.0)
hop, cap, K = wsola_fast.plan_grid(cfg, L, 1.0)
Hs = hop
taps_ref = maxp
pad_front = maxp
dtype = jnp.float32
B = 1
xs = jnp.asarray(x[None, :])


def period_grid(xs, taps, prec=jax.lax.Precision.HIGHEST):
    Wn = 2 * Hs
    x_pad = jnp.concatenate(
        [jnp.zeros((B, pad_front), dtype), xs,
         jnp.zeros((B, 2 * maxp + taps_ref + Wn), dtype)], axis=1)
    seg_w = taps + maxp
    G = 2 * Hs
    m_strides = -(-seg_w // G)
    n_cells = (x_pad.shape[1] - pad_front) // G
    n_grid = n_cells - m_strides + 1
    y = x_pad[:, pad_front: pad_front + n_cells * G].reshape(B, n_cells, G)
    seg = jnp.concatenate([y[:, j: j + n_grid] for j in range(m_strides)], axis=-1)[:, :, :seg_w]
    w = seg.shape[-1]
    M = -(-max(w, taps + maxp) // 128) * 128
    nb = M // 2 + 1
    n_lags = maxp - minp + 1
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
    pg = (minp + jc).astype(dtype) + jnp.clip(frac, -0.5, 0.5)
    # voiced-ness proxy: SSD contrast (min vs median) and cell energy
    e0 = E[..., n_lags]
    contrast = jnp.median(ssd, axis=-1) / (jnp.take_along_axis(ssd, jc[..., None], axis=2)[..., 0] + 1e-9)
    return pg[0], e0[0], contrast[0]


p246, e246, c246 = (np.asarray(a) for a in jax.jit(lambda v: period_grid(v, taps_ref))(xs))
p128, e128, c128 = (np.asarray(a) for a in jax.jit(lambda v: period_grid(v, 128))(xs))
n = min(len(p246), len(p128))
p246, p128 = p246[:n], p128[:n]
d = np.abs(p246 - p128)
energetic = e246[:n] > np.quantile(e246[:n], 0.5)
voiced = energetic & (c246[:n] > 2.0)  # clear periodicity
print(f"cells {n}; |dP|>1: all {np.mean(d>1):.4f}  energetic {np.mean(d[energetic]>1):.4f}  voiced {np.mean(d[voiced]>1):.4f}")
print(f"voiced cells {voiced.sum()}; |dP| p95 voiced {np.quantile(d[voiced],0.95):.3f}  max voiced {d[voiced].max():.2f}")
print(f"|dP|<=0.25 fraction voiced: {np.mean(d[voiced]<=0.25):.4f}")
