"""Device-time + accuracy comparison of pitch SSD matmul precision.

Times via scan-of-8 single dispatch (the relay's ~30 ms per-execute floor
otherwise hides device cost). Accuracy: distribution of |period_HIGH -
period_HIGHEST| on speech-like signal, in samples.
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, jax, jax.numpy as jnp
from speedy_tpu.config import SpeedyConfig
from speedy_tpu.ops import wsola, wsola_fast
from speedy_tpu.ops.wsola_fast import _pitch_corr_matrices

SR = 16000; B = 128; L = SR * 10; cfg = SpeedyConfig(SR)
rng = np.random.default_rng(0)
t = np.arange(L) / SR
f0 = 110.0 + 30.0 * np.sin(2 * np.pi * 0.7 * t)
ph = np.cumsum(2 * np.pi * f0 / SR)
base = (sum(np.sin(k * ph) / k for k in range(1, 6))
        * np.clip(np.sin(2 * np.pi * 2.5 * t), 0, None) * 0.2).astype(np.float32)
def fresh():
    return jnp.asarray(np.tile(base, (B, 1)) * rng.uniform(0.5, 1.0, (B, 1)).astype(np.float32))

minp, maxp, _, _ = wsola.plan(cfg, L, 1.0)
hop, cap, K = wsola_fast.plan_grid(cfg, L, 1.0)
dtype = jnp.float32; Hs = hop; Wn = 2 * Hs
taps = maxp; pad_front = maxp


def period_grid_of(xs, prec):
    x_pad = jnp.concatenate(
        [jnp.zeros((B, pad_front), dtype), xs,
         jnp.zeros((B, 2 * maxp + taps + Wn), dtype)], axis=1)
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
    return (minp + jc).astype(dtype) + jnp.clip(frac, -0.5, 0.5)


def timeit(name, prec, nit=8):
    def scanned(stack):
        def f(c, xs):
            return c + jnp.sum(period_grid_of(xs, prec)), 0.0
        s, _ = jax.lax.scan(f, jnp.float32(0), stack)
        return s
    fj = jax.jit(scanned)
    best = None
    for w in range(2):
        stack = jnp.stack([fresh() for _ in range(nit)])
        float(jnp.sum(stack))
        if w == 0:
            float(fj(stack))
            stack = jnp.stack([fresh() for _ in range(nit)]); float(jnp.sum(stack))
        t0 = time.perf_counter(); float(fj(stack)); dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{name:28s} {best / nit * 1e3:8.2f} ms/step (incl ~3.7 floor share)")


P = jax.lax.Precision
timeit("pitch HIGHEST", P.HIGHEST)
timeit("pitch HIGH", P.HIGH)
timeit("pitch DEFAULT", P.DEFAULT)

xs = fresh()
pg_hst = np.asarray(jax.jit(lambda x: period_grid_of(x, P.HIGHEST))(xs))
pg_h = np.asarray(jax.jit(lambda x: period_grid_of(x, P.HIGH))(xs))
pg_d = np.asarray(jax.jit(lambda x: period_grid_of(x, P.DEFAULT))(xs))
for name, pg in [("HIGH", pg_h), ("DEFAULT", pg_d)]:
    d = np.abs(pg - pg_hst)
    print(f"{name:8s} |dP|: mean {d.mean():.4f}  p99 {np.quantile(d, 0.99):.4f} "
          f"max {d.max():.2f}  frac>0.1 {np.mean(d > 0.1):.4f}  frac>1 {np.mean(d > 1):.5f}")
