"""Prototype: pitch SSD correlation via DFT-as-matmul (MXU) vs jnp.fft.

Validates period outputs against the FFT path and times both at production
shapes (B=128, n_grid~1003, seg_w=492, taps=246, lags 40..246).
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

SR = 16000
B = 128
minp, maxp = 40, 246
taps = maxp
seg_w = taps + maxp  # 492
n_lags = maxp - minp + 1
n_grid = 1003
GSEG = 128
dtype = jnp.float32
rng = np.random.default_rng(0)

nfft = 1
while nfft < seg_w + taps:
    nfft *= 2  # 1024


def pitch_of_fft(seg_c):
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
    return ssd


@functools.lru_cache(maxsize=4)
def corr_matrices(M, prec="float32"):
    nb = M // 2 + 1
    n = np.arange(M, dtype=np.float64)
    k = np.arange(nb, dtype=np.float64)
    ang = 2.0 * np.pi * np.outer(n, k) / M  # [M, nb]
    Ea = np.concatenate([np.cos(ang[:taps]), -np.sin(ang[:taps])], axis=1)
    Es = np.concatenate([np.cos(ang[:seg_w]), -np.sin(ang[:seg_w])], axis=1)
    l = np.arange(minp, maxp + 1, dtype=np.float64)
    angl = 2.0 * np.pi * np.outer(k, l) / M  # [nb, n_lags]
    w = np.full((nb, 1), 2.0)
    w[0] = 1.0
    if M % 2 == 0:
        w[-1] = 1.0
    InvR = w * np.cos(angl) / M
    InvI = -w * np.sin(angl) / M  # irfft[l] = (1/M) sum w_k (YR cos - YI sin)
    Inv = np.concatenate([InvR, InvI], axis=0)  # [2nb, n_lags]
    # band matrix for windowed energies
    Band = np.zeros((seg_w, n_lags + 1))
    for j in range(n_lags):
        Band[minp + j : minp + j + taps, j] = 1.0
    Band[:taps, n_lags] = 1.0
    f = np.float32
    return Ea.astype(f), Es.astype(f), Inv.astype(f), Band.astype(f)


M = 768


def pitch_of_matmul(seg_c, precision):
    Ea, Es, Inv, Band = corr_matrices(M)
    Ea, Es, Inv, Band = map(jnp.asarray, (Ea, Es, Inv, Band))
    a0 = seg_c[:, :, :taps]
    FA = jnp.einsum("bgt,tk->bgk", a0, Ea, precision=precision)
    FS = jnp.einsum("bgt,tk->bgk", seg_c, Es, precision=precision)
    nb = M // 2 + 1
    AR, AI = FA[..., :nb], FA[..., nb:]
    SR, SI = FS[..., :nb], FS[..., nb:]
    PR = AR * SR + AI * SI  # Re(conj(FA) FS)
    PI = AR * SI - AI * SR  # Im(conj(FA) FS)
    # irfft at lag l: (1/M) sum_k w_k (PR cos + PI sin)
    cc = jnp.einsum(
        "bgk,kl->bgl", jnp.concatenate([PR, PI], axis=-1), Inv,
        precision=precision,
    )
    E = jnp.einsum("bgt,tl->bgl", seg_c * seg_c, Band, precision=precision)
    e_lag, e0 = E[..., :n_lags], E[..., n_lags:]
    ssd = e0 + e_lag - 2.0 * cc
    return ssd


def periods_from_ssd(ssd):
    jmin = jnp.argmin(ssd, axis=-1)
    jc = jnp.clip(jmin, 1, n_lags - 2)
    take = lambda off: jnp.take_along_axis(ssd, (jc + off)[..., None], axis=2)[..., 0]
    l, m, r = take(-1), take(0), take(1)
    denom = l - 2.0 * m + r
    frac = jnp.where(jnp.abs(denom) > 1e-12, 0.5 * (l - r) / denom, 0.0)
    return (minp + jc).astype(dtype) + jnp.clip(frac, -0.5, 0.5)


# speech-like segments
L = n_grid * 160 + seg_w
t = np.arange(L) / SR
f0 = 110.0 + 30.0 * np.sin(2 * np.pi * 0.7 * t)
phase = np.cumsum(2 * np.pi * f0 / SR)
voiced = sum(np.sin(k * phase) / k for k in range(1, 6))
env = np.clip(np.sin(2 * np.pi * 2.5 * t), 0.05, None)
base = (voiced * env * 0.2).astype(np.float32)


def fresh_seg():
    amp = rng.uniform(0.5, 1.0, size=(B, 1)).astype(np.float32)
    x = np.tile(base, (B, 1)) * amp + rng.standard_normal((B, L)).astype(np.float32) * 0.001
    idx = np.arange(n_grid)[:, None] * 160 + np.arange(seg_w)[None, :]
    return jnp.asarray(x[:, idx])  # [B, n_grid, seg_w]


def chunked(fn):
    def run(seg):
        n_gpad = -(-n_grid // GSEG) * GSEG
        seg_p = jnp.concatenate(
            [seg, jnp.zeros((B, n_gpad - n_grid, seg_w), dtype)], axis=1
        )
        seg_p = seg_p.reshape(B, n_gpad // GSEG, GSEG, seg_w).transpose(1, 0, 2, 3)
        pg = jax.lax.map(lambda s: periods_from_ssd(fn(s)), seg_p)
        return pg.transpose(1, 0, 2).reshape(B, n_gpad)[:, :n_grid]

    return jax.jit(run)


def timeit(name, fn, iters=3):
    r = fn(fresh_seg())
    float(jnp.sum(r))
    ts = []
    for _ in range(iters):
        s = fresh_seg()
        float(jnp.sum(s))
        t0 = time.perf_counter()
        r = fn(s)
        float(jnp.sum(r))
        ts.append(time.perf_counter() - t0)
    print(f"{name:34s} {min(ts)*1e3:8.2f} ms")
    return r


f_fft = chunked(pitch_of_fft)
f_hi = chunked(lambda s: pitch_of_matmul(s, jax.lax.Precision.HIGHEST))
f_h = chunked(lambda s: pitch_of_matmul(s, jax.lax.Precision.HIGH))
f_d = chunked(lambda s: pitch_of_matmul(s, jax.lax.Precision.DEFAULT))

seg = fresh_seg()
p_fft = np.asarray(f_fft(seg))
for name, f in (("HIGHEST", f_hi), ("HIGH", f_h), ("DEFAULT", f_d)):
    p = np.asarray(f(seg))
    d = np.abs(p - p_fft)
    # integer-lag agreement and sub-sample deviation
    print(
        f"{name}: max|dP|={d.max():.4f} mean={d.mean():.5f} "
        f"frac>0.1={np.mean(d > 0.1):.5f} frac>1={np.mean(d > 1):.6f}"
    )

timeit("fft", f_fft)
timeit("matmul HIGHEST", f_hi)
timeit("matmul HIGH", f_h)
timeit("matmul DEFAULT", f_d)
