"""Pitch stage A/B on the real chip: production XLA einsum formulation
(ssd_matmul + parabolic_min, replicated from wsola_fast at the bench
shapes) vs the VMEM-resident Pallas kernel (pitch_ssd_pallas), both with
the nb-lane-aligned DFT (M=510). Inputs re-randomized per iteration via
an amplitude scale (ranking-invariant but defeats hoisting/caching);
single-dispatch scan windows. Run: python experiments/pitch_kernel_vs_einsum.py
"""
import os, sys, time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
import jax.numpy as jnp

from speedy_tpu.config import SpeedyConfig
from speedy_tpu.ops import wsola, wsola_fast
from speedy_tpu.ops.wsola_fast import _pitch_corr_matrices, _pitch_dft_size
from speedy_tpu.ops.pallas_kernels import pitch_ssd_pallas

SR = 16000
B = int(os.environ.get("B", "96"))
L = SR * 10
NIT = int(os.environ.get("NIT", "24"))
cfg = SpeedyConfig(SR)
minp, maxp, _, _ = wsola.plan(cfg, L, 1.0)
hop, _, _ = wsola_fast.plan_grid(cfg, L, 1.0)
taps = maxp
seg_w = taps + maxp
G = -(-max(3 * hop, seg_w) // 128) * 128
nc = -(-(L + seg_w) // G)
rng = np.random.default_rng(0)
t = np.arange(L) / SR
f0 = 110.0 + 30.0 * np.sin(2 * np.pi * 0.7 * t)
sig = sum(np.sin(k * np.cumsum(2 * np.pi * f0 / SR)) / k for k in range(1, 6))
sig = (sig * np.clip(np.sin(2 * np.pi * 2.5 * t), 0, None) * 0.2).astype(np.float32)
xp = np.zeros((B, nc * G), np.float32)
xp[:, :L] = sig
xg_base = jnp.asarray(xp.reshape(B, nc, G))
sync = jax.jit(lambda x: jnp.sum(x))
PREC = jax.lax.Precision.HIGHEST


def einsum_pitch(xg):
    seg = xg[:, :, :seg_w]
    M = _pitch_dft_size(max(seg_w, taps + maxp))
    nb = M // 2 + 1
    nl = maxp - minp + 1
    mats = _pitch_corr_matrices(taps, seg_w, minp, maxp, M, "float32")
    Ea, Es, Inv, Band = (jnp.asarray(m) for m in mats)
    a0 = seg[..., :taps]
    FA = jnp.einsum("bgt,tk->bgk", a0, Ea, precision=PREC)
    FS = jnp.einsum("bgt,tk->bgk", seg, Es, precision=PREC)
    AR, AI = FA[..., :nb], FA[..., nb:]
    SRl, SI = FS[..., :nb], FS[..., nb:]
    cc = jnp.einsum("bgk,kl->bgl", AR * SRl + AI * SI, Inv[:nb], precision=PREC) + \
         jnp.einsum("bgk,kl->bgl", AR * SI - AI * SRl, Inv[nb:], precision=PREC)
    E = jnp.einsum("bgt,tl->bgl", seg * seg, Band, precision=PREC)
    ssd = E[..., nl:] + E[..., :nl] - 2.0 * cc
    jmin = jnp.argmin(ssd, axis=-1)
    jc = jnp.clip(jmin, 1, maxp - minp - 1)
    take = lambda off: jnp.take_along_axis(ssd, (jc + off)[..., None], axis=2)[..., 0]
    l_, m_, r_ = take(-1), take(0), take(1)
    den = l_ - 2.0 * m_ + r_
    frac = jnp.where(jnp.abs(den) > 1e-12, 0.5 * (l_ - r_) / den, 0.0)
    return (minp + jc).astype(jnp.float32) + jnp.clip(frac, -0.5, 0.5)


def run(name, f):
    def scanned(amps):
        def body(carry, amp):
            return carry + jnp.sum(f(xg_base * amp)), 0.0
        s, _ = jax.lax.scan(body, jnp.float32(0), amps)
        return s

    fj = jax.jit(scanned)
    fresh = lambda: jnp.asarray(
        rng.uniform(0.5, 1.0, (NIT, B, 1, 1)).astype(np.float32)
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
    print(f"{name:28s} {best * 1e3:8.2f} ms/step", flush=True)
    return best


# Agreement first (hardware, one batch)
pe = np.asarray(einsum_pitch(xg_base))
pk = np.asarray(pitch_ssd_pallas(xg_base, taps, minp, maxp))
d = np.abs(pe - pk)
print(f"period agreement: max|d|={d.max():.4f} mean={d.mean():.5f} "
      f"(>1 sample: {(d > 1).mean() * 100:.2f}%)")

run("noop (sum xg*amp)", lambda xg: xg)
run("einsum pitch", einsum_pitch)
for gc in (64, 128, 256):
    run(f"pallas pitch GC={gc}",
        lambda xg, gc=gc: pitch_ssd_pallas(xg, taps, minp, maxp, gc_cells=gc))
