"""Probe: are the fused-front-end vs pitch_ssd_pallas period disagreements
in VOICED cells genuine SSD near-ties?

For every cell where the two paths' integer argmins differ, compute the
exact float64 SSD at both chosen lags with a naive numpy loop and report
the relative margin |SSD(l1) - SSD(l2)| / SSD_scale. Ties (margin within
f32 summation noise ~1e-6) are benign re-rankings; a large margin would
mean one path picks a genuinely worse lag — a bug.

Run hermetically (interpret) by default.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax.numpy as jnp

from speedy_tpu.ops import pallas_kernels as pk


def main():
    rng = np.random.default_rng(1)
    B, L = 2, 60000
    W, step = 240, 160
    T = (L - W) // step + 1
    x = (rng.standard_normal((B, L)) * 0.2).astype(np.float32)
    t = np.arange(L) / 16000.0
    x[0] = (
        0.4 * np.sin(2 * np.pi * 140 * t) * (1 + 0.3 * np.sin(2 * np.pi * 3 * t))
    ).astype(np.float32)
    taps, minp, maxp, G = 246, 40, 246, 512
    seg_w = taps + maxp

    xj = jnp.asarray(x)
    _, _, per = pk.analysis_energy_lsd_pallas(
        xj, T, W, step, interpret=True, pitch_geom=(taps, minp, maxp, G)
    )
    per = np.asarray(per)
    n_grid = per.shape[1]
    n_cells = -(-n_grid // 64) * 64
    xg = np.zeros((B, n_cells * G), np.float32)
    xg[:, :L] = x
    ref = np.asarray(
        pk.pitch_ssd_pallas(
            jnp.asarray(xg.reshape(B, n_cells, G)), taps, minp, maxp,
            interpret=True,
        )
    )[:, :n_grid]

    segs = xg.reshape(B, n_cells, G)[:, :n_grid]
    tmpl = segs[..., :taps]
    rms = np.sqrt((tmpl.astype(np.float64) ** 2).mean(axis=2))
    d = np.abs(per - ref)
    flips = np.argwhere(d > 0.5)
    print(f"{flips.shape[0]} integer flips / {d.size} cells")
    for b, g in flips:
        seg = segs[b, g].astype(np.float64)
        # segment window is only seg_w wide in the kernels
        seg = seg[:seg_w]

        def ssd(lag):
            lag_i = int(round(lag))
            return np.sum((seg[:taps] - seg[lag_i : lag_i + taps]) ** 2)

        lags = np.arange(minp, maxp + 1)
        curve = np.array([ssd(l) for l in lags])
        l1, l2 = per[b, g], ref[b, g]
        s1, s2 = ssd(l1), ssd(l2)
        scale = max(curve.max(), 1e-30)
        print(
            f"b={b} g={g} rms={rms[b, g]:.4f} fused={l1:.2f} std={l2:.2f} "
            f"ssd(fused)={s1:.6e} ssd(std)={s2:.6e} "
            f"margin/scale={abs(s1 - s2) / scale:.3e} "
            f"min(curve)={curve.min():.6e} argmin={lags[curve.argmin()]}"
        )


if __name__ == "__main__":
    main()
