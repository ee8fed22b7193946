"""Probe: analysis_energy_lsd_pallas hardware (Mosaic) vs interpret-mode
error distribution — evidence for the TPU parity-gate tolerances
(tests/test_pallas.py::test_analysis_kernel_on_tpu)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from speedy_tpu.ops.pallas_kernels import analysis_energy_lsd_pallas


def batch(B=4, L=48000):
    rng = np.random.default_rng(13)
    t = np.arange(L) / 16000.0
    f0 = 120.0 + 40.0 * np.sin(2 * np.pi * 0.6 * t)
    voiced = sum(
        np.sin(k * np.cumsum(2 * np.pi * f0 / 16000.0)) / k for k in range(1, 5)
    ) * np.clip(np.sin(2 * np.pi * 2.2 * t), 0, None)
    noise = rng.standard_normal(L) * 0.08
    bursty = np.zeros(L)
    bursty[6000:26000] = voiced[:20000]
    chirp = np.sin(2 * np.pi * (80 + 400 * t) * t) * 0.3
    x = np.stack([voiced * 0.3, noise, bursty * 0.4, chirp]).astype(np.float32)
    return x[:B]


def main():
    print("backend:", jax.default_backend())
    x = jnp.asarray(batch())
    W, step = 240, 160
    T = (x.shape[1] - W) // step + 1
    g = jnp.asarray([1.0, 0.7, 1.3, 0.9], jnp.float32)
    for prec in ("high", "highest"):
        e_hw, l_hw = analysis_energy_lsd_pallas(x, T, W, step, gain=g, precision=prec)
        e_it, l_it = analysis_energy_lsd_pallas(
            x, T, W, step, gain=g, precision=prec, interpret=True
        )
        e_hw, l_hw, e_it, l_it = map(np.asarray, (e_hw, l_hw, e_it, l_it))
        de = np.abs(e_hw - e_it)
        rel = de / np.maximum(np.abs(e_it), 1e-9)
        print(
            f"[{prec}] energy: max abs {de.max():.3e} max rel {rel.max():.3e} "
            f"med rel {np.median(rel):.3e} frac(rel>5e-5) {(rel > 5e-5).mean():.4f}"
        )
        dl = np.abs(l_hw[:, 1:] - l_it[:, 1:])
        scale = max(float(np.abs(l_it[:, 1:]).max()), 1.0)
        print(
            f"[{prec}] lsd: max {dl.max():.3e} med {np.median(dl):.3e} "
            f"scale {scale:.3e} frac(>1e-3*scale) {(dl > 1e-3 * scale).mean():.4f}"
        )
        # where are the large energy rel errors? small-value frames?
        bad = rel > 5e-5
        if bad.any():
            print(
                f"  bad-energy values: min {e_it[bad].min():.3e} "
                f"max {e_it[bad].max():.3e} (global max {e_it.max():.3e})"
            )


if __name__ == "__main__":
    main()
