"""The vendored exact-DFT C oracle must build, run, and reproduce the
pinned feature table + the feature-8 gate evidence (VERDICT r1 item 6;
tools/oracle/). This compiles the READ-ONLY reference speedy.c against
the in-tree double-DFT shim — the mechanical re-derivation of why
tests/test_golden.py gates feature 8 at 2200 instead of the shipped
2300."""

import pathlib
import shutil
import subprocess
import sys

import pytest

import testutil

REPO = pathlib.Path(__file__).resolve().parent.parent
SCRIPT = REPO / "tools" / "oracle" / "run_oracle.py"


@pytest.mark.skipif(
    not testutil.have_test_data(), reason="reference test_data not available"
)
@pytest.mark.skipif(shutil.which("gcc") is None, reason="no gcc")
@pytest.mark.skipif(
    not pathlib.Path("/root/reference/speedy.c").exists(),
    reason="reference source not available",
)
def test_oracle_reproduces_pinned_table():
    out = subprocess.run(
        [sys.executable, str(SCRIPT)],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "ORACLE-OK" in out.stdout, out.stdout
    assert "feature8_snr=2291.9" in out.stdout, out.stdout


@pytest.mark.skipif(
    not testutil.have_test_data(), reason="reference test_data not available"
)
@pytest.mark.skipif(shutil.which("gcc") is None, reason="no gcc")
@pytest.mark.skipif(
    not pathlib.Path("/root/reference/speedy.c").exists(),
    reason="reference source not available",
)
def test_analysis_kernel_matches_oracle_16k(tmp_path, monkeypatch):
    """Golden-level gate for the FLAGSHIP production front-end at a rate
    the fused analysis kernel actually supports. The Matlab golden dumps
    are 22.05 kHz, where the kernel's 4-phase lattice (gf = 32 > 8)
    falls back to the XLA chain — so before this gate the kernel never
    faced reference-derived data (round-2 verdict item 1/4). Build the
    exact-DFT oracle (MATCH_MATLAB), run it on the 16 kHz tapestry.wav,
    and hold the kernel-path batched_analysis tension to it at both
    production (HIGH) and HIGHEST precision."""
    import numpy as np
    import jax.numpy as jnp

    from speedy_tpu.config import SpeedyConfig
    from speedy_tpu.ops import pallas_kernels as pk
    from speedy_tpu.parallel.batch import batched_analysis

    oracle_dir = REPO / "tools" / "oracle"
    exe = tmp_path / "oracle16"
    subprocess.run(
        [
            "gcc", "-O2", "-DMATCH_MATLAB", "-DKISS_FFT",
            "-I", str(oracle_dir), "-I", "/root/reference",
            str(oracle_dir / "driver.c"), "/root/reference/speedy.c",
            "-o", str(exe), "-lm",
        ],
        check=True, capture_output=True,
    )
    samples, sr = testutil.load_wave("tapestry.wav")
    assert sr == 16000
    x = (samples.astype(np.float32) / 32768.0).astype(np.float32)
    raw = tmp_path / "tap16.f32"
    x.tofile(raw)
    feat_p = tmp_path / "feat.txt"
    subprocess.run(
        [str(exe), str(raw), str(sr), str(feat_p), str(tmp_path / "spec.txt")],
        check=True, capture_output=True,
    )
    t_oracle = np.loadtxt(feat_p)[:, -1]

    cfg = SpeedyConfig(sr)
    W, step = cfg.window_size, cfg.frame_step_int
    # The kernel must be the ACTIVE path at this rate, or the gate is
    # testing the XLA chain again.
    assert pk._analysis_geometry(W, step) is not None
    monkeypatch.setenv("SPEEDY_FORCE_ANALYSIS_KERNEL", "interpret")
    T = cfg.num_frames(len(x), integer_step=True)

    # HIGHEST is oracle-exact (measured max 8e-7 over tapestry's 306
    # frames). HIGH (the production default, bf16x3) matches everywhere
    # except isolated 40 dB-mask-edge frames — the documented formulation
    # class (CLAUDE.md) — measured 2/306 frames above 1e-4, worst 5.4e-3.
    # Gate: tight mean + a counted outlier budget, AND every outlier
    # attributed to the mask-edge class in float64 (a regression on a
    # non-edge frame fails even inside the count budget).
    for prec, atol, mean_tol, outliers in (
        ("high", 1e-2, 5e-5, 4),
        ("highest", 5e-6, 5e-7, 0),
    ):
        monkeypatch.setenv("SPEEDY_ANALYSIS_PRECISION", prec)
        t_ours = np.asarray(
            batched_analysis(jnp.asarray(x[None]), cfg, T)
        )[0]
        assert t_ours.shape == t_oracle.shape, (t_ours.shape, t_oracle.shape)
        d = np.abs(t_ours - t_oracle)
        n_big = int((d > 1e-4).sum())
        assert d.max() < atol and d.mean() < mean_tol and n_big <= outliers, (
            prec, d.max(), d.mean(), n_big,
        )
        testutil.assert_tension_outliers_are_mask_edges(x, cfg, T, d)
