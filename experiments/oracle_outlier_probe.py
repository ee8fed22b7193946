"""Locate and characterize the HIGH-precision oracle-gate outlier frames.

The 16 kHz oracle gate (tests/test_oracle.py) holds the production
kernel-path tension at HIGH (bf16x3) precision to the exact-DFT C oracle
under a counted outlier budget (<=4 frames with |d| > 1e-4). Round-3
verdict item 7: a counted budget can absorb ANY single-frame regression —
attribute each outlier to the documented formulation class (40 dB
mask-edge fragility) instead.

This probe computes, in float64 numpy (exact arithmetic, no matmul
precision in play):
  * the magnitude spectrogram of every tension frame (cur) and its
    predecessor (last);
  * the 40 dB mask threshold thresh(t) = max(cur[1:])/100;
  * per frame, the minimum RELATIVE distance of any non-DC bin of cur or
    last to the threshold: margin(t) = min_i |v_i - thresh| / thresh.
A bin within ~HIGH's relative rounding error (~2^-16) of the threshold can
legitimately flip mask membership between formulations; the log-ratio sum
then jumps by that bin's term. Frames whose tension differs from the
oracle by > 1e-4 must have a small margin; frames that match must not need
one. Run prints both distributions to pick the gate epsilon.

Usage (CPU, hermetic): python experiments/oracle_outlier_probe.py
"""

import os
import pathlib
import subprocess
import sys
import tempfile

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

import testutil
from speedy_tpu.config import SpeedyConfig
from speedy_tpu.ops import dft, framing
from speedy_tpu.parallel.batch import batched_analysis


def exact_spectrogram_f64(x: np.ndarray, cfg: SpeedyConfig, T: int) -> np.ndarray:
    """Float64 magnitude spectrogram of every AddData frame (exact ref math)."""
    starts = framing.frame_starts(cfg, T, integer_step=True)
    W = cfg.window_size
    idx = starts[:, None] + np.arange(W)[None, :]
    frames = x[np.clip(idx, 0, len(x) - 1)].astype(np.float64)
    prev_last = x[np.clip(starts[:-1] + W - 1, 0, len(x) - 1)].astype(np.float64)
    state = np.concatenate([[0.0], prev_last])
    prev = np.concatenate([state[:, None], frames[:, :-1]], axis=1)
    pre = frames - 0.97 * prev
    i = np.arange(W, dtype=np.float64)
    win = 0.54 - 0.46 * np.cos(2.0 * np.pi * i / (W - 1.0))
    n = np.arange(W, dtype=np.float64)[:, None]
    k = np.arange(W + 1, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * k * n / (2.0 * W)
    fw = pre * win[None, :]
    re = fw @ np.cos(ang)
    im = fw @ (-np.sin(ang))
    return np.sqrt(re * re + im * im)  # [T, W+1]


def mask_edge_margins(spec: np.ndarray, T_out: int) -> np.ndarray:
    """Per tension frame: min relative distance of any non-DC bin of cur or
    last to the 40 dB mask threshold (see module docstring)."""
    W = spec.shape[1] - 1
    cur = spec[:T_out, 1:W]
    last = np.concatenate([np.zeros((1, W - 1)), spec[: T_out - 1, 1:W]])
    thresh = cur.max(axis=1, keepdims=True) / 100.0
    d = np.minimum(np.abs(cur - thresh), np.abs(last - thresh))
    return d.min(axis=1) / thresh[:, 0]


def main():
    oracle_dir = REPO / "tools" / "oracle"
    tmp = pathlib.Path(tempfile.mkdtemp())
    exe = tmp / "oracle16"
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
    raw = tmp / "tap16.f32"
    x.tofile(raw)
    feat_p = tmp / "feat.txt"
    subprocess.run(
        [str(exe), str(raw), str(sr), str(feat_p), str(tmp / "spec.txt")],
        check=True, capture_output=True,
    )
    t_oracle = np.loadtxt(feat_p)[:, -1]

    cfg = SpeedyConfig(sr)
    T = cfg.num_frames(len(x), integer_step=True)
    T_out = len(t_oracle)

    os.environ["SPEEDY_FORCE_ANALYSIS_KERNEL"] = "interpret"
    os.environ["SPEEDY_ANALYSIS_PRECISION"] = "high"
    t_high = np.asarray(batched_analysis(jnp.asarray(x[None]), cfg, T))[0]
    d = np.abs(t_high - t_oracle)
    out_idx = np.where(d > 1e-4)[0]
    print(f"outliers (>1e-4): {out_idx.tolist()}  diffs {d[out_idx].tolist()}")

    spec = exact_spectrogram_f64(x, cfg, T)
    margins = mask_edge_margins(spec, T_out)
    print("outlier frame margins:", margins[out_idx].tolist())
    ok = np.setdiff1d(np.arange(T_out), out_idx)
    q = np.quantile(margins[ok], [0.0, 0.01, 0.05, 0.5])
    print(f"non-outlier margin quantiles (min/1%/5%/50%): {q.tolist()}")
    n_small = int((margins[ok] < 1e-4).sum())
    print(f"non-outlier frames with margin < 1e-4: {n_small}/{len(ok)}")
    # How far does a single mask-flip propagate through the ew LPF?
    print("diffs at outlier+1:", d[np.clip(out_idx + 1, 0, T_out - 1)].tolist())


if __name__ == "__main__":
    main()
