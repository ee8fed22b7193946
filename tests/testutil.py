"""Shared test utilities: golden-data loaders and the reference's
cross-correlation SNR (speedy_test.cc:787-857), replicated exactly."""

from __future__ import annotations

import functools
import os
import pathlib

import numpy as np

# Golden dumps + test WAVs from the reference checkout (read-only data
# fixtures; location overridable for standalone runs).
TEST_DATA_DIR = pathlib.Path(
    os.environ.get("SPEEDY_TEST_DATA", "/root/reference/test_data")
)


def have_test_data() -> bool:
    return TEST_DATA_DIR.is_dir()


@functools.lru_cache(maxsize=8)
def load_golden(name: str) -> np.ndarray:
    return np.loadtxt(TEST_DATA_DIR / name)


@functools.lru_cache(maxsize=8)
def load_wave(name: str):
    from speedy_tpu.io import read_wave

    return read_wave(str(TEST_DATA_DIR / name))


def compute_snr(signal: np.ndarray, estimate: np.ndarray) -> float:
    """speedy_test.cc:807-811 (linear power ratio, not dB)."""
    err = signal - estimate
    return float(np.sum(signal**2) / np.sum(err**2))


def cross_correlation_snr(a: np.ndarray, b: np.ndarray, num_delays: int = 10):
    """speedy_test.cc:840-857 FindCrossCorrelation: SNR(a vs b) at delays
    -num_delays..num_delays, windows trimmed like the reference."""
    out = []
    for d in range(-num_delays, num_delays + 1):
        if d < 0:
            n = len(a) + d
            aa, bb = a[-d : -d + n], b[:n]
        else:
            n = len(a) - d
            aa, bb = a[:n], b[d : d + n]
        out.append(compute_snr(aa, bb))
    return np.array(out)


def best_delay_and_snr(computed: np.ndarray, expected: np.ndarray, num_delays: int = 10):
    snrs = cross_correlation_snr(computed, expected, num_delays)
    i = int(np.argmax(snrs))
    return i - num_delays, float(snrs[i])


def assert_period_flips_are_ties(
    segs,
    per_a,
    per_b,
    taps: int,
    minp: int,
    maxp: int,
    mask=None,
    rel_tol: float = 1e-4,
    max_flip_frac: float = 0.02,
):
    """Attribute integer-argmin disagreements between two pitch paths.

    For every cell where |per_a - per_b| > 0.5 (and ``mask``, if given),
    recompute the exact SSD objective in float64 with a naive numpy loop
    (wsola_fast.ssd_matmul's definition: template = seg[:taps],
    SSD(d) = sum((seg[:taps] - seg[d:d+taps])**2) over the seg_w window)
    at BOTH chosen integer lags. A benign re-ranking has
    |SSD(a) - SSD(b)| within f32 summation noise of the curve scale
    (probe: experiments/fused_pitch_voiced_flips.py found EXACT float64
    ties); one path picking a genuinely worse lag fails loudly. Uniform
    per-utterance gain cancels in the relative margin, so raw segments
    are fine."""
    per_a = np.asarray(per_a, np.float64)
    per_b = np.asarray(per_b, np.float64)
    d = np.abs(per_a - per_b)
    flip_mask = d > 0.5
    if mask is not None:
        flip_mask &= np.asarray(mask)
        total = int(np.count_nonzero(mask))
    else:
        total = d.size
    flips = np.argwhere(flip_mask)
    assert flips.shape[0] <= max(1, int(max_flip_frac * total)), (
        "too many integer period flips",
        flips.shape[0],
        total,
    )
    seg_w = taps + maxp
    lags = np.arange(minp, maxp + 1)
    for b, g in flips:
        seg = np.asarray(segs[b, g][:seg_w], np.float64)

        def ssd(lag):
            i = int(round(float(lag)))
            return float(np.sum((seg[:taps] - seg[i : i + taps]) ** 2))

        scale = max(max(ssd(l) for l in lags), 1e-30)
        margin = abs(ssd(per_a[b, g]) - ssd(per_b[b, g])) / scale
        assert margin < rel_tol, (
            "period flip is NOT an SSD tie",
            int(b),
            int(g),
            float(per_a[b, g]),
            float(per_b[b, g]),
            margin,
        )
