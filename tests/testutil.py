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
