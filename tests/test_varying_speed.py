"""Varying-speed streaming tests (sonic_test.cc:950-1039).

The reference documents alternating-speed length accuracy as a known-hard
case: its engine FAILS the ±6-pitch-period gate for mixed speeds (tests
4, 5, 6, 9 are annotated "Fails" in-tree). Our engine's play-time
accounting handles per-buffer speed changes exactly, so we hold the gate
for every parameterization — including the reference's failing ones.
Also: multi-sample-rate pipeline coverage (16/22.05/24/44.1 kHz)."""

import numpy as np
import pytest

from speedy_tpu.config import SpeedyConfig
from speedy_tpu.streaming import SonicStream

SR = 22050
PITCH = 237.0


@pytest.mark.parametrize(
    "speed1,speed2",
    [
        (1.0, 1.0),    # reference: passes
        (1.5, 1.5),    # reference: passes
        (2.5, 2.5),    # reference: passes
        (3.0, 3.0),    # reference: passes
        (1.25, 1.75),  # reference: FAILS — we pass
        (2.25, 3.5),   # reference: FAILS — we pass
        (1.5, 3.0),    # reference: FAILS — we pass
        (0.75, 0.75),  # reference: passes
        (0.75, 1.5),   # reference: passes
        (0.75, 3.0),   # reference: FAILS — we pass
    ],
)
def test_varying_speed_length(speed1, speed2):
    n = SR * 10
    period = SR / PITCH
    x = (32000 * np.sin(np.arange(n) * 2 * np.pi / period)).astype(np.int16)
    st = SonicStream(SR, 1)
    st.enable_nonlinear_speedup(0.0)
    out = []
    expected_length = 0.0
    buf = 128
    for i, t in enumerate(range(0, n, buf)):
        speed = speed1 if i % 2 else speed2
        st.set_speed(speed)
        cnt = min(buf, n - t)
        st.write_short(x[t : t + cnt])
        expected_length += cnt / speed
        out.append(st.read_short(buf))
    st.flush()
    while True:
        r = st.read_short(buf)
        if len(r) == 0:
            break
        out.append(r)
    total = sum(len(o) for o in out)
    periods_out = total / period
    periods_expected = expected_length / period
    assert abs(periods_out - periods_expected) < 6  # sonic_test.cc:1021


@pytest.mark.parametrize("sr", [8000, 16000, 22050, 24000, 44100])
def test_pipeline_across_sample_rates(sr):
    """BASELINE.json config: multi-rate coverage incl. 44.1 kHz (odd
    window size 661)."""
    from speedy_tpu.pipeline import nonlinear_speedup

    cfg = SpeedyConfig(sr)
    n = sr  # one second
    t = np.arange(n) / sr
    x = (
        0.3
        * np.sin(2 * np.pi * 150 * t)
        * np.clip(np.sin(2 * np.pi * 3 * t), 0, None)
    ).astype(np.float32)
    for engine in ("scan", "grid"):
        r = nonlinear_speedup(x, cfg, 3.0, 1.0, 0.1, engine=engine)
        assert np.all(np.isfinite(r.output))
        assert 1.5 < r.achieved_rate < 4.5, (sr, engine, r.achieved_rate)
