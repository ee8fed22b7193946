"""Deterministic fuzz: random signals, lengths, speeds, chunkings through
every runtime, checking structural invariants (finite output, length
contracts, no crashes) rather than golden values."""

import numpy as np
import pytest

from speedy_tpu.config import SpeedyConfig
from speedy_tpu.pipeline import linear_time_scale, nonlinear_speedup
from speedy_tpu.streaming import SonicStream


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_pipeline(seed):
    rng = np.random.default_rng(seed)
    sr = int(rng.choice([8000, 16000, 22050, 44100]))
    n = int(rng.integers(sr // 2, 3 * sr))
    kind = rng.integers(0, 3)
    if kind == 0:
        x = (rng.normal(size=n) * 0.1).astype(np.float32)
    elif kind == 1:
        x = (0.5 * np.sin(np.arange(n) * rng.uniform(0.01, 0.5))).astype(np.float32)
    else:
        x = np.zeros(n, np.float32)
        x[:: rng.integers(50, 500)] = rng.uniform(-0.9, 0.9)
    speed = float(rng.uniform(0.4, 6.0))
    engine = ["scan", "grid"][seed % 2]
    cfg = SpeedyConfig(sr)
    r = nonlinear_speedup(
        x, cfg, speed, 1.0, 0.1, engine=engine,
        min_speed_bound=max(0.05, 0.3 * min(speed, 1.0)),
    )
    assert np.all(np.isfinite(r.output.astype(np.float64)))
    if n > cfg.window_size * 4:
        assert 0.2 * speed < r.achieved_rate < 5.0 * speed + 1

    r2 = linear_time_scale(x, cfg, speed, engine=engine)
    expected = n / speed
    assert abs(len(r2.output) - expected) < 0.05 * expected + 3 * cfg.wsola_max_period


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_streaming_chunkings(seed):
    """Arbitrary write/read chunk sizes must not change the output."""
    rng = np.random.default_rng(100 + seed)
    sr = 16000
    n = sr
    x = (15000 * np.sin(np.arange(n) * 0.08) * (0.5 + 0.5 * np.sin(np.arange(n) * 0.001))).astype(np.int16)

    def run(chunks):
        st = SonicStream(sr, 1)
        st.set_speed(2.5)
        st.enable_nonlinear_speedup(1.0)
        out = []
        pos = 0
        for c in chunks:
            st.write_short(x[pos : pos + c])
            pos += c
            out.append(st.read_short(int(rng.integers(1, 512))))
        st.write_short(x[pos:])
        st.flush()
        while True:
            r = st.read_short(997)
            if len(r) == 0:
                break
            out.append(r)
        return np.concatenate(out)

    ref = run([n])
    sizes = []
    pos = 0
    while pos < n - 1:
        c = int(rng.integers(1, 700))
        c = min(c, n - pos)
        sizes.append(c)
        pos += c
    got = run(sizes)
    assert len(got) == len(ref)
    np.testing.assert_array_equal(got, ref)
