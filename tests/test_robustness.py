"""Adversarial-input robustness for the user-facing pipelines: hostile
but finite audio must produce finite audio with sane lengths — no NaNs,
no crashes, no silent truncation (the reference's contract is weaker:
garbage-in/garbage-out C with asserts compiled out)."""

import numpy as np
import pytest

import jax.numpy as jnp

from speedy_tpu.config import SpeedyConfig
from speedy_tpu.parallel.batch import batched_nonlinear_speedup
from speedy_tpu.streaming_device import DeviceStreamingPipeline

CFG16 = SpeedyConfig(16000)
L = 16000


def _cases():
    rng = np.random.default_rng(0)
    t = np.arange(L)
    return {
        "dc": np.full(L, 1.0, np.float32),
        "fullscale_square": np.where(t // 80 % 2 == 0, 1.0, -1.0).astype(
            np.float32
        ),
        "clipped_noise": np.clip(
            rng.standard_normal(L) * 3, -1, 1
        ).astype(np.float32),
        "nyquist": (0.9 * (-1.0) ** t).astype(np.float32),
        "impulse": np.eye(1, L, 4000, dtype=np.float32)[0],
        "tiny": (rng.standard_normal(L) * 1e-30).astype(np.float32),
        "huge": (np.sin(t * 0.05) * 1e4).astype(np.float32),
    }


@pytest.mark.parametrize("name", sorted(_cases().keys()))
def test_batched_engine_survives_hostile_input(name):
    x = _cases()[name]
    out = batched_nonlinear_speedup(
        jnp.asarray(x)[None], jnp.asarray([L], np.int32), CFG16, 3.0
    )
    v = int(out.valid_length[0])
    y = np.asarray(out.output[0])
    assert np.isfinite(y).all(), name
    assert np.isfinite(np.asarray(out.tension)).all(), name
    assert 0 < v <= y.shape[0], (name, v)
    # Achieved rate within the law's possible range [1, 1.6*rg - 0.6]+fb.
    assert L / v < 8.0, (name, v)


@pytest.mark.parametrize("name", ["fullscale_square", "huge", "tiny"])
def test_streaming_pipeline_survives_hostile_input(name):
    x = _cases()[name]
    pipe = DeviceStreamingPipeline(
        CFG16, 3.0, chunk_frames=64, segment_frames=128
    )
    y = pipe.process(x)
    assert np.isfinite(y).all(), name
    assert 0 < len(y) and L / len(y) < 8.0, (name, len(y))


def test_batched_engine_nan_containment():
    """NaN audio is garbage-in; the contract is that it cannot CRASH and
    the length bookkeeping stays sane (output values are unspecified)."""
    x = np.full(L, np.nan, np.float32)
    out = batched_nonlinear_speedup(
        jnp.asarray(x)[None], jnp.asarray([L], np.int32), CFG16, 3.0
    )
    v = int(out.valid_length[0])
    assert 0 <= v <= out.output.shape[1]
