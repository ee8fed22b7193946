"""Gates for the unbounded device streaming pipeline
(speedy_tpu/streaming_device.py): segment-seamless WSOLA continuation,
equivalence with the single-shot batched engine, feed-chunking
invariance, and bounded host memory."""

import numpy as np
import pytest

import jax.numpy as jnp

from speedy_tpu.config import SpeedyConfig
from speedy_tpu.ops import teager
from speedy_tpu.streaming_device import DeviceStreamingPipeline

CFG16 = SpeedyConfig(16000)


def speechlike(seconds=12.0, sr=16000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * sr)) / sr
    f0 = 130.0 + 35.0 * np.sin(2 * np.pi * 0.5 * t)
    phase = np.cumsum(2 * np.pi * f0 / sr)
    voiced = sum(np.sin(k * phase) / k for k in range(1, 6))
    env = np.clip(np.sin(2 * np.pi * 2.7 * t), 0, None)
    return (voiced * env * 0.3 + 0.002 * rng.standard_normal(t.size)).astype(
        np.float32
    )


def test_streamed_constant_speed_teager_no_seams():
    """nonlinear_factor=0 -> every frame runs at the global speed: a
    sped-up sinusoid must stay a clean sinusoid ACROSS segment seams
    (Teager mean +-1%, rel-sigma < 1% — the reference's glitch gate,
    sonic_test.cc:479-531)."""
    sr = 16000
    t = np.arange(sr * 8) / sr
    x = (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
    pipe = DeviceStreamingPipeline(
        CFG16, 2.0, nonlinear_factor=0.0, chunk_frames=64, segment_frames=128
    )
    y = pipe.process(x, feed_chunk=20000)
    expected = len(x) / 2.0
    assert abs(len(y) - expected) < 0.015 * expected + 300
    # Teager over the interior (skip edge transients).
    te = np.asarray(teager.teager(jnp.asarray(y[2000:-2000])))
    mean = float(te.mean())
    assert mean > 0
    rel_sigma = float(te.std()) / mean
    assert rel_sigma < 0.01, rel_sigma


def test_streamed_matches_single_shot_nonlinear():
    """The streamed pipeline must reproduce the single-shot batched grid
    engine: same tension math, same speeds, same synthesis — up to the
    float-reassociation ulps of segment-local vs global prefix sums."""
    from speedy_tpu.parallel.batch import batched_nonlinear_speedup

    x = speechlike(seconds=10.0)
    L = len(x)
    ref = batched_nonlinear_speedup(
        jnp.asarray(x)[None], jnp.asarray([L], jnp.int32), CFG16, 3.0
    )
    v = int(ref.valid_length[0])
    ref_y = np.asarray(ref.output[0, :v])

    pipe = DeviceStreamingPipeline(
        CFG16, 3.0, chunk_frames=128, segment_frames=256
    )
    y = pipe.process(x, feed_chunk=32000)
    assert abs(len(y) - v) <= 2, (len(y), v)
    n = min(len(y), v)
    d = np.abs(y[:n] - ref_y[:n])
    # Measured: max 7.2e-4, mean 1.4e-5, identical lengths — the seams
    # and the segment-local prefix sums cost only ulp-scale jitter.
    assert d.max() < 5e-3, d.max()
    assert d.mean() < 1e-4, d.mean()


def test_streamed_feed_chunking_invariance():
    """Output must be bit-identical regardless of feed() chunk sizes."""
    x = speechlike(seconds=6.0, seed=3)
    outs = []
    for chunk in (1024, 17777, len(x)):
        pipe = DeviceStreamingPipeline(
            CFG16, 3.0, chunk_frames=128, segment_frames=256
        )
        outs.append(pipe.process(x, feed_chunk=chunk))
    np.testing.assert_array_equal(outs[0], outs[1])
    np.testing.assert_array_equal(outs[0], outs[2])


def test_streamed_host_memory_bounded():
    """The raw ring buffer must stay bounded by segment+margin size, not
    stream length."""
    x = speechlike(seconds=20.0, seed=5)
    pipe = DeviceStreamingPipeline(
        CFG16, 3.0, chunk_frames=128, segment_frames=256
    )
    peak = 0
    for i in range(0, len(x), 16000):
        pipe.feed(x[i : i + 16000])
        peak = max(peak, len(pipe._raw))
    pipe.flush()
    # Bound: retained raw <= a few segments' worth, never the stream.
    assert peak < 6 * pipe.L_seg, (peak, pipe.L_seg)
    assert peak < len(x) // 2


def test_streamed_short_input_flush():
    """Sub-window input drains at the requested speed without tension."""
    x = (0.2 * np.sin(np.arange(1000) * 0.1)).astype(np.float32)
    pipe = DeviceStreamingPipeline(CFG16, 2.0, chunk_frames=64, segment_frames=128)
    y = pipe.process(x)
    assert abs(len(y) - 500) < 80, len(y)
    assert np.isfinite(y).all()


def test_streamed_multichannel():
    """Stereo streaming: identical channels match the mono path exactly;
    distinct channels share one valid length and both come out clean."""
    x = speechlike(seconds=6.0, seed=7)
    pipe_m = DeviceStreamingPipeline(
        CFG16, 3.0, chunk_frames=128, segment_frames=256
    )
    y_mono = pipe_m.process(x)

    stereo_same = np.stack([x, x], axis=1)
    pipe_s = DeviceStreamingPipeline(
        CFG16, 3.0, chunk_frames=128, segment_frames=256
    )
    y_same = pipe_s.process(stereo_same)
    assert y_same.shape == (len(y_mono), 2)
    np.testing.assert_array_equal(y_same[:, 0], y_same[:, 1])
    np.testing.assert_allclose(y_same[:, 0], y_mono, atol=1e-6)

    stereo_diff = np.stack([x, 0.7 * np.roll(x, 23)], axis=1)
    pipe_d = DeviceStreamingPipeline(
        CFG16, 3.0, chunk_frames=128, segment_frames=256
    )
    y_diff = pipe_d.process(stereo_diff)
    assert y_diff.ndim == 2 and y_diff.shape[1] == 2
    assert np.isfinite(y_diff).all()
    assert 0.2 < len(y_diff) / len(y_mono) < 2.0


@pytest.mark.parametrize("sr", [22050, 44100])
def test_streamed_other_sample_rates(sr):
    """Streaming pipeline at 22.05/44.1 kHz must match the single-shot
    batched engine (the nonlinear law legitimately deviates from L/R_g on
    short high-tension signals, so the engine is the reference)."""
    from speedy_tpu.parallel.batch import batched_nonlinear_speedup

    cfg = SpeedyConfig(sr)
    t = np.arange(int(sr * 4)) / sr
    x = (
        0.3
        * np.sin(2 * np.pi * 200 * t)
        * np.clip(np.sin(2 * np.pi * 3 * t), 0, None)
    ).astype(np.float32)
    ref = batched_nonlinear_speedup(
        jnp.asarray(x)[None], jnp.asarray([len(x)], np.int32), cfg, 2.5
    )
    v = int(ref.valid_length[0])
    pipe = DeviceStreamingPipeline(cfg, 2.5, chunk_frames=64, segment_frames=128)
    y = pipe.process(x)
    assert abs(len(y) - v) <= 2, (len(y), v)
    n = min(len(y), v)
    d = np.abs(y[:n] - np.asarray(ref.output[0, :n]))
    assert d.max() < 5e-3 and d.mean() < 1e-4, (d.max(), d.mean())
    assert np.isfinite(y).all()


@pytest.mark.slow
def test_streamed_fuzz_matches_single_shot():
    """Randomized lengths / speeds / segmentations vs the single-shot
    batched engine (deterministic seeds)."""
    from speedy_tpu.parallel.batch import batched_nonlinear_speedup

    rng = np.random.default_rng(11)
    for trial in range(3):
        sr = 16000
        seconds = float(rng.uniform(3.0, 7.0))
        rgs = float(rng.uniform(1.5, 4.0))
        x = speechlike(seconds=seconds, seed=100 + trial)
        L = len(x)
        ref = batched_nonlinear_speedup(
            jnp.asarray(x)[None], jnp.asarray([L], np.int32), CFG16, rgs
        )
        v = int(ref.valid_length[0])
        pipe = DeviceStreamingPipeline(
            CFG16,
            rgs,
            chunk_frames=int(rng.choice([64, 128])),
            segment_frames=int(rng.choice([192, 256, 384])),
        )
        y = pipe.process(x, feed_chunk=int(rng.integers(5000, 40000)))
        assert abs(len(y) - v) <= 2, (trial, len(y), v)
        n = min(len(y), v)
        d = np.abs(y[:n] - np.asarray(ref.output[0, :n]))
        assert d.max() < 5e-3 and d.mean() < 1e-4, (trial, d.max(), d.mean())


def test_cli_device_stream_stereo(tmp_path):
    """--engine device-stream with a stereo WAV goes through the device
    pipeline (not the streaming-shim fallback)."""
    from speedy_tpu.cli import compress_sound
    from speedy_tpu.io import read_wave, write_wave

    sr = 16000
    x = speechlike(seconds=3.0, seed=9)
    stereo = np.stack([x, 0.8 * x], axis=1)
    stereo_i = np.clip(np.round(stereo * 32768), -32768, 32767).astype(
        np.int16
    )
    inp = str(tmp_path / "in.wav")
    outp = str(tmp_path / "out.wav")
    write_wave(inp, stereo_i, sr)
    ratio = compress_sound(inp, 3.0, 1.0, 0.1, outp, engine="device-stream")
    y, sr2 = read_wave(outp)
    assert sr2 == sr and y.ndim == 2 and y.shape[1] == 2
    assert 2.0 < ratio < 4.5, ratio


def test_streamed_set_speed_mid_stream():
    """sonicSetSpeed semantics: the rate change applies to frames whose
    tension is computed after the call (within one analysis chunk of the
    feed boundary); nonlinear_factor=0 makes lengths exactly step/rg per
    frame, so the total output lands between the all-old and all-new
    extremes and near the piecewise expectation."""
    sr = 16000
    t = np.arange(sr * 4) / sr
    x = (0.4 * np.sin(2 * np.pi * 300.0 * t)).astype(np.float32)
    pipe = DeviceStreamingPipeline(
        CFG16, 2.0, nonlinear_factor=0.0, chunk_frames=64, segment_frames=128
    )
    out1 = pipe.feed(x)
    pipe.set_speed(4.0)
    out2 = np.concatenate([pipe.feed(x), pipe.flush()])
    total = len(out1) + len(out2)
    expected = len(x) / 2.0 + len(x) / 4.0
    # Transition fuzz: one analysis chunk + the tension lookahead.
    fuzz = (64 + 10) * CFG16.frame_step_int / 2.0
    assert abs(total - expected) < fuzz + 300, (total, expected)
    assert total < len(x) / 2.0 * 2 - 1000  # the change clearly happened
    assert np.isfinite(out2).all()


def test_streamed_phase_rebase_long_stream():
    """Phase-reference re-basing (the f32-overflow guard for multi-hour
    streams): force re-bases every segment via a tiny phase_ref_limit.
    On a constant-period signal the re-base subtracts an exact multiple
    of THE period, so output must match the unlimited pipeline almost
    exactly — and stay Teager-clean across every re-base event."""
    sr = 16000
    t = np.arange(sr * 10) / sr
    x = (0.5 * np.sin(2 * np.pi * 200.0 * t)).astype(np.float32)

    def run(limit):
        pipe = DeviceStreamingPipeline(
            CFG16,
            3.0,
            nonlinear_factor=0.0,
            chunk_frames=64,
            segment_frames=128,
            phase_ref_limit=limit,
        )
        return pipe.process(x), pipe

    y_ref, _ = run(float(2**21))   # never re-bases at this length
    y_reb, pipe = run(20_000.0)    # re-bases every couple of segments
    assert pipe._pr_base != 0.0, "re-base never triggered"
    assert len(y_reb) == len(y_ref)
    # Before the first re-base the outputs are identical; after it, the
    # phase clock is re-anchored by ~k*(P_cell - P_shared) (sub-sample
    # per cell — the same class of re-anchor as the engine's own
    # pitch-cell transitions), so sample-wise equality is not the
    # contract. The contract is: no glitches across any re-base.
    np.testing.assert_allclose(y_reb[:12000], y_ref[:12000], atol=1e-5)
    te = np.asarray(teager.teager(jnp.asarray(y_reb[2000:-2000])))
    assert float(te.std()) / float(te.mean()) < 0.01

    # Speech with re-bases: finite, same length as single-shot.
    xs = speechlike(seconds=8.0, seed=13)
    from speedy_tpu.parallel.batch import batched_nonlinear_speedup

    ref = batched_nonlinear_speedup(
        jnp.asarray(xs)[None], jnp.asarray([len(xs)], np.int32), CFG16, 3.0
    )
    pipe2 = DeviceStreamingPipeline(
        CFG16, 3.0, chunk_frames=128, segment_frames=256,
        phase_ref_limit=30_000.0,
    )
    y2 = pipe2.process(xs)
    assert pipe2._pr_base != 0.0
    assert abs(len(y2) - int(ref.valid_length[0])) <= 2
    assert np.isfinite(y2).all()


def test_streamed_checkpoint_resume_bit_exact():
    """§5.4 for the device pipeline: snapshot mid-stream, resume in a
    FRESH pipeline, outputs must be bit-identical to the uninterrupted
    run — including across a mid-stream speed change."""
    x = speechlike(seconds=8.0, seed=21)
    mk = lambda: DeviceStreamingPipeline(
        CFG16, 3.0, chunk_frames=128, segment_frames=256
    )

    # Uninterrupted run.
    p0 = mk()
    y0 = [p0.feed(x[:64000])]
    p0.set_speed(2.0)
    y0 += [p0.feed(x[64000:]), p0.flush()]
    y0 = np.concatenate(y0)

    # Checkpoint after the first feed + speed change, restore elsewhere.
    p1 = mk()
    part1 = p1.feed(x[:64000])
    p1.set_speed(2.0)
    snap = p1.state_dict()

    p2 = mk()
    p2.load_state_dict(snap)
    part2 = np.concatenate([p2.feed(x[64000:]), p2.flush()])
    y1 = np.concatenate([part1, part2])
    np.testing.assert_array_equal(y0, y1)


def test_streamed_flush_without_feed():
    """flush() on a never-fed stream returns empty output, no errors."""
    pipe = DeviceStreamingPipeline(CFG16, 3.0, chunk_frames=64, segment_frames=128)
    y = pipe.flush()
    assert y.shape[0] == 0


def test_streamed_checkpoint_plan_mismatch_rejected():
    """Restoring a snapshot into a pipeline with a different plan must
    raise, not silently reinterpret counters."""
    x = speechlike(seconds=3.0, seed=2)
    p1 = DeviceStreamingPipeline(CFG16, 3.0, chunk_frames=128, segment_frames=256)
    p1.feed(x)
    snap = p1.state_dict()
    p_bad = DeviceStreamingPipeline(CFG16, 1.5, chunk_frames=128, segment_frames=256)
    with pytest.raises(ValueError, match="plan mismatch"):
        p_bad.load_state_dict(snap)
    p_bad2 = DeviceStreamingPipeline(CFG16, 3.0, chunk_frames=64, segment_frames=256)
    with pytest.raises(ValueError, match="plan mismatch"):
        p_bad2.load_state_dict(snap)


@pytest.mark.slow
def test_streamed_ten_minute_endurance():
    """Endurance: a 10-minute utterance streams in seconds of wall time
    with ~40 phase re-bases and bounded state; rate lands at the law's
    fixed point. (The batched engine's banded time-map inversion is
    O(K*F) per utterance — minutes-long single files are exactly what
    the streaming pipeline exists for.) Plus a 90-second head-to-head
    against the batched engine where O(K*F) is still cheap."""
    sr = 16000
    rng = np.random.default_rng(0)
    t = np.arange(sr * 600) / sr
    f0 = 120 + 40 * np.sin(2 * np.pi * 0.31 * t)
    x = (
        np.sin(np.cumsum(2 * np.pi * f0 / sr))
        * np.clip(np.sin(2 * np.pi * 2.3 * t), 0, None)
        * 0.3
        + 0.01 * rng.standard_normal(t.size)
    ).astype(np.float32)
    pipe = DeviceStreamingPipeline(CFG16, 3.0)
    y = pipe.process(x)
    assert np.isfinite(y).all()
    rate = len(x) / len(y)
    assert 2.7 < rate < 3.3, rate
    assert pipe._pr_base != 0.0  # re-bases exercised on a real stream

    # 90 s head-to-head (batched reference still tractable).
    from speedy_tpu.parallel.batch import batched_nonlinear_speedup

    x90 = x[: sr * 90]
    ref = batched_nonlinear_speedup(
        jnp.asarray(x90)[None], jnp.asarray([len(x90)], np.int32), CFG16, 3.0
    )
    v = int(ref.valid_length[0])
    p2 = DeviceStreamingPipeline(CFG16, 3.0)
    y90 = p2.process(x90)
    # The batched engine's output clock is an f32 cumsum from frame 0
    # (random-walk rounding ~ sqrt(F) ulps -> samples at this length);
    # the streamed clock is float64-anchored. So lengths agree only to
    # the f32 drift (measured 9 samples at 90 s), and sample-wise
    # equality holds in the EARLY region before the f32 clock wanders.
    assert abs(len(y90) - v) <= 2 + int(4e-5 * v), (len(y90), v)
    n = 10 * sr
    d = np.abs(y90[:n] - np.asarray(ref.output[0, :n]))
    assert d.mean() < 1e-4, d.mean()
