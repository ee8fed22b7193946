"""Measure the device streaming pipeline's single-stream serving rate on
the real chip: feed a minutes-long 16 kHz utterance through
DeviceStreamingPipeline in realistic chunks and report audio-seconds per
wall-second (steady-state, excluding the one-time compiles).

The pipeline is SINGLE-stream (B=1 programs) and latency-oriented; its
rate is bounded by the per-segment dispatch (the relay's fixed ~30 ms
execute floor dominates at small segments), so this number is a serving-
latency figure, NOT comparable to the batched corpus bench. Sweep
segment_frames to show the dispatch-amortization curve.

Run: python experiments/streaming_throughput.py
"""
import os, sys, time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np

from speedy_tpu.config import SpeedyConfig
from speedy_tpu.streaming_device import DeviceStreamingPipeline

SR = 16000
SECS = int(os.environ.get("SECS", "120"))
FEED = int(os.environ.get("FEED", str(SR)))  # 1 s feeds
cfg = SpeedyConfig(SR)

rng = np.random.default_rng(0)
t = np.arange(SR * SECS) / SR
f0 = 120.0 + 30.0 * np.sin(2 * np.pi * 0.5 * t)
x = (
    sum(np.sin(k * np.cumsum(2 * np.pi * f0 / SR)) / k for k in range(1, 5))
    * np.clip(np.sin(2 * np.pi * 2.0 * t), 0, None)
    * 0.3
).astype(np.float32)

for seg_frames in (512, 1024, 2048):
    pipe = DeviceStreamingPipeline(
        cfg, global_speed=3.5, nonlinear_factor=1.0,
        segment_frames=seg_frames,
    )
    # Warm the compiles: feed enough to emit >= 2 full segments (the
    # first segment dispatch compiles the per-shape programs; 10 feeds
    # is NOT enough at segment_frames >= 1024 and the compile lands in
    # the timed region otherwise).
    out = []
    seg_samples = seg_frames * cfg.frame_step_int
    warm = ((2 * seg_samples) // FEED + 2) * FEED
    for i in range(0, warm, FEED):
        out.append(pipe.feed(x[i : i + FEED]))
    t0 = time.perf_counter()
    fed = 0
    for i in range(warm, len(x), FEED):
        out.append(pipe.feed(x[i : i + FEED]))
        fed += min(FEED, len(x) - i)
    dt = time.perf_counter() - t0  # flush excluded: one-time drain+compile
    out.append(pipe.flush())
    total_out = sum(len(o) for o in out)
    print(
        f"segment_frames={seg_frames:5d}: {fed / SR / dt:8.1f} audio-s/s "
        f"(steady-state, {fed / SR:.0f} s fed in {dt:.2f} s; "
        f"out {total_out / SR:.1f} s)",
        flush=True,
    )
