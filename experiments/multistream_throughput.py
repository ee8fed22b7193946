"""Measure MultiStreamPipeline's concurrent serving rate on the real
chip: N live 16 kHz streams fed in FEED_S-second chunks through shared
fixed-shape dispatches, reporting the steady-state AGGREGATE audio-s/s,
the per-round latency distribution, and the wire-byte ledger.

The single-stream pipeline measures ~10 audio-s/s (relay's fixed ~27 ms
round-trip floor dominates B=1 serving — experiments/
streaming_throughput.py). Round-4 verdict target: 32 streams >= 50x the
single-stream aggregate (>= 500 audio-s/s). The wire is the binding
resource (relay_wire_probe.py: ~40 MB/s up, ~35 down, no overlap), so
the round-4 pipeline keeps audio device-resident (one upload per sample)
and ships PCM int16 both ways by default here (WIRE=float32 for the
f32 wire; the pipeline's own default stays float32).

Content differs per stream and per feed (re-randomized inputs — the
relay serves identical inputs from a cache; CLAUDE.md measurement rules);
outputs are fetched to host by the pipeline itself on every dispatch, so
wall-clock includes real device work + transfers.

Run: python experiments/multistream_throughput.py
Env: NSTREAMS (default 32), SECS (audio seconds per stream, 60),
     RATE (3.5), SEG (segment_frames, 512), CH (chunk_frames, 128),
     FEED_S (seconds fed per stream per round, 4), WIRE (int16|float32,
     default int16)
"""
import os, sys, time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np

from speedy_tpu.profiling import enable_compile_cache

enable_compile_cache()

from speedy_tpu.config import SpeedyConfig
from speedy_tpu.multistream import MultiStreamPipeline

SR = 16000
N = int(os.environ.get("NSTREAMS", "32"))
SECS = int(os.environ.get("SECS", "60"))
RATE = float(os.environ.get("RATE", "3.5"))
SEG = int(os.environ.get("SEG", "512"))
CH = int(os.environ.get("CH", "128"))
FEED = int(float(os.environ.get("FEED_S", "4")) * SR)  # per stream per round
WIRE = os.environ.get("WIRE", "int16")
cfg = SpeedyConfig(SR)


def stream_audio(seed, secs):
    rng = np.random.default_rng(seed)
    t = np.arange(SR * secs) / SR
    f0 = 110.0 + 40.0 * rng.random() + 30.0 * np.sin(2 * np.pi * 0.5 * t)
    x = (
        sum(np.sin(k * np.cumsum(2 * np.pi * f0 / SR)) / k for k in range(1, 5))
        * np.clip(np.sin(2 * np.pi * (1.5 + rng.random()) * t), 0, None)
        * 0.3
        + 0.003 * rng.standard_normal(t.size)
    ).astype(np.float32)
    if WIRE == "int16":
        return np.clip(np.round(x * 32768.0), -32768, 32767).astype(np.int16)
    return x


xs = [stream_audio(100 + i, SECS) for i in range(N)]

ms = MultiStreamPipeline(
    cfg, RATE, n_streams=N, chunk_frames=CH, segment_frames=SEG,
    wire_dtype=WIRE, max_feed_samples=max(131072, FEED),
)
sids = [ms.open() for _ in range(N)]

# Warm-up: enough rounds to emit >= 2 full segments on every lane (the
# first chunk/segment dispatches compile the shared [N, ...] programs).
seg_samples = SEG * cfg.frame_step_int
warm_rounds = (2 * seg_samples) // FEED + 2
pos = 0
for r in range(warm_rounds):
    ms.feed_many([(s, xs[i][pos : pos + FEED]) for i, s in enumerate(sids)])
    pos += FEED
print(f"warmed {warm_rounds} rounds ({pos / SR:.0f} s/stream)", flush=True)

snap = dict(ms.stats)
lat = []
t0 = time.perf_counter()
fed = 0
while pos + FEED <= len(xs[0]):
    r0 = time.perf_counter()
    ms.feed_many([(s, xs[i][pos : pos + FEED]) for i, s in enumerate(sids)])
    lat.append(time.perf_counter() - r0)
    pos += FEED
    fed += FEED * N
dt = time.perf_counter() - t0
d = {k: ms.stats[k] - snap[k] for k in ms.stats}  # timed window only
for s in sids:
    ms.flush(s)  # excluded from the steady-state window (one-time drain)

lat = np.asarray(lat)
agg = fed / SR / dt
print(
    f"N={N} rate={RATE} seg={SEG} ch={CH} feed={FEED/SR:g}s wire={WIRE}: "
    f"{agg:8.1f} audio-s/s aggregate "
    f"({fed / SR:.0f} audio-s in {dt:.2f} s wall; {agg / N:.1f} per stream)"
)
print(
    f"  per-{FEED/SR:g}s-round latency: p50 {np.percentile(lat, 50)*1e3:.1f} ms  "
    f"p90 {np.percentile(lat, 90)*1e3:.1f} ms  "
    f"p99 {np.percentile(lat, 99)*1e3:.1f} ms  max {lat.max()*1e3:.1f} ms"
)
print(
    f"  dispatches: {d['write_rounds']} rounds, {d['chunk_dispatches']} chunk "
    f"({d['chunks_processed'] / max(d['chunk_dispatches'],1):.1f} chunks each), "
    f"{d['segment_dispatches']} segment "
    f"({d['segments_processed'] / max(d['segment_dispatches'],1):.1f} segments each), "
    f"{d['ring_fallbacks']} ring fallbacks"
)
print(
    f"  wire: {d['bytes_up']/1e6:.1f} MB audio up + {d['bytes_ctrl']/1e6:.1f} MB "
    f"control, {d['bytes_down']/1e6:.1f} MB down "
    f"({(d['bytes_up']+d['bytes_ctrl']+d['bytes_down'])/(fed/SR)/1e3:.1f} KB per audio-s)"
)
