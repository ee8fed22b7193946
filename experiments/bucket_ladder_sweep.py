"""Bucket-ladder sweep (round-4 verdict item 4): measure corpus
throughput, padding overhead, and warm-compile cost for geometric
bucket ratios 2.0 / 1.5 / 1.25 on the standard 512-utt corpus, and pick
the knee by data.

The tension: finer ratios cut device padding waste (padding_overhead =
padded/batched - 1, bounded by ~ratio with bucket-grouped batching) but
pay (a) more (B, L) program keys = warm compiles (amortized by the
persistent cache) and (b) more per-batch dispatch floors, which on the
relay (~30 ms/execute, transfers serial) directly tax wall clock while
the padding they save is device time the wire already hides. On a PCIe
host the trade flips (dispatch ~12 ms, device compute is the bound), so
this sweep records BOTH the measured relay wall and the modeled device
padding, and CORPUS_BENCH keeps whichever default the measurement
justifies.

Run on the real chip: python experiments/bucket_ladder_sweep.py
Env: RATIOS="2.0,1.5,1.25", SPEEDY_BENCH_CORPUS_N (512), BATCH (128).
Appends results to BUCKET_LADDER.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np

from speedy_tpu.profiling import enable_compile_cache

enable_compile_cache()

import jax

from speedy_tpu.config import SpeedyConfig
from speedy_tpu.parallel.batch import CorpusEngine

SR = 16000
N_UTT = int(os.environ.get("SPEEDY_BENCH_CORPUS_N", "512"))
BATCH = int(os.environ.get("BATCH", "128"))
cfg = SpeedyConfig(SR)

rng = np.random.default_rng(7)
durs = np.exp(rng.uniform(np.log(2.0), np.log(30.0), size=N_UTT))
n_long = min(8, max(1, N_UTT // 32))
durs[:n_long] = rng.uniform(40.0, 90.0, size=n_long)
rng.shuffle(durs)


def synth_corpus(seed):
    r = np.random.default_rng(seed)
    utts = []
    for d in durs:
        L = int(d * SR)
        t = np.arange(L) / SR
        f0 = r.uniform(100, 240) + 30 * np.sin(2 * np.pi * r.uniform(0.4, 1.2) * t)
        phase = np.cumsum(2 * np.pi * f0 / SR)
        x = (
            sum(np.sin(k * phase) / k for k in range(1, 5))
            * np.clip(np.sin(2 * np.pi * r.uniform(1.5, 3.5) * t), 0, None)
            * 0.25
            + 0.003 * r.standard_normal(L)
        ).astype(np.float32)
        utts.append(np.clip(np.round(x * 32768.0), -32768, 32767).astype(np.int16))
    return utts


def padding_model(eng, corpus):
    long_thr = eng.long_utterance_samples
    short = sorted(
        len(u) for u in corpus if long_thr is None or len(u) <= long_thr
    )
    by_bucket = {}
    for n in short:
        by_bucket.setdefault(eng._bucket_length(n), []).append(n)
    padded = sum(
        L * len(grp[i : i + BATCH])
        for L, grp in by_bucket.items()
        for i in range(0, len(grp), BATCH)
    )
    return padded / SR, sum(short) / SR, sum(
        -(-len(grp) // BATCH) for grp in by_bucket.values()
    )


def main():
    ratios = [float(v) for v in os.environ.get("RATIOS", "2.0,1.5,1.25").split(",")]
    results = []
    for seed_base, ratio in enumerate(ratios):
        eng = CorpusEngine(
            cfg, 3.5, batch_size=BATCH, capacity_factor=1.33,
            bucket_ratio=ratio,
        )
        warm = synth_corpus(100 + seed_base)
        t0 = time.perf_counter()
        eng.process(warm)
        warm_dt = time.perf_counter() - t0
        corpus = synth_corpus(200 + seed_base)  # distinct content per point
        total_audio = sum(len(u) for u in corpus) / SR
        t0 = time.perf_counter()
        outs = eng.process(corpus)
        dt = time.perf_counter() - t0
        assert all(len(y) > 0 for y in outs)
        padded, batched_s, n_batches = padding_model(eng, corpus)
        row = {
            "ratio": ratio,
            "audio_s_per_s": round(total_audio / dt, 1),
            "wall_s": round(dt, 2),
            "warm_wall_s": round(warm_dt, 1),
            "padding_overhead_device": round(padded / batched_s - 1, 3),
            "batch_dispatches": eng.stats["batches"] + eng.stats["retry_batches"],
            "modeled_batches": n_batches,
            "wire_up_MB": round(eng.stats["wire_up_bytes"] / 1e6, 1),
            "wire_down_MB": round(eng.stats["wire_down_bytes"] / 1e6, 1),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    out = {
        "sweep": results,
        "corpus": f"{N_UTT} utts 2-90 s log-uniform, 16 kHz int16, batch {BATCH}",
        "note": (
            "relay wall vs device padding trade; CORPUS_BENCH default is "
            "the measured-throughput knee, finer ratios serve PCIe hosts"
        ),
    }
    path = os.path.join(os.path.dirname(__file__), "..", "BUCKET_LADDER.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {os.path.abspath(path)}")


if __name__ == "__main__":
    main()
