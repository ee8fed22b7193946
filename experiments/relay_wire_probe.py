"""Characterize the relay's WIRE path (host<->device transfer), the
binding resource for multi-stream serving (the compute path was
characterized by noop_latency.py / relay_character.py: ~30 ms fixed
per execute, ~20-40 s per fresh compile).

Questions this answers (round 4, multi-stream serving design):
  1. Upload bandwidth + floor, f32 vs int16, random vs real-ish audio
     (does the relay compress? does halving bytes halve time?).
  2. Download bandwidth for DEVICE-PRODUCED arrays (host-created
     arrays are mirrored client-side — np.asarray on those is free and
     says nothing about the wire).
  3. Do uploads PIPELINE with execution? (issue async uploads for
     round r+1 while round r computes: overlapped wall vs serial sum).

Run: python experiments/relay_wire_probe.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from speedy_tpu.profiling import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

SR = 16000


def speechish(n, seed):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / SR
    f0 = 120 + 30 * np.sin(2 * np.pi * 0.5 * t) + rng.random()
    x = sum(np.sin(k * np.cumsum(2 * np.pi * f0 / SR)) / k for k in range(1, 5))
    return (x * 0.25 + 0.01 * rng.standard_normal(n)).astype(np.float32)


@jax.jit
def bump(x):
    return x * np.float32(1.000001)


def sync(x):
    # Device-side checksum fetch — the only true barrier on this relay.
    return float(jnp.sum(x[..., :16].astype(jnp.float32)))


def timed_upload(arr, reps=3):
    best = None
    for r in range(reps):
        a = arr + np.asarray(r, arr.dtype)  # distinct content each rep
        t0 = time.perf_counter()
        d = jnp.asarray(a)
        sync(d)  # upload must complete for the device op to run
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def main():
    print("== upload: dtype x content (8 MB equivalent) ==", flush=True)
    n = 2 * 1024 * 1024  # 2M samples
    rnd_f32 = np.random.default_rng(0).standard_normal(n).astype(np.float32)
    sp_f32 = speechish(n, 1)
    sp_i16 = (sp_f32 * 32767).astype(np.int16)
    rnd_i16 = (rnd_f32 * 8191).astype(np.int16)
    zeros = np.zeros(n, np.float32)
    # warm the sync compile at both dtypes
    sync(jnp.asarray(sp_i16[:16]))
    sync(jnp.asarray(sp_f32[:16]))
    for name, arr in [
        ("f32 random", rnd_f32),
        ("f32 speech-like", sp_f32),
        ("f32 zeros", zeros),
        ("i16 speech-like", sp_i16),
        ("i16 random", rnd_i16),
    ]:
        dt = timed_upload(arr)
        mb = arr.nbytes / 1e6
        print(f"  {name:16s} {mb:6.1f} MB: {dt*1e3:7.1f} ms  ({mb/dt:6.1f} MB/s)", flush=True)

    print("== upload floor (4 KB) ==", flush=True)
    small = np.arange(1024, dtype=np.float32)
    dt = timed_upload(small, reps=5)
    print(f"  4 KB: {dt*1e3:.1f} ms", flush=True)

    print("== download of DEVICE-PRODUCED arrays ==", flush=True)
    for mb in (2, 8):
        n2 = int(mb * 1e6 / 4)
        x = jnp.asarray(np.random.default_rng(2).standard_normal(n2).astype(np.float32))
        y = bump(x)
        sync(y)  # compute done; now time pure fetch
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            h = np.asarray(y)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            y = bump(y)  # new buffer each rep (dodge any result cache)
            sync(y)
        print(f"  {mb:4.1f} MB: {best*1e3:7.1f} ms  ({mb/best:6.1f} MB/s)", flush=True)

    print("== do uploads pipeline with execution? ==", flush=True)
    # Serial: upload -> sync -> upload -> sync (x4)
    chunks = [speechish(n, 10 + i) for i in range(4)]
    t0 = time.perf_counter()
    for c in chunks:
        sync(jnp.asarray(c))
    serial = time.perf_counter() - t0
    # Batched-issue: all asarray calls first (async), then one sync each
    chunks = [speechish(n, 20 + i) for i in range(4)]
    t0 = time.perf_counter()
    ds = [jnp.asarray(c) for c in chunks]
    for d in ds:
        sync(d)
    overlapped = time.perf_counter() - t0
    print(f"  4x8MB serial {serial:.2f} s vs batched-issue {overlapped:.2f} s", flush=True)


if __name__ == "__main__":
    main()


def part2():
    """Round-trip structure: do operands ride the execute call (numpy
    arg vs pre-staged device arg)? do results come back inline? does an
    in-flight execute overlap with an unrelated upload?"""
    n = 512 * 1024  # 2 MB f32
    big = [speechish(n, 50 + i) for i in range(8)]

    @jax.jit
    def work(x):
        return x * np.float32(1.0000013), jnp.sum(x)

    # warm
    a, s = work(big[0]); float(s)

    print("== operand shipping: numpy arg vs pre-staged ==", flush=True)
    t0 = time.perf_counter()
    a, s = work(big[1]); float(s)
    numpy_arg = time.perf_counter() - t0
    d = jnp.asarray(big[2]); float(jnp.sum(d[:16].astype(jnp.float32)))
    t0 = time.perf_counter()
    a, s = work(d); float(s)
    staged_arg = time.perf_counter() - t0
    print(f"  2MB numpy arg {numpy_arg*1e3:.0f} ms vs pre-staged {staged_arg*1e3:.0f} ms", flush=True)

    print("== result inline? (fetch 2MB output right after scalar sync) ==", flush=True)
    a, s = work(big[3]); float(s)
    t0 = time.perf_counter()
    h = np.asarray(a)
    print(f"  post-sync 2MB output fetch {1e3*(time.perf_counter()-t0):.0f} ms", flush=True)

    print("== overlap: execute in flight + unrelated upload ==", flush=True)
    t0 = time.perf_counter()
    a, s = work(big[4])
    t_call = time.perf_counter() - t0
    d2 = jnp.asarray(big[5])
    t_up_issue = time.perf_counter() - t0
    float(s)
    t_sync = time.perf_counter() - t0
    float(jnp.sum(d2[:16].astype(jnp.float32)))
    t_all = time.perf_counter() - t0
    print(f"  call-return {t_call*1e3:.0f} ms, upload-issued {t_up_issue*1e3:.0f} ms, "
          f"exec-synced {t_sync*1e3:.0f} ms, upload-synced {t_all*1e3:.0f} ms", flush=True)
    # serial comparison
    t0 = time.perf_counter()
    a, s = work(big[6]); float(s)
    d3 = jnp.asarray(big[7]); float(jnp.sum(d3[:16].astype(jnp.float32)))
    print(f"  serial exec-then-upload total {1e3*(time.perf_counter()-t0):.0f} ms", flush=True)


if __name__ == "__main__" and os.environ.get("PART2"):
    part2()
