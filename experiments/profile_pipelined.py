"""Pipelined stage profile: issues 8 back-to-back calls per stage so the
~23 ms relay latency amortizes away; reports true on-device ms/call."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from speedy_tpu.config import SpeedyConfig
from speedy_tpu.parallel.batch import batched_nonlinear_speedup, batched_analysis
from speedy_tpu.ops import wsola, wsola_fast

SR = 16000
B = 128
L = SR * 10
cfg = SpeedyConfig(SR)
rng = np.random.default_rng(0)
NIT = 8

t = np.arange(L) / SR
f0 = 110.0 + 30.0 * np.sin(2 * np.pi * 0.7 * t)
phase = np.cumsum(2 * np.pi * f0 / SR)
voiced = sum(np.sin(k * phase) / k for k in range(1, 6))
envelope = np.clip(np.sin(2 * np.pi * 2.5 * t), 0, None)
base = (voiced * envelope * 0.2).astype(np.float32)


def fresh():
    amp = rng.uniform(0.5, 1.0, size=(B, 1)).astype(np.float32)
    return jnp.asarray(np.tile(base, (B, 1)) * amp)


def timeit(name, fn, make_args):
    """fn must be jitted and return a device scalar (in-jit checksum)."""
    argsets = [make_args() for _ in range(NIT)]
    sync = jax.jit(lambda x: jnp.sum(x))
    for a in argsets:
        for x in a:
            if hasattr(x, "block_until_ready"):
                float(sync(x))
    float(fn(*argsets[0]))
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        outs = [fn(*a) for a in argsets]
        sums = [float(s) for s in outs]
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{name:38s} {best/NIT*1e3:8.2f} ms/call")


lengths = jnp.asarray(np.full((B,), L, np.int32))
T = cfg.num_frames(L, integer_step=True)

full = jax.jit(
    lambda xs, l: jnp.sum(batched_nonlinear_speedup(xs, l, cfg, 3.5, 1.0, 0.1).output)
)
timeit("full step (3.5x)", full, lambda: (fresh(), lengths))

ana = jax.jit(lambda xs: jnp.sum(batched_analysis(xs, cfg, T)))
timeit("analysis", ana, lambda: (fresh(),))

minp, maxp, cap, steps = wsola.plan(cfg, L, 1.0)
hop, gcap, K = wsola_fast.plan_grid(cfg, L, 1.0)


def make_speeds():
    return jnp.asarray((3.5 + rng.uniform(-1, 1, size=(B, T))).astype(np.float32))


wso = jax.jit(
    lambda xs, l, s: jnp.sum(wsola_fast._wsola_grid_batch(
        xs, l, s, minp, maxp, cfg.frame_step_int, hop, gcap, K
    ).output)
)
timeit("grid WSOLA (per-row+skip)", wso, lambda: (fresh(), lengths, make_speeds()))

wso_span = jax.jit(
    lambda xs, l, s: jnp.sum(wsola_fast._wsola_grid_batch(
        xs, l, s, minp, maxp, cfg.frame_step_int, hop, gcap, K,
        max_speed_plan=6.6,
    ).output)
)
timeit("grid WSOLA (block-span)", wso_span, lambda: (fresh(), lengths, make_speeds()))

# gather in isolation, with and without skip
from speedy_tpu.ops.pallas_kernels import gather_rows

Wn = 2 * hop
width = Wn + 1
Lp = L + 4 * maxp + Wn


def make_gather_args():
    starts = np.sort(rng.integers(0, L - width, size=(B, K)).astype(np.int32), axis=1)
    xp = jnp.concatenate([fresh(), jnp.zeros((B, Lp - L), jnp.float32)], axis=1)
    return xp, jnp.asarray(starts)


g_all = jax.jit(lambda x, s: jnp.sum(gather_rows(x, s, width)))
timeit(f"gather all {K} rows", g_all, make_gather_args)
nv = jnp.asarray(np.full((B,), 326, np.int32))
g_skip = jax.jit(lambda x, s: jnp.sum(gather_rows(x, s, width, nv)[:, :326]))
timeit("gather skip (326 valid rows)", g_skip, make_gather_args)
