"""Stage-level breakdown of the production bench step on the real TPU.

Times (a) the full batched step, (b) analysis-only, (c) the synthesis
gather alone at production shapes, (d) the grid WSOLA without analysis.
Fresh random inputs + checksum fetch per iteration (relay-cache rules).
"""

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
from speedy_tpu.ops.pallas_kernels import gather_rows

SR = 16000
SECONDS = 10.0
B = 128
L = int(SR * SECONDS)
cfg = SpeedyConfig(SR)
rng = np.random.default_rng(0)

t = np.arange(L) / SR
f0 = 110.0 + 30.0 * np.sin(2 * np.pi * 0.7 * t)
phase = np.cumsum(2 * np.pi * f0 / SR)
voiced = sum(np.sin(k * phase) / k for k in range(1, 6))
envelope = np.clip(np.sin(2 * np.pi * 2.5 * t), 0, None)
base = (voiced * envelope * 0.2).astype(np.float32)


def fresh():
    amp = rng.uniform(0.5, 1.0, size=(B, 1)).astype(np.float32)
    return jnp.asarray(np.tile(base, (B, 1)) * amp)


def timeit(name, fn, *args, iters=3):
    s = fn(*args)
    float(jnp.sum(s[0] if isinstance(s, tuple) else s))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        s = fn(*args)
        float(jnp.sum(s[0] if isinstance(s, tuple) else s))
        times.append(time.perf_counter() - t0)
    print(f"{name:35s} {min(times)*1e3:8.2f} ms")
    return min(times)


lengths = jnp.asarray(np.full((B,), L, np.int32))

# (a) full step
full = jax.jit(
    lambda xs, l: batched_nonlinear_speedup(xs, l, cfg, 3.5, 1.0, 0.1).output
)
xs = fresh()
timeit("full step (3.5x)", full, xs, lengths)

# (b) analysis only
T = cfg.num_frames(L, integer_step=True)
ana = jax.jit(lambda xs: batched_analysis(xs, cfg, T))
xs = fresh()
timeit("analysis only", ana, xs)

# (d) grid WSOLA alone (constant speeds)
minp, maxp, cap, steps = wsola.plan(cfg, L, 1.0)
hop, gcap, K = wsola_fast.plan_grid(cfg, L, 1.0)
print(f"plan: hop={hop} gcap={gcap} K={K} minp={minp} maxp={maxp}")
speeds = jnp.full((B, T), 3.5, jnp.float32)
wso = jax.jit(
    lambda xs, l, s: wsola_fast._wsola_grid_batch(
        xs, l, s, minp, maxp, cfg.frame_step_int, hop, gcap, K
    ).output
)
xs = fresh()
timeit("grid WSOLA alone", wso, xs, lengths, speeds)

# (c) gather alone at production shapes: [B, Lp] gather of K rows, width Wn+1
Wn = 2 * hop
width = Wn + 1
Lp = L + 2 * maxp + maxp + Wn + maxp
starts_np = np.sort(
    rng.integers(0, L - width, size=(B, K)).astype(np.int32), axis=1
)
starts = jnp.asarray(starts_np)
xp = jnp.concatenate([fresh(), jnp.zeros((B, Lp - L), jnp.float32)], axis=1)
g = jax.jit(lambda x, s: gather_rows(x, s, width))
timeit(f"gather alone ({B}x{K} rows, w={width})", g, xp, starts)

# valid-row fraction at 3.5x
out = jax.jit(
    lambda xs, l: batched_nonlinear_speedup(xs, l, cfg, 3.5, 1.0, 0.1).valid_length
)(fresh(), lengths)
print("mean valid_length:", float(jnp.mean(out)), "of capacity", gcap, "-> valid rows ~", float(jnp.mean(out)) / hop)
