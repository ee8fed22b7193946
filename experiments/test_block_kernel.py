import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, jax, jax.numpy as jnp
from speedy_tpu.ops.pallas_kernels import gather_rows_block_pallas, gather_rows_reference
rng = np.random.default_rng(0)
B, K, width, L = 4, 300, 321, 170000
x = jnp.asarray(rng.standard_normal((B, L)).astype(np.float32))
steps = rng.integers(0, 1100, size=(B, K))
starts = jnp.asarray(np.minimum(np.cumsum(steps, axis=1), L - width - 1).astype(np.int32))
R = 128
w_span = -(-((R - 1) * 1100 + 321 + 1056) // 1024) * 1024
print("w_span", w_span)
ref = np.asarray(gather_rows_reference(x, starts, width))
got = np.asarray(gather_rows_block_pallas(x, starts, width, R, w_span))
print("exact:", np.array_equal(ref, got), "maxdiff:", np.abs(ref - got).max())
nv = jnp.asarray(np.array([100, 300, 20, 1], np.int32))
got2 = np.asarray(gather_rows_block_pallas(x, starts, width, R, w_span, nv))
ok = all(np.array_equal(ref[b,:int(nv[b])], got2[b,:int(nv[b])]) for b in range(B))
print("n_valid exact:", ok)
