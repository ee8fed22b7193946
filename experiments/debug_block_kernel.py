import os, sys, functools
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import speedy_tpu.ops.pallas_kernels as pk

# monkeypatch pallas_call to interpret mode
orig = pl.pallas_call
def interp_call(*a, **k):
    k["interpret"] = True
    return orig(*a, **k)
pl.pallas_call = interp_call
pk.pl.pallas_call = interp_call

rng = np.random.default_rng(0)
B, K, width, L = 2, 50, 321, 60000
x = jnp.asarray(rng.standard_normal((B, L)).astype(np.float32))
steps = rng.integers(0, 1100, size=(B, K))
starts = jnp.asarray(np.minimum(np.cumsum(steps, axis=1), L - width - 1).astype(np.int32))
R = 32
w_span = -(-((R - 1) * 1100 + 321 + 1056) // 1024) * 1024
ref = np.asarray(pk.gather_rows_reference(x, starts, width))
got = np.asarray(pk.gather_rows_block_pallas(x, starts, width, R, w_span))
print("interpret exact:", np.array_equal(ref, got), "maxdiff:", np.abs(ref - got).max())
bad = np.argwhere(~np.isclose(ref, got))
print("first bad:", bad[:3] if len(bad) else "none")

xnp = np.asarray(x)
badrows = 0
for b in range(B):
    for k in range(K):
        if not np.array_equal(ref[b,k], got[b,k]):
            badrows += 1
            if badrows <= 3:
                # find what offset got[b,k] corresponds to
                s = int(starts[b,k])
                for d in range(-130, 131):
                    if 0 <= s+d <= L-width and np.array_equal(xnp[b, s+d:s+d+width], got[b,k]):
                        print(f"row ({b},{k}): got data from start+({d})")
                        break
                else:
                    print(f"row ({b},{k}): got data matches no clean shift; got[:5]={got[b,k,:5]} ref[:5]={ref[b,k,:5]}")
print("bad rows:", badrows, "of", B*K)
