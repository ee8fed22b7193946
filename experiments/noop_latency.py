import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, jax, jax.numpy as jnp
f = jax.jit(lambda x: jnp.sum(x) * 1.000001)
rng = np.random.default_rng(0)
for size in (128, 1_000_000, 80_000_000):
    x = jnp.asarray(rng.standard_normal(size).astype(np.float32))
    float(f(x))
    ts = []
    for _ in range(5):
        x = jnp.asarray(rng.standard_normal(size).astype(np.float32))
        float(jnp.sum(x))
        t0 = time.perf_counter()
        float(f(x))
        ts.append(time.perf_counter() - t0)
    print(f"noop jit call, {size} elems: min {min(ts)*1e3:.2f} ms  all {[round(t*1e3,1) for t in ts]}")
