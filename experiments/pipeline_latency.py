import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, jax, jax.numpy as jnp
# moderately expensive op ~ (8192x8192) @ (8192x8192) bf16 ~ 1.1 TFLOP -> ~5ms
f = jax.jit(lambda x: jnp.sum(jnp.dot(x, x)))
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((8192, 8192)).astype(np.float32))
float(f(x))
# serial with per-iter fetch
ts = []
for _ in range(4):
    t0 = time.perf_counter()
    float(f(x))
    ts.append(time.perf_counter() - t0)
print(f"serial per-call: {min(ts)*1e3:.2f} ms")
# pipelined: issue 8, fetch at end
for K in (4, 8, 16):
    t0 = time.perf_counter()
    outs = [f(x) for _ in range(K)]
    s = float(sum(outs[-1] for _ in (0,)) + sum(o for o in outs))
    dt = time.perf_counter() - t0
    print(f"pipelined x{K}: {dt*1e3:.2f} ms total = {dt/K*1e3:.2f} ms/step")
