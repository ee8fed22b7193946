import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, jax, jax.numpy as jnp
from speedy_tpu.config import SpeedyConfig
from speedy_tpu.parallel.batch import batched_analysis
SR=16000; B=128; L=SR*10; cfg=SpeedyConfig(SR)
T = cfg.num_frames(L, integer_step=True)
rng = np.random.default_rng(0)
base = rng.standard_normal((B, L)).astype(np.float32) * 0.1
ana = jax.jit(lambda xs: jnp.sum(batched_analysis(xs, cfg, T)))
sync = jax.jit(lambda x: jnp.sum(x))
inputs = [jnp.asarray(base * rng.uniform(0.5, 1.0)) for _ in range(16)]
for x in inputs: float(sync(x))
float(ana(inputs[0]))
# (a) serial distinct
ts=[]
for x in inputs[:6]:
    t0=time.perf_counter(); float(ana(x)); ts.append(time.perf_counter()-t0)
print("serial distinct:", [round(t*1e3,1) for t in ts])
# (c) serial SAME input
ts=[]
for _ in range(6):
    t0=time.perf_counter(); float(ana(inputs[0])); ts.append(time.perf_counter()-t0)
print("serial same:    ", [round(t*1e3,1) for t in ts])
# (b) pipelined distinct, NIT=16
t0=time.perf_counter()
outs=[ana(x) for x in inputs]
_=[float(s) for s in outs]
dt=time.perf_counter()-t0
print(f"pipelined x16 distinct: {dt/16*1e3:.1f} ms/call")
t0=time.perf_counter()
outs=[ana(inputs[0]) for _ in range(16)]
_=[float(s) for s in outs]
dt=time.perf_counter()-t0
print(f"pipelined x16 same:     {dt/16*1e3:.1f} ms/call")
