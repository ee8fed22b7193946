import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, jax, jax.numpy as jnp
from speedy_tpu.config import SpeedyConfig
from speedy_tpu.parallel.batch import batched_nonlinear_speedup
SR=16000; B=128; L=SR*10; cfg=SpeedyConfig(SR)
rng=np.random.default_rng(0)
t=np.arange(L)/SR
f0=110.0+30.0*np.sin(2*np.pi*0.7*t)
ph=np.cumsum(2*np.pi*f0/SR)
base=(sum(np.sin(k*ph)/k for k in range(1,6))*np.clip(np.sin(2*np.pi*2.5*t),0,None)*0.2).astype(np.float32)
lengths=jnp.asarray(np.full((B,),L,np.int32))
def fn(xs,l):
    out=batched_nonlinear_speedup(xs,l,cfg,3.5,1.0,0.1)
    return jnp.sum(out.output)
step=jax.jit(fn)
sync=jax.jit(lambda x: jnp.sum(x))
def fresh(): return jnp.asarray(np.tile(base,(B,1))*rng.uniform(0.5,1.0,(B,1)).astype(np.float32))
iters=8
inputs=[fresh() for _ in range(iters)]
for x in inputs: float(sync(x))
float(step(inputs[0],lengths))
# variant 1: per-iter fetch (current bench)
for _ in range(2):
    t0=time.perf_counter()
    outs=[step(x,lengths) for x in inputs]
    sums=[float(s) for s in outs]
    print(f"per-iter fetch: {(time.perf_counter()-t0)/iters*1e3:.2f} ms/step")
# variant 2: single fetch of device-side sum
for _ in range(2):
    t0=time.perf_counter()
    outs=[step(x,lengths) for x in inputs]
    acc=outs[0]
    for s in outs[1:]:
        acc=acc+s  # eager adds enqueue on device
    total=float(acc)
    print(f"single-fetch:   {(time.perf_counter()-t0)/iters*1e3:.2f} ms/step")
