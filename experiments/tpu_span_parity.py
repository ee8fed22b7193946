"""TPU parity: block-span engine vs per-row engine, then bench delta."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, jax, jax.numpy as jnp
from speedy_tpu.config import SpeedyConfig
from speedy_tpu.ops import wsola, wsola_fast
SR=16000; B=8; L=SR*5; cfg=SpeedyConfig(SR)
T = cfg.num_frames(L, integer_step=True)
rng=np.random.default_rng(0)
t=np.arange(L)/SR
x=np.stack([(0.3*np.sin(2*np.pi*(150+30*i)*t)*np.clip(np.sin(2*np.pi*2.5*t),0,None)).astype(np.float32) for i in range(B)])
minp, maxp, _, _ = wsola.plan(cfg, L, 1.0)
hop, gcap, K = wsola_fast.plan_grid(cfg, L, 1.0)
speeds = jnp.asarray((3.5+np.sin(np.arange(T)*0.13)[None,:]*np.ones((B,1))).astype(np.float32))
lengths = jnp.asarray(np.full((B,),L,np.int32))
xs = jnp.asarray(x)
r1 = wsola_fast._wsola_grid_batch(xs, lengths, speeds, minp, maxp, cfg.frame_step_int, hop, gcap, K)
r2 = wsola_fast._wsola_grid_batch(xs, lengths, speeds, minp, maxp, cfg.frame_step_int, hop, gcap, K, max_speed_plan=6.6)
v = np.asarray(r1.valid_length); v2 = np.asarray(r2.valid_length)
print("valid equal:", np.array_equal(v, v2))
y1, y2 = np.asarray(r1.output), np.asarray(r2.output)
md = max(np.abs(y1[b,:v[b]]-y2[b,:v[b]]).max() for b in range(B))
print("maxdiff in valid region:", md)
