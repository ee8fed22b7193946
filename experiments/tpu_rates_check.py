"""TPU check: batch engine at 22.05k/24k/44.1k (block kernel nt=5+ paths)
against the per-row engine."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, jax, jax.numpy as jnp
from speedy_tpu.config import SpeedyConfig
from speedy_tpu.ops import wsola, wsola_fast

for sr in (22050, 24000, 44100):
    cfg = SpeedyConfig(sr)
    B, L = 4, sr * 3
    T = cfg.num_frames(L, integer_step=True)
    rng = np.random.default_rng(1)
    t = np.arange(L)/sr
    x = np.stack([(0.3*np.sin(2*np.pi*(140+25*i)*t)*np.clip(np.sin(2*np.pi*2.2*t),0,None)).astype(np.float32) for i in range(B)])
    minp, maxp, _, _ = wsola.plan(cfg, L, 1.0)
    hop, gcap, K = wsola_fast.plan_grid(cfg, L, 1.0)
    speeds = jnp.asarray((3.0+0.8*np.sin(np.arange(T)*0.17)[None,:]*np.ones((B,1))).astype(np.float32))
    lengths = jnp.asarray(np.full((B,), L, np.int32))
    xs = jnp.asarray(x)
    r1 = wsola_fast._wsola_grid_batch(xs, lengths, speeds, minp, maxp, cfg.frame_step_int, hop, gcap, K)
    r2 = wsola_fast._wsola_grid_batch(xs, lengths, speeds, minp, maxp, cfg.frame_step_int, hop, gcap, K, max_speed_plan=6.0)
    v = np.asarray(r1.valid_length)
    y1, y2 = np.asarray(r1.output), np.asarray(r2.output)
    md = max(np.abs(y1[b,:v[b]]-y2[b,:v[b]]).max() for b in range(B))
    print(f"sr={sr}: width={2*hop+1} valid-eq={np.array_equal(v, np.asarray(r2.valid_length))} maxdiff={md}")
