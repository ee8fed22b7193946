import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, jax, jax.numpy as jnp
from speedy_tpu.config import SpeedyConfig
from speedy_tpu.parallel.batch import batched_nonlinear_speedup, batched_analysis
from speedy_tpu.ops import wsola, wsola_fast
SR=16000; B=128; L=SR*10; cfg=SpeedyConfig(SR)
T = cfg.num_frames(L, integer_step=True)
rng = np.random.default_rng(0)
t = np.arange(L)/SR
f0 = 110.0+30.0*np.sin(2*np.pi*0.7*t)
ph = np.cumsum(2*np.pi*f0/SR)
base = (sum(np.sin(k*ph)/k for k in range(1,6)) * np.clip(np.sin(2*np.pi*2.5*t),0,None)*0.2).astype(np.float32)
def fresh():
    return jnp.asarray(np.tile(base,(B,1)) * rng.uniform(0.5,1.0,(B,1)).astype(np.float32))
lengths = jnp.asarray(np.full((B,), L, np.int32))
sync = jax.jit(lambda x: jnp.sum(x))

def run(name, f, nit=8):
    fj = jax.jit(f)
    ins = [fresh() for _ in range(nit)]
    for x in ins: float(sync(x))
    float(fj(ins[0], lengths))
    best=None
    for _ in range(2):
        t0=time.perf_counter()
        outs=[fj(x, lengths) for x in ins]
        _=[float(s) for s in outs]
        dt=time.perf_counter()-t0
        best=dt if best is None else min(best,dt)
    print(f"{name:44s} {best/nit*1e3:8.2f} ms/call")
    return best/nit

def full(xs, l):
    return jnp.sum(batched_nonlinear_speedup(xs, l, cfg, 3.5, 1.0, 0.1).output)

def full_plus_analysis(xs, l):
    a = jnp.sum(batched_analysis(xs * 1.0001, cfg, T))
    return full(xs, l) + a

minp, maxp, cap, steps = wsola.plan(cfg, L, 1.0)
hop, gcap, K = wsola_fast.plan_grid(cfg, L, 1.0)
def full_plus_wsola(xs, l):
    sp = jnp.full((B, T), 3.51, jnp.float32)
    w = jnp.sum(wsola_fast._wsola_grid_batch(xs*1.0001, l, sp, minp, maxp, cfg.frame_step_int, hop, gcap, K).output)
    return full(xs, l) + w

t_full = run("full", full)
t_fa = run("full + extra analysis", full_plus_analysis)
t_fw = run("full + extra grid WSOLA", full_plus_wsola)
print(f"=> analysis ~{(t_fa-t_full)*1e3:.1f} ms, grid WSOLA ~{(t_fw-t_full)*1e3:.1f} ms of {t_full*1e3:.1f}")
