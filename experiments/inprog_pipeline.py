"""Cumulative-prefix bisect of the FULL production pipeline at the bench
operating point (B=96, 10 s 16 kHz, 3.5x nonlinear, fused gain): jit
progressively longer prefixes (XLA DCEs everything past the fetched
checksum), time each with the single-dispatch scan-window protocol.
Differences between consecutive prefixes = true in-program stage costs.

WSOLA-internal stages use _wsola_grid_batch(debug_stage=...) — the
PRODUCTION function, not a re-implementation — so numbers can't drift
from the shipped code. Run on the real chip: python experiments/inprog_pipeline.py
"""
import os, sys, time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
import jax.numpy as jnp

from speedy_tpu.config import SpeedyConfig
from speedy_tpu.ops import wsola, wsola_fast
from speedy_tpu.parallel.batch import (
    batched_analysis, batched_nonlinear_speedup, _plan_max_speed,
)
from speedy_tpu.ops.speed import speed_from_tension_parallel

SR = int(os.environ.get("SR", "16000"))  # 22050/44100 for the other rates
B = int(os.environ.get("B", "128"))
L = SR * 10
NIT = int(os.environ.get("NIT", "24"))
cfg = SpeedyConfig(SR)
T = cfg.num_frames(L, integer_step=True)
rng = np.random.default_rng(0)
t = np.arange(L) / SR
f0 = 110.0 + 30.0 * np.sin(2 * np.pi * 0.7 * t)
voiced = sum(np.sin(k * np.cumsum(2 * np.pi * f0 / SR)) / k for k in range(1, 6))
env = np.clip(np.sin(2 * np.pi * 2.5 * t), 0, None)
base = np.broadcast_to((voiced * env * 0.2).astype(np.float32), (B, L)).copy()
base_d = jnp.asarray(base)
lengths = jnp.asarray(np.full((B,), L, np.int32))
sync = jax.jit(lambda x: jnp.sum(x))

minp, maxp, cap_s, steps = wsola.plan(cfg, L, 1.0)
hop, cap, K = wsola_fast.plan_grid(cfg, L, 1.0)
# Rate-derived capacity (the production serving plan; CAPF=0 restores the
# worst-case speed-1.0 plan).
CAPF = float(os.environ.get("CAPF", "1.5"))
if CAPF:
    cap = int(np.ceil(CAPF * L / 3.5 / hop) + 2) * hop
    K = cap // hop + 1
step = cfg.frame_step_int
MSP = _plan_max_speed(3.5, 1.0)
SPEEDS = jnp.full((B, T), 3.51, jnp.float32)


def wsola_stage(stage):
    def f(amp):
        r = wsola_fast._wsola_grid_batch(
            base_d, lengths, SPEEDS, minp, maxp, step, hop, cap, K,
            max_speed_plan=MSP, gain=amp[:, 0], debug_stage=stage,
        )
        if stage is None:
            return jnp.sum(r.output) + jnp.sum(r.valid_length).astype(jnp.float32)
        return r

    return f


def analysis_only(amp):
    tn = batched_analysis(base_d, cfg, T, None, gain=amp[:, 0])
    return jnp.sum(tn)


def with_speeds(amp):
    tn = batched_analysis(base_d, cfg, T, None, gain=amp[:, 0])
    sp = speed_from_tension_parallel(tn, 3.5, 0.1, 1.0)
    return jnp.sum(sp)


def full_pipeline(amp):
    out = batched_nonlinear_speedup(
        base_d, lengths, cfg, 3.5, 1.0, 0.1, mesh=None, gain=amp[:, 0],
        capacity_factor=CAPF or None,
    )
    return jnp.sum(out.output) + jnp.sum(out.valid_length).astype(jnp.float32)


def run(name, f):
    def scanned(amps):
        def body(carry, amp):
            return carry + f(amp), 0.0
        s, _ = jax.lax.scan(body, jnp.float32(0), amps)
        return s

    fj = jax.jit(scanned)
    fresh = lambda: jnp.asarray(
        rng.uniform(0.5, 1.0, (NIT, B, 1)).astype(np.float32)
    )
    float(sync(fj(fresh())))  # compile + burn one window
    best = None
    for _ in range(2):
        amps = fresh()
        float(sync(amps))
        t0 = time.perf_counter()
        float(fj(amps))
        dt = (time.perf_counter() - t0) / NIT
        best = dt if best is None else min(best, dt)
    print(f"{name:34s} {best * 1e3:8.2f} ms/step", flush=True)
    return best


ts = {}
ts["noop (sum amps)"] = run("noop (sum amps)", lambda a: jnp.sum(a))
ts["analysis"] = run("analysis (tension)", analysis_only)
ts["analysis+speed"] = run("analysis+speed law", with_speeds)
ts["w:timemap"] = run("wsola prefix: time map", wsola_stage("timemap"))
ts["w:pitch"] = run("wsola prefix: +pitch", wsola_stage("pitch"))
ts["w:phase"] = run("wsola prefix: +phase", wsola_stage("phase"))
ts["w:synthraw"] = run("wsola prefix: +synth kernel", wsola_stage("synthraw"))
ts["w:full"] = run("wsola full (synth)", wsola_stage(None))
ts["pipeline"] = run("FULL production pipeline", full_pipeline)

print()
print(f"  analysis             {ts['analysis'] * 1e3:6.2f}")
print(f"  speed law           +{(ts['analysis+speed'] - ts['analysis']) * 1e3:6.2f}")
print(f"  wsola time map       {ts['w:timemap'] * 1e3:6.2f} (incl. scan floor)")
print(f"  wsola pitch         +{(ts['w:pitch'] - ts['w:timemap']) * 1e3:6.2f}")
print(f"  wsola phase         +{(ts['w:phase'] - ts['w:pitch']) * 1e3:6.2f}")
print(f"  wsola synth kernel  +{(ts['w:synthraw'] - ts['w:phase']) * 1e3:6.2f}")
print(f"  wsola repack/mask   +{(ts['w:full'] - ts['w:synthraw']) * 1e3:6.2f}")
print(f"  wsola total          {ts['w:full'] * 1e3:6.2f}")
print(f"  pipeline             {ts['pipeline'] * 1e3:6.2f}")
