"""22.05 kHz analysis-chain cost split (round-3 verdict item 1): the
chain (not the gf=32 kernel) is the production analysis path at the
reference's canonical rate, so prove where its cost sits the way
analysis_cost_split.py did for the 16 kHz kernel — MXU share from the
precision slope (DEFAULT/HIGH/HIGHEST = 1/3/6 bf16-split passes),
VPU + intermediate-materialization + input-DMA share as the intercept —
and compare the non-MXU share against the HBM floor of the chain's
materialized intermediates.

Chain HBM estimate at B=128, L=220500, W=330, step=220, T=1002:
  input 113 MB read; frames concat [B,T,2*step] write+read ~2x225 MB;
  re/im dot outputs 2x [B,T,331] ~2x170 MB write (+read into spec);
  spec write+read ~340 MB; so ~1.3-1.6 GB/step touched if nothing
  fuses — the probe measures what XLA actually achieves.

Run on the real chip: python experiments/analysis22k_cost_split.py
"""
import os, sys, time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
import jax.numpy as jnp

from speedy_tpu.config import SpeedyConfig
from speedy_tpu.parallel.batch import batched_analysis

SR = 22050
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
sync = jax.jit(lambda x: jnp.sum(x))

assert jax.default_backend() == "tpu", "hardware probe"


def chain(prec_env):
    # batched_analysis reads SPEEDY_ANALYSIS_PRECISION at trace time;
    # each sweep point gets its own jit cache entry via clear_caches.
    def f(amp):
        tens = batched_analysis(base_d, cfg, T, gain=amp[:, 0])
        return jnp.sum(tens)

    return f


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
    float(sync(fj(fresh())))
    best = None
    for _ in range(2):
        amps = fresh()
        float(sync(amps))
        t0 = time.perf_counter()
        float(fj(amps))
        dt = (time.perf_counter() - t0) / NIT
        best = dt if best is None else min(best, dt)
    print(f"{name:28s} {best * 1e3:8.2f} ms/step", flush=True)
    return best


t_noop = run("noop", lambda a: jnp.sum(a))
res = {}
for prec in ("default", "high", "highest"):
    os.environ["SPEEDY_ANALYSIS_PRECISION"] = prec
    jax.clear_caches()
    res[prec] = run(f"chain {prec.upper()}", chain(prec))
os.environ.pop("SPEEDY_ANALYSIS_PRECISION", None)

per_pass = (res["highest"] - res["default"]) / 5.0
mxu3 = 3 * per_pass
net_high = res["high"] - t_noop
nonmxu = net_high - mxu3
# DFT MACs at HIGH: B*T*W*(2*(W+1)) per pass.
gflop_pass = 2 * B * T * 330 * 662 / 1e9
print()
print(f"  per-MXU-pass cost     {per_pass * 1e3:6.3f} ms "
      f"({gflop_pass / max(per_pass, 1e-9) / 1e3:.1f} TF/s bf16-pass)")
print(f"  HIGH MXU (3 passes)   {mxu3 * 1e3:6.3f} ms")
print(f"  non-MXU share         {nonmxu * 1e3:6.3f} ms (HIGH net {net_high * 1e3:.3f})")
print(f"  input-only HBM floor  {B * L * 4 / 75e9 * 1e3:6.3f} ms @75 GB/s "
      f"({B * L * 4 / 1e6:.0f} MB)")
print(f"  gf=32 kernel (probed round 3): 9.96 ms/step HIGH — chain wins")
