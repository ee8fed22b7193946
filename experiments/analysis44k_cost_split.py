"""44.1 kHz analysis-chain cost split (round-4 verdict item 5): probe —
not assert — where the 44.1 kHz analysis cost sits, the same way
analysis_cost_split.py (16 kHz kernel) and analysis22k_cost_split.py
(22.05 kHz chain) did: MXU share from the precision slope
(DEFAULT/HIGH/HIGHEST = 1/3/6 bf16-split passes over the DFT matmuls),
VPU + intermediate-materialization + input-DMA share as the intercept,
compared against the raw input HBM floor. The result bounds what a
dense-lattice analysis kernel for step 441 could recover: the kernel
eliminates the [B,T,W]-class intermediates (the non-MXU share above the
input floor) but pays its own extraction cost — at 22.05 kHz that cost
made the kernel 2x SLOWER (round 3); at 44.1 kHz gf = gcd-driven phase
count is 128 (step 441 is odd x 441 = 3^2*7^2 shares no power-of-two
factor with the 128-lane tile), so the extraction is structurally a
128-phase unroll — strictly worse than the 32-phase one that already
lost.

Run on the real chip: python experiments/analysis44k_cost_split.py
Env: SR (44100), B (32 — the BENCH_44K knee), NIT (24).
"""
import os, sys, time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
import jax.numpy as jnp

from speedy_tpu.config import SpeedyConfig
from speedy_tpu.parallel.batch import batched_analysis

SR = int(os.environ.get("SR", "44100"))
B = int(os.environ.get("B", "32"))
L = SR * 10
NIT = int(os.environ.get("NIT", "24"))
cfg = SpeedyConfig(SR)
T = cfg.num_frames(L, integer_step=True)
W = cfg.window_size

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
gflop_pass = 2 * B * T * W * 2 * (W + 1) / 1e9
in_mb = B * L * 4 / 1e6
print()
print(f"  B={B} T={T} W={W} step={cfg.frame_step_int}")
print(f"  per-MXU-pass cost     {per_pass * 1e3:6.3f} ms "
      f"({gflop_pass / max(per_pass, 1e-9) / 1e3:.1f} TF/s bf16-pass)")
print(f"  HIGH MXU (3 passes)   {mxu3 * 1e3:6.3f} ms")
print(f"  non-MXU share         {nonmxu * 1e3:6.3f} ms (HIGH net {net_high * 1e3:.3f})")
print(f"  input-only HBM floor  {in_mb * 1e-3 / 75 * 1e3:6.3f} ms @75 GB/s ({in_mb:.0f} MB)")
print(f"  dense-lattice kernel bound: could recover at most the non-MXU "
      f"share above the input floor = "
      f"{max(nonmxu - in_mb * 1e-3 / 75, 0) * 1e3:.3f} ms/step")
