"""Measure quality margins for the pitch grid stride G = 2*Hs vs 3*Hs.

Gates (from tests/test_wsola.py contracts): Teager mean dev and rel-sigma
on sped-up/slowed sinusoids (<1%), at several rates, both grid strides.
Patches wsola_fast's G via an env-var-free source toggle (monkeypatched
module constant through re-tracing)."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
from speedy_tpu.config import SpeedyConfig
from speedy_tpu.ops import wsola_fast
from speedy_tpu.ops.teager import teager_stats

SR = 16000
cfg = SpeedyConfig(SR)
L = SR * 4
t = np.arange(L) / SR
sinusoid = (0.5 * np.sin(2 * np.pi * 220.0 * t)).astype(np.float32)
T = cfg.num_frames(L, integer_step=True)


def run_gate(g_mult, speed):
    # patch G by editing the traced constant: recompile via a wrapper that
    # monkeypatches the source-level expression
    import re, importlib
    src_path = wsola_fast.__file__
    with open(src_path) as f:
        src = f.read()
    # Production is G = roundup(max(3*Hs, seg_w), 128); this experiment
    # forces plain multiples of Hs to compare grid densities.
    pat = r"G = -\(-max\(\d \* Hs, seg_w\) // 128\) \* 128|G = \d \* Hs"
    assert re.search(pat, src), "G expression in wsola_fast.py changed; update this experiment"
    new = re.sub(pat, f"G = {g_mult} * Hs", src, count=1)
    with open(src_path, "w") as f:
        f.write(new)
    importlib.reload(wsola_fast)
    try:
        speeds = jnp.full((T,), speed, jnp.float32)
        r = wsola_fast.time_scale_grid(
            jnp.asarray(sinusoid), speeds, cfg,
            min_speed_bound=min(1.0, speed), max_speed_bound=None,
        )
        out = np.asarray(r.output)[: int(r.valid_length)]
        skip = 1000 if speed < 1 else 300
        out = out[: len(out) - skip]
        im, iv = teager_stats(sinusoid)
        om, ov = teager_stats(out)
        mean_dev = abs(om / im - 1.0)
        rels = np.sqrt(ov) / om
        exp = L / speed
        len_err = abs((int(r.valid_length) - exp) / exp)
        print(f"G={g_mult}*Hs speed={speed:4.1f}: mean_dev={mean_dev:.5f} "
              f"rel_sigma={rels:.5f} len_err={len_err:.5f}")
        return mean_dev, rels
    finally:
        with open(src_path, "w") as f:
            f.write(src)
        importlib.reload(wsola_fast)


for g in (3, 4, 5):
    for sp in (3.5, 3.0, 0.4, 1.7):
        run_gate(g, sp)
