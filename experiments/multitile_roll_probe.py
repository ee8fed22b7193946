"""Probe: does Mosaic lower pltpu.roll on a multi-tile lane axis?

The pitch-kernel forward-DFT split (FS = FA + FT with the split at
taps=246) needs the segment tail as a lane-offset operand: the cheapest
extraction is pltpu.roll(slab[GC, 512], 512-246, axis=1). If Mosaic
rejects multi-tile minor-dim rolls, the fallback is an aligned-slice
matmul + rank-(gap) VPU correction. Run on the real chip.
"""
import os, sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GC, G, SHIFT = 64, 512, 512 - 246


def kernel(x_ref, o_ref):
    o_ref[...] = pltpu.roll(x_ref[...], SHIFT, 1)


@jax.jit
def run(x):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((GC, G), x.dtype),
    )(x)


x = jnp.asarray(np.random.default_rng(0).standard_normal((GC, G)).astype(np.float32))
want = np.roll(np.asarray(x), SHIFT, axis=1)
try:
    got = np.asarray(run(x))
    ok = np.array_equal(got, want)
    print("multi-tile lane roll:", "OK exact" if ok else "WRONG VALUES")
except Exception as e:
    print("multi-tile lane roll: FAILED ->", type(e).__name__, str(e)[:500])
