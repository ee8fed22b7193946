"""Probe: which column->row transpose forms does Mosaic lower on this
chip? The fused analysis kernel reduces per-frame energy/lsd to VMEM
COLUMNS [F, 1] but the output wants frame-lane ROWS; candidates:
  a) jnp.swapaxes(cols, 0, 1)                       (lax.transpose)
  b) lax.dot_general(eye2, cols, (((1,), (1,)), ...))  (transposed rhs)
  c) lax.dot_general(cols, eyeF, (((0,), (0,)), ...))  (transposed lhs)
Run on the real chip: python experiments/mosaic_transpose_probe.py
"""
import os, sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F = 512


def make(kind):
    def kernel(x_ref, eye_ref, o_ref):
        cols = x_ref[...]  # [F, 2]... stored as [F, 128], 2 used lanes
        if kind == "swap":
            o_ref[...] = jnp.swapaxes(cols[:, :8], 0, 1)[:8, :]
        elif kind == "dot_rhsT":
            eye8 = eye_ref[:8, :8]
            o_ref[...] = jax.lax.dot_general(
                eye8, cols[:, :8],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        elif kind == "dot_lhsT":
            o_ref[...] = jax.lax.dot_general(
                cols[:, :8], eye_ref[...],
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

    @jax.jit
    def run(x, eye):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, F), jnp.float32),
            in_specs=[
                pl.BlockSpec((F, 128), lambda: (0, 0)),
                pl.BlockSpec((F, F), lambda: (0, 0)),
            ],
            out_specs=pl.BlockSpec((8, F), lambda: (0, 0)),
        )(x, eye)

    return run


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((F, 128)).astype(np.float32))
    eye = jnp.asarray(np.eye(F, dtype=np.float32))
    want = np.swapaxes(np.asarray(x)[:, :8], 0, 1)
    for kind in ("swap", "dot_rhsT", "dot_lhsT"):
        try:
            got = np.asarray(make(kind)(x, eye))
            ok = np.array_equal(got, want)
            print(f"{kind}: lowered OK, exact={ok}, maxdiff="
                  f"{np.abs(got - want).max():.3e}")
        except Exception as e:  # noqa: BLE001
            print(f"{kind}: FAILED -> {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
