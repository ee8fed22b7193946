"""Probe: does the manual bf16-split matmul survive Mosaic on hardware?

Round-3 evidence for the analysis kernel's HIGH path divergence
(experiments/analysis_hw_vs_interp.py showed max rel 2.8e-3 at HIGH on
hardware vs interpret — the 1-pass bf16 signature — while HIGHEST matched
to 5e-7). Variants, each a minimal Pallas matmul [R,K]@[K,N]:

  conv3   — the production convert-based split: h=bf16(x), l=bf16(x-f32(h))
  bitcast — truncation split via bitcast/mask (not fp-foldable)
  default — 1-pass bf16 (DEFAULT dot)
  highest — f32 HIGHEST dot

Errors are vs a float64 numpy reference. If conv3 ~= default on hardware
but ~= highest/2^-16 in interpret, Mosaic folds ext(truncf(x)) -> x.
"""

import os
import sys
import functools

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


R, K, N = 256, 256, 256


def _kernel(a_ref, b_ref, o_ref, *, mode):
    a = a_ref[...]
    b = b_ref[...]
    dt = jnp.float32
    if mode == "conv3":
        ah = a.astype(jnp.bfloat16)
        al = (a - ah.astype(dt)).astype(jnp.bfloat16)
        bh = b.astype(jnp.bfloat16)
        bl = (b - bh.astype(dt)).astype(jnp.bfloat16)
        d = lambda x, y: jnp.dot(x, y, preferred_element_type=dt)
        o_ref[...] = d(ah, bh) + d(ah, bl) + d(al, bh)
    elif mode == "bitcast":
        def hi(x):
            u = jax.lax.bitcast_convert_type(x, jnp.uint32)
            return jax.lax.bitcast_convert_type(
                u & jnp.uint32(0xFFFF0000), jnp.float32
            )
        ah_f = hi(a)
        ah = ah_f.astype(jnp.bfloat16)  # exact: low mantissa bits are zero
        al = (a - ah_f).astype(jnp.bfloat16)
        bh_f = hi(b)
        bh = bh_f.astype(jnp.bfloat16)
        bl = (b - bh_f).astype(jnp.bfloat16)
        d = lambda x, y: jnp.dot(x, y, preferred_element_type=dt)
        o_ref[...] = d(ah, bh) + d(ah, bl) + d(al, bh)
    elif mode == "default":
        o_ref[...] = jnp.dot(
            a, b, preferred_element_type=dt,
            precision=jax.lax.Precision.DEFAULT,
        )
    else:
        o_ref[...] = jnp.dot(
            a, b, preferred_element_type=dt,
            precision=jax.lax.Precision.HIGHEST,
        )


@functools.partial(jax.jit, static_argnames=("mode", "interpret"))
def run(a, b, mode, interpret=False):
    return pl.pallas_call(
        functools.partial(_kernel, mode=mode),
        out_shape=jax.ShapeDtypeStruct((R, N), jnp.float32),
        interpret=interpret,
    )(a, b)


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(7)
    a = rng.standard_normal((R, K)).astype(np.float32)
    b = rng.standard_normal((K, N)).astype(np.float32)
    ref = a.astype(np.float64) @ b.astype(np.float64)
    scale = np.abs(ref).max()
    aj, bj = jnp.asarray(a), jnp.asarray(b)
    for mode in ("conv3", "bitcast", "default", "highest"):
        for interp in (False, True):
            out = np.asarray(run(aj, bj, mode, interpret=interp))
            rel = np.abs(out - ref).max() / scale
            print(f"{mode:8s} interp={interp}: max rel {rel:.3e}")


if __name__ == "__main__":
    main()


def bitwise_check():
    rng = np.random.default_rng(7)
    a = rng.standard_normal((R, K)).astype(np.float32)
    b = rng.standard_normal((K, N)).astype(np.float32)
    aj, bj = jnp.asarray(a), jnp.asarray(b)
    for mode in ("conv3", "bitcast"):
        hw = np.asarray(run(aj, bj, mode, interpret=False))
        it = np.asarray(run(aj, bj, mode, interpret=True))
        eq = (hw == it).mean()
        print(f"{mode}: hw==interpret frac {eq:.6f} max|d| {np.abs(hw-it).max():.3e}")
