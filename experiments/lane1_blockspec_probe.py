"""Probe: cost of VMEM input BlockSpecs with a 1-wide lane dim.
A [4096, 1] f32 block occupies 2 MB of VMEM (lane dim padded to 128);
theory: the HBM->VMEM DMA pays the padded-write side, so [B] programs
x 3 such inputs explain the synth kernel's ~3.8 ms fixed cost.
Compares per-step time of a do-nothing kernel with (a) three [4096, 1]
blocks vs (b) three [32, 128] lane-dense blocks of the same payload.
"""
import os, sys, time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

B, N = 96, 4096
NIT = 24
rng = np.random.default_rng(0)


def make(shape):
    def kernel(a_ref, b_ref, c_ref, o_ref):
        o_ref[0] = (
            a_ref[0, 0:8, 0:1] + b_ref[0, 0:8, 0:1] + c_ref[0, 0:8, 0:1]
        )

    @jax.jit
    def window(a, b, c, amps):
        def body(carry, amp):
            o = pl.pallas_call(
                kernel,
                grid=(B,),
                in_specs=[
                    pl.BlockSpec((1,) + shape, lambda i: (i, 0, 0))
                ] * 3,
                out_specs=pl.BlockSpec((1, 8, 1), lambda i: (i, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((B, 8, 1), jnp.float32),
            )(a * amp, b, c)
            return carry + jnp.sum(o), 0.0

        acc, _ = jax.lax.scan(body, 0.0, amps)
        return acc

    return window


def run(shape):
    a = jnp.asarray(rng.standard_normal((B,) + shape).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((B,) + shape).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((B,) + shape).astype(np.float32))
    amps = jnp.asarray(rng.uniform(0.5, 1.0, (NIT,)).astype(np.float32))
    w = make(shape)
    float(w(a, b, c, amps))
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        float(w(a, b, c, amps))
        dt = (time.perf_counter() - t0) / NIT * 1e3
        best = dt if best is None else min(best, dt)
    print(f"shape {shape}: {best:7.3f} ms/step")


if __name__ == "__main__":
    run((N, 1))
    run((N // 128, 128))
