"""EXPERIMENT: coalesced row gather — one DMA per block of sorted rows.

Hypothesis: the per-row gather kernel (pallas_kernels.py) is DMA-issue-
rate bound, so blocks of sorted rows sharing one span DMA should be ~8x
cheaper. MEASURED RESULT on v5e: no win (27.5 ms vs 29.6 ms for 32x1008
rows) — the wall is ~6 us of fixed per-grid-program overhead, not DMA
issue rate. Kept as a correct, tested alternative and a record of the
measurement; the per-row kernel remains the production path. A future
attempt should amortize grid overhead (more rows per program) or software-
pipeline the span DMA across grid steps.

Blocks whose span overflows (unsorted or fast regions) fall back to
per-row DMAs into disjoint slots of the same scratch, so correctness never
depends on the span bound.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ALIGN = 1024
RPB = 8  # rows per block


def _kernel(width, length, span_rows, slot_rows, starts_ref, x_ref, out_ref,
            scratch, sems):
    b = pl.program_id(0)
    kb = pl.program_id(1)
    out_subs = out_ref.shape[2]
    ws = (width + 127) // 128 + 2  # sublanes needed per extracted row (+pad)

    s0 = b * length + starts_ref[b, kb * RPB]
    row0 = pl.multiple_of((s0 // _ALIGN) * (_ALIGN // 128), 8)
    # A block is coalescible only if EVERY row lies inside the span
    # (unsorted inputs can put rows before row0 or beyond it).
    ok = jnp.bool_(True)
    for i in range(RPB):
        si = b * length + starts_ref[b, kb * RPB + i]
        ok = ok & (si >= row0 * 128) & (
            (si + width) // 128 + 1 - row0 <= span_rows
        )

    @pl.when(ok)
    def _():
        pltpu.make_async_copy(
            x_ref.at[pl.ds(row0, span_rows), :],
            scratch.at[pl.ds(0, span_rows), :],
            sems.at[0],
        ).start()
        pltpu.make_async_copy(
            x_ref.at[pl.ds(0, span_rows), :],
            scratch.at[pl.ds(0, span_rows), :],
            sems.at[0],
        ).wait()

    @pl.when(jnp.logical_not(ok))
    def _():
        for i in range(RPB):
            s = b * length + starts_ref[b, kb * RPB + i]
            r = pl.multiple_of((s // _ALIGN) * (_ALIGN // 128), 8)
            pltpu.make_async_copy(
                x_ref.at[pl.ds(r, slot_rows), :],
                scratch.at[pl.ds(span_rows + i * slot_rows, slot_rows), :],
                sems.at[i],
            ).start()
        for i in range(RPB):
            pltpu.make_async_copy(
                x_ref.at[pl.ds(0, slot_rows), :],
                scratch.at[pl.ds(span_rows + i * slot_rows, slot_rows), :],
                sems.at[i],
            ).wait()

    nrows = ((ws + 8 + 7) // 8) * 8  # sublane slices must be 8-aligned
    lane = jax.lax.broadcasted_iota(jnp.int32, (nrows, 128), 1)
    for i in range(RPB):
        s = b * length + starts_ref[b, kb * RPB + i]
        fb_aligned = (s // _ALIGN) * _ALIGN
        # Offset of row start within the scratch, per path.
        off = jnp.where(
            ok,
            s - row0 * 128,
            (span_rows + i * slot_rows) * 128 + (s - fb_aligned),
        )
        sub = off // 128
        r = off - sub * 128
        sub8 = pl.multiple_of((sub // 8) * 8, 8)
        dsub = sub - sub8  # in [0, 8)
        a = scratch[pl.ds(sub8, nrows), :]
        b1 = pltpu.roll(a, nrows - dsub, 0)
        lanes_cur = pltpu.roll(b1, 128 - r, 1)
        lanes_next = pltpu.roll(pltpu.roll(b1, nrows - 1, 0), 128 - r, 1)
        c = jnp.where(lane < 128 - r, lanes_cur, lanes_next)
        out_ref[0, i, :, :] = c[:out_subs]


@functools.partial(jax.jit, static_argnames=("width", "span_rows"))
def gather_rows_coalesced(
    x: jnp.ndarray, starts: jnp.ndarray, width: int, span_rows: int = 64
) -> jnp.ndarray:
    """x[B, L], sorted-ish starts[B, K] -> rows[B, K, width].

    span_rows*128 samples must usually cover RPB consecutive rows
    (overflow falls back to per-row DMAs; only throughput depends on the
    sortedness/stride assumption, never correctness)."""
    B, L = x.shape
    K = starts.shape[1]
    assert K % RPB == 0
    wsubs = (width + 127) // 128
    slot_rows = ((width + 2 * _ALIGN - 1) // _ALIGN * _ALIGN) // 128
    scratch_rows = span_rows + RPB * slot_rows
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, K // RPB),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, RPB, wsubs, 128),
            lambda b, kb, starts: (b, kb, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((scratch_rows + 16, 128), x.dtype),
            pltpu.SemaphoreType.DMA((RPB,)),
        ],
    )
    kernel = functools.partial(_kernel, width, L, span_rows, slot_rows)
    flat = x.reshape(-1)
    blk = max(span_rows * 128, slot_rows * 128)
    pad = (-flat.shape[0]) % _ALIGN + blk + _ALIGN
    flat = jnp.concatenate([flat, jnp.zeros(pad, x.dtype)])
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, K, wsubs, 128), x.dtype),
        grid_spec=grid_spec,
    )(starts, flat.reshape(-1, 128))
    return out.reshape(B, K, wsubs * 128)[:, :, :width]
