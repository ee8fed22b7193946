"""Pallas TPU kernels for the hot ops.

gather_rows: the grid-parallel WSOLA engine's dominant cost is reading
overlapping windows at data-dependent positions (synthesis chunks). XLA
lowers those to generic gathers running at ~0.6 GB/s on v5e; this kernel
instead issues one async DMA per row with the row starts scalar-prefetched
into SMEM, overlapping many copies in flight (~3x XLA).

Measured limit: ~0.85 us per row regardless of design (per-row, span-
coalesced, double-buffered, constant-address and no-extraction ablations
all land at 27-30 ms for 32k rows) — the TPU scalar core's DMA-enqueue
issue rate is the floor for independent unaligned reads.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_ALIGN = 1024  # 1D f32 HBM tiling on v5e


def _bf16_trunc_split(x, terms):
    """Fold-proof split of f32 `x` into `terms` bf16 factors summing to x.

    The convert-based split (h = bf16(x); l = bf16(x - f32(h))) is folded
    by XLA:CPU's simplifier — ext(truncf(x)) -> x — back to 1-pass bf16,
    which silently degraded every interpret-mode run of these kernels
    (Mosaic on hardware does NOT fold it; probe:
    experiments/bf16_split_probe.py — conv split hw 5.1e-6 / interpret
    3.1e-3 max rel, truncation split 1.43e-5 ~= 2^-16 in BOTH modes).
    Truncation via integer masking cannot be fp-simplified, and each
    truncated head has only the top 8 mantissa bits set, so its bf16
    convert is lossless in both modes. With terms=3 the residual after
    two truncations has <= 8 significant bits, so the split is exactly
    reconstructive: x == sum(f32(t) for t in split) bit-for-bit.
    """
    out = []
    r = x
    for _ in range(terms - 1):
        u = jax.lax.bitcast_convert_type(r, jnp.uint32)
        h = jax.lax.bitcast_convert_type(
            u & jnp.uint32(0xFFFF0000), jnp.float32
        )
        out.append(h.astype(jnp.bfloat16))
        r = r - h
    out.append(r.astype(jnp.bfloat16))
    return out


def _gather_rows_kernel(
    width,
    rows_per_block,
    length,
    nvalid_ref,
    starts_ref,
    x_ref,
    out_ref,
    scratch,
    sems,
):
    # starts_ref is the scalar-prefetched [Bc, K] starts array in SMEM; the
    # wrapper chunks the batch so Bc*K*4 bytes stays under the 1 MB SMEM
    # budget. nvalid_ref [Bc] is the per-utterance count of rows worth
    # fetching: rows >= nvalid are skipped entirely (no DMA, output left
    # unwritten = garbage the caller masks), which at a 3.5x speedup
    # avoids ~70% of the DMA issue cost (output capacity is planned for
    # the worst-case speed of 1.0).
    # x_ref is the flattened [B*L] waveform. HBM slices must be tile
    # (1024)-aligned, so each row DMAs an aligned superset block into a
    # VMEM scratch viewed as [sublanes, 128]; the dynamic in-tile offset
    # off = 128*sub + r is then applied as a dynamic sublane roll plus a
    # lane roll with sublane-carry select — all 2D vector ops (Mosaic has
    # no 1D ops or unaligned vector loads).
    b = pl.program_id(0)
    blk = ((width + _ALIGN - 1) // _ALIGN + 1) * _ALIGN  # offset<ALIGN + width
    brows = blk // 128
    out_subs = out_ref.shape[2]
    offs = []
    kb = pl.program_id(1)
    nvalid = nvalid_ref[b]
    for i in range(rows_per_block):
        s = b * length + starts_ref[b, kb * rows_per_block + i]
        row = pl.multiple_of((s // _ALIGN) * (_ALIGN // 128), 8)

        @pl.when(kb * rows_per_block + i < nvalid)
        def _():
            pltpu.make_async_copy(
                x_ref.at[pl.ds(row, brows), :], scratch.at[i], sems.at[i]
            ).start()

        offs.append(s - row * 128)
    lane = jax.lax.broadcasted_iota(jnp.int32, (brows, 128), 1)
    for i in range(rows_per_block):

        @pl.when(kb * rows_per_block + i < nvalid)
        def _():
            pltpu.make_async_copy(
                x_ref.at[pl.ds(0, brows), :], scratch.at[i], sems.at[i]
            ).wait()
            a = scratch[i]
            sub = offs[i] // 128
            r = offs[i] - sub * 128
            # pltpu.roll requires non-negative shifts: roll(x, n-k) == x << k.
            b1 = pltpu.roll(a, brows - sub, 0)
            lanes_cur = pltpu.roll(b1, 128 - r, 1)
            lanes_next = pltpu.roll(pltpu.roll(b1, brows - 1, 0), 128 - r, 1)
            c = jnp.where(lane < 128 - r, lanes_cur, lanes_next)
            out_ref[0, i, :, :] = c[:out_subs]


@functools.partial(jax.jit, static_argnames=("width", "rows_per_block"))
def gather_rows_pallas(
    x: jnp.ndarray,
    starts: jnp.ndarray,
    width: int,
    rows_per_block: int = 8,
    n_valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """x[B, L], starts[B, K] (0 <= s <= L - width) -> rows[B, K, width].

    n_valid [B] (optional): per-utterance count of leading rows to
    actually fetch; rows beyond it return unspecified values."""
    B, L = x.shape
    K = starts.shape[1]
    assert K % rows_per_block == 0, (K, rows_per_block)
    if n_valid is None:
        n_valid = jnp.full((B,), K, jnp.int32)
    wsubs = (width + 127) // 128  # output sublanes per row
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, K // rows_per_block),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, rows_per_block, wsubs, 128),
            lambda b, kb, nvalid, starts: (b, kb, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM(
                (
                    rows_per_block,
                    (((width + _ALIGN - 1) // _ALIGN + 1) * _ALIGN) // 128,
                    128,
                ),
                x.dtype,
            ),
            pltpu.SemaphoreType.DMA((rows_per_block,)),
        ],
    )
    kernel = functools.partial(_gather_rows_kernel, width, rows_per_block, L)
    flat = x.reshape(-1)
    blk = ((width + _ALIGN - 1) // _ALIGN + 1) * _ALIGN
    pad = (-flat.shape[0]) % _ALIGN + blk  # headroom for the last block
    flat = jnp.concatenate([flat, jnp.zeros(pad, x.dtype)])
    x2 = flat.reshape(-1, 128)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, K, wsubs, 128), x.dtype),
        grid_spec=grid_spec,
    )(n_valid.astype(jnp.int32), starts, x2)
    return out.reshape(B, K, wsubs * 128)[:, :, :width]


def gather_rows_reference(x: jnp.ndarray, starts: jnp.ndarray, width: int):
    """XLA fallback (vmapped dynamic slices)."""
    return jax.vmap(
        lambda xb, sb: jax.vmap(
            lambda s: jax.lax.dynamic_slice(xb, (s,), (width,))
        )(sb)
    )(x, starts)


def gather_rows(
    x: jnp.ndarray,
    starts: jnp.ndarray,
    width: int,
    n_valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Best-available row gather: Pallas DMA kernel on TPU, XLA elsewhere.

    Pads the row count to the DMA block size; callers may pass any K.
    n_valid [B] (optional): rows beyond it may return unspecified values
    (the TPU kernel skips their DMAs entirely).
    """
    if jax.default_backend() != "tpu":
        return gather_rows_reference(x, starts, width)
    B, K = starts.shape
    # 32 rows per grid program: amortizes per-program overhead across the
    # (majority, at speedups) skipped programs — measured 9.8 vs 11.3 ms
    # per production batch at rpb=8.
    rpb = 32
    pad = (-K) % rpb
    if pad:
        starts = jnp.concatenate(
            [starts, jnp.zeros((B, pad), starts.dtype)], axis=1
        )
    # The starts array is scalar-prefetched into SMEM (1 MB budget): chunk
    # the batch so each call stays under ~200k int32 entries.
    b_chunk = max(1, 200_000 // starts.shape[1])
    if B <= b_chunk:
        out = gather_rows_pallas(x, starts, width, rpb, n_valid)
    else:
        outs = []
        for b0 in range(0, B, b_chunk):
            outs.append(
                gather_rows_pallas(
                    x[b0 : b0 + b_chunk],
                    starts[b0 : b0 + b_chunk],
                    width,
                    rpb,
                    None if n_valid is None else n_valid[b0 : b0 + b_chunk],
                )
            )
        out = jnp.concatenate(outs, axis=0)
    return out[:, :K] if pad else out


def _gather_pipelined_kernel(
    width, length, n_rows, starts_ref, x_ref, out_ref, scratch, sems
):
    """EXPERIMENT: one program per batch row; internal loop over output
    rows with double-buffered DMAs. Measured equal to the per-row kernel
    (27.3 vs 27.1 ms at 32x1008 rows): with constant-address and no-roll
    ablations also landing at ~28-30 ms, the floor is the TPU scalar
    core's per-DMA-enqueue issue cost (~0.85 us) — not DMA latency,
    address arithmetic, extraction rolls, or grid overhead. Kept for the
    record; per-row gather_rows_pallas remains the production path."""
    b = pl.program_id(0)
    blk = ((width + _ALIGN - 1) // _ALIGN + 1) * _ALIGN
    brows = blk // 128
    out_subs = out_ref.shape[2]
    nrows = (((width + 127) // 128 + 2 + 8 + 7) // 8) * 8
    lane = jax.lax.broadcasted_iota(jnp.int32, (nrows, 128), 1)

    def aligned_row(j):
        s = b * length + starts_ref[b, j]
        return pl.multiple_of((s // _ALIGN) * (_ALIGN // 128), 8), s

    def start_dma(j, slot):
        row, _ = aligned_row(j)
        pltpu.make_async_copy(
            x_ref.at[pl.ds(row, brows), :],
            scratch.at[slot, pl.ds(0, brows), :],
            sems.at[slot],
        ).start()

    start_dma(0, 0)

    def body(j, _):
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < n_rows)
        def _():
            start_dma(j + 1, jax.lax.rem(j + 1, 2))

        pltpu.make_async_copy(
            x_ref.at[pl.ds(0, brows), :],
            scratch.at[slot, pl.ds(0, brows), :],
            sems.at[slot],
        ).wait()
        row, s = aligned_row(j)
        off = s - row * 128
        sub = off // 128
        r = off - sub * 128
        sub8 = pl.multiple_of((sub // 8) * 8, 8)
        dsub = sub - sub8
        a = scratch[slot, pl.ds(sub8, nrows), :]
        b1 = pltpu.roll(a, nrows - dsub, 0)
        lanes_cur = pltpu.roll(b1, 128 - r, 1)
        lanes_next = pltpu.roll(pltpu.roll(b1, nrows - 1, 0), 128 - r, 1)
        c = jnp.where(lane < 128 - r, lanes_cur, lanes_next)
        out_ref[0, j, :, :] = c[:out_subs]
        return 0

    jax.lax.fori_loop(0, n_rows, body, 0)


@functools.partial(jax.jit, static_argnames=("width",))
def gather_rows_pipelined(x: jnp.ndarray, starts: jnp.ndarray, width: int):
    """Double-buffered variant of gather_rows_pallas (one grid program per
    batch row; DMA for row j+1 overlaps row j's extraction)."""
    B, L = x.shape
    K = starts.shape[1]
    wsubs = (width + 127) // 128
    blk = ((width + _ALIGN - 1) // _ALIGN + 1) * _ALIGN
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, K, wsubs, 128),
            lambda b, starts: (b, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, blk // 128 + 16, 128), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_gather_pipelined_kernel, width, L, K)
    flat = x.reshape(-1)
    pad = (-flat.shape[0]) % _ALIGN + blk
    flat = jnp.concatenate([flat, jnp.zeros(pad, x.dtype)])
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, K, wsubs, 128), x.dtype),
        grid_spec=grid_spec,
    )(starts, flat.reshape(-1, 128))
    return out.reshape(B, K, wsubs * 128)[:, :, :width]


def _gather_synth_kernel(
    NB,
    R,
    SR,
    w_rows,
    w_sub_rows,
    nt,
    ts,
    hop,
    length_rows,
    nvb_ref,
    bases_ref,
    rowoff_ref,
    nrows_ref,
    q8k_ref,
    r7k_ref,
    af_ref,
    win_ref,
    gain_ref,
    x_ref,
    out_ref,
    scratch,
    carr,
    obuf,
    sems,
    osems,
):
    """Fused WSOLA synthesis: block-span gather + fractional-delay interp +
    Hann window + half-slot OLA, emitting final hop-sample SLOTS.

    The separate gather kernel + XLA interp/OLA pipeline moves ~1.1 GB/step
    through HBM at production shapes (padded row buffer written, re-sliced,
    re-read by the interp pass); everything here happens on the in-VMEM
    slab instead and only the [ts*R, 128] slot tiles leave the core.

    One grid program per batch row; the NB block loop is unrolled inside
    (8x fewer grid programs — measured ~3.7 us fixed cost per program) with
    double-buffered span DMAs. Slabs are T-MAJOR (row t*R + r holds tile t
    of output row r) so the ts slot tiles are a CONTIGUOUS leading slice:
      1. hierarchical one-hot tile select on the MXU (exact): the span is
         first narrowed per SR-row sub-block by a dynamic 8-aligned VMEM
         slice (sub-block row offsets scalar-prefetched), so each one-hot
         is [SR*nt, w_sub_rows~128] instead of [R*nt, w_rows~1000] —
         ~8x fewer matmul FLOPs for the same exact selection,
      2. 7-step barrel shift by the 0..127 lane residual (cross-tile carry
         = +R sublanes in t-major),
      3. fractional interp: raw = slab*(1-af) + (slab<<1)*af,
      4. per-tile window multiply (win prefetched, sublane-broadcast),
      5. OLA: slots = firsts + prev_row(seconds<<hop); the cross-row
         dependency is a +1 sublane roll, block boundaries carried in a
         scratch register across the unrolled loop; global row 0 is the
         reference's unwindowed slot.
    Blocks past nvb are skipped entirely — including their OUTPUT HBM
    traffic: the output lives in ANY space and valid blocks are written
    by explicit double-buffered VMEM->HBM DMAs, so the ~5/8 of capacity
    that is dead at a 3.5x speedup never crosses the memory bus (a
    VMEM-blocked out spec writes every block back regardless).
    """
    b = pl.program_id(0)
    nvb = nvb_ref[b]
    TOT = R * nt
    ST = R * ts

    def out_dma(nb, oslot):
        return pltpu.make_async_copy(
            obuf.at[oslot], out_ref.at[b, nb], osems.at[oslot]
        )

    # Span DMA lengths are bucketed: w_rows covers the worst-case plan
    # speed, but a block's ACTUAL extent (scalar-prefetched nrows) is
    # usually much smaller — at a 3.5x speedup ~60% of the span bytes are
    # dead. Static lengths keep the DMA shapes compile-time known; the
    # ladder runs in eighths from w_sub_rows (the smallest possible need:
    # nrows = max sub-block window end >= one window) to w_rows, so the
    # common mid-speed blocks land in a tight bucket instead of the
    # worst-case one.
    lo_r = min(w_sub_rows, w_rows)
    _bl = sorted({
        min(w_rows, -(-(lo_r + (w_rows - lo_r) * c // 8) // 8) * 8)
        for c in range(9)
    })

    def span_dma(nb, slot, do):
        s = b * length_rows + bases_ref[b, nb]
        row = pl.multiple_of(s, 8)
        need = nrows_ref[b, nb]
        lo = 0
        for lc in _bl:
            @pl.when((lo < need) & (need <= lc))
            def _(lc=lc):
                cp = pltpu.make_async_copy(
                    x_ref.at[pl.ds(row, lc), :],
                    scratch.at[slot, pl.ds(0, lc), :],
                    sems.at[slot],
                )
                cp.start() if do == "start" else cp.wait()
            lo = lc

    @pl.when(0 < nvb)
    def _():
        span_dma(0, 0, "start")

    lane = jax.lax.broadcasted_iota(jnp.int32, (TOT, 128), 1)
    sub2 = jax.lax.broadcasted_iota(jnp.int32, (ST, 128), 0)
    first_row = (sub2 & (R - 1)) == 0  # R is a power of two

    def bcast_rows(src, rows):
        """src[rows[t]] broadcast to sublane range [t*R, (t+1)*R)."""
        ce = jnp.broadcast_to(src[rows[ts - 1] : rows[ts - 1] + 1, :], (ST, 128))
        for t in range(ts - 2, -1, -1):
            ce = jnp.where(
                sub2 < (t + 1) * R,
                jnp.broadcast_to(src[rows[t] : rows[t] + 1, :], (ST, 128)),
                ce,
            )
        return ce

    for nb in range(NB):
        slot = nb % 2

        @pl.when(nb + 1 < nvb)
        def _():
            span_dma(nb + 1, (nb + 1) % 2, "start")

        @pl.when(nb < nvb)
        def _():
            span_dma(nb, slot, "wait")
            # Per-row controls arrive LANE-DENSE [TOTp//128, 128] and are
            # rebuilt into the [TOT, 1] columns the select/shift math
            # wants, in-register: a [*, 1] VMEM input block would pad its
            # lane dim x128, and the padded HBM->VMEM writes cost ~1.5
            # ms/step at production shapes (experiments/
            # lane1_blockspec_probe.py: three [4096, 1] blocks 2.53
            # ms/step vs 1.06 lane-dense).
            sub_t = jax.lax.broadcasted_iota(jnp.int32, (TOT, 128), 0)
            lane_t = lane  # (TOT, 128) lane iota, built above

            def col(vd):
                # c[i, 0] = vd[i // 128, i % 128] without transposes or
                # sublane concats (Mosaic rejects both at these shapes):
                # broadcast each dense row over its 128-row segment, then
                # a lane-one-hot masked reduce — pure VPU, exact f32.
                q = vd.shape[0]
                P = jnp.broadcast_to(vd[q - 1 : q, :], (TOT, 128))
                for r in range(q - 2, -1, -1):
                    P = jnp.where(
                        sub_t < (r + 1) * 128,
                        jnp.broadcast_to(vd[r : r + 1, :], (TOT, 128)),
                        P,
                    )
                return jnp.sum(
                    jnp.where(lane_t == (sub_t & 127), P, 0.0),
                    axis=1,
                    keepdims=True,
                )

            r7k = col(r7k_ref[0, nb]).astype(jnp.int32)  # [TOT, 1]
            af = col(af_ref[0, nb])  # [TOT, 1] fractional delays
            q8col = col(q8k_ref[0, nb]).astype(jnp.int32)
            # Hierarchical tile select: per SR-row sub-block, narrow the
            # span to w_sub_rows via a dynamic 8-aligned slice, then a
            # small exact one-hot matmul. q8k_ref rows are ordered
            # (sb, t, r) with values relative to the sub-block offset.
            SB = R // SR
            CH = SR * nt
            iota_sub = jax.lax.broadcasted_iota(
                jnp.int32, (CH, w_sub_rows), 1
            )
            dt = scratch.dtype
            chunks = []
            for sb in range(SB):
                off = pl.multiple_of(rowoff_ref[b, nb * SB + sb], 8)
                spw = scratch[slot, pl.ds(off, w_sub_rows), :]
                q8c = q8col[sb * CH : (sb + 1) * CH]
                # Exact selection in THREE bf16 passes instead of f32
                # HIGHEST's six: the one-hot is 0/1 (bf16-exact) and the
                # f32 values split losslessly into three bf16 terms
                # (24 = 3x8 significand bits) — each pass selects one
                # term exactly, and the f32 sum of the disjoint-range
                # terms reconstructs the value bit-for-bit. Truncation
                # split: fold-proof in interpret mode too (see
                # _bf16_trunc_split).
                onehot = (iota_sub == q8c).astype(jnp.bfloat16)
                v_h, v_l, v_ll = _bf16_trunc_split(spw, 3)
                sel = lambda m: jnp.dot(
                    onehot, m, preferred_element_type=dt
                )
                chunks.append(
                    sel(v_h) + sel(v_l) + sel(v_ll)
                )  # [CH, 128], rows (t, r) within sub-block sb
            # Reassemble the global t-major slab: row t*R + sb*SR + r.
            slab = jnp.concatenate(
                [
                    chunks[sb][t * SR : (t + 1) * SR]
                    for t in range(nt)
                    for sb in range(SB)
                ],
                axis=0,
            )
            for bit in range(7):
                sh = 1 << bit
                cur = pltpu.roll(slab, 128 - sh, 1)
                nxt = pltpu.roll(pltpu.roll(slab, TOT - R, 0), 128 - sh, 1)
                shifted = jnp.where(lane < 128 - sh, cur, nxt)
                slab = jnp.where((r7k & sh) != 0, shifted, slab)
            # Per-utterance input gain, applied to the selected slab (all
            # downstream math — interp, window, OLA, the unwindowed slot-0
            # — is linear in x). Keeping the gain HERE instead of on the
            # HBM source makes the padded source gain-free, so in serving
            # loops XLA hoists the pad as loop-invariant staging and the
            # per-utterance multiply never touches a [B, L] HBM pass.
            slab = slab * jnp.broadcast_to(gain_ref[0, 0:1, :], slab.shape)
            # raw[i] = slab[i]*(1-af) + slab[i+1]*af (one more 1-lane shift)
            cur = pltpu.roll(slab, 127, 1)
            nxt = pltpu.roll(pltpu.roll(slab, TOT - R, 0), 127, 1)
            s1 = jnp.where(lane < 127, cur, nxt)
            raw = slab * (1.0 - af) + s1 * af
            raw_w = jnp.concatenate(
                [
                    raw[t * R : (t + 1) * R]
                    * jnp.broadcast_to(win_ref[t : t + 1, :], (R, 128))
                    for t in range(nt)
                ],
                axis=0,
            )
            # seconds << hop samples = q tiles (+R sublanes each) + rr lanes
            q, rr = hop // 128, hop % 128
            a1 = pltpu.roll(raw_w, TOT - q * R, 0) if q else raw_w
            if rr:
                cur = pltpu.roll(a1, 128 - rr, 1)
                nxt = pltpu.roll(pltpu.roll(a1, TOT - R, 0), 128 - rr, 1)
                sec = jnp.where(lane < 128 - rr, cur, nxt)
            else:
                sec = a1
            F = raw_w[:ST]
            S = sec[:ST]
            prev = pltpu.roll(S, 1, 0)  # row i reads row i-1 (same tile)
            ce = bcast_rows(carr, [t for t in range(ts)])
            prev = jnp.where(first_row, ce, prev)
            slots = F + prev
            if nb == 0:
                # Global slot 0: unwindowed raw, no blend partner
                # (wsola_fast.synth / the reference's first chunk).
                r0 = bcast_rows(raw, [t * R for t in range(ts)])
                slots = jnp.where(first_row, r0, slots)
            oslot = nb % 2
            if nb >= 2:
                # The buffer's previous DMA (issued at nb-2) must land
                # before overwriting it.
                out_dma(nb - 2, oslot).wait()
            obuf[oslot, :, :] = slots
            out_dma(nb, oslot).start()
            for t in range(ts):
                carr[t : t + 1, :] = S[t * R + R - 1 : t * R + R, :]

    # Drain the last outstanding output DMAs (static sem indices; both
    # parities are in flight when nvb >= 2, only parity 0 when nvb == 1).
    @pl.when(nvb >= 2)
    def _():
        out_dma(0, 0).wait()
        out_dma(0, 1).wait()

    @pl.when(nvb == 1)
    def _():
        out_dma(0, 0).wait()


class _SpanGeo:
    """Span-block geometry of gather_synth_block_pallas (see
    _span_geometry). Plain attribute bag so jnp arrays trace through."""

    __slots__ = (
        "nt", "w_rows", "SR", "SB", "w_sub_rows",
        "base_al", "q8", "r7", "q8s", "rowoff", "q8rel",
    )

    def __init__(self, **kw):
        for k, v in kw.items():
            setattr(self, k, v)


def _span_geometry(starts, width: int, rows_per_block: int, w_span: int, xp):
    """The ONE statement of the fused-synthesis span/sub-block geometry,
    shared by the kernel wrapper (xp=jnp, traced), the in-graph poison
    check, and the eager validate_span_contract (xp=np) — so the
    contract arithmetic cannot drift between them. `starts` must already
    be padded to a multiple of rows_per_block."""
    B = starts.shape[0]
    R = rows_per_block
    NB = starts.shape[1] // R
    nt = (width + 127) // 128 + 1  # tiles per row incl. shift headroom
    w_rows = -(-((w_span + 1024) // 128 + nt + 8) // 8) * 8
    s2 = starts.reshape(B, NB, R)
    base_al = (xp.min(s2, axis=2) // 1024) * 1024
    offs = (s2 - base_al[:, :, None]).astype(xp.int32)
    q8 = offs // 128
    r7 = offs - q8 * 128
    # Sub-block height: the hierarchical select's one-hot FLOPs scale as
    # SR * w_sub_rows where w_sub_rows ~ SR * step_ub, so smaller SR
    # shrinks the matmuls quadratically at the cost of more dynamic
    # slices per block. Trace-time experiment knob (clear jit caches
    # after changing); 16 is the production default.
    SR = min(int(os.environ.get("SPEEDY_SYNTH_SUBROWS", "16")), R)
    SB = R // SR
    step_ub = -(-w_span // max(R - 1, 1))  # per-row start step bound
    w_sub = (SR - 1) * step_ub + width + 32 + 1024
    w_sub_rows = min(w_rows, -(-(-(-w_sub // 128) + nt + 8) // 8) * 8)
    q8s = q8.reshape(B, NB, SB, SR)
    rowoff = xp.clip(
        (xp.min(q8s, axis=3) // 8) * 8, 0, w_rows - w_sub_rows
    ).astype(xp.int32)  # [B, NB, SB]
    q8rel = q8s - rowoff[..., None]
    return _SpanGeo(
        nt=nt, w_rows=w_rows, SR=SR, SB=SB, w_sub_rows=w_sub_rows,
        base_al=base_al, q8=q8, r7=r7, q8s=q8s, rowoff=rowoff, q8rel=q8rel,
    )


def _span_violations(geo: _SpanGeo, xp):
    """Per-[B, NB] violation flags: a 16-row sub-block's spread exceeds
    its narrowed selection window, or the block overruns the span DMA."""
    sub_viol = xp.any(
        (geo.q8rel < 0) | (geo.q8rel + geo.nt > geo.w_sub_rows), axis=(2, 3)
    )
    blk_viol = xp.max(geo.q8, axis=2) + geo.nt > geo.w_rows
    return sub_viol, blk_viol


@functools.partial(
    jax.jit,
    static_argnames=("hop", "width", "rows_per_block", "w_span", "interpret"),
)
def gather_synth_block_pallas(
    x: jnp.ndarray,
    starts: jnp.ndarray,
    af: jnp.ndarray,
    hop: int,
    width: int,
    rows_per_block: int,
    w_span: int,
    n_valid: Optional[jnp.ndarray] = None,
    interpret: bool = False,
    gain: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Fused WSOLA synthesis tail: x[B, L], near-monotone starts[B, K],
    fractional delays af[B, K] -> OLA slots [B, K, hop] (slot k =
    windowed-interpolated chunk k's first hop samples + chunk k-1's last;
    slot 0 unwindowed). width must be 2*hop + 1. Rows at/after n_valid
    are garbage.

    Span contract — TIGHTER than gather_rows_block_pallas's per-128-row
    bound: the hierarchical select additionally needs every 16-row
    SUB-block's spread to fit its narrowed window, i.e.
    max(starts) - min(starts) within any 16 consecutive rows must stay
    under ~15*ceil(w_span/127) + 1024 samples. Both hold automatically
    for near-monotone starts with per-row steps <= the planner bound the
    caller sizes w_span from (wsola_fast: Hs*max_speed_plan steps plus a
    +-max_period/2 phase-snap jitter, absorbed by the alignment slack);
    pathological starts that concentrate a block's spread inside one
    sub-block select zeros. Not a concern for the production caller, by
    construction — and the boundary is guarded: SPEEDY_VALIDATE_SPAN=1
    NaN-poisons the output of any live violating block (in-graph), and
    validate_span_contract() is the eager pre-dispatch check that raises
    (tests/test_pallas_kernels.py::test_span_contract_*).
    """
    assert width == 2 * hop + 1
    B, L = x.shape
    K = starts.shape[1]
    R = rows_per_block
    assert R & (R - 1) == 0, "rows_per_block must be a power of two"
    NB = -(-K // R)
    if NB * R != K:
        pad = NB * R - K
        starts = jnp.concatenate(
            [starts, jnp.tile(starts[:, -1:], (1, pad))], axis=1
        )
        af = jnp.concatenate([af, jnp.zeros((B, pad), af.dtype)], axis=1)
    ts = (hop + 127) // 128  # slot tiles per row
    # Hierarchical select prep (shared geometry — ONE statement of the
    # contract arithmetic, also used by the poison check below and the
    # eager validate_span_contract): per SR-row sub-block, an 8-aligned
    # row offset into the span (scalar-prefetched) and tile indices
    # RELATIVE to it, ordered (sb, t, r) — see _gather_synth_kernel.
    geo = _span_geometry(starts, width, R, w_span, jnp)
    nt, w_rows, SR, SB, w_sub_rows = (
        geo.nt, geo.w_rows, geo.SR, geo.SB, geo.w_sub_rows,
    )
    base_al, q8, r7, rowoff, q8rel = (
        geo.base_al, geo.q8, geo.r7, geo.rowoff, geo.q8rel,
    )
    ktile = jnp.arange(nt, dtype=jnp.int32)
    # Actual span extent per block for the bucketed span-DMA lengths.
    # Must cover every hierarchical sub-block window [off, off+w_sub_rows)
    # — the one-hot multiplies un-DMA'd rows by 0.0, which is only safe if
    # they hold real numbers, not stale NaN/Inf VMEM. The kernel reads
    # scratch ONLY through those windows, so the exact requirement is
    # max_sb(rowoff) + w_sub_rows — for monotone starts that is
    # ~(SR-1)*step/128 rows tighter than the naive max(q8) + w_sub_rows
    # (the last sub-block's window START is what matters, not its top
    # row), which drops many blocks into a smaller DMA bucket.
    nrows = jnp.minimum(
        jnp.max(rowoff, axis=2) + w_sub_rows, w_rows
    ).astype(jnp.int32)  # [B, NB]
    # Per-row controls packed LANE-DENSE [B, NB, TOTp/128, 128] (f32
    # transport — the int values are < 2^24 so the cast is exact); the
    # kernel rebuilds the [TOT, 1] columns in-register. A [.., TOT, 1]
    # VMEM block pads its lane dim x128, and those padded HBM->VMEM
    # writes alone cost ~1.5 ms/step at production shapes
    # (experiments/lane1_blockspec_probe.py).
    TOT = nt * R
    TOTp = -(-TOT // 128) * 128

    def _pack(v):
        v = v.astype(x.dtype).reshape(B, NB, TOT)
        if TOTp != TOT:
            v = jnp.concatenate(
                [v, jnp.zeros((B, NB, TOTp - TOT), x.dtype)], axis=-1
            )
        return v.reshape(B, NB, TOTp // 128, 128)

    q8k = _pack(q8rel[:, :, :, None, :] + ktile[None, None, None, :, None])
    # T-major: row t*R + r of the slab is tile t of output row r.
    r7k = _pack(jnp.broadcast_to(r7[:, :, None, :], (B, NB, nt, R)))
    af_tm = _pack(
        jnp.broadcast_to(af.reshape(B, NB, R)[:, :, None, :], (B, NB, nt, R))
    )
    nvb = (
        jnp.full((B,), NB, jnp.int32)
        if n_valid is None
        else jnp.minimum(-(-n_valid // R), NB).astype(jnp.int32)
    )
    # Span-contract detector (opt-in: SPEEDY_VALIDATE_SPAN=1). The
    # hierarchical select silently yields zeros for any row whose tiles
    # fall outside its sub-block's narrowed window; with the flag set,
    # violating LIVE blocks poison the whole output with NaN so contract
    # breaches fail loudly at the caller's quality gates instead of
    # shipping silent garbage. One extra elementwise pass over the
    # output, so off by default (the production planner guarantees the
    # contract by construction — see validate_span_contract for the
    # host-side eager check).
    poison = None
    if os.environ.get("SPEEDY_VALIDATE_SPAN", "0") == "1":
        sub_viol, blk_viol = _span_violations(geo, jnp)
        live = jnp.arange(NB, dtype=jnp.int32)[None, :] < nvb[:, None]
        bad = jnp.any((sub_viol | blk_viol) & live)
        poison = jnp.where(
            bad, jnp.asarray(np.nan, x.dtype), jnp.asarray(1.0, x.dtype)
        )

    from .wsola_fast import _cola_hann  # COLA window, host-exact

    win_rows = max(8, nt)
    win_np = _cola_hann(2 * hop, str(np.dtype(x.dtype)))
    win_pad = np.zeros((win_rows * 128,), win_np.dtype)
    win_pad[: 2 * hop] = win_np
    win2 = jnp.asarray(win_pad.reshape(win_rows, 128))

    # Per-utterance gain as a lane-broadcast row (ones when absent:
    # x * 1.0 == x bitwise, so the unconditional in-kernel multiply is
    # a no-op numerically and costs one VPU pass over the slab).
    # Shape [B, 8, 128]: Mosaic blocks need their last two dims 8x128.
    g_row = (
        jnp.ones((B, 8, 128), x.dtype)
        if gain is None
        else jnp.broadcast_to(
            gain.astype(x.dtype)[:, None, None], (B, 8, 128)
        )
    )

    # ONE fused pad builds the kernel's flat HBM view (the old column-pad
    # concat + flatten-append chain copied x through HBM twice per call):
    # the per-row tail covers the widest interp/selection read past L
    # (starts <= L-1, + width + the s1 lane), the g ghost zero rows at the
    # bottom cover the LAST row's span-DMA overrun (earlier rows' DMA fill
    # reads the next row's real samples — harmless: fill rows are
    # multiplied by 0.0 in the one-hot select and only need to be finite).
    Lp = -(-(L + width + 8) // 1024) * 1024
    g = -(-((w_rows + 8) * 128) // Lp)
    x2 = jnp.pad(x, ((0, g), (0, Lp - L))).reshape(-1, 128)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(
                (1, NB, TOTp // 128, 128), lambda b, *_: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, NB, TOTp // 128, 128), lambda b, *_: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, NB, TOTp // 128, 128), lambda b, *_: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (win_rows, 128), lambda b, *_: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 8, 128), lambda b, *_: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, w_rows, 128), x.dtype),
            pltpu.VMEM((8, 128), x.dtype),
            pltpu.VMEM((2, R * ts, 128), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _gather_synth_kernel, NB, R, SR, w_rows, w_sub_rows, nt, ts, hop,
        Lp // 128,
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, NB, R * ts, 128), x.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        # The unrolled NB loop keeps several [R*nt, 128] slab temporaries
        # live on Mosaic's scoped-VMEM stack; the 16 MB default is a bit
        # short at NB=8 production shapes.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
    )(
        nvb,
        (base_al // 128).astype(jnp.int32),
        rowoff.reshape(B, NB * SB),
        nrows,
        q8k,
        r7k,
        af_tm,
        win2,
        g_row,
        x2,
    )
    # T-major slot tiles -> [B, K, hop] without a transpose pass: slice
    # each tile's used lanes and concatenate along the sample axis.
    o = out.reshape(B, NB, ts, R, 128)
    pieces = [
        o[:, :, t, :, : min(128, hop - t * 128)] for t in range(ts)
    ]
    slots = jnp.concatenate(pieces, axis=-1) if ts > 1 else pieces[0][..., :hop]
    if poison is not None:
        slots = slots * poison
    return slots.reshape(B, NB * R, hop)[:, :K]


def validate_span_contract(
    starts: np.ndarray,
    width: int,
    rows_per_block: int,
    w_span: int,
    n_valid: Optional[np.ndarray] = None,
) -> None:
    """Eager, host-side check of gather_synth_block_pallas's span
    contract (same arithmetic as the wrapper, in numpy): raises
    ValueError naming the first violating (batch, block) if any LIVE
    block's starts overrun the span DMA or concentrate a 16-row
    sub-block's spread beyond its narrowed selection window. Use before
    dispatch in debug/bring-up paths; the in-graph equivalent is the
    SPEEDY_VALIDATE_SPAN=1 NaN-poison check."""
    starts = np.asarray(starts)
    B, K = starts.shape
    R = rows_per_block
    NB = -(-K // R)
    if NB * R != K:
        starts = np.concatenate(
            [starts, np.tile(starts[:, -1:], (1, NB * R - K))], axis=1
        )
    geo = _span_geometry(starts, width, R, w_span, np)
    live = np.ones((B, NB), bool)
    if n_valid is not None:
        nvb = np.minimum(-(-np.asarray(n_valid) // R), NB)
        live = np.arange(NB)[None, :] < nvb[:, None]
    sub_viol, blk_viol = _span_violations(geo, np)
    bad = (sub_viol | blk_viol) & live
    if bad.any():
        b, nb = np.argwhere(bad)[0]
        s2 = starts.reshape(B, NB, R)
        spread = int(s2[b, nb].max() - s2[b, nb].min())
        raise ValueError(
            f"span contract violated at batch {b}, block {nb}: row-start "
            f"spread {spread} (+width {width}) exceeds the w_span={w_span} "
            f"plan ({'sub-block window' if sub_viol[b, nb] else 'span DMA'} "
            f"overrun); raise max_speed_plan / w_span or use the per-row "
            f"gather path"
        )


def _gather_block_kernel(
    width,
    rows_per_block,
    w_rows,
    nt,
    length_rows,
    nvb_ref,
    bases_ref,
    q8k_ref,
    r7k_ref,
    x_ref,
    out_ref,
    scratch,
    sem,
):
    # One program per block of R consecutive rows: a single span DMA into
    # VMEM, then extraction of ALL R rows at once as 2D vector/MXU ops —
    # rows live in sublane groups of nt, so the per-row work that made
    # per-row kernels scalar-issue bound (~0.85 us/row) becomes lane-
    # parallel:
    #   1. tile select: one-hot [R*nt, w_rows] @ span [w_rows, 128] on the
    #      MXU (f32: one-hot times value is exact),
    #   2. lane shift by the 0..127 residual: 7-step barrel shift with
    #      per-sublane masks; the cross-tile carry is the next sublane
    #      (tile k+1 of the same row), exactly the existing roll+select
    #      trick batched over rows.
    b = pl.program_id(0)
    nb = pl.program_id(1)
    R = rows_per_block

    @pl.when(nb < nvb_ref[b])
    def _():
        s = b * length_rows + bases_ref[b, nb]  # in 128-lane rows, 8-aligned
        row = pl.multiple_of(s, 8)
        pltpu.make_async_copy(
            x_ref.at[pl.ds(row, w_rows), :], scratch, sem
        ).start()
        pltpu.make_async_copy(
            x_ref.at[pl.ds(0, w_rows), :], scratch, sem
        ).wait()
        q8k = q8k_ref[0, 0, :, :]  # [R*nt, 1] scratch row index per tile
        r7k = r7k_ref[0, 0, :, :]  # [R*nt, 1] 0..127 lane residual per row
        iota_rows = jax.lax.broadcasted_iota(jnp.int32, (R * nt, w_rows), 1)
        onehot = (iota_rows == q8k).astype(scratch.dtype)
        slab = jnp.dot(
            onehot,
            scratch[...],
            preferred_element_type=scratch.dtype,
            precision=jax.lax.Precision.HIGHEST,  # one-hot @ f32 is exact
        )  # [R*nt, 128]
        lane = jax.lax.broadcasted_iota(jnp.int32, (R * nt, 128), 1)
        for bit in range(7):
            sh = 1 << bit
            cur = pltpu.roll(slab, 128 - sh, 1)
            nxt = pltpu.roll(pltpu.roll(slab, R * nt - 1, 0), 128 - sh, 1)
            shifted = jnp.where(lane < 128 - sh, cur, nxt)
            slab = jnp.where((r7k & sh) != 0, shifted, slab)
        out_ref[0, 0, :, :] = slab


@functools.partial(
    jax.jit, static_argnames=("width", "rows_per_block", "w_span")
)
def gather_rows_block_pallas(
    x: jnp.ndarray,
    starts: jnp.ndarray,
    width: int,
    rows_per_block: int,
    w_span: int,
    n_valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Block-span gather: x[B, L], near-monotone starts[B, K] -> rows
    [B, K, width]. One ~w_span-sample DMA per rows_per_block rows plus
    fully lane-parallel in-VMEM extraction (see _gather_block_kernel) —
    ~4x the throughput of the per-row DMA kernel at production shapes.

    Requires max(starts) - min(starts) + width <= w_span within every
    block (the caller's speed-clamp contract); the base's 1024-alignment
    residual is absorbed by the extra 1024 samples + nt tiles built into
    w_rows below. Rows past n_valid[b] are garbage.
    """
    B, L = x.shape
    K = starts.shape[1]
    R = rows_per_block
    NB = -(-K // R)
    if NB * R != K:
        starts = jnp.concatenate(
            [starts, jnp.tile(starts[:, -1:], (1, NB * R - K))], axis=1
        )
    nt = (width + 127) // 128 + 1  # tiles per row incl. shift headroom
    s2 = starts.reshape(B, NB, R)
    base = jnp.min(s2, axis=2)
    base_al = (base // 1024) * 1024
    offs = (s2 - base_al[:, :, None]).astype(jnp.int32)  # < w_span + 1024
    q8 = offs // 128
    r7 = offs - q8 * 128
    ktile = jnp.arange(nt, dtype=jnp.int32)
    q8k = (q8[..., None] + ktile).reshape(B, NB, R * nt, 1)
    r7k = jnp.broadcast_to(r7[..., None], (B, NB, R, nt)).reshape(
        B, NB, R * nt, 1
    )
    nvb = (
        jnp.full((B,), NB, jnp.int32)
        if n_valid is None
        else jnp.minimum(-(-n_valid // R), NB).astype(jnp.int32)
    )

    # Sublane slices must be 8-aligned: round the span row count up.
    w_rows = -(-((w_span + 1024) // 128 + nt + 8) // 8) * 8
    # Flatten with per-utterance stride a multiple of 1024 and tail room
    # for the last block's span.
    Lp = -(-L // 1024) * 1024
    pad_cols = Lp - L
    xp = x if pad_cols == 0 else jnp.concatenate(
        [x, jnp.zeros((B, pad_cols), x.dtype)], axis=1
    )
    flat = xp.reshape(-1)
    flat = jnp.concatenate([flat, jnp.zeros((w_rows + 8) * 128, x.dtype)])
    x2 = flat.reshape(-1, 128)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, NB),
        in_specs=[
            pl.BlockSpec(
                (1, 1, R * nt, 1), lambda b, nb, *_: (b, nb, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, R * nt, 1), lambda b, nb, *_: (b, nb, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, R * nt, 128), lambda b, nb, *_: (b, nb, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((w_rows, 128), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(
        _gather_block_kernel, width, R, w_rows, nt, Lp // 128
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, NB, R * nt, 128), x.dtype),
        grid_spec=grid_spec,
    )(nvb, (base_al // 128).astype(jnp.int32), q8k, r7k, x2)
    rows = out.reshape(B, NB, R, nt * 128)[..., :width]
    return rows.reshape(B, NB * R, width)[:, :K]


@functools.lru_cache(maxsize=16)
def _pitch_kernel_matrices(taps: int, seg_w: int, minp: int, maxp: int,
                           M: int, n_lag_pad: int, dtype: str = "float32"):
    """Packed, zero-padded variants of _pitch_corr_matrices for the Pallas
    pitch kernel — one matrix per MXU matmul:
      EH [Hpad, 2nb] (Hpad = taps rounded up to 128): forward real DFT
        rows for samples 0..taps-1 ([cos | -sin]), zero rows above.
        Because the template IS the segment's first taps samples
        (wsola_fast: taps = maxp, seg_w = taps + maxp), EH serves DOUBLE
        duty: FA = head @ EH is the template DFT AND the head term of
        the segment DFT — FS = FA + tail @ ETL with the split exactly at
        sample taps. The old separate full-segment forward matmul
        ([seg_pad, 2nb] rows) is gone: ~20% of the kernel's MACs, the
        single largest matmul, for one lane-roll + one VPU add.
      ETL [Tpad, 2nb] (Tpad = seg_w - taps rounded up to 128): DFT rows
        for samples taps..seg_w-1; row i multiplies sample taps+i of the
        lane-rolled slab the kernel feeds it. Zero rows above kill both
        the roll's wraparound lanes and the slab's past-window samples.
      INV [2nb, n_lag_pad] (inverse DFT at the lags; cols beyond n_lags
        zero).
    The reference path's Band matrix (windowed lag energies + template
    energy) has NO kernel matrix anymore: its columns are banded 0/1
    sums, which the kernel computes as an in-VMEM lane prefix sum of the
    squared window plus two rolls (see _pitch_ssd_kernel) — the old
    [seg_pad, n_lag_pad] energy matmul was 25% of the kernel's MACs at
    HIGHEST for what is ~30 VPU passes hidden under the DFT matmuls.
    """
    from .wsola_fast import _pitch_corr_matrices

    nb = M // 2 + 1
    n_lags = maxp - minp + 1
    assert n_lag_pad >= n_lags + 1
    Ea, Es, Inv, _Band = _pitch_corr_matrices(taps, seg_w, minp, maxp, M, dtype)
    f = np.dtype(dtype).type
    z = lambda a, rows, cols: np.pad(
        a, ((0, rows - a.shape[0]), (0, cols - a.shape[1]))
    ).astype(f)
    Hpad = -(-taps // 128) * 128
    Tpad = -(-(seg_w - taps) // 128) * 128
    EH = z(Ea, Hpad, 2 * nb)  # Ea == Es[:taps] (same basis rows)
    ETL = z(Es[taps:seg_w], Tpad, 2 * nb)
    INV = z(Inv, 2 * nb, n_lag_pad)
    return EH, ETL, INV


def _pitch_cell_body(slab, taps, seg_w, n_lags, minp, n_lag_pad,
                     eh, etl, inv):
    """Shared pitch-SSD math on a VMEM-resident [GC, G] cell slab (gain
    already applied): packed split-complex DFT matmuls + lane prefix-sum
    lag energies + argmin/parabolic refine -> period [GC, 1]. Used by
    the standalone pitch kernel (pitch_ssd_pallas) and the fused
    analysis+pitch front-end (identical MACs in both)."""
    dt = slab.dtype
    G = slab.shape[1]
    hi = jax.lax.Precision.HIGHEST
    dot = lambda a, m: jnp.dot(a, m, preferred_element_type=dt, precision=hi)
    nb = eh.shape[1] // 2
    FA = dot(slab[:, : eh.shape[0]], eh[...])
    tail = pltpu.roll(slab, G - taps, 1)[:, : etl.shape[0]]
    FS = FA + dot(tail, etl[...])
    FAr, FAi = FA[:, :nb], FA[:, nb:]
    FSr, FSi = FS[:, :nb], FS[:, nb:]
    prod = jnp.concatenate(
        [FAr * FSr + FAi * FSi, FAr * FSi - FAi * FSr], axis=1
    )
    cc = dot(prod, inv[...])
    lane_g = jax.lax.broadcasted_iota(jnp.int32, slab.shape, 1)
    sq = jnp.where(lane_g < seg_w, slab * slab, jnp.zeros((), dt))
    cum = sq
    sh = 1
    while sh < G:
        # pltpu.roll rotates right: rolled[i] = cum[i - sh]
        cum = cum + jnp.where(lane_g >= sh, pltpu.roll(cum, sh, 1), 0.0)
        sh *= 2
    e_hi = pltpu.roll(cum, G - (minp + taps - 1), 1)[:, :n_lag_pad]
    e_lo = pltpu.roll(cum, G - (minp - 1), 1)[:, :n_lag_pad]
    e_lag = e_hi - e_lo  # [GC, n_lag_pad]; lanes >= n_lags are garbage
    e0 = jnp.sum(
        jnp.where(lane_g == taps - 1, cum, 0.0), axis=1, keepdims=True
    )
    lane = jax.lax.broadcasted_iota(jnp.int32, cc.shape, 1)
    big = jnp.asarray(3e38, dt)
    ssd = jnp.where(lane < n_lags, e_lag + e0 - 2.0 * cc, big)
    jmin = jnp.argmin(ssd, axis=1)
    jc = jnp.clip(jmin, 1, n_lags - 2)[:, None]  # [GC, 1]
    pick = lambda off: jnp.sum(
        jnp.where(lane == jc + off, ssd, 0.0), axis=1, keepdims=True
    )
    l_, m_, r_ = pick(-1), pick(0), pick(1)
    den = l_ - 2.0 * m_ + r_
    frac = jnp.where(jnp.abs(den) > 1e-12, 0.5 * (l_ - r_) / den, 0.0)
    return (minp + jc).astype(dt) + jnp.clip(frac, -0.5, 0.5)  # [GC, 1]


def _pitch_ssd_kernel(taps, seg_w, n_lags, minp, n_lag_pad,
                      x_ref, eh, etl, inv,
                      gain_ref, out_ref):
    """One program per GC grid cells: windowed SSD over the pitch lag
    range as split-complex DFT matmuls on the MXU with all matrices
    VMEM-resident (fetched once — constant block index across the grid),
    then argmin + 3-point parabolic refinement, emitting only the
    [GC] period estimates. The XLA formulation reads the ~80 MB window
    operand once per einsum; here x crosses HBM exactly once.

    The segment forward DFT is SPLIT at the template boundary:
    FS = FA + tail @ ETL, where FA = head @ EH is simultaneously the
    template DFT (the template is the segment's first taps samples).
    The tail operand is the slab lane-rolled by taps (multi-tile lane
    roll — probed exact on v5e, experiments/multitile_roll_probe.py);
    ETL's zero rows kill the wraparound lanes. Vs the old separate
    [seg_pad, 2nb]-row full-segment matmul this trades ~20% of the
    kernel's MACs (its single largest matmul) for one roll + one add;
    the FS summation order changes, so lag energies shift by ~2^-24
    relative — far below the near-silence argmin-tie noise the parity
    gates already absorb."""
    slab = x_ref[0]  # [GC, G] — cell g's window is its first seg_w lanes
    dt = slab.dtype
    # Per-utterance input gain applied in VMEM: multiplying the slab by
    # a scalar is element-for-element the same f32 multiply as
    # prescaling the HBM source, so period decisions match the prescaled
    # path while the padded source stays gain-free (loop-invariant
    # staging in serving scans — mirrors _gather_synth_kernel's gain).
    # The [1, 128] VMEM row is constant-valued; max() collapses it to the
    # scalar (Mosaic block shapes forbid a (1, 1) SMEM spec here).
    slab = slab * jnp.max(gain_ref[0, 0:1, :])
    # Windowed lag energies inside _pitch_cell_body use an in-VMEM lane
    # prefix sum instead of the old [seg_pad, n_lag_pad] 0/1-band matmul
    # (131k MACs/cell at HIGHEST, 25% of the kernel): e_lag(l) =
    # cum[l+taps-1] - cum[l-1] with cum the inclusive prefix sum of the
    # squared window, and both index ranges CONTIGUOUS in l — two lane
    # rolls extract them all. (The XLA-level cumsum form was a measured
    # dead end — jnp.cumsum lowers poorly and the einsum streams its
    # operand from HBM; here the squares live in VMEM and the 9-step
    # log-roll cumsum is ~30 VPU passes overlapped with the MXU DFTs.)
    # Summation order shifts energies ~2^-22 relative — near-silence
    # argmin ties can flip, absorbed by phase snapping like the
    # forward-split's 2^-24 shifts.
    period = _pitch_cell_body(
        slab, taps, seg_w, n_lags, minp, n_lag_pad, eh, etl, inv
    )  # [GC, 1]
    # Pack the GC per-cell periods LANE-DENSE into ceil(GC/128) output
    # rows (cell g -> row g // 128, lane g % 128) instead of broadcasting
    # each period across a full 128-lane row: the old [GC, 128] block was
    # a 128x output write amplification (~21 MB/step of pure padding at
    # production shapes). The transpose-free packing is the same masked
    # cross-sublane reduce the synthesis kernel's col() uses in reverse.
    GC = period.shape[0]
    sub_p = jax.lax.broadcasted_iota(jnp.int32, (GC, 128), 0)
    lane_p = jax.lax.broadcasted_iota(jnp.int32, (GC, 128), 1)
    P = jnp.broadcast_to(period, (GC, 128))
    out_ref[0, :, :] = jnp.zeros(out_ref.shape[1:], dt)
    for r in range(-(-GC // 128)):
        row = jnp.sum(
            jnp.where((sub_p == r * 128 + lane_p), P, 0.0),
            axis=0,
            keepdims=True,
        )
        out_ref[0, r : r + 1, :] = row


@functools.partial(
    jax.jit, static_argnames=("taps", "minp", "maxp", "gc_cells", "interpret")
)
def pitch_ssd_pallas(
    xg: jnp.ndarray,
    taps: int,
    minp: int,
    maxp: int,
    gc_cells: int = 128,
    interpret: bool = False,
    gain: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """xg [B, nc, G] (G a 128-multiple >= seg_w = taps + maxp; cell g's
    window = its first seg_w samples, zero-tailed past the signal) ->
    period [B, nc] float32: sub-sample pitch period per grid cell,
    identical math to wsola_fast's ssd_matmul + parabolic_min."""
    B, nc, G = xg.shape
    seg_w = taps + maxp
    assert G % 128 == 0 and G >= seg_w
    from .wsola_fast import _pitch_dft_size

    M = _pitch_dft_size(max(seg_w, taps + maxp))
    n_lags = maxp - minp + 1
    # +1: the template-energy column rides in lane n_lags of the packed
    # BANDC matrix (see _pitch_kernel_matrices).
    n_lag_pad = -(-(n_lags + 1) // 128) * 128
    GC = gc_cells  # grid cells per program (static; 128 and 256 measured equal)
    NC = -(-nc // GC)
    if NC * GC != nc:
        xg = jnp.concatenate(
            [xg, jnp.zeros((B, NC * GC - nc, G), xg.dtype)], axis=1
        )
    mats = _pitch_kernel_matrices(
        taps, seg_w, minp, maxp, M, n_lag_pad, str(np.dtype(xg.dtype))
    )
    mats = tuple(jnp.asarray(m) for m in mats)
    # Per-utterance gain as a lane-broadcast VMEM row (ones when absent:
    # x * 1.0 is bitwise x) — see _pitch_ssd_kernel.
    g_arr = (
        jnp.ones((B, 8, 128), xg.dtype)
        if gain is None
        else jnp.broadcast_to(
            gain.astype(xg.dtype)[:, None, None], (B, 8, 128)
        )
    )
    c0 = lambda b, cb: (0, 0)
    assert minp >= 1  # e_lo's roll reads cum[minp + lane - 1]
    # Periods come back lane-dense: ceil(GC/128) meaningful rows per
    # program, padded to the 8-sublane f32 tile (see _pitch_ssd_kernel).
    PR = -(-GC // 128)
    OR = max(8, -(-PR // 8) * 8)
    assert GC <= OR * 128
    out = pl.pallas_call(
        functools.partial(
            _pitch_ssd_kernel, taps, seg_w, n_lags, minp, n_lag_pad
        ),
        grid=(B, NC),
        in_specs=[
            pl.BlockSpec((1, GC, G), lambda b, cb: (b, cb, 0)),
            *[
                pl.BlockSpec(m.shape, c0)  # constant index: fetched once
                for m in mats
            ],
            pl.BlockSpec(
                (1, 8, 128), lambda b, cb: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec((1, OR, 128), lambda b, cb: (b, cb, 0)),
        out_shape=jax.ShapeDtypeStruct((B, NC * OR, 128), xg.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
    )(xg, *mats, g_arr)
    per = out.reshape(B, NC, OR, 128)[:, :, :PR, :].reshape(B, NC * PR * 128)
    if PR * 128 != GC:
        per = per.reshape(B, NC, PR * 128)[:, :, :GC].reshape(B, NC * GC)
    return per[:, :nc]


# ---------------------------------------------------------------------------
# Fused analysis front-end: waveform -> per-frame {energy, lsd}
# ---------------------------------------------------------------------------


def _analysis_geometry(window: int, step: int):
    """Static frame-extraction geometry for the fused analysis kernel.

    Integer-step analysis frames (soniclib.c:195,265-287: frame f covers
    [f*step, f*step+window)) repeat their lane phase every gf frames,
    where gf = lcm(step, 128) / step: frame (g*gf + p)'s window starts at
    row g*gr + (p*step)//128, lane (p*step) % 128 of a [rows, 128] view.
    That makes extraction a handful of STATIC strided slices + lane rolls
    — no gather, no one-hot select. Returns (gf, gr, nt, hb, n_g1) or
    None when the geometry is kernel-unfriendly (gf > 32 would unroll too
    many phases; hb > 384 overflows the split-re/im lane budget). n_g1 is
    the slab group count (groups of gf frames per chunk, incl. one
    leading group): 128 for the dense-phase rates (gf <= 8 — 16/24 kHz
    class, unchanged layout), shrunk to keep R = gf*n_g1 = 1024 slab rows
    for the sparse-phase rates (22.05 kHz: step 220 -> gf = 32, the
    reference's canonical config, speedy.c:213-215)."""
    g = np.gcd(step, 128)
    gf = 128 // g
    gr = step * gf // 128
    nt = -(-window // 128)
    hb = -(-(window + 1) // 128) * 128
    if gf > 32 or hb > 384 or window <= step:
        return None
    n_g1 = 128 if gf <= 8 else 1024 // gf
    env = os.environ.get("SPEEDY_ANALYSIS_NG1", "")
    if env and gf > 8:  # experiment knob for the sparse-phase slab size
        n_g1 = int(env)
    return gf, gr, nt, hb, n_g1


@functools.lru_cache(maxsize=16)
def _analysis_matrices(window: int, hb: int, nt: int, dtype: str = "float32"):
    """DFT basis + Hamming + bin-mask constants, mirroring ops/dft.py.

    E [nt*128, 2*hb]: rows = window-sample index (zero past `window`),
    lanes [0, hb) = cos basis, [hb, 2hb) = -sin basis for bins
    0..window (the real-input half of the reference's 2W-point FFT,
    speedy.c:438-454). ham [8, nt*128] row 0 = Hamming window
    (speedy.c:256-258). emask [8, hb] row 0 = 1.0 for bins 1..window-1
    (the energy / spectral-difference band, speedy.c:513-516,713-719)."""
    W = window
    n = np.arange(W, dtype=np.float64)[:, None]
    k = np.arange(W + 1, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * k * n / (2.0 * W)
    E = np.zeros((nt * 128, 2 * hb), np.float64)
    E[:W, :W + 1] = np.cos(ang)
    E[:W, hb : hb + W + 1] = -np.sin(ang)
    i = np.arange(W, dtype=np.float64)
    hamv = 0.54 - 0.46 * np.cos(2.0 * np.pi * i / (W - 1.0))
    ham = np.zeros((8, nt * 128), np.float64)
    ham[0, :W] = hamv
    emask = np.zeros((8, hb), np.float64)
    emask[0, 1:W] = 1.0
    f = np.dtype(dtype).type
    return E.astype(f), ham.astype(f), emask.astype(f)


def _analysis_kernel(
    NC, n_g1, gf, gr, nt, hb, W, step, chunk_rows, l_rows, prec, pitch,
    x_ref, E_ref, ham_ref, em_ref, *rest,
):
    """One grid program per utterance; NC chunks unrolled with double-
    buffered chunk DMAs. Per chunk (ng = n_g1 - 1 groups of gf frames,
    plus one LEADING group so every emitted frame's t-1 neighbor is in
    VMEM — chunk 0's leading group reads the gr zero rows the wrapper
    prepends, reproducing the reference's zero spectrogram for frame -1,
    speedy.c:242-248):
      1. window extraction: per (phase, tile) a strided sublane slice of
         the chunk + a static lane roll with row-carry select,
      2. preemphasis IN VMEM (exact f32): pre[i] = w[i] - 0.97*w[i-1];
         the cross-frame state entering each frame is the previous
         frame's last raw sample = window sample W-step-1 of the SAME
         frame (framing.py: overlapped-frame state-as-gather), frame 0's
         state is 0 (speedy.c:293,422-423),
      3. per-utterance gain on the windowed frames (fw * g, matching
         parallel/batch.py's prescale order bit-for-bit),
      4. DFT as two tile-split matmuls against the VMEM-resident
         split-re/im basis (fetched once: constant block index),
      5. magnitude / energy / 40 dB bin mask / L2-normalize / masked
         |log-ratio| vs frame t-1 — all on the VMEM slabs; only the
         [gf, ng] per-frame energy and lsd rows leave the core.

    With `pitch` set (the fused analysis+pitch front-end), each chunk
    additionally runs the pitch-SSD search for the grid cells whose
    windows the chunk's scratch slab already holds — the cell slab is
    RC strided sublane views of scratch (zero extra HBM traffic; the
    standalone pitch kernel's second full-input read is gone), the
    forward DFT is a row-tile split against _pitch_rowsplit_matrices,
    lag energies come from per-row lane prefix sums with cross-row
    carries, and per-cell periods pack lane-dense into a second output.
    """
    if pitch is None:
        gain_ref, out_ref, scratch, sems = rest
    else:
        (eh_ref, etl_ref, inv_ref, gain_ref, out_ref, out2_ref,
         scratch, sems) = rest
    b = pl.program_id(0)
    ng = n_g1 - 1
    R = gf * n_g1
    dt = scratch.dtype
    eps = jnp.asarray(2.220446049250313e-16, dt)
    lane = jax.lax.broadcasted_iota(jnp.int32, (n_g1, 128), 1)
    grow = jnp.broadcast_to(gain_ref[0, 0:1, :], (n_g1, 128))

    # Mosaic exposes only DEFAULT/HIGHEST dot precisions; HIGH (XLA's
    # 3-pass bf16 split, the analysis default — see dft.analysis_precision)
    # is implemented manually: A@B ~= Ah@Bh + Ah@Bl + Al@Bh with
    # X = Xh + Xl, Xh = trunc16(X) (fold-proof truncation split — see
    # _bf16_trunc_split). The E split happens ONCE per program
    # (constant across the chunk loop).
    if prec == "high":
        E_h, E_l = _bf16_trunc_split(E_ref[...], 2)

        def dft_dot(FW, t):
            sl = slice(t * 128, (t + 1) * 128)
            fh, fl = _bf16_trunc_split(FW, 2)
            d = lambda a, m: jnp.dot(a, m, preferred_element_type=dt)
            return d(fh, E_h[sl]) + d(fh, E_l[sl]) + d(fl, E_h[sl])

    else:
        hw_prec = (
            jax.lax.Precision.HIGHEST
            if prec == "highest"
            else jax.lax.Precision.DEFAULT
        )

        def dft_dot(FW, t):
            return jnp.dot(
                FW,
                E_ref[t * 128 : (t + 1) * 128, :],
                preferred_element_type=dt,
                precision=hw_prec,
            )

    def chunk_dma(c, slot):
        # Chunk origins 8-aligned (HBM (.,128) views need 8-row slices);
        # the residual rows land in d below.
        org = (c * ng * gr) // 8 * 8
        return pltpu.make_async_copy(
            x_ref.at[pl.ds(b * l_rows + org, chunk_rows), :],
            scratch.at[slot],
            sems.at[slot],
        )

    @pl.when(NC > 0)
    def _():
        chunk_dma(0, 0).start()

    if pitch is not None:
        out2_ref[0, :, :] = jnp.zeros(out2_ref.shape[1:], dt)

    for c in range(NC):
        slot = c % 2
        if c + 1 < NC:
            chunk_dma(c + 1, (c + 1) % 2).start()
        chunk_dma(c, slot).wait()
        d = c * ng * gr - (c * ng * gr) // 8 * 8  # 0..7 residual rows

        def row_view(r):
            # Rows d + r + g*gr for g in 0..n_g1-1, as a strided slice.
            q, rr = divmod(r, gr)
            v = scratch[slot, d + q * gr : d + q * gr + n_g1 * gr, :]
            return v.reshape(n_g1, gr, 128)[:, rr, :]

        fw_t = [[] for _ in range(nt)]
        w_prev_last = None
        for p in range(gf):
            lam = (p * step) % 128
            tiles = []
            for t in range(nt):
                r = (p * step + t * 128) // 128
                if lam == 0:
                    tiles.append(row_view(r))
                else:
                    cur = pltpu.roll(row_view(r), 128 - lam, 1)
                    nxt = pltpu.roll(row_view(r + 1), 128 - lam, 1)
                    tiles.append(jnp.where(lane < 128 - lam, cur, nxt))
            sl = W - step - 1  # state = prev frame's last raw sample
            st = tiles[sl // 128][:, sl % 128 : sl % 128 + 1]
            if c == 0 and p == 0:
                # Global frame 0 has zero preemphasis state. Slab row 1
                # is frame 0 (row 0 is the leading group's frame -gf).
                ri = jax.lax.broadcasted_iota(jnp.int32, (n_g1, 1), 0)
                st = jnp.where(ri == 1, jnp.zeros((), dt), st)
            coef = jnp.asarray(0.97, dt)
            for t in range(nt):
                sh = pltpu.roll(tiles[t], 1, 1)
                carry = (
                    jnp.broadcast_to(st, (n_g1, 128))
                    if t == 0
                    else jnp.broadcast_to(
                        tiles[t - 1][:, 127:128], (n_g1, 128)
                    )
                )
                pre = tiles[t] - coef * jnp.where(lane == 0, carry, sh)
                ham = jnp.broadcast_to(
                    ham_ref[0:1, t * 128 : (t + 1) * 128], (n_g1, 128)
                )
                fw_t[t].append(pre * ham * grow)
        reim = None
        for t in range(nt):
            FW = jnp.concatenate(fw_t[t], axis=0)  # [R, 128], p-major
            prod = dft_dot(FW, t)
            reim = prod if reim is None else reim + prod
        re, im = reim[:, :hb], reim[:, hb:]
        mag2 = re * re + im * im  # [R, hb]
        em = jnp.broadcast_to(em_ref[0:1, :], (R, hb))
        energy = jnp.sum(mag2 * em, axis=1, keepdims=True)  # [R, 1]
        mag = jnp.sqrt(mag2)
        th = jnp.max(mag * em, axis=1, keepdims=True) * 0.01
        nrm = mag * (1.0 / (jnp.sqrt(energy) + eps))
        e_cols, l_cols = [], []
        for p in range(gf):
            s = slice(p * n_g1, (p + 1) * n_g1)
            if p == 0:
                sl_ = slice((gf - 1) * n_g1, gf * n_g1)
                # Frame t-1 of phase 0 is phase gf-1, group g-1: shift
                # rows down by one (slab row 0 wraps junk; it is the
                # never-emitted leading row).
                m_l = pltpu.roll(mag[sl_], 1, 0)
                n_l = pltpu.roll(nrm[sl_], 1, 0)
            else:
                sl_ = slice((p - 1) * n_g1, p * n_g1)
                m_l, n_l = mag[sl_], nrm[sl_]
            m_c, n_c, t_c = mag[s], nrm[s], th[s]
            msk = (m_c > t_c) & (m_l > t_c) & (em[s] > 0)
            lr = jnp.abs(jnp.log((n_c + eps) / (n_l + eps)))
            l_cols.append(
                jnp.sum(jnp.where(msk, lr, jnp.zeros((), dt)), axis=1,
                        keepdims=True)
            )
            e_cols.append(energy[s])
        ecl = jnp.concatenate(e_cols + l_cols, axis=1)  # [n_g1, 2*gf]
        rows = jnp.swapaxes(ecl, 0, 1)  # [2*gf, n_g1]
        orows = 16 if gf <= 8 else 2 * gf
        out_ref[0, c * orows : c * orows + 2 * gf, :] = rows

        if pitch is None:
            continue
        RC, taps, seg_w, minp, n_lags, n_lag_pad, PRC, plan = pitch
        base, CPC = plan[c]
        if CPC <= 0:
            continue
        gscal = jnp.max(gain_ref[0, 0:1, :])
        view = scratch[slot, base : base + RC * CPC, :].reshape(CPC, RC, 128)
        # Cell k's G samples are scratch rows base+RC*k .. +RC-1: the RC
        # strided row views X[r] hold sample 128*r + lane of every cell.
        # (A lane-concat into the standalone kernel's [CPC, G] slab is
        # NOT Mosaic-legal here — the strided views carry sublane
        # offsets, "result/input offset mismatch on non-concat
        # dimension" — so the packed matmuls run tile-split instead:
        # dot(concat(a0, a1), M) == dot(a0, M0) + dot(a1, M1) exactly,
        # same MACs, no concat.)
        X = [view[:, r, :] * gscal for r in range(RC)]
        lane_c = jax.lax.broadcasted_iota(jnp.int32, (CPC, 128), 1)
        hi = jax.lax.Precision.HIGHEST
        dotp = lambda a, m: jnp.dot(
            a, m, preferred_element_type=dt, precision=hi
        )

        def flat_tile(s0):
            # [CPC, 128] holding flat cell samples s0 .. s0+127: aligned
            # row + static roll + lane-carry select (wraps zeros/garbage
            # only into lanes a zero basis row multiplies).
            r, off = divmod(s0, 128)
            if r >= RC:
                return jnp.zeros((CPC, 128), dt)
            if off == 0:
                return X[r]
            a_ = pltpu.roll(X[r], 128 - off, 1)
            b_ = pltpu.roll(
                X[r + 1] if r + 1 < RC else jnp.zeros((CPC, 128), dt),
                128 - off, 1,
            )
            return jnp.where(lane_c < 128 - off, a_, b_)

        # Forward DFTs, tile-split against the SAME packed matrices as
        # the standalone kernel (identical MAC count): FA over the head
        # tiles, FS = FA + roll-aligned tail tiles @ ETL tiles.
        FA = None
        for k in range(eh_ref.shape[0] // 128):
            t_ = dotp(X[k], eh_ref[k * 128 : (k + 1) * 128, :])
            FA = t_ if FA is None else FA + t_
        FS = FA
        for k in range(etl_ref.shape[0] // 128):
            if k * 128 >= seg_w - taps:
                break  # zero ETL rows from here on
            FS = FS + dotp(
                flat_tile(taps + k * 128),
                etl_ref[k * 128 : (k + 1) * 128, :],
            )
        nb2 = eh_ref.shape[1] // 2
        FAr, FAi = FA[:, :nb2], FA[:, nb2:]
        FSr, FSi = FS[:, :nb2], FS[:, nb2:]
        prod = jnp.concatenate(
            [FAr * FSr + FAi * FSi, FAr * FSi - FAi * FSr], axis=1
        )
        cc = dotp(prod, inv_ref[...])  # [CPC, n_lag_pad]
        # Windowed lag energies: per-row 7-step log-roll lane prefix
        # sums with cross-row carries (the standalone kernel's G-lane
        # cumsum in row layout; summation-order shifts ~2^-22 — the
        # argmin-tie class the parity gates absorb).
        cums = []
        carry = None
        for r in range(RC):
            sq = X[r] * X[r]
            if (r + 1) * 128 > seg_w:
                sq = jnp.where(
                    r * 128 + lane_c < seg_w, sq, jnp.zeros((), dt)
                )
            cum = sq
            sh = 1
            while sh < 128:
                cum = cum + jnp.where(
                    lane_c >= sh, pltpu.roll(cum, sh, 1), 0.0
                )
                sh *= 2
            if carry is not None:
                cum = cum + carry
            carry = cum[:, 127:128]
            cums.append(cum)

        def cum_window(s0):
            # tiles of cum_flat[s0 + j], j in [0, n_lag_pad)
            tiles = []
            for t_i in range(n_lag_pad // 128):
                sb = s0 + 128 * t_i
                rr = sb // 128
                off = sb - rr * 128
                if rr >= RC:
                    tiles.append(jnp.zeros((CPC, 128), dt))
                    continue
                if off == 0:
                    tiles.append(cums[rr])
                    continue
                a_ = pltpu.roll(cums[rr], 128 - off, 1)
                b_ = pltpu.roll(
                    cums[rr + 1]
                    if rr + 1 < RC
                    else jnp.zeros((CPC, 128), dt),
                    128 - off, 1,
                )
                tiles.append(jnp.where(lane_c < 128 - off, a_, b_))
            return jnp.concatenate(tiles, axis=1)

        e_lag = cum_window(minp + taps - 1) - cum_window(minp - 1)
        e0 = jnp.sum(
            jnp.where(
                lane_c == (taps - 1) % 128, cums[(taps - 1) // 128], 0.0
            ),
            axis=1,
            keepdims=True,
        )
        lane_l = jax.lax.broadcasted_iota(jnp.int32, cc.shape, 1)
        big = jnp.asarray(3e38, dt)
        ssd = jnp.where(lane_l < n_lags, e_lag + e0 - 2.0 * cc, big)
        jmin = jnp.argmin(ssd, axis=1)
        jc = jnp.clip(jmin, 1, n_lags - 2)[:, None]
        pick = lambda off: jnp.sum(
            jnp.where(lane_l == jc + off, ssd, 0.0), axis=1, keepdims=True
        )
        l_, m_, r_ = pick(-1), pick(0), pick(1)
        den = l_ - 2.0 * m_ + r_
        frac = jnp.where(jnp.abs(den) > 1e-12, 0.5 * (l_ - r_) / den, 0.0)
        period = (minp + jc).astype(dt) + jnp.clip(frac, -0.5, 0.5)
        # Lane-dense packing, as in _pitch_ssd_kernel.
        sub_p = jax.lax.broadcasted_iota(jnp.int32, (CPC, 128), 0)
        P_ = jnp.broadcast_to(period, (CPC, 128))
        for r in range(-(-CPC // 128)):
            row = jnp.sum(
                jnp.where(sub_p == r * 128 + lane_c, P_, 0.0),
                axis=0,
                keepdims=True,
            )
            out2_ref[0, c * PRC + r : c * PRC + r + 1, :] = row


@functools.partial(
    jax.jit,
    static_argnames=("num_frames", "window", "step", "precision",
                     "interpret", "pitch_geom"),
)
def analysis_energy_lsd_pallas(
    x: jnp.ndarray,
    num_frames: int,
    window: int,
    step: int,
    gain: Optional[jnp.ndarray] = None,
    precision=jax.lax.Precision.HIGHEST,
    interpret: bool = False,
    pitch_geom=None,
):
    """Fused analysis front-end: x[B, L] -> (energy[B, T], lsd[B, T]).

    Replaces the XLA chain frames -> preemphasis -> Hamming -> DFT ->
    magnitude -> energy / masked log-ratio (parallel/batch.py:80-160,
    mirroring speedy.c:416-525,649-739) with ONE pass over x: the
    [B, T, W] frame/spectrogram tensors (~1 GB/step of HBM traffic at
    production shapes) never exist — x crosses HBM once and only the
    two [B, T] per-frame vectors come back. Everything downstream of
    {energy, lsd} (LPF scans, hysteresis, skip gating, tension) is
    [B, T]-sized and stays in XLA.

    lsd[:, 0] is computed against the reference's zero frame -1 but its
    value is DON'T-CARE: the skip gate (speedy.c:685-703, `skipped =
    low_energy | t == 0`) zeroes it in every consumer.

    Geometry: integer-step frames only; supported when
    _analysis_geometry(window, step) is not None — the 16/24 kHz-class
    dense lattices (gf <= 8, 128-group slabs) AND the reference's
    canonical 22.05 kHz config (step 220 -> gf = 32 phases, 32-group
    slabs keeping R = 1024 slab rows; speedy.c:213-215).

    pitch_geom (optional, static): (taps, minp, maxp, G) — fuse the
    WSOLA pitch-grid SSD search into the same single pass over x (the
    pipeline's two largest stages each streamed the full input from HBM;
    fused, x crosses HBM once for both). G must match wsola_fast's grid
    stride (pitch_grid_stride). Returns (energy, lsd, periods[B, n_grid])
    with n_grid = ceil((L + seg_w) / G), period math identical to
    pitch_ssd_pallas up to fp summation order (see _analysis_kernel)."""
    geo = _analysis_geometry(window, step)
    assert geo is not None, (window, step)
    gf, gr, nt, hb, n_g1 = geo
    if not isinstance(precision, str):
        precision = {
            jax.lax.Precision.DEFAULT: "default",
            jax.lax.Precision.HIGH: "high",
            jax.lax.Precision.HIGHEST: "highest",
        }[precision]
    W = window
    B, L = x.shape
    dt = x.dtype
    ng = n_g1 - 1
    F = gf * ng  # frames per chunk
    NC = max(1, -(-num_frames // F))
    # Chunk c covers groups [c*ng - 1, c*ng + ng): rows c*ng*gr (8-aligned
    # down, residual re-added in-kernel) .. + chunk_rows. The slab must
    # hold EVERY strided row_view the kernel traces: view (q, rr) spans
    # slab rows d + q*gr .. + n_g1*gr with d up to 7 (the 8-alignment
    # residual) — computed exactly over the (phase, tile) lattice below.
    # (The old closed form under-counted by up to gr-1 rows for chunks
    # with d >= 4, a trace-time reshape failure first reachable at
    # NC >= 3 on the pitch-free path.)
    max_q = 0
    for p_ in range(gf):
        lam_ = (p_ * step) % 128
        for t_ in range(nt):
            r_ = (p_ * step + t_ * 128) // 128
            top = r_ if lam_ == 0 else r_ + 1
            max_q = max(max_q, top // gr)
    chunk_rows = -(-(max_q * gr + n_g1 * gr + 7) // 8) * 8
    # Out rows per chunk: [energy | lsd] = 2*gf rows (16 kHz class keeps
    # the historical 16-row stride; gf > 8 packs at its natural stride).
    orows = 16 if gf <= 8 else 2 * gf
    pitch = None
    mats_p = ()
    if pitch_geom is not None:
        taps, minp, maxp, G = pitch_geom
        from .wsola_fast import _pitch_dft_size

        seg_w = taps + maxp
        assert G % 128 == 0 and G >= seg_w and minp >= 1
        RC = G // 128
        M = _pitch_dft_size(max(seg_w, taps + maxp))
        nb = M // 2 + 1
        # Row-split matmuls want lane-tile-aligned DFT columns; the
        # caller gates on this (16 kHz-class M=510 -> 2nb=512).
        assert (2 * nb) % 128 == 0, M
        n_lags = maxp - minp + 1
        n_lag_pad = -(-(n_lags + 1) // 128) * 128
        n_grid = -(-(L + seg_w) // G)
        # Static per-chunk cell plan: chunk c owns cells starting before
        # sample (c+1)*F*step; every owned cell's RC window rows must sit
        # inside the chunk's scratch slab — grow chunk_rows until the
        # plan fits (the slack needed is ~gr + RC + 8 rows beyond the
        # analysis chunk; the extra DMA bytes are noise).
        while True:
            plan = []
            g0 = 0
            fits = True
            for c in range(NC):
                org = (c * ng * gr) // 8 * 8
                g1 = (
                    n_grid if c == NC - 1
                    else min(n_grid, -(-((c + 1) * F * step) // G))
                )
                g1 = max(g0, g1)
                base = gr + RC * g0 - org
                assert base >= 0
                if g1 > g0 and base + RC * (g1 - g0) > chunk_rows:
                    fits = False
                    break
                plan.append((base, g1 - g0))
                g0 = g1
            if fits:
                break
            chunk_rows += 8
        max_cpc = max(cpc for _, cpc in plan)
        PRC = max(1, -(-max_cpc // 128))
        pitch = (RC, taps, seg_w, minp, n_lags, n_lag_pad, PRC,
                 tuple(plan))
        mats_p = tuple(
            jnp.asarray(m)
            for m in _pitch_kernel_matrices(
                taps, seg_w, minp, maxp, M, n_lag_pad, str(np.dtype(dt))
            )
        )
    l_rows = -(-((NC - 1) * ng * gr + chunk_rows) // 8) * 8
    # Front pad of gr zero rows = the zero "frame -1" ring slot; tail pad
    # covers the last chunk's window overhang.
    pad_tail = l_rows * 128 - gr * 128 - L
    assert pad_tail >= 0
    x2 = jnp.pad(x, ((0, 0), (gr * 128, pad_tail))).reshape(-1, 128)
    E, ham, emask = _analysis_matrices(W, hb, nt, str(np.dtype(dt)))
    g_arr = (
        jnp.ones((B, 8, 128), dt)
        if gain is None
        else jnp.broadcast_to(gain.astype(dt)[:, None, None], (B, 8, 128))
    )
    kernel = functools.partial(
        _analysis_kernel, NC, n_g1, gf, gr, nt, hb, W, step, chunk_rows,
        l_rows, precision, pitch,
    )
    c0 = lambda b: (0, 0)
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(E.shape, c0),
        pl.BlockSpec(ham.shape, c0),
        pl.BlockSpec(emask.shape, c0),
        *[pl.BlockSpec(m.shape, c0) for m in mats_p],
        pl.BlockSpec((1, 8, 128), lambda b: (b, 0, 0)),
    ]
    out_specs = pl.BlockSpec((1, NC * orows, n_g1), lambda b: (b, 0, 0))
    out_shape = jax.ShapeDtypeStruct((B, NC * orows, n_g1), dt)
    if pitch is not None:
        PRC = pitch[6]
        out_specs = (
            out_specs,
            pl.BlockSpec((1, NC * PRC, 128), lambda b: (b, 0, 0)),
        )
        out_shape = (
            out_shape,
            jax.ShapeDtypeStruct((B, NC * PRC, 128), dt),
        )
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, chunk_rows, 128), dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
    )(x2, jnp.asarray(E), jnp.asarray(ham), jnp.asarray(emask), *mats_p,
      g_arr)
    if pitch is not None:
        out, out2 = out
        per2 = out2.reshape(B, NC, PRC * 128)
        periods = jnp.concatenate(
            [per2[:, c, :cpc] for c, (_, cpc) in enumerate(pitch[7])
             if cpc > 0],
            axis=1,
        )
    # Unpack [B, NC, orows, n_g1]: frame (c*ng + g - 1)*gf + p lives at
    # [b, c, p, g] (energy) / [b, c, gf + p, g] (lsd), g in 1..ng.
    o = out.reshape(B, NC, orows, n_g1)
    T = num_frames

    def unpack(rows):
        v = o[:, :, rows : rows + gf, 1:]  # [B, NC, gf, ng]
        v = jnp.swapaxes(v, 2, 3).reshape(B, NC * F)
        return v[:, :T]

    if pitch is not None:
        return unpack(0), unpack(gf), periods
    return unpack(0), unpack(gf)
