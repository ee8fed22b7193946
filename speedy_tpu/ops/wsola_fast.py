"""Grid-parallel WSOLA: the TPU-native fast path for batched resynthesis.

The sonic-exact engine (ops.wsola) walks the waveform pitch-period by
pitch-period — inherently sequential (~L/P scan steps). This module
restructures time-scale modification so almost everything is parallel:

  1. TIME MAP (parallel): per-frame speeds give the output clock
     o(x) = integral dx/s(x), piecewise linear over analysis frames;
     prefix sums + searchsorted invert it, yielding each output chunk's
     nominal source position c_k on a FIXED synthesis grid k*Hs.
  2. PITCH (parallel, gather-free): local pitch measured on a REGULAR
     input grid whose overlapping windows are built from strided reshapes
     (zero gather), then looked up per chunk with a scalar gather. The
     squared-difference (SSD) argmin over lags [fs/400, fs/65] expands as
     E0 + E(d) - 2*CC(d): sliding energies from one cumsum, correlations
     from zero-padded FFTs — refined to SUB-SAMPLE precision by parabolic
     interpolation of the SSD minimum (splice phase error scales with
     period error x periods wrapped; the Teager gates need ~0.05-sample
     accuracy).
  3. PHASE SNAP (closed form): the alignment recurrence telescopes to
     a_k = c_k + wrap(c_0 + k*Hs - c_k, P_k) — fully parallel, bounded
     non-compounding drift <= P_k/2.
  4. SYNTHESIS (parallel): Hann-windowed chunks of width 2*Hs gathered at
     fractional a_k (linear interpolation), overlap-added on the fixed
     grid — 50% overlap OLA is two half-slot adds, no scatter. Slot 0 is
     emitted unwindowed (no blend partner; the reference has no fade-in).

Everything is natively batched over utterances ([B, L] in, [B, cap] out):
vmapping the batch-grouped conv would materialize a cross-product (OOM),
and batching by hand also lets the phase scan amortize across B.

For constant speed this reduces to near-exact passthrough of the
time-scaled signal (COLA window sums to 1). Quality is held to the same
contracts as the sonic-exact engine (length ±1.5%, Teager mean ±1% and
rel-sigma < 1%, DTW warp slope) by the shared test suite — measured
Teager rel-sigma is ~2x BETTER than the reference engine's.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SpeedyConfig
from .wsola import WsolaResult


# f32 matmul accumulation for the pitch SSD. Measured: HIGH (bf16x3) is
# ~7% SLOWER than HIGHEST end-to-end on v5e at these shapes and shifts
# ~0.02% of periods by >0.1 samples — HIGHEST wins on both axes.
_PITCH_PRECISION = jax.lax.Precision.HIGHEST

# NOTE on a measured dead end: a hierarchical pitch search (coarse SSD on
# a 2x-decimated signal + exact 12-lag full-rate refinement around the
# top-2 coarse minima, windows fetched via the block-span gather) was
# 23% SLOWER end-to-end than the dense MXU SSD below AND picked a
# 2-3x-worse splice on ~2% of real-speech cells (decimation re-ranks
# competing harmonic minima). Dense matmul on the MXU wins.


@functools.lru_cache(maxsize=16)
def _cola_hann(width: int, dtype: str = "float32") -> np.ndarray:
    """Offset Hann: w[i] + w[i + width/2] == 1 exactly, w > 0 everywhere."""
    i = np.arange(width, dtype=np.float64) + 0.5
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * i / width)).astype(dtype)


def _pitch_dft_size(req: int) -> int:
    """Smallest even DFT length M >= req whose real-bin count
    nb = M//2 + 1 is a 128-multiple. The DFT is a MATMUL (not an FFT),
    so M needs no special factorization — and the matmuls' lane dimension
    is nb, so aligning nb (not M) is what avoids Mosaic/XLA padding the
    [.., 2nb] DFT products up to the next 128 tile (M=512 gives nb=257 ->
    lanes padded ~25-49%; M=510 gives nb=256 exactly)."""
    nb = -(-(-(-req // 2) + 1) // 128) * 128
    return 2 * nb - 2


@functools.lru_cache(maxsize=16)
def _pitch_corr_matrices(
    taps: int, seg_w: int, minp: int, maxp: int, M: int, dtype: str = "float32"
):
    """Matrices that turn the pitch SSD into three MXU matmuls.

    The linear cross-correlation cc[l] = sum_i a0[i]*seg[i+l] (l in
    [minp, maxp]) equals the M-point circular correlation when
    M >= max(seg_w, taps + maxp): the largest seg index touched is
    (taps-1) + maxp, so no product wraps around, and the forward DFT
    just needs M >= seg_w to hold the zero-padded window. (M >= seg_w +
    taps — the classic full-linear-convolution bound — is NOT required:
    only lags [minp, maxp] are read, never the aliased negative lags.)
    A real DFT of length M is a pair of [len, 2*(M/2+1)] matmuls — the same
    DFT-as-matmul trick as the front-end spectrogram (ops/dft.py), chosen
    because XLA's TPU FFT lowering runs ~7x slower than the MXU on these
    shapes (measured 67 ms vs 10 ms per production batch).

    Returns (Ea [taps, 2nb], Es [seg_w, 2nb], Inv [2nb, n_lags],
    Band [seg_w, n_lags+1]) with nb = M//2+1:
      FA = a0 @ Ea, FS = seg @ Es               (forward real DFTs)
      cc = [Re(conj(FA)FS) | Im(...)] @ Inv     (inverse DFT at the lags)
      [e_lag | e0] = seg^2 @ Band               (windowed energies; replaces
                                                 the cumsum+slice form)
    """
    assert M >= max(seg_w, taps + maxp)
    nb = M // 2 + 1
    n_lags = maxp - minp + 1
    n = np.arange(M, dtype=np.float64)
    k = np.arange(nb, dtype=np.float64)
    ang = 2.0 * np.pi * np.outer(n, k) / M
    Ea = np.concatenate([np.cos(ang[:taps]), -np.sin(ang[:taps])], axis=1)
    Es = np.concatenate([np.cos(ang[:seg_w]), -np.sin(ang[:seg_w])], axis=1)
    lag = np.arange(minp, maxp + 1, dtype=np.float64)
    angl = 2.0 * np.pi * np.outer(k, lag) / M
    w = np.full((nb, 1), 2.0)
    w[0] = 1.0
    if M % 2 == 0:
        w[-1] = 1.0
    # irfft(Y)[l] = (1/M) sum_k w_k (Re Y[k] cos(2pi k l/M) - Im Y[k] sin(...))
    Inv = np.concatenate([w * np.cos(angl) / M, -w * np.sin(angl) / M], axis=0)
    Band = np.zeros((seg_w, n_lags + 1))
    for j in range(n_lags):
        Band[minp + j : minp + j + taps, j] = 1.0
    Band[:taps, n_lags] = 1.0
    f = np.dtype(dtype).type
    return Ea.astype(f), Es.astype(f), Inv.astype(f), Band.astype(f)


def _gather_rows(
    x: jnp.ndarray,
    starts: jnp.ndarray,
    width: int,
    n_valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """x[B, Lp], starts[B, K] -> rows[B, K, width]: Pallas DMA kernel on
    TPU (~3x the throughput of XLA's gather lowering), vmapped dynamic
    slices elsewhere. Rows beyond n_valid[b] may return garbage (their
    DMAs are skipped — capacity is planned for worst-case speed 1.0, so
    at a 3.5x speedup this skips ~70% of the issue cost)."""
    from .pallas_kernels import gather_rows

    return gather_rows(x, starts, width, n_valid)


def _gather_rows_spans(
    x: jnp.ndarray,
    starts: jnp.ndarray,
    width: int,
    span_rows: int,
    w_span: int,
    n_valid_rows: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Block-span row gather: the fast path for sorted-ish starts.

    The per-row DMA kernel is issue-rate bound (~0.85 us/row on v5e
    regardless of design — see pallas_kernels.py), so instead fetch ONE
    aligned span of w_span samples per block of span_rows consecutive
    rows (span_rows x fewer DMAs) and extract the rows from the spans with
    dense, fully vectorized XLA ops:

      1. superblock select: one-hot [R, nsb] @ overlapped 1536-wide views
         of the span (exact f32 matmul — one-hot times value is lossless),
      2. two radix-8 shift levels (128- and 16-sample) as where-masked
         static slices,
      3. a 4-step barrel shift for the final 0..15 lanes.

    Correctness requires max(starts) - min(starts) + width <= w_span
    within every block; callers guarantee it by clamping speeds to the
    static plan bound (the same planner contract as min_speed_bound).
    n_valid_rows [B]: blocks entirely past it are skipped (no DMA);
    their rows return unspecified values.
    """
    assert w_span % 1024 == 0
    from .pallas_kernels import gather_rows, gather_rows_block_pallas

    if jax.default_backend() == "tpu":
        # One span DMA per block + fully lane-parallel in-VMEM extraction.
        return gather_rows_block_pallas(
            x, starts, width, span_rows, w_span, n_valid_rows
        )
    B, K = starts.shape
    R = span_rows
    NB = -(-K // R)
    if NB * R != K:
        starts = jnp.concatenate(
            [starts, jnp.tile(starts[:, -1:], (1, NB * R - K))], axis=1
        )
    s2 = starts.reshape(B, NB, R)
    base = jnp.min(s2, axis=2)  # [B, NB]
    offs = (s2 - base[:, :, None]).astype(jnp.int32)
    nvb = None
    if n_valid_rows is not None:
        nvb = jnp.minimum(-(-n_valid_rows // R), NB).astype(jnp.int32)
    # Spans may run past the padded signal end (base is clipped to the
    # valid region but base + w_span need not be): give the slice room so
    # the CPU fallback's dynamic_slice never shifts its start.
    x = jnp.concatenate([x, jnp.zeros((B, w_span), x.dtype)], axis=1)
    spans = gather_rows(x, base, w_span, nvb)  # [B, NB, w_span]

    dtype = x.dtype
    nsb = w_span // 1024
    # Level widths, innermost out: the barrel consumes shifts < 16 (plus
    # its own <=15-lane wrap margin), level C consumes 7*16, level B
    # 7*128, level A the 1024-aligned superblock index.
    w3 = -(-(width + 15) // 16) * 16 + 16
    w2 = 7 * 16 + w3
    w1 = 7 * 128 + w2
    v_extra = max(512, -(-(w1 - 1024) // 128) * 128)
    assert v_extra <= 1024, f"row width {width} too large for 1024-superblocks"
    sp_pad = jnp.concatenate([spans, jnp.zeros((B, NB, 1024), dtype)], axis=-1)
    Vl = sp_pad.reshape(B, NB, nsb + 1, 1024)
    V = jnp.concatenate([Vl[:, :, :nsb], Vl[:, :, 1:, :v_extra]], axis=-1)

    qA = offs // 1024
    rA = offs - qA * 1024
    onehotA = (qA[..., None] == jnp.arange(nsb, dtype=jnp.int32)).astype(dtype)
    slabA = jnp.einsum(
        "bnrj,bnjc->bnrc", onehotA, V, precision=jax.lax.Precision.HIGHEST
    )[..., :w1]  # [B, NB, R, w1]

    qB = rA // 128
    rB = rA - qB * 128
    slabB = sum(
        jnp.where(
            (qB == j)[..., None],
            jax.lax.slice_in_dim(slabA, j * 128, j * 128 + w2, axis=-1),
            jnp.zeros((), dtype),
        )
        for j in range(8)
    )  # [B, NB, R, w2]

    qC = rB // 16
    rC = rB - qC * 16
    slabC = sum(
        jnp.where(
            (qC == j)[..., None],
            jax.lax.slice_in_dim(slabB, j * 16, j * 16 + w3, axis=-1),
            jnp.zeros((), dtype),
        )
        for j in range(8)
    )  # [B, NB, R, w3]

    slab = slabC
    for bit in range(4):
        sh = 1 << bit
        rolled = jnp.roll(slab, -sh, axis=-1)
        slab = jnp.where((rC & sh)[..., None] != 0, rolled, slab)
    return slab[..., :width].reshape(B, NB * R, width)[:, :K]


@functools.partial(
    jax.jit,
    static_argnames=(
        "min_period",
        "max_period",
        "frame_step",
        "hop",
        "capacity",
        "num_chunks",
        "max_speed_plan",
        "span_rows",
        "mask_output",
        "return_period",
        "debug_stage",
    ),
)
def _wsola_grid_batch(
    xs: jnp.ndarray,
    input_lengths: jnp.ndarray,
    speeds: jnp.ndarray,
    min_period: int,
    max_period: int,
    frame_step: int,
    hop: int,
    capacity: int,
    num_chunks: int,
    xs_channels: Optional[jnp.ndarray] = None,
    max_speed_plan: Optional[float] = None,
    # 128-row span blocks: the knee moved after the lane-dense control
    # packing removed the old per-block fixed cost (round-1 sweep at the
    # 85k level chose 64; with dense controls: 64 -> 166.2k,
    # 128 -> 172.4k, and with B=128 -> 176.3k audio-s/s/chip;
    # experiments/synth_sweep.py has the standalone-block numbers).
    span_rows: int = 128,
    in_offset: Optional[jnp.ndarray] = None,
    out_shift: Optional[jnp.ndarray] = None,
    phase_ref: Optional[jnp.ndarray] = None,
    mask_output: bool = True,
    return_period: bool = False,
    gain: Optional[jnp.ndarray] = None,
    debug_stage: Optional[str] = None,
    period_grid: Optional[jnp.ndarray] = None,
) -> WsolaResult:
    """xs[B, L], input_lengths[B], speeds[B, F] -> WsolaResult with
    output[B, capacity], valid_length[B].

    xs_channels [B, C, L] (optional): synthesize each channel with the
    mono-derived pitch/positions (the multichannel contract of the
    reference shim — identical channels produce identical outputs);
    output becomes [B, C, capacity].

    max_speed_plan (static, optional): planner bound on instantaneous
    speed. When set, speeds are clamped to it (the ceiling analog of the
    engine's min_speed_bound floor) and synthesis uses the block-span
    gather (_gather_rows_spans) whose span width it sizes — the TPU fast
    path. When None, the per-row gather is used and speeds are unbounded.

    Streaming-continuation hooks (streaming_device.py; all default to the
    single-shot behavior):
      in_offset [B]:  sample position of speed-frame 0 within xs (the
                      segment buffer carries a left margin);
      out_shift [B]:  output-clock offset of local chunk 0 relative to
                      the passed frames' output start (local chunk j sits
                      at output out_shift + j*hop of the passed frames);
      phase_ref [B]:  phase-snap reference replacing c[:, :1], so the
                      wrap alignment continues the previous segment's
                      global clock instead of restarting;
      mask_output:    False returns every computed slot un-zeroed (the
                      caller owns trimming; valid_length is still the
                      local time-map estimate);
      return_period:  True additionally returns the per-chunk pitch
                      period [B, K] (the streaming pipeline snaps its
                      phase-reference re-basing to an exact period
                      multiple of the segment-boundary chunk);
      debug_stage:    profiling hook (experiments/inprog_pipeline.py):
                      'timemap' | 'pitch' | 'phase' returns a scalar
                      checksum of that stage's outputs instead of a
                      WsolaResult, so cumulative-prefix timing bisects
                      the PRODUCTION code (XLA DCEs everything after the
                      checksum) without a drifting re-implementation.
      gain [B]:       per-utterance input scale, equivalent to passing
                      xs * gain[:, None] up to fp rounding but with no
                      standalone [B, L] materialization: the pitch path
                      folds it into the pitch-grid build (mandatory
                      copy), and the fused synthesis kernel applies it
                      in VMEM post-selection — keeping the padded HBM
                      source gain-free, so serving scans hoist the pad
                      as loop-invariant staging (sonicSetVolume-style
                      input gain at zero bandwidth cost)."""
    dtype = xs.dtype
    B, L = xs.shape
    g_row = None if gain is None else gain.astype(dtype).reshape(B, 1)
    xs_g = xs if g_row is None else xs * g_row
    if max_speed_plan is not None:
        speeds = jnp.minimum(speeds, jnp.asarray(max_speed_plan, dtype))
    K = num_chunks
    Hs = hop
    Wn = 2 * Hs
    maxp, minp = max_period, min_period
    n_frames = speeds.shape[1]
    taps = maxp
    # Synthesis positions are clipped to [0, L-1] below, so no front
    # padding is ever read: the fused TPU path hands RAW xs_g to
    # gather_synth_block_pallas, whose single fused jnp.pad builds the
    # kernel's flat HBM view directly (the old x_pad concat + the
    # wrapper's flatten-append chain cost two extra full HBM copies of x
    # per step). The XLA fallback builds its padded buffer inside synth()
    # (only traced on the branch actually taken).
    pad_front = maxp
    lens_f = input_lengths.astype(dtype)

    # ---- 1. time map ----
    inv_s = jnp.asarray(frame_step, dtype) / speeds  # [B, F]
    obnd = jnp.concatenate(
        [jnp.zeros((B, 1), dtype), jnp.cumsum(inv_s, axis=1)], axis=1
    )  # [B, F+1]
    total_frames = jnp.clip(input_lengths // frame_step, 0, n_frames)
    tail = (input_lengths - total_frames * frame_step).astype(dtype)
    last_speed = jnp.take_along_axis(
        speeds, jnp.clip(total_frames, 0, n_frames - 1)[:, None], axis=1
    )[:, 0]
    out_len = (
        jnp.take_along_axis(obnd, total_frames[:, None], axis=1)[:, 0]
        + tail / last_speed
    )
    valid = jnp.minimum(jnp.round(out_len).astype(jnp.int32), capacity)

    p = jnp.arange(K, dtype=dtype) * Hs  # output grid positions [K]
    p_b = p[None, :] + (
        out_shift[:, None].astype(dtype) if out_shift is not None else 0.0
    )  # [B, K]
    # Invert the monotone time map: frame f owns output positions in
    # [obnd[f], obnd[f+1]), the last frame also owns the tail. A fused
    # compare-select-reduce over the frame axis replaces searchsorted +
    # two take_along_axis (XLA's sort/gather lowerings cost ~15 ms/batch
    # here; the banded reduce fuses to ~2 ms and never materializes the
    # [B, K, F] mask).
    lo = obnd[:, None, :-1]  # [B, 1, F]
    hi_b = obnd[:, None, 1:]
    pk = p_b[:, :, None]
    sel = (lo <= pk) & ((pk < hi_b) | (jnp.arange(n_frames) == n_frames - 1))
    sp_f = jnp.sum(jnp.where(sel, speeds[:, None, :], 0), axis=-1)
    ob_f = jnp.sum(jnp.where(sel, lo, 0), axis=-1)
    fidx = jnp.sum(jnp.where(sel, jnp.arange(n_frames, dtype=dtype), 0), axis=-1)
    c = fidx * frame_step + (p_b - ob_f) * sp_f  # [B, K]
    if in_offset is not None:
        c = c + in_offset[:, None].astype(dtype)
    c = jnp.clip(c, 0.0, jnp.maximum(lens_f - 1.0, 0.0)[:, None])
    if debug_stage == "timemap":
        return jnp.sum(c) + jnp.sum(valid).astype(dtype)

    seg_w = taps + maxp
    # Pitch grid stride: the smallest 128-multiple >= max(3*Hs, seg_w) —
    # one estimate per ~30 ms (512 samples @16 kHz). Pitch varies slowly:
    # measured at 30 ms vs the earlier 20 ms grid, Teager margins at
    # rates 0.4-3.5, real-speech splice-disagreement, and every Teager/
    # DTW/varying-speed gate are identical (experiments/pitch_grid_G.py,
    # pitch_grid_splice.py). G >= seg_w makes the windows non-overlapping
    # pure slice views of a strided reshape (no concat — the old 2-view
    # concat materialized ~125 MB/step), and 128 | G keeps the reshape
    # lane-aligned so XLA fuses the views into the DFT einsums.
    G = -(-max(3 * Hs, seg_w) // 128) * 128  # G >= seg_w by construction
    # Cell count rounded up to the pitch kernel's GC program size so its
    # internal padding is a no-op (otherwise it would concat-copy the
    # whole grid); the extra zero cells cost ~1 MB of the pad that builds
    # xs_pitch anyway, and g_idx below is clipped to the REAL cell range.
    # The rounding follows SPEEDY_PITCH_GC so GC sweeps are FAIRLY
    # pre-rounded (the round-3 lesson: a grid rounded for GC=64 makes
    # GC=128 pay a per-step pad copy). At 22.05 kHz the default GC=64
    # rounds 288 real cells to 320 (+11% dead pitch work); GC=32 is
    # exact there — see the 22 kHz knee sweep in the ledger.
    n_grid = -(-(L + seg_w) // G)  # real cells (g_idx clip bound)
    _gc = int(os.environ.get("SPEEDY_PITCH_GC", "64"))
    n_cells = -(-n_grid // _gc) * _gc
    # Pitch reads x from sample 0 (x_pad's front padding is synthesis
    # back-reach only): pad xs directly so the reshape stays tile-aligned.
    # Branch decided BEFORE the grid build: the kernel path pads RAW xs
    # (gain applied in-VMEM by the kernel), so the padded pitch grid is
    # loop-invariant staging in serving scans, exactly like the
    # synthesis kernel's padded source; the einsum path keeps the
    # prescaled build (gain fused into this mandatory copy).
    force_pitch = os.environ.get("SPEEDY_FORCE_PITCH_KERNEL", "")
    on_tpu_p = jax.default_backend() == "tpu"
    kernel_pitch = on_tpu_p or force_pitch == "interpret"
    if period_grid is None:
        xs_pitch = jnp.concatenate(
            [xs if kernel_pitch else xs_g,
             jnp.zeros((B, n_cells * G - L), dtype)], axis=1
        )
        y = xs_pitch.reshape(B, n_cells, G)
        seg = y[:, :, :seg_w]  # [B, n_grid, seg_w] — slice view, no copy
    def ssd_matmul(seg_c, a_taps, lag_lo, lag_hi, prec):
        """SSD(d) for d in [lag_lo, lag_hi] over seg_c [B, Gc, w] with the
        template = first a_taps samples, as DFT matmuls on the MXU (see
        _pitch_corr_matrices) — XLA's TPU FFT lowering is ~7x slower."""
        w = seg_c.shape[-1]
        M = _pitch_dft_size(max(w, a_taps + lag_hi))
        nb = M // 2 + 1
        nl = lag_hi - lag_lo + 1
        mats = _pitch_corr_matrices(
            a_taps, w, lag_lo, lag_hi, M, np.dtype(dtype).name
        )
        Ea, Es, Inv, Band = (jnp.asarray(m) for m in mats)
        a0 = seg_c[..., :a_taps]
        FA = jnp.einsum("bgt,tk->bgk", a0, Ea, precision=prec)
        FS = jnp.einsum("bgt,tk->bgk", seg_c, Es, precision=prec)
        AR, AI = FA[..., :nb], FA[..., nb:]
        SR, SI = FS[..., :nb], FS[..., nb:]
        # conj(FA)*FS as Re/Im einsums (measured equal to the single
        # concatenated-product einsum — XLA fuses either form; kept split
        # as the simpler expression of the complex arithmetic).
        cc = jnp.einsum(
            "bgk,kl->bgl", AR * SR + AI * SI, Inv[:nb], precision=prec
        ) + jnp.einsum(
            "bgk,kl->bgl", AR * SI - AI * SR, Inv[nb:], precision=prec
        )
        E = jnp.einsum("bgt,tl->bgl", seg_c * seg_c, Band, precision=prec)
        return E[..., nl:] + E[..., :nl] - 2.0 * cc

    def parabolic_min(ssd, lag_lo, j_hi):
        jmin = jnp.argmin(ssd, axis=-1)
        jc = jnp.clip(jmin, 1, j_hi)
        take = lambda off: jnp.take_along_axis(
            ssd, (jc + off)[..., None], axis=2
        )[..., 0]
        l, m, r = take(-1), take(0), take(1)
        denom = l - 2.0 * m + r
        frac = jnp.where(jnp.abs(denom) > 1e-12, 0.5 * (l - r) / denom, 0.0)
        return (lag_lo + jc).astype(dtype) + jnp.clip(frac, -0.5, 0.5)

    # Production pitch on TPU: the Pallas kernel with VMEM-resident DFT
    # matrices (pallas_kernels.pitch_ssd_pallas). An earlier round
    # measured it EQUAL to the einsums — but that was with M=512 (nb=257,
    # Mosaic pads the DFT-product lanes 257->384, +33% FLOPs); with the
    # nb-lane-aligned M=510 the kernel reads x across HBM exactly once
    # and wins 3.03 vs 3.98 ms/step at the B=96 bench point (GC=64 knee;
    # experiments/pitch_kernel_vs_einsum.py). Period decisions agree with
    # the einsum path on every strongly-voiced cell; near-silence cells
    # flip argmin ties under fp noise, which phase snapping absorbs (any
    # period multiple aligns phase). The einsum path remains the
    # off-TPU/reference formulation; SPEEDY_FORCE_PITCH_KERNEL=interpret
    # routes the kernel through interpret mode for hermetic coverage.
    if period_grid is not None:
        # Precomputed by the fused analysis+pitch front-end kernel
        # (pallas_kernels.analysis_energy_lsd_pallas with pitch_geom):
        # the caller guarantees it was built with THIS G (same
        # pitch_grid_stride) over the same xs, so the cell indexing
        # below is identical. Whole-utterance single-shot callers only
        # (streaming continuations keep the in-engine pitch path).
        pass
    elif kernel_pitch:
        from .pallas_kernels import pitch_ssd_pallas

        period_grid = pitch_ssd_pallas(
            y, taps, minp, maxp,
            gc_cells=int(os.environ.get("SPEEDY_PITCH_GC", "64")),
            interpret=not on_tpu_p,
            gain=gain,
        )
    else:
        ssd = ssd_matmul(seg, taps, minp, maxp, _PITCH_PRECISION)
        period_grid = parabolic_min(ssd, minp, maxp - minp - 1)
    # Look up the period at each chunk's nominal source position.
    g_idx = jnp.clip(jnp.round(c / G).astype(jnp.int32), 0, n_grid - 1)
    period = jnp.take_along_axis(period_grid, g_idx, axis=1)  # [B, K]
    if debug_stage == "pitch":
        return jnp.sum(period) + jnp.sum(valid).astype(dtype)

    # ---- 3. phase snap, closed form (no scan) ----
    # The recurrence a_k = c_k + wrap(a_{k-1} + Hs - c_k, P_k) telescopes:
    # wrapping the cumulative nominal offset c_0 + k*Hs - c_k by the LOCAL
    # period gives the same phase alignment up to m*|P_k - P_{k-1}| (pitch
    # varies slowly; transitions are masked by the Hann blend). This
    # removes the last per-chunk sequential dependency — the entire
    # resynthesis is now parallel (verified against the scan form by the
    # Teager and DTW gates; measured identical rel-sigma).
    kk = jnp.arange(K, dtype=dtype)[None, :]
    pr = c[:, :1] if phase_ref is None else phase_ref[:, None].astype(dtype)
    delta = pr + kk * Hs - c
    o = delta - jnp.round(delta / period) * period
    a = jnp.clip(c + o, 0.0, (lens_f - 1.0)[:, None])  # [B, K]
    if debug_stage == "phase":
        return jnp.sum(a) + jnp.sum(valid).astype(dtype)

    # ---- 4. synthesis: fractional-delay gather, half-slot OLA ----
    win = jnp.asarray(_cola_hann(Wn, np.dtype(dtype).name))
    a_i = jnp.floor(a).astype(jnp.int32)
    a_f = a - a_i.astype(dtype)

    if max_speed_plan is None:
        w_span = None
    else:
        need = (
            (span_rows - 1) * int(np.ceil(Hs * max_speed_plan))
            + maxp
            + (Wn + 1)
            + 32
        )
        w_span = -(-need // 1024) * 1024

    def synth(src_raw, a_i_s, a_f_s, valid_s, g_s=None):
        # src_raw [N, L] (unpadded, UNSCALED); positions [N, K] ->
        # [N, capacity]. g_s [N] (optional): per-row input gain — the
        # fused kernel applies it in VMEM post-selection so the padded
        # HBM source stays gain-free (loop-invariant staging in serving
        # scans); the XLA fallback folds it into its pad concat (the
        # prescale order, bitwise-identical to passing src_raw * g_s).
        n = src_raw.shape[0]
        # Rows whose output slot is past valid_s contribute nothing the
        # capacity mask keeps; skip their DMAs.
        valid_rows = jnp.minimum(valid_s // Hs + 2, K)
        # SPEEDY_FORCE_FUSED_SYNTH=interpret routes the fused kernel
        # through Pallas interpret mode off-TPU, so the hermetic CPU
        # suite can exercise the PRODUCTION synthesis wiring end-to-end
        # (tests/test_pallas_kernels.py::test_grid_pipeline_fused_synth).
        force_fused = os.environ.get("SPEEDY_FORCE_FUSED_SYNTH", "")
        on_tpu = jax.default_backend() == "tpu"
        if w_span is not None and (on_tpu or force_fused == "interpret"):
            # Fused kernel: span gather + interp + window + OLA in VMEM,
            # emitting final slots — the separate gather + XLA interp
            # pipeline moves ~1.1 GB/step of HBM padding at these shapes.
            # Raw source, raw starts: the wrapper's single fused pad is
            # the only copy of x between HBM and the span DMAs.
            from .pallas_kernels import gather_synth_block_pallas

            slots = gather_synth_block_pallas(
                src_raw, a_i_s, a_f_s, Hs, Wn + 1,
                span_rows, w_span, valid_rows,
                interpret=not on_tpu, gain=g_s,
            )  # [N, K, Hs]
            if debug_stage == "synthraw":
                # Bisect hook: checksum the kernel's output BEFORE the
                # reshape/mask pass so `full - synthraw` isolates that
                # pass's cost (dead blocks' garbage may make the sum
                # NaN — timing-only).
                return slots
            out_full = slots.reshape(n, K * Hs)
        else:
            src_s = src_raw if g_s is None else src_raw * g_s[:, None]
            src_pad = jnp.concatenate(
                [
                    jnp.zeros((n, pad_front), dtype),
                    src_s,
                    jnp.zeros((n, 2 * maxp + taps + Wn), dtype),
                ],
                axis=1,
            )
            if w_span is None:
                wide = _gather_rows(
                    src_pad, a_i_s + pad_front, Wn + 1, valid_rows
                )
            else:
                # Block-span gather: one span DMA per 128 rows + lane-
                # parallel in-VMEM extraction.
                wide = _gather_rows_spans(
                    src_pad, a_i_s + pad_front, Wn + 1, span_rows, w_span,
                    valid_rows,
                )  # [N, K, Wn+1]
            af = a_f_s[:, :, None]
            raw = wide[:, :, :-1] * (1.0 - af) + wide[:, :, 1:] * af
            rows = raw * win[None, None, :]
            firsts = rows[:, :, :Hs]
            seconds = rows[:, :, Hs:]
            slots = firsts + jnp.concatenate(
                [jnp.zeros((n, 1, Hs), dtype), seconds[:, :-1]], axis=1
            )
            slots = jnp.concatenate([raw[:, :1, :Hs], slots[:, 1:]], axis=1)
            out_full = slots.reshape(n, K * Hs)  # plan: K*Hs >= capacity
        idx = jnp.arange(capacity, dtype=jnp.int32)
        return jnp.where(
            idx[None, :] < valid_s[:, None], out_full[:, :capacity], 0.0
        )

    # mask_output=False (streaming continuation): every slot is real
    # output owned by the caller — no zero-mask, no valid-row DMA skips.
    valid_m = valid if mask_output else jnp.full((B,), capacity, jnp.int32)
    g_vec = None if gain is None else gain.astype(dtype)
    if xs_channels is None:
        out = synth(xs, a_i, a_f, valid_m, g_vec)
        if debug_stage == "synthraw":
            return jnp.sum(out) + jnp.sum(valid).astype(dtype)
    else:
        C = xs_channels.shape[1]
        rep = lambda v: None if v is None else jnp.repeat(v, C, axis=0)
        out = synth(
            xs_channels.reshape(B * C, L),
            rep(a_i), rep(a_f), rep(valid_m), rep(g_vec),
        ).reshape(B, C, capacity)
    res = WsolaResult(out, valid, jnp.full((B,), K, jnp.int32))
    if return_period:
        return res, period
    return res


def pitch_grid_stride(cfg: SpeedyConfig, hop: Optional[int] = None) -> int:
    """The engine's pitch-grid cell stride G for a given hop (must mirror
    the G computation inside _wsola_grid_batch: taps = maxp, seg_w =
    taps + maxp). streaming_device.py aligns segment buffers to G so a
    source position's pitch estimate is identical in every segment."""
    if hop is None:
        hop = max(32, cfg.frame_step_int)
    seg_w = 2 * cfg.wsola_max_period
    return -(-max(3 * hop, seg_w) // 128) * 128


def plan_grid(
    cfg: SpeedyConfig, input_len: int, min_speed_bound: float, hop: Optional[int] = None
):
    """NOTE on scaling: the engine's fused time-map inversion is
    O(K*F) per utterance (K output chunks x F frames — the banded
    compare-select that beats searchsorted at corpus batch shapes).
    That is the right trade for throughput batches of <= minutes-long
    utterances; single files beyond a few minutes should stream
    (streaming_device.py: O(segment) per step) or shard their slot axis
    across chips (parallel/seqpar.py: O(K*F/n) per device)."""
    if hop is None:
        # One analysis frame step (10 ms): chunk grid aligned with the
        # speed-change granularity, and the phase-snap scan length — the
        # throughput limiter — halves vs a frame_step/2 hop (measured
        # 1111 -> 2252 audio-s/s/chip) while every Teager/DTW gate still
        # holds. 2x the step gains another ~1.7x but fails the 0.4x
        # slowdown Teager rel-sigma gate (0.013 vs 0.01).
        hop = max(32, cfg.frame_step_int)
    capacity = (
        int(np.ceil(input_len / max(min_speed_bound, 0.01))) + 4 * cfg.wsola_max_period
    )
    capacity = -(-capacity // (2 * hop)) * (2 * hop)
    num_chunks = capacity // hop + 1
    return hop, capacity, num_chunks


def time_scale_grid(
    x: jnp.ndarray,
    speeds: jnp.ndarray,
    cfg: SpeedyConfig,
    input_length=None,
    min_speed_bound: float = 0.25,
    hop: Optional[int] = None,
    capacity: Optional[int] = None,
    max_speed_bound: Optional[float] = None,
) -> WsolaResult:
    """Grid-parallel time-scaling of a single mono utterance x[L].

    max_speed_bound: optional planner ceiling on instantaneous speed
    (speeds are clamped to it); enables the block-span gather fast path.
    None keeps speeds unbounded (per-row gather)."""
    x = jnp.asarray(x)
    if input_length is None:
        input_length = x.shape[-1]
    h, cap, K = plan_grid(cfg, x.shape[-1], min_speed_bound, hop)
    if capacity is not None:
        cap = capacity
        K = cap // h + 1
    res = _wsola_grid_batch(
        x[None, :],
        jnp.asarray([input_length], jnp.int32),
        jnp.asarray(speeds, x.dtype)[None, :],
        cfg.wsola_min_period,
        cfg.wsola_max_period,
        cfg.frame_step_int,
        h,
        cap,
        K,
        max_speed_plan=max_speed_bound,
    )
    return WsolaResult(res.output[0], res.valid_length[0], res.steps_used[0])
