"""Sequence-parallel analysis: ONE long utterance split across chips.

SURVEY.md §5.7's closing note — "the 'context' is a fixed ±12-frame
hysteresis window, which becomes a halo exchange of ≤21 frames between
sequence shards if we ever split one utterance across chips" — made
real: the frame axis of a single utterance is sharded over the mesh's
devices inside `jax.shard_map`, and the algorithm's three cross-frame
couplings become three tiny collectives:

  1. RAW-SAMPLE HALO: a frame window spans W = 1.5*step samples, and
     preemphasis state reaches one sample before the frame — each shard
     fetches the first W+step samples of its RIGHT neighbor via
     `lax.ppermute` (one ring hop on ICI).
  2. DISTRIBUTED PREFIX SCAN for the two 1-pole LPFs: each shard folds
     its chunk into a single (a, b) affine pair (composition of
     y -> a*y + b), all-gathers the n pairs (2n floats), and composes
     the exclusive prefix locally — the classic scan-of-scans, with the
     cross-device stage costing one `all_gather` of scalars.
  3. STATE-RING HALOS: tension at frame t reads energy_compressed over
     [t-past, t+fut] and the spectrogram at t-1 — each shard pulls
     `past`(+1) trailing energy values and 1 trailing spectrogram frame
     from its LEFT neighbor and `fut` leading energy values from its
     RIGHT neighbor (ppermute ring hops; ≤ 21 frames of state, exactly
     the reference's ring extent, speedy.c:95-97).

Per-device memory is T/n frames; the collectives move O(W + fut*W)
floats per shard regardless of T. Hermetically gated on the 8-virtual-
device CPU mesh against the single-device batched front-end
(tests/test_seqpar.py); the same program runs unchanged on a real ICI
mesh.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import config as C
from ..config import SpeedyConfig
from ..ops import dft


def _ppermute_ring(x, axis_name, n, shift):
    """x from the neighbor `shift` positions ahead (ring)."""
    perm = [((i + shift) % n, i) for i in range(n)]
    return jax.lax.ppermute(x, axis_name, perm)


@functools.partial(jax.jit, static_argnames=("cfg", "mesh", "num_frames"))
def analysis_seq_parallel(
    x: jnp.ndarray,
    cfg: SpeedyConfig,
    mesh: Mesh,
    num_frames: Optional[int] = None,
) -> jnp.ndarray:
    """Tension [T_out] for one utterance x[L], frame axis sharded over
    every device of `mesh` (all axes flattened into one 'seq' ring).

    Matches `ops.analysis.analyze(..., integer_step=True).tension` /
    `parallel.batch.batched_analysis` to float-reassociation ulps (the
    distributed LPF composes per-shard affine folds instead of one
    global associative scan).
    """
    dtype = x.dtype
    step = cfg.frame_step_int
    W = cfg.window_size
    fut = cfg.hysteresis_future
    past = cfg.hysteresis_past
    L = x.shape[-1]
    T = cfg.num_frames(L, integer_step=True) if num_frames is None else num_frames
    T_out = cfg.num_tension_frames(T)
    if T_out <= 0:
        return jnp.zeros((0,), dtype)

    devices = np.asarray(mesh.devices).reshape(-1)
    n = devices.size
    seq_mesh = Mesh(devices, ("seq",))
    # Frames per shard; a shard must be at least as large as the halos it
    # exchanges (raw halo spans W+step = 2.5 frames, the ec halos span
    # past/fut frames). Short utterances leave trailing shards fully
    # masked — correct, just not useful parallelism.
    Ts = max(-(-T // n), past, fut, 3)
    # Pad raw audio so every shard owns exactly Ts*step samples, plus the
    # halo reach of the final shard's last frame window.
    need = n * Ts * step + W + step
    x_pad = jnp.concatenate([x, jnp.zeros((need - L,), dtype)]) if need > L else x[:need]
    x_sh = x_pad[: n * Ts * step].reshape(n, Ts * step)
    tail_extra = x_pad[n * Ts * step :]  # [W+step] replicated leftover

    win = jnp.asarray(dft.hamming_window(W, np.dtype(dtype).name))
    cos_m, sin_m = (jnp.asarray(m) for m in dft.dft_matrices(W, np.dtype(dtype).name))
    alpha = jnp.asarray(cfg.lpf_alpha, dtype)
    eps = jnp.asarray(C.EPS, dtype)
    low_thresh = jnp.asarray(cfg.low_energy_threshold, dtype)

    def shard_fn(xs, tail):
        # xs [1, Ts*step] (this shard's samples), tail [W+step] replicated.
        xs = xs[0]
        idx = jax.lax.axis_index("seq")

        # --- 1. raw halo: first W+step samples of the RIGHT neighbor
        # (the last shard splices the replicated global tail instead). ---
        head = jax.lax.slice_in_dim(xs, 0, W + step)
        right_head = _ppermute_ring(head, "seq", n, 1)
        right_head = jnp.where(idx == n - 1, tail, right_head)
        buf = jnp.concatenate([xs, right_head])  # [Ts*step + W + step]

        # Frames local t = 0..Ts-1 (global idx*Ts + t) at offsets t*step:
        # gather-free strided views over buf (same trick as batch.py).
        mcells = -(-(W + step) // step)
        frames = jnp.concatenate(
            [
                jax.lax.slice_in_dim(
                    buf, j * step, j * step + Ts * step
                ).reshape(Ts, step)
                for j in range(mcells)
            ],
            axis=-1,
        )[:, :W]  # [Ts, W]

        t_glob = idx * Ts + jnp.arange(Ts)
        # Preemphasis state = x[(t-1)*step + W - 1] = buf[t*step + (W-1-step)]
        # (W = 1.5*step so the offset W-1-step = step/2 - 1 >= 0).
        state = jax.lax.slice(
            buf, (W - 1 - step,), (W - 1 - step + Ts * step,), (step,)
        )
        # Global frame 0 has no predecessor.
        state = jnp.where(t_glob == 0, 0.0, state)
        prev = jnp.concatenate([state[:, None], frames[:, :-1]], axis=1)
        pre = frames - jnp.asarray(C.PREEMPHASIS_COEF, dtype) * prev

        hi = jax.lax.Precision.HIGHEST
        fw = pre * win[None, :]
        re = jnp.dot(fw, cos_m, precision=hi)
        im = jnp.dot(fw, sin_m, precision=hi)
        half = jnp.sqrt(re * re + im * im)[:, :W]  # [Ts, W]
        valid_frame = t_glob < T
        half = jnp.where(valid_frame[:, None], half, 0.0)

        energy = jnp.sum(half[:, 1:] ** 2, axis=-1)  # [Ts]

        # --- 2. distributed LPF prefix scan ---
        def lpf_distributed(values, init, valid):
            a = jnp.where(valid, alpha, 1.0)
            b = jnp.where(valid, (1.0 - alpha) * values, 0.0)

            def combine(l, r):
                a1, b1 = l
                a2, b2 = r
                return a1 * a2, a2 * b1 + b2

            a_cum, b_cum = jax.lax.associative_scan(combine, (a, b))
            # Per-shard fold = last element of the inclusive scan.
            folds = jax.lax.all_gather((a_cum[-1], b_cum[-1]), "seq")  # [n]
            fa, fb = folds
            # Exclusive prefix over shards, composed locally (n scalars).
            def exclusive(carry, ab):
                comp = combine(carry, ab)
                return comp, carry
            (_, _), (pa, pb) = jax.lax.scan(
                exclusive, (jnp.asarray(1.0, dtype), jnp.asarray(0.0, dtype)),
                (fa, fb),
            )
            carry_in = pa[idx] * jnp.asarray(init, dtype) + pb[idx]
            return a_cum * carry_in + b_cum

        energy_lp = lpf_distributed(
            energy, C.MEAN_SPECTROGRAM_ENERGY, valid_frame
        )
        ec = jnp.where(
            valid_frame, jnp.sqrt(jnp.minimum(energy / energy_lp, 2.0)), 0.0
        )

        # --- 3. state-ring halos ---
        # Hysteresis needs ec over [t-past, t+fut]: pull `past` trailing
        # values from the LEFT neighbor and `fut` leading from the RIGHT.
        left_tail = _ppermute_ring(ec[-past:], "seq", n, -1)
        left_tail = jnp.where(idx == 0, 0.0, left_tail)
        right_head_ec = _ppermute_ring(ec[:fut], "seq", n, 1)
        right_head_ec = jnp.where(idx == n - 1, 0.0, right_head_ec)
        ec_all = jnp.concatenate([left_tail, ec, right_head_ec])  # [past+Ts+fut]
        future_max = jnp.zeros((Ts,), dtype)
        for i in range(fut + 1):
            taper = (fut - i) / float(fut)
            sl = jax.lax.slice_in_dim(ec_all, past + i, past + i + Ts)
            future_max = jnp.maximum(future_max, sl * taper)
        past_max = jnp.zeros((Ts,), dtype)
        for i in range(past + 1):
            taper = (past - i) / float(past)
            sl = jax.lax.slice_in_dim(ec_all, past - i, past - i + Ts)
            past_max = jnp.maximum(past_max, sl * taper)
        energy_hyst = (past_max + future_max) / 2.0  # [Ts], tension frame t

        # Spectral difference: frame t vs t-1 — one spectrogram frame of
        # left halo.
        left_spec = _ppermute_ring(half[-1:], "seq", n, -1)
        left_spec = jnp.where(idx == 0, 0.0, left_spec)
        sp_all = jnp.concatenate([left_spec, half])  # [Ts+1, W]
        cur = sp_all[1:]
        last = sp_all[:-1]
        sig_energy = jnp.sum(cur[:, 1:] ** 2, axis=-1)
        last_energy = jnp.sum(last[:, 1:] ** 2, axis=-1)
        normalized = cur / (jnp.sqrt(sig_energy)[:, None] + eps)
        normalized_last = last / (jnp.sqrt(last_energy)[:, None] + eps)
        tt = t_glob  # tension frame index == analysis frame index here
        skipped = (sig_energy <= low_thresh) | (tt == 0)
        bin_thresh = jnp.max(cur[:, 1:], axis=-1, keepdims=True) / 100.0
        mask = (cur[:, 1:] > bin_thresh) & (last[:, 1:] > bin_thresh)
        log_ratio = jnp.abs(
            jnp.log((normalized[:, 1:] + eps) / (normalized_last[:, 1:] + eps))
        )
        lsd = jnp.sum(jnp.where(mask, log_ratio, 0.0), axis=-1)
        lsd = jnp.where(skipped, 0.0, lsd)
        ewld = lsd * energy_hyst
        valid_t = tt < T_out
        ew_lpf = lpf_distributed(
            jnp.where(skipped, 0.0, ewld),
            C.MEAN_EMPHASIS_WEIGHTED_LOCAL_DIFFERENCE,
            valid_t,
        )
        rsd = jnp.where(
            skipped, 0.0, ewld / (ew_lpf + 0.01 * C.MEAN_EMPHASIS_WEIGHTED_LPF)
        )
        changes = jnp.where(
            skipped, 0.0, jnp.minimum(rsd, cfg.speech_changes_clamp)
        )
        tension = C.TENSION_A * (energy_hyst - C.TENSION_M_E) + C.TENSION_B * (
            changes - C.TENSION_M_S
        )
        return tension[None, :]

    out = jax.shard_map(
        shard_fn,
        mesh=seq_mesh,
        in_specs=(P("seq", None), P()),
        out_specs=P("seq", None),
        check_vma=False,
    )(x_sh, tail_extra)
    return out.reshape(-1)[:T_out]


@functools.partial(
    jax.jit, static_argnames=("cfg", "mesh", "min_speed_bound", "max_speed_bound")
)
def wsola_seq_parallel(
    x: jnp.ndarray,
    speeds: jnp.ndarray,
    cfg: SpeedyConfig,
    mesh: Mesh,
    min_speed_bound: float = 1.0,
    max_speed_bound: float = 6.0,
):
    """Grid WSOLA for ONE utterance with the OUTPUT-SLOT axis sharded
    across every device of `mesh`: device s synthesizes global chunks
    [s*Kn, (s+1)*Kn) using the engine's streaming-continuation hooks
    (out_shift = the shard's global slot offset, phase_ref = the global
    phase clock, plus one recomputed overlap chunk for the OLA carry —
    exactly the segment-continuation mechanics of streaming_device.py,
    applied across space instead of time). The waveform and speeds are
    replicated, but each shard SLICES its pitch-grid-aligned source span
    before entering the engine, so the pitch search — the dominant WSOLA
    cost — scales as ~L*max_speed_bound/n per device (pass a tight
    max_speed_bound for full benefit). The single-utterance LATENCY
    axis, complementing dp throughput.

    Returns (output [capacity], valid_length) — matches
    wsola_fast.time_scale_grid(..., max_speed_bound=...) to float ulps.
    """
    from ..ops import wsola_fast

    dtype = x.dtype
    L = x.shape[-1]
    devices = np.asarray(mesh.devices).reshape(-1)
    n = devices.size
    seq_mesh = Mesh(devices, ("seq",))
    hop, cap, K = wsola_fast.plan_grid(cfg, L, min_speed_bound)
    Kn = -(-K // n)  # chunks per shard
    minp, maxp = cfg.wsola_min_period, cfg.wsola_max_period
    step = cfg.frame_step_int
    G = wsola_fast.pitch_grid_stride(cfg, hop)
    front = maxp + hop + 64
    back = G // 2 + 2 * maxp + 2 * hop + 64
    # Static per-shard source width: the shard's Kn+2 chunks span at most
    # (Kn+2)*hop*max_speed source samples, plus margins; never wider than
    # the (padded) utterance itself.
    L_shard = (
        -(-int((Kn + 2) * hop * max_speed_bound + front + back) // G) * G
    )
    L_shard = min(L_shard, -(-(L + G) // G) * G)
    Lp = -(-L // G) * G + L_shard  # room for the last shard's slice
    x_rep = jnp.concatenate([x, jnp.zeros((Lp - L,), dtype)])

    def shard_fn(xr, sp):
        s = jax.lax.axis_index("seq")
        S0 = s * Kn
        S_local0 = jnp.maximum(S0 - 1, 0)
        sp0 = sp[0]
        # Source position of the shard's first chunk via the global time
        # map (same formula as the engine, O(F) scalars on replicated
        # speeds), minus margins, G-aligned so pitch cells match the
        # global grid exactly.
        ob = jnp.concatenate(
            [jnp.zeros((1,), dtype), jnp.cumsum(jnp.asarray(step, dtype) / sp0)]
        )
        q0 = (S_local0 * hop).astype(dtype)
        f = jnp.clip(
            jnp.searchsorted(ob, q0, side="right") - 1, 0, sp0.shape[0] - 1
        )
        c_lo = f.astype(dtype) * step + (q0 - ob[f]) * sp0[f]
        s0 = (
            jnp.clip(c_lo - front, 0.0, None).astype(jnp.int32) // G
        ) * G
        xs_sh = jax.lax.dynamic_slice_in_dim(xr[0], s0, L_shard)
        lens = jnp.clip(L - s0, 0, L_shard)
        res = wsola_fast._wsola_grid_batch(
            xs_sh[None],
            lens[None].astype(jnp.int32),
            sp,
            minp,
            maxp,
            step,
            hop,
            (Kn + 1) * hop,
            Kn + 2,
            max_speed_plan=max_speed_bound,
            in_offset=(-s0).astype(jnp.float32)[None],
            out_shift=(S_local0 * hop).astype(jnp.float32)[None],
            phase_ref=((S_local0 * hop) - s0).astype(jnp.float32)[None],
            mask_output=False,
        )
        # Emit exactly Kn slots starting at global S0 (local slot 1 for
        # every shard but the first, whose chunk 0 is the global start).
        emit_from = (S0 - S_local0) * hop
        y = jax.lax.dynamic_slice_in_dim(
            res.output[0], emit_from, Kn * hop
        )
        return y[None, :]

    sp = jnp.minimum(jnp.asarray(speeds, dtype), max_speed_bound)[None, :]
    out = jax.shard_map(
        shard_fn,
        mesh=seq_mesh,
        in_specs=(P(), P()),
        out_specs=P("seq", None),
        check_vma=False,
    )(x_rep[None, :], sp)
    flat = out.reshape(-1)
    # Global output length: the engine's time-map estimate, evaluated
    # once outside the shard_map (each shard's own estimate clips to its
    # local capacity). Same ops as _wsola_grid_batch for bit parity.
    n_frames = sp.shape[1]
    inv_s = jnp.asarray(step, dtype) / sp
    obnd = jnp.concatenate(
        [jnp.zeros((1, 1), dtype), jnp.cumsum(inv_s, axis=1)], axis=1
    )
    total_frames = min(L // step, n_frames)
    tail = jnp.asarray(L - total_frames * step, dtype)
    last_speed = sp[0, min(total_frames, n_frames - 1)]
    out_len = obnd[0, total_frames] + tail / last_speed
    valid = jnp.minimum(jnp.round(out_len).astype(jnp.int32), cap)
    idx = jnp.arange(flat.shape[0], dtype=jnp.int32)
    flat = jnp.where(idx < valid, flat, 0.0)
    return flat[:cap], valid


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "mesh", "global_speed", "nonlinear_factor",
        "duration_feedback_strength",
    ),
)
def nonlinear_speedup_seq_parallel(
    x: jnp.ndarray,
    cfg: SpeedyConfig,
    mesh: Mesh,
    global_speed: float,
    nonlinear_factor: float = 1.0,
    duration_feedback_strength: float = 0.1,
):
    """End-to-end nonlinear speedup of ONE long utterance with every
    stage scaled across the mesh's devices: sequence-parallel analysis
    (frame axis sharded, halo exchanges), the tiny sequential speed law,
    and slot-sharded WSOLA. The single-utterance LATENCY path — the
    batch engine (parallel/batch.py) remains the THROUGHPUT path.

    Returns (output [capacity], valid_length, tension, speeds)."""
    from ..ops.speed import speed_from_tension

    dtype = x.dtype
    L = x.shape[-1]
    step = cfg.frame_step_int
    min_sb = 1.0 if global_speed >= 1.0 else max(C.MIN_SPEED, 0.3 * global_speed)
    from .batch import _plan_max_speed

    max_sb = _plan_max_speed(global_speed, nonlinear_factor)

    tension = analysis_seq_parallel(x, cfg, mesh)
    total_frames = L // step
    if tension.shape[0] == 0:
        speeds = jnp.full((max(total_frames, 1),), global_speed, dtype)
    else:
        sp, _ = speed_from_tension(
            tension, global_speed, duration_feedback_strength, nonlinear_factor
        )
        # Flush-at-last-speed for the lookahead tail frames
        # (soniclib.c:538-551), plus the batch engine's planner floor.
        pad = max(total_frames - sp.shape[0], 0)
        speeds = jnp.concatenate([sp, jnp.broadcast_to(sp[-1], (pad,))])[
            : max(total_frames, 1)
        ]
    speeds = jnp.clip(speeds, min_sb, max_sb)
    y, valid = wsola_seq_parallel(
        x, speeds, cfg, mesh, min_speed_bound=min_sb, max_speed_bound=max_sb
    )
    return y, valid, tension, speeds
