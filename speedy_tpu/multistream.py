"""Concurrent multi-stream serving: N live streams, shared dispatches.

The single-stream `DeviceStreamingPipeline` measures ~10 audio-s/s on the
relayed chip — the relay charges a fixed ~30 ms per execute call, so B=1
serving is dispatch-floor-bound, not compute-bound (CLAUDE.md measurement
rules; experiments/streaming_throughput.py). `MultiStreamPipeline`
amortizes that floor across N concurrent feed()/flush() streams by
multiplexing them into shared FIXED-SHAPE device programs:

  1. ANALYSIS + SPEED LAW: one jitted step batching the O(1)-state chunk
     scan (ops/chunked.py::make_chunk_step, vmapped over stream slots)
     FUSED with the per-frame speed law — the law is the same exact scan
     as ops/speed.py::speed_from_tension with identity steps on masked
     slots, so per-row results are bit-identical to the single-stream
     pipeline's separate law dispatch. Slots with no chunk ready take a
     masked row (carry passes through untouched).
  2. WSOLA: the grid engine (already batched — streaming_device.py's
     per-stream continuation hooks in_offset/out_shift/phase_ref are [B]
     arrays by construction) dispatched once per round over all ready
     streams' segments; idle slots carry zero-length dummy rows.

Per-stream state (raw ring, output clock, phase re-base, pruning) is the
single-stream pipeline's own — each lane IS a `DeviceStreamingPipeline`
with only its three device-call seams re-routed through the coordinator
(`_run_analysis_chunk` / `_extend_speeds` / `_wsola_dispatch`), so every
contract the single-stream pipeline is gated on (seam exactness, feed-
chunking invariance, flush semantics, set_speed, multichannel) holds per
lane by construction. The equality gate in tests/test_multistream.py pins
per-stream outputs to the single-stream pipeline bit-for-bit.

All lanes share one segment plan (same cfg / chunk_frames /
segment_frames / speed bounds — the static shapes of the shared
programs); per-stream global_speed may differ within the plan's speed
bounds (the law takes the rate per row). The reference's serving analog
is one sonicStream per caller (soniclib.c:427-450) — N callers pay N
serial C loops there; here they share one device program.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import config as C
from .config import SpeedyConfig
from .ops import wsola_fast
from .ops.chunked import make_chunk_step
from .parallel.batch import _plan_max_speed
from .streaming_device import DeviceStreamingPipeline


@functools.lru_cache(maxsize=8)
def _batched_chunk_law_step(
    cfg: SpeedyConfig,
    chunk_frames: int,
    nonlinear_factor: float,
    feedback: float,
):
    """One compiled fused step: vmapped O(1)-state analysis chunk scan +
    masked speed-law scan. Signature (all leading dims = n_slots):

      (an_carry, law_carry[N,2], k[N], samples[N,Ch*step], rg[N],
       lo[N], hi[N], valid[N])
        -> (an_carry', law_carry', tension[N,Ch], speeds[N,Ch])

    Row semantics: valid=False rows pass their carries through untouched
    (the slot had no chunk ready this round). k==0 rows read the FRESH
    initial carry (slot reuse after a flush needs no reset dispatch —
    freshness is derivable from the chunk counter). Law slots outside
    [lo, hi) take identity steps, exactly reproducing the single-stream
    pipeline's trimming (`t[lo:]` for the lag slots, the flush-time
    T_out cap) — the law math itself is speed_from_tension's
    (ops/speed.py, speedy.c:768-788 exact) with the same unroll."""
    carry0, body = make_chunk_step(cfg, chunk_frames)
    Ch = chunk_frames
    fd = 1.0 / C.FRAME_RATE_HZ
    ms = C.MIN_SPEED
    nl = float(nonlinear_factor)
    fb = float(feedback)

    def law(tension, rg, carry, slot_valid):
        def step(c, tv):
            t, v = tv
            cur, des = c
            fast = jnp.maximum(1.0, rg + (1.0 - rg) * t)
            slow = jnp.maximum(ms, jnp.minimum(1.0, rg - (1.0 - rg) * t))
            requested = jnp.where(rg > 1.0, fast, slow)
            excess = cur - des
            if fb > 0.0:
                requested = requested + jnp.maximum(ms, fb * excess)
            cur2 = cur + fd / requested
            des2 = des + fd / rg
            final = requested * nl + rg * (1.0 - nl)
            return (
                jnp.where(v, cur2, cur),
                jnp.where(v, des2, des),
            ), final

        (cur, des), speeds = jax.lax.scan(
            step, (carry[0], carry[1]), (tension, slot_valid), unroll=16
        )
        return speeds, jnp.stack([cur, des])

    def one(an_row, law_row, k, samples, rg, lo, hi, valid):
        use0 = k == 0
        an_in = jax.tree_util.tree_map(
            lambda a0, a: jnp.where(use0, a0, a), carry0, an_row
        )
        law_in = jnp.where(use0, jnp.zeros((2,), samples.dtype), law_row)
        an_new, tension = body(an_in, (k, samples))
        j = jnp.arange(Ch)
        slot_valid = valid & (j >= lo) & (j < hi)
        speeds, law_new = law(tension, rg, law_in, slot_valid)
        an_out = jax.tree_util.tree_map(
            lambda n, o: jnp.where(valid, n, o), an_new, an_row
        )
        law_out = jnp.where(valid, law_new, law_row)
        return an_out, law_out, tension, speeds

    def init_state(n_slots: int):
        an = jax.tree_util.tree_map(
            lambda a: jnp.tile(a[None], (n_slots,) + (1,) * a.ndim), carry0
        )
        law = jnp.zeros((n_slots, 2), jnp.float32)
        return an, law

    return jax.jit(jax.vmap(one)), init_state


class _Lane(DeviceStreamingPipeline):
    """One stream slot: a DeviceStreamingPipeline whose device calls are
    re-routed through the owning MultiStreamPipeline's shared batched
    programs. All host-side state machinery (rings, clocks, flush
    semantics) is inherited unchanged."""

    def __init__(self, owner: "MultiStreamPipeline", slot: int, **kw):
        self._owner = owner
        self._slot = slot
        self._pending_speeds: Optional[np.ndarray] = None
        self._flush_T_out: Optional[int] = None
        super().__init__(**kw)

    # The coordinator drives all pumping (a lane's feed may unblock work
    # on every lane that was waiting for a shared dispatch round).
    def _pump(self):
        self._owner._pump_all()

    # Single-lane analysis path (used by the inherited flush loop; the
    # live pump path batches across lanes in _pump_all instead).
    def _run_analysis_chunk(self, samples: np.ndarray) -> np.ndarray:
        ((t, sp),) = self._owner._dispatch_chunks([(self, samples)])
        self._k += 1
        self._pending_speeds = sp
        return t

    def _extend_speeds(self, tension: np.ndarray) -> None:
        # The fused step already computed this chunk's speeds (stashed by
        # _run_analysis_chunk / _pump_all); only the host bookkeeping of
        # the base method remains. The device law carry lives stacked in
        # the owner.
        sp = self._pending_speeds
        self._pending_speeds = None
        if tension.size == 0:
            return
        assert sp is not None and sp.shape == tension.shape, (
            None if sp is None else sp.shape,
            tension.shape,
        )
        sp = np.clip(sp.astype(np.float64), self.min_sb, self.max_sb)
        for s in sp:
            self._speeds.append(float(s))
            self._obnd.append(self._obnd[-1] + self.step / float(s))
        self._t_emitted += tension.size

    def _wsola_dispatch(self, req):
        return self._owner._dispatch_segments([req])[0]

    def flush(self) -> np.ndarray:
        # The inherited flush trims each chunk's tension to the true
        # T_out; the fused step needs that bound to mask the law's
        # integrator identically (the trimmed frames must never reach
        # it — streaming_device.flush's contract).
        T = self.cfg.num_frames(self._fed, integer_step=True)
        self._flush_T_out = self.cfg.num_tension_frames(T)
        try:
            return super().flush()
        finally:
            self._owner._release(self._slot)


class MultiStreamPipeline:
    """N concurrent live streams multiplexed into shared fixed-shape
    device dispatches. open() a slot, feed()/flush() it like a
    DeviceStreamingPipeline; feed_many() batches several streams' feeds
    into one pump round (the high-throughput call pattern).

    All streams share one plan (cfg, chunk/segment geometry, channel
    count, speed bounds); per-stream rates may differ within the plan's
    bounds. Per-stream outputs are bit-identical to a standalone
    DeviceStreamingPipeline with the same parameters (gated)."""

    def __init__(
        self,
        cfg: SpeedyConfig,
        global_speed: float,
        n_streams: int = 16,
        nonlinear_factor: float = 1.0,
        duration_feedback_strength: float = 0.1,
        chunk_frames: int = 128,
        segment_frames: int = 512,
        channels: int = 1,
        min_speed_bound: Optional[float] = None,
        max_speed_bound: Optional[float] = None,
        phase_ref_limit: float = float(2**21),
    ):
        assert n_streams >= 1 and channels >= 1
        self.cfg = cfg
        self.rg = float(global_speed)
        self.nl = float(nonlinear_factor)
        self.fb = float(duration_feedback_strength)
        self.n_slots = int(n_streams)
        self.channels = int(channels)
        self.Ch = int(chunk_frames)
        self.Fseg = int(segment_frames)
        self.step = cfg.frame_step_int
        # Shared plan bounds: every lane is constructed with these
        # EXPLICITLY so per-stream rates cannot fork the static plan.
        if min_speed_bound is None:
            min_speed_bound = (
                1.0 if self.rg >= 1.0 else max(C.MIN_SPEED, 0.3 * self.rg)
            )
        self.min_sb = float(min_speed_bound)
        if max_speed_bound is None:
            max_speed_bound = _plan_max_speed(self.rg, self.nl)
        self.max_sb = float(max_speed_bound)
        self._pr_limit = float(phase_ref_limit)

        self._lanes: List[Optional[_Lane]] = [None] * self.n_slots
        # Observability: device dispatches vs work units they carried —
        # the multiplexing ratio (work / dispatches) is the whole point.
        self.stats = {
            "chunk_dispatches": 0,
            "chunks_processed": 0,
            "segment_dispatches": 0,
            "segments_processed": 0,
        }
        self._chunk_step, init_state = _batched_chunk_law_step(
            cfg, self.Ch, self.nl, self.fb
        )
        self._an_carry, self._law_carry = init_state(self.n_slots)

        # Shared segment geometry, derived from a template lane so the
        # WSOLA dispatch's static shapes exist before the first open().
        tmpl = self._make_lane(slot=0, speed=self.rg)
        self.L_seg = tmpl.L_seg
        self.F_in = tmpl.F_in
        self.K_st = tmpl.K_st
        self.capacity = tmpl.capacity

    # ---------- slot management ----------

    def _make_lane(self, slot: int, speed: float) -> _Lane:
        return _Lane(
            self,
            slot,
            cfg=self.cfg,
            global_speed=speed,
            nonlinear_factor=self.nl,
            duration_feedback_strength=self.fb,
            chunk_frames=self.Ch,
            segment_frames=self.Fseg,
            min_speed_bound=self.min_sb,
            max_speed_bound=self.max_sb,
            phase_ref_limit=self._pr_limit,
        )

    def open(self, global_speed: Optional[float] = None) -> int:
        """Acquire a free stream slot; returns the stream id. Raises if
        all slots are busy, or if the requested rate needs a larger
        speed-bound plan than this pipeline was constructed with."""
        speed = self.rg if global_speed is None else float(global_speed)
        if not (self.min_sb <= speed and _plan_max_speed(speed, self.nl) <= self.max_sb):
            raise ValueError(
                f"stream rate {speed} outside this pipeline's plan bounds "
                f"[{self.min_sb}, {self.max_sb}]; construct the pipeline "
                "with explicit min/max_speed_bound covering every rate"
            )
        for i, lane in enumerate(self._lanes):
            if lane is None:
                self._lanes[i] = self._make_lane(i, speed)
                return i
        raise RuntimeError(f"all {self.n_slots} stream slots are busy")

    def _release(self, slot: int) -> None:
        self._lanes[slot] = None

    def _lane(self, sid: int) -> _Lane:
        lane = (
            self._lanes[sid] if 0 <= sid < self.n_slots else None
        )
        if lane is None:
            raise KeyError(f"stream {sid} is not open")
        return lane

    @property
    def n_active(self) -> int:
        return sum(l is not None for l in self._lanes)

    # ---------- public stream API ----------

    def feed(self, sid: int, samples: np.ndarray) -> np.ndarray:
        """Feed one stream; pump ALL streams' ready work in shared
        dispatches; return this stream's available output."""
        lane = self._lane(sid)
        if self.channels > 1:
            samples = np.asarray(samples, np.float32)
            assert samples.ndim == 2 and samples.shape[1] == self.channels
        return lane.feed(samples)

    def feed_many(
        self, pairs: Sequence[Tuple[int, np.ndarray]]
    ) -> Dict[int, np.ndarray]:
        """Feed several streams, then run ONE shared pump round — the
        call pattern that maximizes dispatch sharing. Returns each fed
        stream's drained output."""
        for sid, samples in pairs:
            self._lane(sid)._ingest(samples)
        self._pump_all()
        return {sid: self._lane(sid)._drain() for sid, _ in pairs}

    def set_speed(self, sid: int, global_speed: float) -> None:
        """sonicSetSpeed semantics per stream. Like
        DeviceStreamingPipeline.set_speed, instantaneous speeds remain
        clamped to the plan bounds fixed at construction — pass a larger
        max_speed_bound up front to raise rates beyond the initial
        plan's ceiling (identical clamping in a standalone pipeline with
        the same bounds, so bit-equality is preserved either way)."""
        self._lane(sid).set_speed(global_speed)

    def flush(self, sid: int) -> np.ndarray:
        """Drain the stream's tail and release its slot."""
        return self._lane(sid).flush()

    # ---------- shared dispatch machinery ----------

    def _active_lanes(self) -> List[_Lane]:
        return [l for l in self._lanes if l is not None]

    def _pump_all(self) -> None:
        lanes = self._active_lanes()
        # Analysis + speed law rounds: every lane with a full chunk of
        # raw audio advances one chunk per dispatch.
        while True:
            items = [
                (l, l._chunk_samples()) for l in lanes if l._analysis_ready()
            ]
            if not items:
                break
            outs = self._dispatch_chunks(items)
            for (l, _), (t, sp) in zip(items, outs):
                l._k += 1
                l._pending_speeds = sp
                l._extend_speeds(t)
        # WSOLA rounds: every lane with a full segment of speeds + the
        # synthesis-reach margin of raw audio advances one segment.
        while True:
            ready = [l for l in lanes if l._segment_ready()]
            if not ready:
                break
            prepped = [
                l._prep_wsola_segment(l._f_done + l.Fseg, None) for l in ready
            ]
            outs = self._dispatch_segments([req for req, _ in prepped])
            for l, (_, meta), (y, p) in zip(ready, prepped, outs):
                l._finish_wsola_segment(meta, y, p)

    def _dispatch_chunks(
        self, items: Sequence[Tuple[_Lane, np.ndarray]]
    ) -> List[Tuple[np.ndarray, np.ndarray]]:
        """One fused analysis+law dispatch over all slots; `items` rows
        are valid, the rest are masked. Returns per item the lo-trimmed
        tension row and the [lo:hi) speeds row (hi < Ch only under the
        flush-time T_out cap)."""
        N, Ch = self.n_slots, self.Ch
        ks = np.ones((N,), np.int32)  # dummy rows: k=1 keeps use0 off
        samples = np.zeros((N, Ch * self.step), np.float32)
        rgs = np.ones((N,), np.float32)
        los = np.zeros((N,), np.int32)
        his = np.zeros((N,), np.int32)
        valids = np.zeros((N,), bool)
        metas = []
        for l, s in items:
            i = l._slot
            k = l._k
            ks[i] = k
            samples[i] = s
            rgs[i] = l.rg
            lo = max(0, -(k * Ch - 2 - l.fut))
            if l._flush_T_out is None:
                hi = Ch
            else:
                hi = min(Ch, lo + max(0, l._flush_T_out - l._t_emitted))
            los[i] = lo
            his[i] = hi
            valids[i] = True
            metas.append((i, lo, hi))
        self._an_carry, self._law_carry, tension, speeds = self._chunk_step(
            self._an_carry,
            self._law_carry,
            jnp.asarray(ks),
            jnp.asarray(samples),
            jnp.asarray(rgs),
            jnp.asarray(los),
            jnp.asarray(his),
            jnp.asarray(valids),
        )
        self.stats["chunk_dispatches"] += 1
        self.stats["chunks_processed"] += len(items)
        t_host = np.asarray(tension)
        s_host = np.asarray(speeds)
        return [(t_host[i, lo:], s_host[i, lo:hi]) for (i, lo, hi) in metas]

    def _dispatch_segments(self, reqs: Sequence[dict]) -> List[Tuple[np.ndarray, np.ndarray]]:
        """One grid-WSOLA dispatch over all slots (fixed shape [N, ...]);
        rows beyond len(reqs) are zero-length dummies. Returns (output
        row, period row) per request."""
        N = self.n_slots
        segs = np.zeros((N, self.L_seg), np.float32)
        lens = np.zeros((N,), np.int32)
        sps = np.ones((N, self.F_in), np.float32)
        ino = np.zeros((N,), np.float32)
        osh = np.zeros((N,), np.float32)
        prf = np.zeros((N,), np.float32)
        seg_ch = (
            np.zeros((N, self.channels, self.L_seg), np.float32)
            if self.channels > 1
            else None
        )
        for i, r in enumerate(reqs):
            segs[i] = r["seg"]
            lens[i] = r["seg_len"]
            sps[i] = r["sp"]
            ino[i] = r["in_offset"]
            osh[i] = r["out_shift"]
            prf[i] = r["phase_ref"]
            if seg_ch is not None:
                assert r["seg_ch"] is not None, "mono feed on a multichannel pipeline"
                seg_ch[i] = r["seg_ch"].T
        res, periods = wsola_fast._wsola_grid_batch(
            jnp.asarray(segs),
            jnp.asarray(lens),
            jnp.asarray(sps),
            self.cfg.wsola_min_period,
            self.cfg.wsola_max_period,
            self.step,
            self.step,  # hop == frame step: the streaming plan invariant
            self.capacity,
            self.K_st,
            xs_channels=None if seg_ch is None else jnp.asarray(seg_ch),
            max_speed_plan=self.max_sb,
            in_offset=jnp.asarray(ino),
            out_shift=jnp.asarray(osh),
            phase_ref=jnp.asarray(prf),
            mask_output=False,
            return_period=True,
        )
        self.stats["segment_dispatches"] += 1
        self.stats["segments_processed"] += len(reqs)
        y = np.asarray(res.output)
        p = np.asarray(periods)
        return [(y[i], p[i]) for i in range(len(reqs))]
