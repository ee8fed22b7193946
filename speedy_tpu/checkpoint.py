"""Checkpoint / resume of streaming state (SURVEY.md §5.4).

The reference has no persistence — all state is a few KB per stream and
streams are create-once-run-forward. Here per-stream state is an explicit
dict-of-arrays (a pytree), so a long-running streaming service can
snapshot mid-utterance and resume exactly: resume == re-feed from frame k
with identical rings/filters/integrators.

Batch-engine state needs no checkpointing (the pipeline is a pure
function of the utterance), so this module covers the stateful streaming
shim only.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from .streaming import SonicStream, SpeedyFrontEndStream, WsolaStream, _RateConverter


def snapshot_stream(st: SonicStream) -> Dict[str, Any]:
    """Capture the complete state of a SonicStream as plain arrays."""
    fe = st.speedy
    en = st.engine
    return {
        "version": 1,
        "sample_rate": st.sample_rate,
        "num_channels": st.num_channels,
        "global_speed": st.global_speed,
        "nonlinear_factor": st.nonlinear_factor,
        "duration_feedback_strength": st.duration_feedback_strength,
        "buffers_allocated": st._buffers_allocated,
        "pending": st._pending.copy(),
        "write_total": st._write_total,
        "speedy_frame": st._speedy_frame,
        "read_frame": st._read_frame,
        "fe": {
            "current_time": fe.current_time,
            "preemph_state": float(fe.preemph_state),
            "energy_lp_state": float(fe.energy_lp_state),
            "diff_lp_state": float(fe.diff_lp_state),
            "skip_frame_count": fe.skip_frame_count,
            "current_duration": float(fe.current_duration),
            "desired_duration": float(fe.desired_duration),
            "spec_ring": fe._spec_ring.copy(),
            "hyst_ring": fe._hyst_ring.copy(),
            "features": fe.features.copy(),
            "spectrogram": fe.spectrogram.copy(),
            "normalized": fe.normalized.copy(),
        },
        "engine": {
            "speed": en.speed,
            "rate": en.rate,
            "in": en._in.copy(),
            "in_pos": en._in_pos,
            "in_base": en._in_base,
            "speed_seg_ends": np.asarray([e for e, _ in en._speed_segs], np.int64),
            "speed_seg_vals": np.asarray([v for _, v in en._speed_segs], np.float64),
            "consumed_real": en._consumed_real,
            "play_time": en._play_time,
            "emitted": en._emitted,
            "rem_copy": en._rem_copy,
            "out": np.concatenate(en._out_chunks)
            if en._out_chunks
            else np.zeros((0, st.num_channels), np.float32),
            "out_read": en._out_read,
            "fifo_base": en._fifo_base,
            "rate_conv": {
                "rate": en._rate_conv.rate,
                "phase": en._rate_conv.phase,
                "last": en._rate_conv.last.copy(),
                "primed": en._rate_conv.primed,
            },
        },
    }


def restore_stream(state: Dict[str, Any]) -> SonicStream:
    """Reconstruct a SonicStream exactly at the snapshotted point."""
    assert state["version"] == 1
    st = SonicStream(state["sample_rate"], state["num_channels"])
    st.global_speed = state["global_speed"]
    st.nonlinear_factor = state["nonlinear_factor"]
    st.duration_feedback_strength = state["duration_feedback_strength"]
    st._buffers_allocated = state["buffers_allocated"]
    st._pending = state["pending"].copy()
    st._write_total = state["write_total"]
    st._speedy_frame = state["speedy_frame"]
    st._read_frame = state["read_frame"]
    fe = st.speedy
    fs = state["fe"]
    fe.current_time = fs["current_time"]
    fe.preemph_state = np.float32(fs["preemph_state"])
    fe.energy_lp_state = np.float32(fs["energy_lp_state"])
    fe.diff_lp_state = np.float32(fs["diff_lp_state"])
    fe.skip_frame_count = fs["skip_frame_count"]
    fe.current_duration = np.float32(fs["current_duration"])
    fe.desired_duration = np.float32(fs["desired_duration"])
    fe._spec_ring = fs["spec_ring"].copy()
    fe._hyst_ring = fs["hyst_ring"].copy()
    fe.features = fs["features"].copy()
    fe.spectrogram = fs["spectrogram"].copy()
    fe.normalized = fs["normalized"].copy()
    en = st.engine
    es = state["engine"]
    en.speed = es["speed"]
    en.rate = es["rate"]
    en._in = es["in"].copy()
    en._in_pos = es["in_pos"]
    en._in_base = int(es["in_base"])
    en._speed_segs = [
        (int(e), float(v))
        for e, v in zip(es["speed_seg_ends"], es["speed_seg_vals"])
    ]
    en._consumed_real = es["consumed_real"]
    en._play_time = es["play_time"]
    en._emitted = es["emitted"]
    en._rem_copy = es["rem_copy"]
    en._out_chunks = [es["out"].copy()] if len(es["out"]) else []
    en._out_read = es["out_read"]
    en._fifo_base = int(es.get("fifo_base", 0))
    rc = es["rate_conv"]
    en._rate_conv.rate = rc["rate"]
    en._rate_conv.phase = rc["phase"]
    en._rate_conv.last = rc["last"].copy()
    en._rate_conv.primed = rc["primed"]
    return st


def save_stream(st: SonicStream, path: str) -> None:
    """Serialize a snapshot to an .npz file."""
    flat = {}

    def put(prefix, d):
        for k, v in d.items():
            if isinstance(v, dict):
                put(f"{prefix}{k}/", v)
            else:
                flat[f"{prefix}{k}"] = np.asarray(v)

    put("", snapshot_stream(st))
    np.savez(path, **flat)


def load_stream(path: str) -> SonicStream:
    data = np.load(path, allow_pickle=False)
    nested: Dict[str, Any] = {}
    for key in data.files:
        parts = key.split("/")
        d = nested
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        v = data[key]
        d[parts[-1]] = v.item() if v.ndim == 0 else v
    return restore_stream(nested)
