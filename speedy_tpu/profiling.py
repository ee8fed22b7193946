"""Tracing / profiling utilities (SURVEY.md §5.1).

The reference's only observability is per-frame monitoring callbacks and
CLI dump files. The rebuild exposes:
  * the 15-feature matrix as a first-class batched output
    (ops.analysis.AnalysisResult.features) — the feature-tap API;
  * device-level tracing via jax.profiler (`trace` context manager);
  * simple wall/throughput counters for pipeline stages.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Dict, Iterator, Optional


def honor_jax_platform_env() -> None:
    """Make JAX_PLATFORMS effective even when a sitecustomize imported
    jax at interpreter boot with a different platform pinned (this
    image's boot hook points at a TPU tunnel, so plain
    `JAX_PLATFORMS=cpu python script.py` is silently ignored and every
    jit becomes a minutes-long remote compile). Called by the example
    scripts and the CLI so user intent wins."""
    plat = os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    import jax

    try:
        jax.config.update("jax_platforms", plat)
        from jax.extend import backend as _backend

        _backend.clear_backends()
    except Exception:
        pass


def enable_compile_cache(path: Optional[str] = None) -> None:
    """Point jax at a persistent compilation cache (remote TPU compiles
    take minutes; cache hits bring fresh-process startup down to seconds).
    Shared by bench.py and __graft_entry__.py so the two entry points
    cannot drift. No-op on jax builds without the knobs."""
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            path
            or os.environ.get(
                "SPEEDY_JAX_CACHE", os.path.expanduser("~/.cache/speedy_jax")
            ),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace viewable in TensorBoard/XProf."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Wall-clock + audio-throughput accounting per pipeline stage."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}
        self.audio_seconds: Dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str, audio_seconds: float = 0.0) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1
            self.audio_seconds[name] = (
                self.audio_seconds.get(name, 0.0) + audio_seconds
            )

    def report(self) -> str:
        lines = []
        for name, total in sorted(self.totals.items()):
            rt = ""
            if self.audio_seconds.get(name):
                rt = f"  {self.audio_seconds[name] / total:,.0f}x realtime"
            lines.append(
                f"{name:24s} {total * 1000:9.1f} ms  x{self.counts[name]:<5d}{rt}"
            )
        return "\n".join(lines)


def feature_names() -> list:
    """Labels for the 15-feature vector (speedy.c:369-384 legend)."""
    return [
        "spectrogram_energy",
        "energy_lp",
        "energy_local",
        "energy_compressed",
        "energy_hysteresis",
        "low_energy_frame",
        "local_spectral_difference",
        "emphasis_weighted_local_difference",
        "emphasis_weighted_lpf",
        "relative_spectral_difference",
        "speech_changes",
        "audio_tension",
        "time_energy",
        "time_spectral",
        "low_energy_threshold",
    ]
