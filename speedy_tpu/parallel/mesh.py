"""Device-mesh helpers for the corpus engine.

The algorithm's parallelism axes (SURVEY.md §2) map to mesh axes as:
  * utterance/batch axis  -> 'dp' (data parallel; no cross-utterance
    communication exists in the algorithm, so dp scales linearly on ICI)
  * frame/sequence axis   -> 'sp' (sequence parallel within the front-end;
    halo = the ±(past,future) hysteresis window and one-frame overlap)
  * frequency-bin axis    -> 'tp' (tensor parallel over the DFT's output
    bins; energy reductions psum over this axis)
Pipeline and expert parallelism have no counterpart in this workload (no
layer stack, no experts) — the reference is a single DSP chain.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    dp: Optional[int] = None, tp: int = 1, devices: Optional[Sequence] = None
) -> Mesh:
    """Build a (dp, tp) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        dp = n // tp
    assert dp * tp == n, f"mesh {dp}x{tp} != {n} devices"
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("dp"))


__all__ = ["Mesh", "NamedSharding", "P", "make_mesh", "batch_sharding"]
