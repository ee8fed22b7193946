"""Tapered-max temporal hysteresis (component C7), vectorized.

The reference keeps a 42-slot ring buffer and, per queried frame, scans
kTemporalHysteresisFuture forward and kTemporalHysteresisPast backward with
triangular tapers, averaging the two maxima (speedy.c:587-619). Here the
whole utterance is a [T] vector and every output frame's tapered windows are
materialized with a single gather — pure VPU work, no ring buffer.

Out-of-range reads are 0: the reference's ring is zero-initialized and, for
any valid query (at_time + future <= current_time), a wrapped negative index
lands on a slot that has not yet been overwritten (buffer is 2x the window,
speedy.c:95), so it still holds 0. The zero-pad here is therefore exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("future", "past", "num_out"))
def tapered_max_hysteresis(
    values: jnp.ndarray, future: int, past: int, num_out: int
) -> jnp.ndarray:
    """Evaluate speedyEvaluateHysteresis for t = 0..num_out-1.

    values: [T] per-frame compressed energies (hysteresis buffer contents).
    Returns [num_out]: (max_i taper_f(i)·v[t+i] + max_i taper_p(i)·v[t-i])/2
    with taper_f(i) = (future-i)/future over i=0..future (speedy.c:595-601)
    and taper_p(i) = (past-i)/past over i=0..past (speedy.c:602-608).
    Maxima are clamped at 0 (accumulators start at 0.0, speedy.c:594).
    """
    dtype = values.dtype
    t = jnp.arange(num_out, dtype=jnp.int32)[:, None]

    i_f = np.arange(future + 1, dtype=np.int32)
    taper_f = jnp.asarray((future - i_f) / float(future), dtype)
    fut_idx = t + i_f[None, :]
    fut_vals = jnp.take(values, fut_idx, axis=0, mode="fill", fill_value=0)
    future_max = jnp.maximum(jnp.max(fut_vals * taper_f[None, :], axis=1), 0.0)

    i_p = np.arange(past + 1, dtype=np.int32)
    taper_p = jnp.asarray((past - i_p) / float(past), dtype)
    past_idx = t - i_p[None, :]
    past_vals = jnp.where(
        past_idx >= 0,
        jnp.take(values, jnp.maximum(past_idx, 0), axis=0, mode="clip"),
        jnp.zeros((), dtype),
    )
    past_max = jnp.maximum(jnp.max(past_vals * taper_p[None, :], axis=1), 0.0)

    return (past_max + future_max) / 2.0
