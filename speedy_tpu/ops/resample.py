"""Playback-rate change (sonicSetRate semantics): varispeed resampling.

The reference delegates rate changes to libsonic, which resamples between
pitch periods; the contract is output_samples ~= input/rate with the pitch
shifted by the same factor. Linear interpolation at these audio rates is
transparent for speech (first-null well above the band of interest);
implemented as a static-capacity masked op so it jits and vmaps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("capacity",))
def resample_linear(x: jnp.ndarray, rate, valid_in, capacity: int):
    """Resample x[..., L] by `rate` (>1 = faster/shorter output).

    Returns (y[..., capacity], valid_out). Output sample i is x interpolated
    at i*rate, masked past valid_out = floor((valid_in - 1)/rate) + 1.
    """
    dtype = x.dtype
    rate = jnp.asarray(rate, dtype)
    valid_in = jnp.asarray(valid_in, jnp.int32)
    pos = jnp.arange(capacity, dtype=dtype) * rate
    i0 = jnp.floor(pos).astype(jnp.int32)
    frac = pos - i0.astype(dtype)
    i0 = jnp.clip(i0, 0, x.shape[-1] - 1)
    i1 = jnp.clip(i0 + 1, 0, x.shape[-1] - 1)
    y = jnp.take(x, i0, axis=-1) * (1.0 - frac) + jnp.take(x, i1, axis=-1) * frac
    valid_out = jnp.where(
        valid_in > 0,
        (jnp.floor((valid_in.astype(dtype) - 1.0) / rate)).astype(jnp.int32) + 1,
        0,
    )
    valid_out = jnp.minimum(valid_out, capacity)
    mask = jnp.arange(capacity) < valid_out
    return jnp.where(mask, y, 0.0), valid_out


def resample_linear_np(x: np.ndarray, rate: float) -> np.ndarray:
    """Host-side resampler for the streaming engine (same semantics)."""
    x = np.asarray(x)
    n = len(x)
    if n == 0 or rate == 1.0:
        return x.copy()
    out_n = int(np.floor((n - 1) / rate)) + 1
    pos = np.arange(out_n) * rate
    i0 = np.clip(np.floor(pos).astype(np.int64), 0, n - 1)
    i1 = np.clip(i0 + 1, 0, n - 1)
    frac = (pos - i0).astype(x.dtype if x.dtype.kind == "f" else np.float32)
    if x.ndim == 2:
        frac = frac[:, None]
    return (x[i0] * (1.0 - frac) + x[i1] * frac).astype(x.dtype, copy=False)
