"""Teager energy operator — the reference's glitch detector for verifying
resynthesis quality (sonic_test.cc:142-197): psi[n] = x[n]^2 - x[n-1]*x[n+1]
is constant for a pure sinusoid, so discontinuities from bad overlap-add
splices show up as outliers."""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def teager(x: jnp.ndarray) -> jnp.ndarray:
    """psi[n] over the interior samples: [L] -> [L-2]."""
    return x[1:-1] * x[1:-1] - x[:-2] * x[2:]


def teager_stats(x):
    """(mean, variance) of the Teager signal, like TeagerVariance
    (sonic_test.cc:142-156). Host-side numpy: test utility, and variable
    output lengths would force a jit recompile per shape."""
    import numpy as np

    x = np.asarray(x, dtype=np.float32)
    t = x[1:-1] * x[1:-1] - x[:-2] * x[2:]
    return float(t.mean()), float(t.var())
