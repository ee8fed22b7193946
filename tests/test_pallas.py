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


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="needs TPU")
def test_gather_rows_coalesced_on_tpu():
    """Experimental coalesced kernel: both the span path (sorted starts)
    and the per-row fallback (random starts) must be bit-exact."""
    from speedy_tpu.ops.pallas_coalesced import gather_rows_coalesced

    rng = np.random.default_rng(2)
    B, K, W, L = 8, 256, 321, 60000
    x = jnp.asarray(rng.normal(size=(B, L)).astype(np.float32))
    base = np.cumsum(rng.integers(150, 400, size=(B, K)), axis=1)
    base = (base % (L - W - 2048)).astype(np.int32)
    base.sort(axis=1)
    for starts in (base, rng.integers(0, L - W - 2048, size=(B, K)).astype(np.int32)):
        got = gather_rows_coalesced(x, jnp.asarray(starts), W)
        ref = gather_rows_reference(x, jnp.asarray(starts), W)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="needs TPU")
def test_gather_rows_pipelined_on_tpu():
    from speedy_tpu.ops.pallas_kernels import gather_rows_pipelined

    rng = np.random.default_rng(3)
    B, K, W, L = 4, 200, 321, 50000
    x = jnp.asarray(rng.normal(size=(B, L)).astype(np.float32))
    starts = jnp.asarray(
        np.sort(rng.integers(0, L - W, size=(B, K))).astype(np.int32)
    )
    got = gather_rows_pipelined(x, starts, W)
    ref = gather_rows_reference(x, starts, W)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
