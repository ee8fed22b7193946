"""Hermetic (CPU, interpret-mode) coverage of the Pallas gather kernels.

The test mesh is CPU-only, so the Mosaic lowering itself can only run on
real hardware — but `pallas_call(interpret=True)` executes the kernel
logic (DMA emulation, pl.when skips, roll/select extraction, one-hot
matmul) exactly, which is what caught the kernel's bf16-dot bug during
development. These tests pin the per-row kernel (with n_valid skipping)
and the block-span kernel against the XLA reference gather.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

import speedy_tpu.ops.pallas_kernels as pk


@pytest.fixture()
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def interp(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pk.pl, "pallas_call", interp)
    # The jitted wrappers close over pl.pallas_call at trace time; clear
    # their caches so the patched version is traced.
    pk.gather_rows_pallas.clear_cache()
    pk.gather_rows_block_pallas.clear_cache()
    yield
    pk.gather_rows_pallas.clear_cache()
    pk.gather_rows_block_pallas.clear_cache()


def _random_case(B=3, K=64, width=321, L=40000, monotone=False):
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((B, L)).astype(np.float32))
    if monotone:
        steps = rng.integers(0, 900, size=(B, K))
        starts = np.minimum(np.cumsum(steps, axis=1), L - width - 1)
    else:
        starts = rng.integers(0, L - width, size=(B, K))
    return x, jnp.asarray(starts.astype(np.int32))


def test_per_row_kernel_interpret_matches_reference(interpret_pallas):
    x, starts = _random_case()
    ref = np.asarray(pk.gather_rows_reference(x, starts, 321))
    got = np.asarray(pk.gather_rows_pallas(x, starts, 321, 8))
    np.testing.assert_array_equal(ref, got)
    # 32-row programs (the production configuration)
    got32 = np.asarray(pk.gather_rows_pallas(x, starts, 321, 32))
    np.testing.assert_array_equal(ref, got32)


def test_per_row_kernel_n_valid_skip(interpret_pallas):
    x, starts = _random_case()
    ref = np.asarray(pk.gather_rows_reference(x, starts, 321))
    nv = jnp.asarray(np.array([64, 17, 0], np.int32))
    got = np.asarray(pk.gather_rows_pallas(x, starts, 321, 8, nv))
    for b in range(3):
        np.testing.assert_array_equal(ref[b, : int(nv[b])], got[b, : int(nv[b])])


def test_block_span_kernel_interpret_matches_reference(interpret_pallas):
    x, starts = _random_case(K=100, monotone=True)
    R = 32
    w_span = -(-((R - 1) * 900 + 321 + 32) // 1024) * 1024
    ref = np.asarray(pk.gather_rows_reference(x, starts, 321))
    got = np.asarray(pk.gather_rows_block_pallas(x, starts, 321, R, w_span))
    np.testing.assert_array_equal(ref, got)


def test_block_span_kernel_n_valid_and_odd_width(interpret_pallas):
    # width 443 (22.05 kHz row width) exercises nt=5 tile paths.
    x, starts = _random_case(K=70, width=443, monotone=True)
    R = 32
    w_span = -(-((R - 1) * 900 + 443 + 32) // 1024) * 1024
    ref = np.asarray(pk.gather_rows_reference(x, starts, 443))
    nv = jnp.asarray(np.array([70, 33, 1], np.int32))
    got = np.asarray(
        pk.gather_rows_block_pallas(x, starts, 443, R, w_span, nv)
    )
    for b in range(3):
        np.testing.assert_array_equal(ref[b, : int(nv[b])], got[b, : int(nv[b])])
