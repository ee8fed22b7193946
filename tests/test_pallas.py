"""Pallas kernel tests. The DMA gather kernel only compiles on real TPU
hardware; on the CPU test mesh we verify the dispatch fallback and run the
kernel in interpret mode on a tiny case."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speedy_tpu.ops.pallas_kernels import gather_rows, gather_rows_reference

import testutil


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


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="needs TPU")
def test_gather_rows_block_on_tpu():
    """Block-span kernel (the production synthesis gather): exact vs the
    reference, including valid-row skipping and the 22.05 kHz width."""
    from speedy_tpu.ops.pallas_kernels import gather_rows_block_pallas

    rng = np.random.default_rng(4)
    for width in (321, 443):
        B, K, L = 4, 300, 170000
        x = jnp.asarray(rng.normal(size=(B, L)).astype(np.float32))
        steps = rng.integers(0, 1100, size=(B, K))
        starts = jnp.asarray(
            np.minimum(np.cumsum(steps, axis=1), L - width - 1).astype(np.int32)
        )
        R = 128
        w_span = -(-((R - 1) * 1100 + width + 32) // 1024) * 1024
        ref = np.asarray(gather_rows_reference(x, starts, width))
        got = np.asarray(gather_rows_block_pallas(x, starts, width, R, w_span))
        np.testing.assert_array_equal(ref, got)
        nv = jnp.asarray(np.array([300, 100, 20, 1], np.int32))
        got_v = np.asarray(
            gather_rows_block_pallas(x, starts, width, R, w_span, nv)
        )
        for b in range(B):
            np.testing.assert_array_equal(
                ref[b, : int(nv[b])], got_v[b, : int(nv[b])]
            )


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="needs TPU")
def test_gather_rows_n_valid_skip_on_tpu():
    from speedy_tpu.ops.pallas_kernels import gather_rows

    rng = np.random.default_rng(5)
    B, K, W, L = 4, 96, 321, 30000
    x = jnp.asarray(rng.normal(size=(B, L)).astype(np.float32))
    starts = jnp.asarray(rng.integers(0, L - W, size=(B, K)).astype(np.int32))
    nv = jnp.asarray(np.array([96, 17, 0, 50], np.int32))
    ref = np.asarray(gather_rows_reference(x, starts, W))
    got = np.asarray(jax.jit(lambda x, s, n: gather_rows(x, s, W, n))(x, starts, nv))
    for b in range(B):
        np.testing.assert_array_equal(ref[b, : int(nv[b])], got[b, : int(nv[b])])


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="needs TPU")
@pytest.mark.parametrize("hop", [160, 220, 441])
def test_fused_synth_kernel_on_tpu(hop):
    """The fused gather+interp+window+OLA kernel must match the XLA synth
    composition on hardware (Mosaic lowering of the t-major layout, fixed
    hop shifts, cross-block OLA carry, and slot-0 special case) — at
    every production hop geometry (frame steps of 16/22.05/44.1 kHz;
    the round-5 rates all serve through this kernel)."""
    from speedy_tpu.ops.pallas_kernels import gather_synth_block_pallas
    from tests.test_pallas_kernels import _synth_reference

    rng = np.random.default_rng(9)
    B, K, L = 4, 300, 60000 * max(1, hop // 160)
    width = 2 * hop + 1
    x = jnp.asarray(rng.normal(size=(B, L)).astype(np.float32))
    steps = rng.uniform(hop * 0.5, hop * 5.5, (B, K))
    starts = jnp.asarray(
        np.minimum(np.cumsum(steps, axis=1).astype(np.int32), L - width - 1)
    )
    af = jnp.asarray(rng.uniform(0.0, 1.0, (B, K)).astype(np.float32))
    R = 128
    need = (R - 1) * int(np.ceil(hop * 6.0)) + width + 32
    w_span = -(-need // 1024) * 1024
    ref = np.asarray(_synth_reference(x, starts, af, hop))
    got = np.asarray(
        gather_synth_block_pallas(x, starts, af, hop, width, R, w_span)
    )
    np.testing.assert_allclose(got, ref, rtol=0, atol=2e-5)
    nv = jnp.asarray(np.array([300, 100, 20, 1], np.int32))
    got_v = np.asarray(
        gather_synth_block_pallas(x, starts, af, hop, width, R, w_span, nv)
    )
    for b in range(B):
        np.testing.assert_allclose(
            ref[b, : int(nv[b])], got_v[b, : int(nv[b])], rtol=0, atol=2e-5
        )


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="needs TPU")
def test_streaming_device_pipeline_on_tpu():
    """The segment-continued streaming pipeline on real hardware: the
    continuation hooks (in_offset/out_shift/phase_ref/mask_output) must
    compose with the fused synthesis kernel and match the single-shot
    meshed engine."""
    import jax.numpy as jnp

    from speedy_tpu.config import SpeedyConfig
    from speedy_tpu.parallel.batch import batched_nonlinear_speedup
    from speedy_tpu.streaming_device import DeviceStreamingPipeline

    cfg = SpeedyConfig(16000)
    rng = np.random.default_rng(0)
    t = np.arange(16000 * 6) / 16000.0
    x = (
        0.3
        * np.sin(2 * np.pi * (150 + 30 * np.sin(2 * np.pi * 0.5 * t)) * t)
        * np.clip(np.sin(2 * np.pi * 2.5 * t), 0, None)
        + 0.002 * rng.standard_normal(t.size)
    ).astype(np.float32)
    ref = batched_nonlinear_speedup(
        jnp.asarray(x)[None], jnp.asarray([len(x)], np.int32), cfg, 3.0
    )
    v = int(ref.valid_length[0])
    y = DeviceStreamingPipeline(
        cfg, 3.0, chunk_frames=128, segment_frames=256
    ).process(x)
    assert abs(len(y) - v) <= 2, (len(y), v)
    n = min(len(y), v)
    d = np.abs(y[:n] - np.asarray(ref.output[0, :n]))
    assert d.max() < 5e-3 and d.mean() < 1e-4, (d.max(), d.mean())


def _analysis_tpu_batch(B=4, L=48000):
    """Realistic mixed batch for the analysis-kernel hardware gates:
    voiced speechlike, noise, bursty, chirp — the bench's family mix."""
    rng = np.random.default_rng(13)
    t = np.arange(L) / 16000.0
    f0 = 120.0 + 40.0 * np.sin(2 * np.pi * 0.6 * t)
    voiced = sum(
        np.sin(k * np.cumsum(2 * np.pi * f0 / 16000.0)) / k for k in range(1, 5)
    ) * np.clip(np.sin(2 * np.pi * 2.2 * t), 0, None)
    noise = rng.standard_normal(L) * 0.08
    bursty = np.zeros(L)
    bursty[6000:26000] = voiced[:20000]
    chirp = np.sin(2 * np.pi * (80 + 400 * t) * t) * 0.3
    x = np.stack([voiced * 0.3, noise, bursty * 0.4, chirp]).astype(np.float32)
    return x[:B]


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="needs TPU")
@pytest.mark.parametrize("W,step", [(240, 160), (330, 220)])
def test_analysis_kernel_on_tpu(W, step):
    """The fused analysis front-end's Mosaic lowering (strided-slice
    window extraction, lane rolls with row carry, manual 3-pass bf16
    HIGH split, masked log-ratio) must match interpret mode on hardware.
    The HIGH split is the fold-proof truncation form (_bf16_trunc_split),
    so both modes run the same math and agree to summation-order noise
    (probe: experiments/analysis_hw_vs_interp.py — max rel 3.6e-7 at
    HIGH, 5.4e-7 at HIGHEST on the 4-family batch). Covers both lattice
    classes: 16 kHz (gf = 4, dense) and the reference's canonical
    22.05 kHz (gf = 32, 32-group slabs)."""
    from speedy_tpu.ops.pallas_kernels import analysis_energy_lsd_pallas

    x = jnp.asarray(_analysis_tpu_batch())
    T = (x.shape[1] - W) // step + 1
    g = jnp.asarray([1.0, 0.7, 1.3, 0.9], jnp.float32)
    for prec in ("high", "highest"):
        e_hw, l_hw = analysis_energy_lsd_pallas(
            x, T, W, step, gain=g, precision=prec
        )
        e_it, l_it = analysis_energy_lsd_pallas(
            x, T, W, step, gain=g, precision=prec, interpret=True
        )
        e_hw, l_hw, e_it, l_it = map(np.asarray, (e_hw, l_hw, e_it, l_it))
        np.testing.assert_allclose(e_hw, e_it, rtol=2e-6, atol=1e-3)
        # lsd[:, 0] is DON'T-CARE (zeroed by the skip gate downstream).
        dl = np.abs(l_hw[:, 1:] - l_it[:, 1:])
        assert dl.max() < 1e-3, (prec, dl.max())


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="needs TPU")
@pytest.mark.parametrize("sr", [16000, 22050])
def test_fused_frontend_on_tpu(sr):
    """The fused analysis+pitch variant on hardware: energy/lsd must be
    BITWISE what the pitch-free kernel computes (shared analysis body;
    pitch only grows the chunk slab), and periods must match
    pitch_ssd_pallas' hardware output up to the documented near-silence
    argmin-tie class (same gate as test_pitch_ssd_kernel_on_tpu).
    Runs at 16 kHz and the reference's canonical 22.05 kHz."""
    from speedy_tpu.config import SpeedyConfig
    from speedy_tpu.ops.pallas_kernels import (
        analysis_energy_lsd_pallas,
        pitch_ssd_pallas,
    )
    from speedy_tpu.ops import wsola_fast

    cfg = SpeedyConfig(sr)
    x = jnp.asarray(_analysis_tpu_batch())
    B, L = x.shape
    W, step = cfg.window_size, cfg.frame_step_int
    T = (L - W) // step + 1
    taps = maxp = cfg.wsola_max_period
    minp = cfg.wsola_min_period
    seg_w = taps + maxp
    G = -(-seg_w // 128) * 128
    g = jnp.asarray([1.0, 0.7, 1.3, 0.9], jnp.float32)

    e1, l1 = analysis_energy_lsd_pallas(x, T, W, step, gain=g, precision="high")
    e2, l2, per = analysis_energy_lsd_pallas(
        x, T, W, step, gain=g, precision="high",
        pitch_geom=(taps, minp, maxp, G),
    )
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))

    n_grid = -(-(L + seg_w) // G)
    assert per.shape == (B, n_grid)
    n_cells = -(-n_grid // 64) * 64
    xg = np.zeros((B, n_cells * G), np.float32)
    xg[:, :L] = np.asarray(x)
    ref = np.asarray(
        pitch_ssd_pallas(
            jnp.asarray(xg.reshape(B, n_cells, G)), taps, minp, maxp, gain=g
        )
    )[:, :n_grid]
    per = np.asarray(per)
    # Strongly-voiced cells (template carries signal): any integer flip
    # must be a genuine float64 SSD tie (the two paths reorder summation
    # by ~2^-22); non-flip cells agree to sub-sample refinement noise.
    # Near-silent templates have contrast-free SSDs whose ties flip
    # freely (absorbed by phase snapping) and are not gated.
    segs = xg.reshape(B, n_cells, G)[:, :n_grid]
    tmpl = segs[..., :taps] * np.asarray(g)[:, None, None]
    voiced = np.sqrt((tmpl**2).mean(axis=2)) > 1e-2
    assert voiced.mean() > 0.3
    testutil.assert_period_flips_are_ties(
        segs, per, ref, taps, minp, maxp, mask=voiced
    )
    agree = voiced & (np.abs(per - ref) <= 0.5)
    np.testing.assert_allclose(per[agree], ref[agree], rtol=0, atol=5e-2)


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="needs TPU")
@pytest.mark.parametrize("sr", [16000, 22050, 44100])
def test_pitch_ssd_kernel_on_tpu(sr):
    """The production pitch kernel's Mosaic lowering (packed split-complex
    DFT matmuls, template-energy column folded into the lag-energy matmul,
    in-VMEM gain) must match interpret mode on hardware. Periods are
    sub-sample (parabolic refinement), so allow tiny refinement noise but
    require the integer lag decisions to agree everywhere."""
    from speedy_tpu.ops.pallas_kernels import pitch_ssd_pallas

    rng = np.random.default_rng(11)
    B, nc = 4, 64
    # Production geometries per rate (wsola_fast: taps = maxp, G =
    # pitch_grid_stride): 16 kHz / 22.05 kHz / 44.1 kHz all serve
    # through this kernel on hardware.
    G, taps, minp, maxp = {
        16000: (512, 246, 40, 246),
        22050: (768, 339, 55, 339),
        44100: (1408, 678, 110, 678),
    }[sr]
    t = np.arange(nc * G) / float(sr)
    voiced = np.sin(2 * np.pi * 130.0 * t) + 0.4 * np.sin(2 * np.pi * 260.0 * t)
    x = np.stack(
        [
            voiced,
            np.sin(2 * np.pi * (90 + 150 * np.linspace(0, 1, t.size)) * t),
            rng.standard_normal(t.size) * 0.1,
            voiced * np.clip(np.sin(2 * np.pi * 2.0 * t), 0, None),
        ]
    ).astype(np.float32)
    xg = jnp.asarray(x.reshape(B, nc, G))
    gain = jnp.asarray(np.linspace(0.5, 1.5, B).astype(np.float32))
    hw = np.asarray(pitch_ssd_pallas(xg, taps, minp, maxp, gain=gain))
    it = np.asarray(
        pitch_ssd_pallas(xg, taps, minp, maxp, gain=gain, interpret=True)
    )
    # Cells whose TEMPLATE (first `taps` samples) is near-silent have a
    # contrast-free SSD — argmin TIES that MXU vs host rounding resolves
    # differently, absorbed downstream by phase snapping (see CLAUDE.md
    # pitch-kernel ledger entry). Where the template carries signal,
    # decisions must agree EXCEPT for provable SSD ties: at the wider
    # 22.05/44.1 kHz geometries the harmonic stack makes ~1/200 voiced
    # cells land on near-exact multi-period ties that hardware MXU vs
    # interpret rounding resolve differently — every such flip must pass
    # the float64 tie attribution (the repo's standard for pitch-path
    # disagreements), and non-flip cells must agree to refinement noise.
    tmpl_rms = np.sqrt((np.asarray(xg)[:, :, :taps] ** 2).mean(axis=2))
    voiced = tmpl_rms > 1e-2
    assert voiced.mean() > 0.5  # the gate must not trivialize the test
    segs = np.asarray(x.reshape(B, nc, G))
    testutil.assert_period_flips_are_ties(
        segs, hw, it, taps, minp, maxp, mask=voiced, max_flip_frac=0.01
    )
    agree = voiced & (np.abs(hw - it) <= 0.5)
    assert agree.mean() > 0.95 * voiced.mean()
    np.testing.assert_allclose(hw[agree], it[agree], rtol=0, atol=5e-2)
