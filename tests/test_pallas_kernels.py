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

import testutil


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


def _synth_reference(x, starts, af, hop):
    """XLA composition the fused kernel must match: gather width-(2*hop+1)
    rows, fractional interp, COLA-Hann window, half-slot OLA (slot 0
    unwindowed) — the synth() algebra in ops/wsola_fast.py."""
    from speedy_tpu.ops.wsola_fast import _cola_hann

    B = x.shape[0]
    width = 2 * hop + 1
    wide = pk.gather_rows_reference(x, starts, width)
    afj = af[:, :, None]
    raw = wide[:, :, :-1] * (1.0 - afj) + wide[:, :, 1:] * afj
    win = jnp.asarray(_cola_hann(2 * hop))
    rows = raw * win[None, None, :]
    firsts = rows[:, :, :hop]
    seconds = rows[:, :, hop:]
    slots = firsts + jnp.concatenate(
        [jnp.zeros((B, 1, hop), jnp.float32), seconds[:, :-1]], axis=1
    )
    return jnp.concatenate([raw[:, :1, :hop], slots[:, 1:]], axis=1)


def _synth_case(hop, K, n_valid, seed=7, B=3, L=40000, max_step_factor=5.5):
    rng = np.random.default_rng(seed)
    width = 2 * hop + 1
    x = jnp.asarray(rng.standard_normal((B, L)).astype(np.float32))
    steps = rng.uniform(hop * 0.5, hop * max_step_factor, (B, K))
    starts = jnp.asarray(
        np.minimum(np.cumsum(steps, axis=1).astype(np.int32), L - width - 1)
    )
    af = jnp.asarray(rng.uniform(0.0, 1.0, (B, K)).astype(np.float32))
    R = 128
    need = (R - 1) * int(np.ceil(hop * 6.0)) + width + 32
    w_span = -(-need // 1024) * 1024
    got = pk.gather_synth_block_pallas(
        x, starts, af, hop, width, R, w_span,
        None if n_valid is None else jnp.asarray(n_valid, jnp.int32),
        interpret=True,
    )
    ref = _synth_reference(x, starts, af, hop)
    return np.asarray(got), np.asarray(ref)


@pytest.mark.parametrize(
    "hop,K",
    [
        (160, 300),  # 16 kHz production shape (ts=2, rr=32), K % 128 != 0
        (220, 256),  # 22.05 kHz (ts=2, rr=92)
        (128, 130),  # tile-aligned hop (rr=0)
        (96, 140),   # single slot tile (ts=1)
    ],
)
def test_fused_synth_kernel_interpret_matches_reference(hop, K):
    got, ref = _synth_case(hop, K, None)
    np.testing.assert_allclose(got, ref, rtol=0, atol=2e-5)


def test_fused_synth_kernel_n_valid_skip():
    # nv=0 exercises the no-valid-blocks path (no span/output DMAs, no
    # semaphore drains) on a whole utterance.
    nv = np.array([300, 170, 0], np.int32)
    got, ref = _synth_case(160, 300, nv)
    for b in range(3):
        np.testing.assert_allclose(
            got[b, : nv[b]], ref[b, : nv[b]], rtol=0, atol=2e-5
        )


def _pathological_starts(hop=160, K=300, B=2, L=400000):
    """Starts that satisfy the BLOCK-level span bound but concentrate a
    ~100k-sample jump inside one 16-row sub-block — exactly the case the
    fused kernel's hierarchical select cannot represent (its narrowed
    sub-block window is ~16k samples)."""
    width = 2 * hop + 1
    R = 128
    need = (R - 1) * int(np.ceil(hop * 6.0)) + width + 32
    w_span = -(-need // 1024) * 1024
    starts = np.cumsum(np.full((B, K), hop, np.int64), axis=1)
    starts[:, 8:16] += w_span - width - 4096  # inside sub-block 0 of block 0
    starts = np.minimum(starts, L - width - 1).astype(np.int32)
    return starts, width, R, w_span


def test_span_contract_validator_accepts_production_starts():
    rng = np.random.default_rng(2)
    hop, K, B = 160, 300, 3
    width = 2 * hop + 1
    R = 128
    need = (R - 1) * int(np.ceil(hop * 6.0)) + width + 32
    w_span = -(-need // 1024) * 1024
    steps = rng.uniform(hop * 0.5, hop * 5.5, (B, K))
    starts = np.cumsum(steps, axis=1).astype(np.int32)
    pk.validate_span_contract(starts, width, R, w_span)  # must not raise


def test_span_contract_validator_rejects_pathological():
    starts, width, R, w_span = _pathological_starts()
    with pytest.raises(ValueError, match="span contract violated"):
        pk.validate_span_contract(starts, width, R, w_span)
    # ...but the violating block is DEAD for utterance 1 -> no error.
    nv = np.array([0, 300], np.int32)
    starts2 = starts.copy()
    starts2[1] = np.cumsum(np.full(starts.shape[1], 160, np.int64)).astype(
        np.int32
    )
    pk.validate_span_contract(starts2, width, R, w_span, n_valid=nv)


def test_span_contract_nan_poison(monkeypatch):
    """SPEEDY_VALIDATE_SPAN=1 turns a (previously silent-zero) span
    contract violation into loud NaNs; clean inputs stay NaN-free."""
    starts, width, R, w_span = _pathological_starts(B=1, K=300)
    hop = (width - 1) // 2
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((1, 400000)).astype(np.float32))
    af = jnp.asarray(rng.uniform(0, 1, starts.shape).astype(np.float32))

    monkeypatch.setenv("SPEEDY_VALIDATE_SPAN", "1")
    pk.gather_synth_block_pallas.clear_cache()
    try:
        got = np.asarray(
            pk.gather_synth_block_pallas(
                x, jnp.asarray(starts), af, hop, width, R, w_span,
                interpret=True,
            )
        )
        assert np.isnan(got).all(), "violation must poison the output"
        clean = np.cumsum(np.full((1, 300), hop, np.int64)).astype(np.int32)
        ok = np.asarray(
            pk.gather_synth_block_pallas(
                x, jnp.asarray(clean.reshape(1, -1)), af, hop, width, R,
                w_span, interpret=True,
            )
        )
        assert np.isfinite(ok).all()
    finally:
        pk.gather_synth_block_pallas.clear_cache()


def test_grid_pipeline_fused_synth(monkeypatch):
    """ADVICE r1: run the PRODUCTION fused-synthesis wiring (kernel in
    interpret mode) through the full _wsola_grid_batch pipeline on CPU
    and pin it against the XLA-composition synthesis path — catches
    pipeline-level regressions in the kernel wiring hermetically."""
    from speedy_tpu.config import SpeedyConfig
    from speedy_tpu.ops import wsola_fast as wf

    cfg = SpeedyConfig(16000)
    rng = np.random.default_rng(9)
    L = 16000
    t = np.arange(L) / 16000.0
    x = (
        0.4 * np.sin(2 * np.pi * 170 * t) * np.clip(np.sin(2 * np.pi * 3 * t), 0, None)
        + 0.002 * rng.standard_normal(L)
    ).astype(np.float32)
    F = L // cfg.frame_step_int
    speeds = np.linspace(1.5, 3.4, F).astype(np.float32)

    ref = wf.time_scale_grid(x, speeds, cfg, max_speed_bound=4.0)
    ref_out = np.asarray(ref.output)

    monkeypatch.setenv("SPEEDY_FORCE_FUSED_SYNTH", "interpret")
    wf._wsola_grid_batch.clear_cache()
    try:
        got = wf.time_scale_grid(x, speeds, cfg, max_speed_bound=4.0)
        assert int(got.valid_length) == int(ref.valid_length)
        np.testing.assert_allclose(
            np.asarray(got.output), ref_out, rtol=0, atol=2e-5
        )
    finally:
        wf._wsola_grid_batch.clear_cache()


def test_fused_synth_in_kernel_gain(monkeypatch):
    """The fused kernel's in-VMEM per-row gain (applied post-selection so
    the padded HBM source stays gain-free / loop-invariant) must match
    prescaling the input, through the full production pipeline wiring."""
    from speedy_tpu.config import SpeedyConfig
    from speedy_tpu.parallel.batch import batched_nonlinear_speedup

    cfg = SpeedyConfig(16000)
    rng = np.random.default_rng(11)
    B, L = 3, 12000
    t = np.arange(L) / 16000.0
    base = (
        0.3 * np.sin(2 * np.pi * np.array([150.0, 220.0, 95.0])[:, None] * t)
        * np.clip(np.sin(2 * np.pi * 2.5 * t), 0, None)
        + 0.002 * rng.standard_normal((B, L))
    ).astype(np.float32)
    lengths = jnp.asarray([L, L - 1700, L], jnp.int32)
    g = jnp.asarray([0.5, 0.9, 1.2], jnp.float32)

    # Force BOTH production kernels (interpret mode): in-VMEM gain in the
    # synthesis kernel AND the pitch kernel must together match the
    # prescaled pipeline.
    monkeypatch.setenv("SPEEDY_FORCE_FUSED_SYNTH", "interpret")
    monkeypatch.setenv("SPEEDY_FORCE_PITCH_KERNEL", "interpret")
    from speedy_tpu.ops import wsola_fast as wf

    wf._wsola_grid_batch.clear_cache()
    try:
        ref = batched_nonlinear_speedup(
            jnp.asarray(base) * g[:, None], lengths, cfg, 3.0
        )
        got = batched_nonlinear_speedup(
            jnp.asarray(base), lengths, cfg, 3.0, gain=g
        )
        np.testing.assert_array_equal(
            np.asarray(got.valid_length), np.asarray(ref.valid_length)
        )
        # 1e-3: kernel-gain reassociation + pitch-dot rounding shift
        # sub-sample period fractions by ulps (see
        # test_grid_pipeline_kernel_pitch).
        np.testing.assert_allclose(
            np.asarray(got.output), np.asarray(ref.output), atol=1e-3
        )
    finally:
        wf._wsola_grid_batch.clear_cache()


def test_grid_pipeline_kernel_pitch(monkeypatch):
    """SPEEDY_FORCE_PITCH_KERNEL=interpret routes the PRODUCTION pitch
    kernel (pitch_ssd_pallas, the TPU path) through the full
    _wsola_grid_batch pipeline hermetically; on a well-voiced signal the
    output must match the einsum-pitch pipeline (near-silence argmin tie
    flips are absorbed by phase snapping and the tolerance)."""
    from speedy_tpu.config import SpeedyConfig
    from speedy_tpu.ops import wsola_fast as wf

    cfg = SpeedyConfig(16000)
    L = 16000
    t = np.arange(L) / 16000.0
    x = (
        0.4 * np.sin(2 * np.pi * 160 * t)
        + 0.2 * np.sin(2 * np.pi * 320 * t)
        + 0.004 * np.random.default_rng(3).standard_normal(L)
    ).astype(np.float32)
    F = L // cfg.frame_step_int
    speeds = np.linspace(2.0, 3.2, F).astype(np.float32)

    ref = wf.time_scale_grid(x, speeds, cfg, max_speed_bound=4.0)

    monkeypatch.setenv("SPEEDY_FORCE_PITCH_KERNEL", "interpret")
    wf._wsola_grid_batch.clear_cache()
    try:
        got = wf.time_scale_grid(x, speeds, cfg, max_speed_bound=4.0)
        assert int(got.valid_length) == int(ref.valid_length)
        # 1e-3: the kernel's dot rounding shifts sub-sample period
        # fractions by ulps, which the fractional-delay interp turns into
        # ~2e-4 sample differences (measured max 2.4e-4; a genuine period
        # flip would produce O(signal) differences).
        np.testing.assert_allclose(
            np.asarray(got.output), np.asarray(ref.output), rtol=0, atol=1e-3
        )
    finally:
        wf._wsola_grid_batch.clear_cache()


def test_pitch_ssd_kernel_interpret_matches_xla():
    """pitch_ssd_pallas (kept as a documented measured-equal alternative
    to the production einsum path) must agree with ssd_matmul +
    parabolic_min on the period decisions."""
    from speedy_tpu.ops import wsola_fast as wf

    rng = np.random.default_rng(5)
    B, nc, G = 2, 80, 512
    taps, maxp, minp = 246, 246, 40
    seg_w = taps + maxp
    t = np.arange(nc * G) / 16000.0
    xg = rng.standard_normal((B, nc, G)).astype(np.float32) * 0.3
    xg[0] = (0.5 * np.sin(2 * np.pi * 180 * t)).astype(np.float32).reshape(
        nc, G
    )
    xg[:, -1] = 0.0
    xj = jnp.asarray(xg)
    seg = xj[:, :, :seg_w]
    # replicate the production XLA pitch math via the module helpers
    M = 512
    nb = M // 2 + 1
    nl = maxp - minp + 1
    Ea, Es, Inv, Band = (
        jnp.asarray(m)
        for m in wf._pitch_corr_matrices(taps, seg_w, minp, maxp, M)
    )
    prec = wf._PITCH_PRECISION
    a0 = seg[..., :taps]
    FA = jnp.einsum("bgt,tk->bgk", a0, Ea, precision=prec)
    FS = jnp.einsum("bgt,tk->bgk", seg, Es, precision=prec)
    AR, AI = FA[..., :nb], FA[..., nb:]
    SR, SI = FS[..., :nb], FS[..., nb:]
    cc = jnp.einsum(
        "bgk,kl->bgl", AR * SR + AI * SI, Inv[:nb], precision=prec
    ) + jnp.einsum("bgk,kl->bgl", AR * SI - AI * SR, Inv[nb:], precision=prec)
    E = jnp.einsum("bgt,tl->bgl", seg * seg, Band, precision=prec)
    ssd_v = E[..., nl:] + E[..., :nl] - 2.0 * cc
    jmin = jnp.argmin(ssd_v, axis=-1)
    jc = jnp.clip(jmin, 1, maxp - minp - 1)
    take = lambda off: jnp.take_along_axis(
        ssd_v, (jc + off)[..., None], axis=2
    )[..., 0]
    l, m, r = take(-1), take(0), take(1)
    den = l - 2.0 * m + r
    frac = jnp.where(jnp.abs(den) > 1e-12, 0.5 * (l - r) / den, 0.0)
    ref = np.asarray(
        (minp + jc).astype(jnp.float32) + jnp.clip(frac, -0.5, 0.5)
    )
    got = np.asarray(pk.pitch_ssd_pallas(xj, taps, minp, maxp, interpret=True))
    d = np.abs(ref - got)
    assert np.mean(d > 0.1) < 0.005, d.max()


def _analysis_xla_chain(xs, W, step, T, gain=None):
    """Inline replica of the XLA analysis front-end (parallel/batch.py)
    producing (energy[B,T], lsd[B,T]) for the kernel gate."""
    B, L = xs.shape
    dtype = xs.dtype
    m = -(-W // step)
    n_cells = T + m
    xs_pad = jnp.concatenate(
        [xs, jnp.zeros((B, n_cells * step - L), dtype)], axis=1
    )
    y = xs_pad.reshape(B, n_cells, step)
    frames = jnp.concatenate(
        [y[:, j : j + T] for j in range(m)], axis=-1
    )[:, :, :W]
    starts = np.arange(T, dtype=np.int64) * step
    prev_last = jnp.take(
        xs, jnp.asarray(starts[:-1] + (W - 1)), axis=1, mode="clip"
    )
    state = jnp.concatenate([jnp.zeros((B, 1), dtype), prev_last], axis=1)
    prev = jnp.concatenate([state[:, :, None], frames[:, :, :-1]], axis=2)
    pre = frames - 0.97 * prev
    from speedy_tpu.ops import dft

    win = jnp.asarray(dft.hamming_window(W))
    cos_m, sin_m = dft.dft_matrices(W)
    fw = pre * win[None, None, :]
    if gain is not None:
        fw = fw * gain[:, None, None]
    hi = jax.lax.Precision.HIGHEST
    re = jnp.dot(fw, jnp.asarray(cos_m), precision=hi)
    im = jnp.dot(fw, jnp.asarray(sin_m), precision=hi)
    half = jnp.sqrt(re * re + im * im)[:, :, :W]
    energy = jnp.sum(half[:, :, 1:] ** 2, axis=-1)
    cur = half
    last = jnp.concatenate(
        [jnp.zeros((B, 1, W), half.dtype), half[:, :-1]], axis=1
    )
    eps = jnp.asarray(2.220446049250313e-16, dtype)
    e_l = jnp.sum(last[:, :, 1:] ** 2, axis=-1)
    nc = cur / (jnp.sqrt(energy)[..., None] + eps)
    nl = last / (jnp.sqrt(e_l)[..., None] + eps)
    th = jnp.max(cur[:, :, 1:], axis=-1, keepdims=True) / 100.0
    mask = (cur[:, :, 1:] > th) & (last[:, :, 1:] > th)
    lr = jnp.abs(jnp.log((nc[:, :, 1:] + eps) / (nl[:, :, 1:] + eps)))
    return energy, jnp.sum(jnp.where(mask, lr, 0.0), axis=-1)


def _analysis_test_batch(L=32000):
    rng = np.random.default_rng(7)
    t = np.arange(L) / 16000.0
    voiced = (
        np.sin(2 * np.pi * 180 * t) * np.clip(np.sin(2 * np.pi * 2.3 * t), 0, None)
    ).astype(np.float32) * 0.4
    noise = rng.standard_normal(L).astype(np.float32) * 0.05
    bursty = np.zeros(L, np.float32)
    bursty[4000:12000] = voiced[:8000]
    return np.stack([voiced, noise, bursty])


@pytest.mark.parametrize(
    "sr,W,step,L",
    [
        (16000, 240, 160, 32000),
        # >= 3 chunks at 16 kHz: regression for the chunk_rows
        # under-count (the old +2-row slack missed row_views on chunks
        # whose 8-alignment residual d >= 4 — a trace-time reshape
        # failure first reachable at NC >= 3 on the pitch-free path).
        (16000, 240, 160, 340000),
        # 22.05 kHz — the reference's canonical rate (speedy.c:213-215):
        # the gf = 32 sparse-phase lattice with 32-group slabs.
        (22050, 330, 220, 66150),
        (22050, 330, 220, 441000),  # multi-chunk at 22.05 kHz
        # 24 kHz (negative_speed.wav's rate): gf = 8, the dense-lattice
        # boundary case.
        (24000, 360, 240, 96000),
    ],
)
def test_analysis_kernel_matches_xla(sr, W, step, L):
    """Fused analysis front-end == the XLA chain (matched f32/'highest'
    precision, interpret mode): the wiring gate for window extraction,
    preemphasis state (incl. the frame-0 zero state), Hamming, tile-split
    DFT, and the masked log-ratio — on voiced/noise/bursty signals with
    per-utterance gain, across both lattice classes (dense gf <= 8 and
    the 22.05 kHz 32-phase form) and multi-chunk lengths."""
    xs = _analysis_test_batch(L)
    T = (L - W) // step + 1
    g = jnp.asarray([1.0, 0.7, 1.4], jnp.float32)
    e_ref, l_ref = _analysis_xla_chain(jnp.asarray(xs), W, step, T, g)
    e_k, l_k = pk.analysis_energy_lsd_pallas(
        jnp.asarray(xs), T, W, step, gain=g, precision="highest",
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(e_k), np.asarray(e_ref), rtol=2e-6, atol=1e-6
    )
    # lsd[:, 0] is DON'T-CARE (zeroed by the skip gate downstream).
    # Tight everywhere, with a COUNTED budget for 40 dB-mask-edge flips:
    # a bin whose magnitude sits within f32 noise of the mask threshold
    # can flip inclusion between the two formulations, shifting that
    # frame's masked log-ratio sum by one |log-ratio| term (the same
    # documented class the 16 kHz oracle gate counts; each outlier is
    # bounded by a small fraction of the frame value).
    scale = float(np.abs(np.asarray(l_ref)).max())
    dl = np.abs(np.asarray(l_k)[:, 1:] - np.asarray(l_ref)[:, 1:])
    tight = 2e-4 * max(scale, 1.0)
    n_out = int((dl > tight).sum())
    rel = dl / (np.abs(np.asarray(l_ref)[:, 1:]) + 1.0)
    assert n_out <= 2 and rel.max() < 1e-2, (n_out, dl.max(), rel.max())


def test_analysis_kernel_in_pipeline(monkeypatch):
    """SPEEDY_FORCE_ANALYSIS_KERNEL=interpret routes the production
    batched tension path through the fused kernel; at matched 'highest'
    precision it must agree with the XLA path to float32 noise, and the
    'high' bf16-split mode (the TPU production precision) must stay
    within its documented tension envelope."""
    from speedy_tpu.config import SpeedyConfig
    from speedy_tpu.parallel.batch import batched_analysis

    cfg = SpeedyConfig(16000)
    xs = jnp.asarray(_analysis_test_batch())
    T = cfg.num_frames(xs.shape[1], integer_step=True)
    g = jnp.asarray([1.0, 0.7, 1.4], jnp.float32)

    monkeypatch.setenv("SPEEDY_ANALYSIS_PRECISION", "highest")
    monkeypatch.setenv("SPEEDY_FORCE_ANALYSIS_KERNEL", "interpret")
    t_k = np.asarray(batched_analysis(xs, cfg, T, gain=g))
    monkeypatch.setenv("SPEEDY_FORCE_ANALYSIS_KERNEL", "")
    t_x = np.asarray(batched_analysis(xs, cfg, T, gain=g))
    np.testing.assert_allclose(t_k, t_x, atol=2e-5)

    monkeypatch.setenv("SPEEDY_ANALYSIS_PRECISION", "high")
    monkeypatch.setenv("SPEEDY_FORCE_ANALYSIS_KERNEL", "interpret")
    t_h = np.asarray(batched_analysis(xs, cfg, T, gain=g))
    np.testing.assert_allclose(t_h, t_x, atol=2e-2)
    assert np.abs(t_h - t_x).mean() < 1e-3


def test_fused_frontend_matches_parts():
    """The fused analysis+pitch front-end (pitch_geom on
    analysis_energy_lsd_pallas) must return BITWISE-identical energy/lsd
    to the pitch-free kernel (the analysis body is shared code; only the
    chunk slab grows) and periods matching pitch_ssd_pallas up to the
    documented argmin-tie class (row-split DFT + per-row prefix sums
    reorder fp summation by ~2^-22)."""
    rng = np.random.default_rng(0)
    B, L = 2, 90000  # two chunks (F*step = 81280 at 16 kHz)
    W, step = 240, 160
    T = (L - W) // step + 1
    taps, minp, maxp, G = 246, 40, 246, 512
    x = (rng.standard_normal((B, L)) * 0.3).astype(np.float32)
    t = np.arange(L) / 16000.0
    x[0] = (0.5 * np.sin(2 * np.pi * 180 * t)).astype(np.float32)
    xj = jnp.asarray(x)
    g = jnp.asarray([1.0, 0.8], jnp.float32)

    e1, l1 = pk.analysis_energy_lsd_pallas(
        xj, T, W, step, gain=g, interpret=True
    )
    e2, l2, per = pk.analysis_energy_lsd_pallas(
        xj, T, W, step, gain=g, interpret=True,
        pitch_geom=(taps, minp, maxp, G),
    )
    assert bool(jnp.all(e1 == e2)) and bool(jnp.all(l1 == l2))

    seg_w = taps + maxp
    n_grid = -(-(L + seg_w) // G)
    assert per.shape == (B, n_grid)
    n_cells = -(-n_grid // 64) * 64
    xg = np.zeros((B, n_cells * G), np.float32)
    xg[:, :L] = x
    ref = pk.pitch_ssd_pallas(
        jnp.asarray(xg.reshape(B, n_cells, G)), taps, minp, maxp,
        interpret=True, gain=g,
    )[:, :n_grid]
    d = np.abs(np.asarray(ref) - np.asarray(per))
    assert np.mean(d > 0.1) < 0.005, (d.max(), np.argwhere(d > 0.1)[:5])


def test_fused_frontend_22050():
    """The fused analysis+pitch front-end at the reference's canonical
    22.05 kHz config (gf = 32 lattice, G = 768 pitch grid): energy/lsd
    must be BITWISE identical to the pitch-free kernel, and every period
    disagreement vs pitch_ssd_pallas must be a float64 SSD tie
    (testutil.assert_period_flips_are_ties — the same attribution gate
    the 16 kHz pipeline uses)."""
    import testutil
    from speedy_tpu.config import SpeedyConfig

    sr = 22050
    cfg = SpeedyConfig(sr)
    W, step = cfg.window_size, cfg.frame_step_int
    maxp, minp = cfg.wsola_max_period, cfg.wsola_min_period
    taps = maxp
    seg_w = taps + maxp
    G = 768
    assert G % 128 == 0 and G >= seg_w
    B, L = 2, sr * 4
    rng = np.random.default_rng(5)
    t = np.arange(L) / sr
    f0 = 140.0 + 40.0 * np.sin(2 * np.pi * 0.6 * t)
    x = np.stack([
        (0.4 * np.sin(np.cumsum(2 * np.pi * f0 / sr))
         * np.clip(np.sin(2 * np.pi * 2.3 * t), 0, None)).astype(np.float32),
        (rng.standard_normal(L) * 0.05).astype(np.float32),
    ])
    g = jnp.asarray([1.0, 0.8], jnp.float32)
    T = cfg.num_frames(L, integer_step=True)
    xj = jnp.asarray(x)
    e1, l1 = pk.analysis_energy_lsd_pallas(xj, T, W, step, gain=g,
                                           interpret=True)
    e2, l2, per = pk.analysis_energy_lsd_pallas(
        xj, T, W, step, gain=g, interpret=True,
        pitch_geom=(taps, minp, maxp, G),
    )
    assert bool(jnp.all(e1 == e2)) and bool(jnp.all(l1 == l2))

    n_grid = -(-(L + seg_w) // G)
    assert per.shape == (B, n_grid)
    n_cells = -(-n_grid // 64) * 64
    xg = np.zeros((B, n_cells * G), np.float32)
    xg[:, :L] = x
    ref = pk.pitch_ssd_pallas(
        jnp.asarray(xg.reshape(B, n_cells, G)), taps, minp, maxp,
        interpret=True, gain=g,
    )[:, :n_grid]
    xpad = np.zeros((B, n_grid * G + seg_w), np.float32)
    xpad[:, :L] = x
    segs = np.stack(
        [np.stack([xpad[b, k * G : k * G + seg_w] for k in range(n_grid)])
         for b in range(B)]
    )
    testutil.assert_period_flips_are_ties(
        segs, np.asarray(ref), np.asarray(per), taps, minp, maxp
    )


@pytest.mark.parametrize("sr", [16000, 22050])
def test_fused_frontend_pipeline(monkeypatch, sr):
    """End-to-end: batched_nonlinear_speedup with the fused front-end
    (both interpret forces set) vs SPEEDY_DISABLE_FUSED_FRONTEND=1 —
    tension bitwise, valid lengths equal, and every output difference
    ATTRIBUTED to a period-grid difference (the two pitch paths reorder
    fp summation by ~2^-22; a half-integer snap ratio can then flip the
    phase-snap rounding, perturbing a bounded output neighborhood).
    Gates: (a) every voiced integer period flip is PROVEN a genuine SSD
    near-tie by a float64 recomputation of the objective at both chosen
    lags (probe experiments/fused_pitch_voiced_flips.py found exact
    ties; a real pitch regression — one path picking a worse lag —
    fails here); (b) each output-diff sample maps (through the speed
    time map) into the neighborhood of a cell whose periods differ — a
    synth/gain regression producing diffs away from period flips fails
    here; (c) the total diff fraction stays small. Runs at 16 kHz AND
    at the reference's canonical 22.05 kHz (gf = 32 lattice)."""
    from speedy_tpu.config import SpeedyConfig
    from speedy_tpu.parallel import batch as pb
    from speedy_tpu.ops import wsola as ow
    from speedy_tpu.ops import wsola_fast as wf

    rng = np.random.default_rng(1)
    cfg = SpeedyConfig(sr)
    B, L = 2, 60000
    x = (rng.standard_normal((B, L)) * 0.2).astype(np.float32)
    t = np.arange(L) / float(sr)
    x[0] = (
        0.4 * np.sin(2 * np.pi * 140 * t) * (1 + 0.3 * np.sin(2 * np.pi * 3 * t))
    ).astype(np.float32)
    lengths = jnp.asarray([L, L - 2000], jnp.int32)
    xj = jnp.asarray(x)

    monkeypatch.setenv("SPEEDY_FORCE_ANALYSIS_KERNEL", "interpret")
    monkeypatch.setenv("SPEEDY_FORCE_PITCH_KERNEL", "interpret")
    monkeypatch.setenv("SPEEDY_FORCE_FUSED_SYNTH", "interpret")
    r1 = pb.batched_nonlinear_speedup(xj, lengths, cfg, 3.0, 1.0)
    monkeypatch.setenv("SPEEDY_DISABLE_FUSED_FRONTEND", "1")
    r2 = pb.batched_nonlinear_speedup(xj, lengths, cfg, 3.0, 1.0)

    assert bool(jnp.all(r1.tension == r2.tension))
    np.testing.assert_array_equal(
        np.asarray(r1.valid_length), np.asarray(r2.valid_length)
    )

    # Reconstruct the two period grids at the pipeline's exact geometry.
    monkeypatch.setenv("SPEEDY_DISABLE_FUSED_FRONTEND", "")
    minp, maxp, _, _ = ow.plan(cfg, L, 1.0)
    geom = pb._fused_pitch_geom(cfg, L, minp, maxp, 1.0)
    assert geom is not None
    taps, minp_g, maxp_g, G = geom
    T = cfg.num_frames(L, integer_step=True)
    _, pg_fused = pb.batched_analysis(xj, cfg, T, pitch_geom=geom)
    pg_fused = np.asarray(pg_fused)
    seg_w = taps + maxp_g
    n_grid = pg_fused.shape[1]
    n_cells = -(-n_grid // 64) * 64
    xg = np.zeros((B, n_cells * G), np.float32)
    xg[:, :L] = x
    pg_std = np.asarray(
        pk.pitch_ssd_pallas(
            jnp.asarray(xg.reshape(B, n_cells, G)), taps, minp_g, maxp_g,
            interpret=True,
        )
    )[:, :n_grid]
    dper = np.abs(pg_fused - pg_std)

    # (a) Every voiced integer flip must be a genuine SSD near-tie.
    segs = xg.reshape(B, n_cells, G)[:, :n_grid]
    tmpl = segs[..., :taps]
    voiced = np.sqrt((tmpl**2).mean(axis=2)) > 1e-2
    assert voiced.mean() > 0.5
    testutil.assert_period_flips_are_ties(
        segs, pg_fused, pg_std, taps, minp_g, maxp_g, mask=voiced
    )

    # (b) Attribute every output diff to a differing-period cell through
    # the time map: source frame f plays at output time o(f) = sum step/s.
    speeds = np.asarray(r1.speeds)
    step = cfg.frame_step_int
    hop = wf.plan_grid(cfg, L, 1.0)[0]
    margin = G + seg_w + 2 * maxp_g + hop  # source-sample slack
    y1, y2 = np.asarray(r1.output), np.asarray(r2.output)
    vl = np.asarray(r1.valid_length)
    total, diffs = 0, 0
    for b in range(B):
        d = np.abs(y1[b, : vl[b]] - y2[b, : vl[b]])
        bad = np.flatnonzero(d > 1e-3)
        total += vl[b]
        diffs += bad.size
        if bad.size == 0:
            continue
        o_of_f = np.concatenate(
            [[0.0], np.cumsum(step / speeds[b])]
        )  # output samples at each source frame boundary
        src_of_bad = (
            np.searchsorted(o_of_f, bad.astype(np.float64)) * step
        )
        flip_cells = np.flatnonzero(dper[b] > 0)
        assert flip_cells.size, "output diff with bitwise-equal periods"
        cell_centers = flip_cells * G + G / 2
        near = np.min(
            np.abs(src_of_bad[:, None] - cell_centers[None, :]), axis=1
        )
        assert near.max() <= margin, (
            "unattributed output diff",
            near.max(),
            margin,
        )
    assert diffs / max(total, 1) < 0.02, diffs / total


def test_fused_frontend_multichannel(monkeypatch):
    """The multichannel batch step takes the fused front-end too (round-3
    fix: stereo serving previously paid the second full-input HBM stream
    the mono path had eliminated). Identical-channel stereo must match
    the mono fused path exactly, and fused-vs-disabled must agree on
    tension bitwise and lengths exactly (period tie flips are absorbed
    the same way as in the mono gate above)."""
    from speedy_tpu.config import SpeedyConfig
    from speedy_tpu.parallel import batch as pb

    rng = np.random.default_rng(5)
    cfg = SpeedyConfig(16000)
    B, L = 2, 40000
    t = np.arange(L) / 16000.0
    x = np.stack(
        [
            0.4 * np.sin(2 * np.pi * 150 * t).astype(np.float32),
            (rng.standard_normal(L) * 0.15).astype(np.float32),
        ]
    ).astype(np.float32)
    lengths = jnp.asarray([L, L - 1500], jnp.int32)
    st = jnp.asarray(np.stack([x, x], axis=-1))  # [B, L, 2] identical

    monkeypatch.setenv("SPEEDY_FORCE_ANALYSIS_KERNEL", "interpret")
    monkeypatch.setenv("SPEEDY_FORCE_PITCH_KERNEL", "interpret")
    monkeypatch.setenv("SPEEDY_FORCE_FUSED_SYNTH", "interpret")
    g = jnp.asarray([0.9, 1.1], jnp.float32)
    r_mc = pb.batched_nonlinear_speedup_multichannel(
        st, lengths, cfg, 3.0, gain=g
    )
    r_mono = pb.batched_nonlinear_speedup(
        jnp.asarray(x), lengths, cfg, 3.0, gain=g
    )
    assert bool(jnp.all(r_mc.tension == r_mono.tension))
    np.testing.assert_array_equal(
        np.asarray(r_mc.valid_length), np.asarray(r_mono.valid_length)
    )
    y = np.asarray(r_mc.output)
    np.testing.assert_array_equal(y[:, 0], y[:, 1])
    np.testing.assert_allclose(y[:, 0], np.asarray(r_mono.output), atol=1e-5)

    monkeypatch.setenv("SPEEDY_DISABLE_FUSED_FRONTEND", "1")
    r_off = pb.batched_nonlinear_speedup_multichannel(
        st, lengths, cfg, 3.0, gain=g
    )
    assert bool(jnp.all(r_mc.tension == r_off.tension))
    np.testing.assert_array_equal(
        np.asarray(r_mc.valid_length), np.asarray(r_off.valid_length)
    )
    d = np.abs(y - np.asarray(r_off.output))
    assert np.mean(d > 1e-3) < 0.02, (d.max(), np.mean(d > 1e-3))
