"""Cumulative-prefix bisect of _wsola_grid_batch: jit progressively longer
prefixes of the pipeline (XLA DCEs everything after the summed value), time
each with the back-to-back protocol. Differences = true stage costs inside
the program, including any scheduling effects marginal-addition ablation
hides."""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, jax, jax.numpy as jnp
from speedy_tpu.config import SpeedyConfig
from speedy_tpu.ops import wsola, wsola_fast
from speedy_tpu.ops.wsola_fast import (
    _pitch_corr_matrices, _cola_hann, _gather_rows, _gather_rows_spans,
    _PITCH_PRECISION,
)

SR = 16000; B = 128; L = SR * 10; cfg = SpeedyConfig(SR)
T = cfg.num_frames(L, integer_step=True)
rng = np.random.default_rng(0)
base = rng.standard_normal((B, L)).astype(np.float32) * 0.1
def fresh(): return jnp.asarray(base * rng.uniform(0.5, 1.0, (B, 1)).astype(np.float32))
lengths = jnp.asarray(np.full((B,), L, np.int32))
sync = jax.jit(lambda x: jnp.sum(x))
minp, maxp, capS, steps = wsola.plan(cfg, L, 1.0)
hop, cap, K = wsola_fast.plan_grid(cfg, L, 1.0)
dtype = jnp.float32; Hs = hop; Wn = 2 * Hs
taps = maxp; pad_front = maxp
frame_step = cfg.frame_step_int
n_frames = T
MAX_SPEED_PLAN = 4.0
span_rows = 128


def stages(xs, input_lengths, upto):
    speeds = jnp.minimum(jnp.full((B, T), 3.51, dtype), MAX_SPEED_PLAN)
    x_pad = jnp.concatenate(
        [jnp.zeros((B, pad_front), dtype), xs,
         jnp.zeros((B, 2 * maxp + taps + Wn), dtype)], axis=1)
    lens_f = input_lengths.astype(dtype)
    # 1. time map
    inv_s = jnp.asarray(frame_step, dtype) / speeds
    obnd = jnp.concatenate([jnp.zeros((B, 1), dtype), jnp.cumsum(inv_s, axis=1)], axis=1)
    total_frames = jnp.clip(input_lengths // frame_step, 0, n_frames)
    tail = (input_lengths - total_frames * frame_step).astype(dtype)
    last_speed = jnp.take_along_axis(speeds, jnp.clip(total_frames, 0, n_frames - 1)[:, None], axis=1)[:, 0]
    out_len = jnp.take_along_axis(obnd, total_frames[:, None], axis=1)[:, 0] + tail / last_speed
    valid = jnp.minimum(jnp.round(out_len).astype(jnp.int32), cap)
    p = jnp.arange(K, dtype=dtype) * Hs
    lo = obnd[:, None, :-1]; hi_b = obnd[:, None, 1:]; pk = p[None, :, None]
    sel = (lo <= pk) & ((pk < hi_b) | (jnp.arange(n_frames) == n_frames - 1))
    sp_f = jnp.sum(jnp.where(sel, speeds[:, None, :], 0), axis=-1)
    ob_f = jnp.sum(jnp.where(sel, lo, 0), axis=-1)
    fidx = jnp.sum(jnp.where(sel, jnp.arange(n_frames, dtype=dtype), 0), axis=-1)
    c = fidx * frame_step + (p[None, :] - ob_f) * sp_f
    c = jnp.clip(c, 0.0, jnp.maximum(lens_f - 1.0, 0.0)[:, None])
    if upto == 1:
        return jnp.sum(c) + jnp.sum(valid)
    # 2. pitch (current production formulation: lane-aligned G >= seg_w)
    seg_w = taps + maxp
    G = -(-max(3 * Hs, seg_w) // 128) * 128
    m_strides = -(-seg_w // G)
    n_cells = -(-(L + seg_w) // G)
    n_grid = n_cells - m_strides + 1
    xs_pitch = jnp.concatenate([xs, jnp.zeros((B, n_cells * G - L), dtype)], axis=1)
    y = xs_pitch.reshape(B, n_cells, G)
    seg = jnp.concatenate([y[:, j: j + n_grid] for j in range(m_strides)], axis=-1)[:, :, :seg_w]
    w = seg.shape[-1]
    M = -(-max(w, taps + maxp) // 128) * 128
    nb = M // 2 + 1
    n_lags = maxp - minp + 1
    Ea, Es, Inv, Band = (jnp.asarray(m) for m in _pitch_corr_matrices(taps, w, minp, maxp, M))
    a0 = seg[..., :taps]
    prec = _PITCH_PRECISION
    FA = jnp.einsum("bgt,tk->bgk", a0, Ea, precision=prec)
    FS = jnp.einsum("bgt,tk->bgk", seg, Es, precision=prec)
    AR, AI = FA[..., :nb], FA[..., nb:]; SRr, SI = FS[..., :nb], FS[..., nb:]
    prod = jnp.concatenate([AR * SRr + AI * SI, AR * SI - AI * SRr], axis=-1)
    cc = jnp.einsum("bgk,kl->bgl", prod, Inv, precision=prec)
    E = jnp.einsum("bgt,tl->bgl", seg * seg, Band, precision=prec)
    ssd = E[..., n_lags:] + E[..., :n_lags] - 2.0 * cc
    jmin = jnp.argmin(ssd, axis=-1); jc = jnp.clip(jmin, 1, maxp - minp - 1)
    take = lambda off: jnp.take_along_axis(ssd, (jc + off)[..., None], axis=2)[..., 0]
    l_, m_, r_ = take(-1), take(0), take(1)
    den = l_ - 2 * m_ + r_
    frac = jnp.where(jnp.abs(den) > 1e-12, 0.5 * (l_ - r_) / den, 0.0)
    period_grid = (minp + jc).astype(dtype) + jnp.clip(frac, -0.5, 0.5)
    g_idx = jnp.clip(jnp.round(c / G).astype(jnp.int32), 0, n_grid - 1)
    period = jnp.take_along_axis(period_grid, g_idx, axis=1)
    if upto == 2:
        return jnp.sum(period) + jnp.sum(valid)
    # 3. phase snap
    kk = jnp.arange(K, dtype=dtype)[None, :]
    delta = c[:, :1] + kk * Hs - c
    o = delta - jnp.round(delta / period) * period
    a = jnp.clip(c + o, 0.0, (lens_f - 1.0)[:, None])
    if upto == 3:
        return jnp.sum(a) + jnp.sum(valid)
    # 4. gather
    a_i = jnp.floor(a).astype(jnp.int32)
    a_f = a - a_i.astype(dtype)
    need = (span_rows - 1) * int(np.ceil(Hs * MAX_SPEED_PLAN)) + maxp + (Wn + 1) + 32
    w_span = -(-need // 1024) * 1024
    valid_rows = jnp.minimum(valid // Hs + 2, K)
    wide = _gather_rows_spans(x_pad, a_i + pad_front, Wn + 1, span_rows, w_span, valid_rows)
    if upto == 4:
        return jnp.sum(wide) + jnp.sum(valid)
    # 5. interp + OLA
    win = jnp.asarray(_cola_hann(Wn))
    af = a_f[:, :, None]
    raw = wide[:, :, :-1] * (1.0 - af) + wide[:, :, 1:] * af
    rows = raw * win[None, None, :]
    firsts = rows[:, :, :Hs]; seconds = rows[:, :, Hs:]
    slots = firsts + jnp.concatenate([jnp.zeros((B, 1, Hs), dtype), seconds[:, :-1]], axis=1)
    slots = jnp.concatenate([raw[:, :1, :Hs], slots[:, 1:]], axis=1)
    out_full = slots.reshape(B, K * Hs)
    idx = jnp.arange(cap, dtype=jnp.int32)
    out = jnp.where(idx[None, :] < valid[:, None], out_full[:, :cap], 0.0)
    return jnp.sum(out) + jnp.sum(valid)


def run(name, f, nit=8):
    """Time f via a scan-of-nit inside ONE dispatch: the relay's ~27 ms
    per-execute host issue cost otherwise hides device times below it."""
    def scanned(stack, l):
        def body(carry, xs):
            return carry + f(xs, l), 0.0
        s, _ = jax.lax.scan(body, jnp.float32(0), stack)
        return s
    fj = jax.jit(scanned)
    best = None
    for w in range(2):
        stack = jnp.stack([fresh() for _ in range(nit)])
        float(sync(stack))
        if w == 0:
            float(fj(stack, lengths))
            stack = jnp.stack([fresh() for _ in range(nit)])
            float(sync(stack))
        t0 = time.perf_counter()
        float(fj(stack, lengths))
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{name:30s} {best / nit * 1e3:8.2f} ms/step (device)")
    return best / nit


t_noop = run("noop (sum input)", lambda xs, l: jnp.sum(xs))
ts = [run(f"prefix upto={u}", (lambda u: lambda xs, l: stages(xs, l, u))(u)) for u in (1, 2, 3, 4, 5)]
names = ["time map", "pitch", "phase", "gather", "interp/OLA+mask"]
prev = t_noop
for n, t in zip(names, ts):
    print(f"  {n:20s} +{(t - prev) * 1e3:6.2f} ms")
    prev = t
t_full = run("production _wsola_grid_batch", lambda xs, l: jnp.sum(
    wsola_fast._wsola_grid_batch(xs, l, jnp.full((B, T), 3.51, dtype), minp, maxp,
                                 frame_step, hop, cap, K, max_speed_plan=MAX_SPEED_PLAN).output))
print(f"prefix-5 {ts[-1]*1e3:.2f} vs production {t_full*1e3:.2f}")
