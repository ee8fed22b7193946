"""Bisect gather_synth_block_pallas internals: variants stop after
(dma copy-out | onehot | barrel | interp+window | full OLA), plus a
narrow-span variant to expose the DMA-byte share. Scan-of-8 timing."""
import os, sys, time, functools
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from speedy_tpu.config import SpeedyConfig
from speedy_tpu.ops import wsola, wsola_fast
from speedy_tpu.ops.wsola_fast import _cola_hann

SR = 16000; B = 128; L = SR * 10; cfg = SpeedyConfig(SR)
minp, maxp, _, _ = wsola.plan(cfg, L, 1.0)
hop, cap, K = wsola_fast.plan_grid(cfg, L, 1.0)
Hs = hop
width = 2 * Hs + 1
R = 128
pad_front = maxp
rng = np.random.default_rng(0)
Lp_sig = L + pad_front + 2 * maxp + maxp + 2 * Hs


def make_fused(mode, max_speed):
    need = (R - 1) * int(np.ceil(Hs * max_speed)) + maxp + width + 32
    w_span = -(-need // 1024) * 1024

    def _kernel(NB, w_rows, nt, ts, length_rows,
                nvb_ref, bases_ref, q8k_ref, r7k_ref, af_ref, win_ref,
                x_ref, out_ref, scratch, carr, sems):
        b = pl.program_id(0)
        nvb = nvb_ref[b]
        TOT = R * nt
        ST = R * ts

        def start_dma(nb, slot):
            s = b * length_rows + bases_ref[b, nb]
            row = pl.multiple_of(s, 8)
            pltpu.make_async_copy(
                x_ref.at[pl.ds(row, w_rows), :], scratch.at[slot], sems.at[slot]
            ).start()

        @pl.when(0 < nvb)
        def _():
            start_dma(0, 0)

        lane = jax.lax.broadcasted_iota(jnp.int32, (TOT, 128), 1)
        sub2 = jax.lax.broadcasted_iota(jnp.int32, (ST, 128), 0)
        first_row = (sub2 & (R - 1)) == 0

        def bcast_rows(src, rows):
            ce = jnp.broadcast_to(src[rows[ts - 1]: rows[ts - 1] + 1, :], (ST, 128))
            for t in range(ts - 2, -1, -1):
                ce = jnp.where(sub2 < (t + 1) * R,
                               jnp.broadcast_to(src[rows[t]: rows[t] + 1, :], (ST, 128)), ce)
            return ce

        for nb in range(NB):
            slot = nb % 2

            @pl.when(nb + 1 < nvb)
            def _():
                start_dma(nb + 1, (nb + 1) % 2)

            @pl.when(nb < nvb)
            def _():
                pltpu.make_async_copy(
                    x_ref.at[pl.ds(0, w_rows), :], scratch.at[slot], sems.at[slot]
                ).wait()
                sp = scratch[slot]
                if mode == "dma":
                    out_ref[0, nb, :, :] = sp[0:ST, :]
                    return
                q8k = q8k_ref[0, nb, :, :]
                r7k = r7k_ref[0, nb, :, :]
                af = af_ref[0, nb, :, :]
                iota_rows = jax.lax.broadcasted_iota(jnp.int32, (TOT, w_rows), 1)
                onehot = (iota_rows == q8k).astype(sp.dtype)
                slab = jnp.dot(onehot, sp, preferred_element_type=sp.dtype,
                               precision=jax.lax.Precision.HIGHEST)
                if mode == "onehot":
                    out_ref[0, nb, :, :] = slab[0:ST, :]
                    return
                for bit in range(7):
                    sh = 1 << bit
                    cur = pltpu.roll(slab, 128 - sh, 1)
                    nxt = pltpu.roll(pltpu.roll(slab, TOT - R, 0), 128 - sh, 1)
                    shifted = jnp.where(lane < 128 - sh, cur, nxt)
                    slab = jnp.where((r7k & sh) != 0, shifted, slab)
                if mode == "barrel":
                    out_ref[0, nb, :, :] = slab[0:ST, :]
                    return
                cur = pltpu.roll(slab, 127, 1)
                nxt = pltpu.roll(pltpu.roll(slab, TOT - R, 0), 127, 1)
                s1 = jnp.where(lane < 127, cur, nxt)
                raw = slab * (1.0 - af) + s1 * af
                raw_w = jnp.concatenate(
                    [raw[t * R:(t + 1) * R] * jnp.broadcast_to(win_ref[t:t + 1, :], (R, 128))
                     for t in range(nt)], axis=0)
                if mode == "interp":
                    out_ref[0, nb, :, :] = raw_w[0:ST, :]
                    return
                q, rr = Hs // 128, Hs % 128
                a1 = pltpu.roll(raw_w, TOT - q * R, 0) if q else raw_w
                if rr:
                    cur = pltpu.roll(a1, 128 - rr, 1)
                    nxt = pltpu.roll(pltpu.roll(a1, TOT - R, 0), 128 - rr, 1)
                    sec = jnp.where(lane < 128 - rr, cur, nxt)
                else:
                    sec = a1
                F = raw_w[:ST]
                S = sec[:ST]
                prev = pltpu.roll(S, 1, 0)
                ce = bcast_rows(carr, list(range(ts)))
                prev = jnp.where(first_row, ce, prev)
                slots = F + prev
                if nb == 0:
                    r0 = bcast_rows(raw, [t * R for t in range(ts)])
                    slots = jnp.where(first_row, r0, slots)
                out_ref[0, nb, :, :] = slots
                for t in range(ts):
                    carr[t:t + 1, :] = S[t * R + R - 1: t * R + R, :]

    @jax.jit
    def run(x, starts, af, n_valid):
        B_, L_ = x.shape
        K_ = starts.shape[1]
        NB = -(-K_ // R)
        if NB * R != K_:
            padn = NB * R - K_
            starts = jnp.concatenate([starts, jnp.tile(starts[:, -1:], (1, padn))], axis=1)
            af = jnp.concatenate([af, jnp.zeros((B_, padn), af.dtype)], axis=1)
        nt = (width + 127) // 128 + 1
        ts = (Hs + 127) // 128
        s2 = starts.reshape(B_, NB, R)
        base = jnp.min(s2, axis=2)
        base_al = (base // 1024) * 1024
        offs = (s2 - base_al[:, :, None]).astype(jnp.int32)
        q8 = offs // 128
        r7 = offs - q8 * 128
        ktile = jnp.arange(nt, dtype=jnp.int32)
        q8k = (q8[:, :, None, :] + ktile[None, None, :, None]).reshape(B_, NB, nt * R, 1)
        r7k = jnp.broadcast_to(r7[:, :, None, :], (B_, NB, nt, R)).reshape(B_, NB, nt * R, 1)
        af_tm = jnp.broadcast_to(af.reshape(B_, NB, R)[:, :, None, :], (B_, NB, nt, R)).reshape(B_, NB, nt * R, 1)
        nvb = jnp.minimum(-(-n_valid // R), NB).astype(jnp.int32)
        win_rows = max(8, nt)
        win_np = _cola_hann(2 * Hs)
        win_pad = np.zeros((win_rows * 128,), np.float32)
        win_pad[: 2 * Hs] = win_np
        win2 = jnp.asarray(win_pad.reshape(win_rows, 128))
        w_rows = -(-((w_span + 1024) // 128 + nt + 8) // 8) * 8
        Lpq = -(-L_ // 1024) * 1024
        xp = x if Lpq == L_ else jnp.concatenate([x, jnp.zeros((B_, Lpq - L_), x.dtype)], axis=1)
        flat = jnp.concatenate([xp.reshape(-1), jnp.zeros((w_rows + 8) * 128, x.dtype)])
        x2 = flat.reshape(-1, 128)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B_,),
            in_specs=[
                pl.BlockSpec((1, NB, R * nt, 1), lambda b, *_: (b, 0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, NB, R * nt, 1), lambda b, *_: (b, 0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, NB, R * nt, 1), lambda b, *_: (b, 0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((win_rows, 128), lambda b, *_: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec((1, NB, R * ts, 128), lambda b, *_: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, w_rows, 128), x.dtype),
                pltpu.VMEM((8, 128), x.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        kernel = functools.partial(_kernel, NB, w_rows, nt, ts, Lpq // 128)
        out = pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((B_, NB, R * ts, 128), x.dtype),
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        )(nvb, (base_al // 128).astype(jnp.int32), q8k, r7k, af_tm, win2, x2)
        return out

    return run


def fresh():
    return jnp.asarray(rng.standard_normal((B, Lp_sig)).astype(np.float32) * 0.1)

c = np.cumsum(np.full((B, K), Hs * 3.51), axis=1).astype(np.float32)
a_i = np.clip(c.astype(np.int32), 0, L - 1) + pad_front
starts = jnp.asarray(a_i.astype(np.int32))
af = jnp.asarray(rng.uniform(0, 1, (B, K)).astype(np.float32))
n_valid = jnp.full((B,), int(L / 3.51 / Hs) + 2, jnp.int32)


def timeit(name, f, nit=8):
    def scanned(stack):
        def bd(cr, xs):
            return cr + jnp.sum(f(xs)), 0.0
        s, _ = jax.lax.scan(bd, jnp.float32(0), stack)
        return s
    fj = jax.jit(scanned)
    best = None
    for w in range(2):
        stack = jnp.stack([fresh() for _ in range(nit)])
        float(jnp.sum(stack))
        if w == 0:
            float(fj(stack))
            stack = jnp.stack([fresh() for _ in range(nit)]); float(jnp.sum(stack))
        t0 = time.perf_counter(); float(fj(stack)); dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{name:34s} {best / nit * 1e3:8.2f} ms/step")


timeit("noop", lambda xs: xs[:, :1] * 2.0)
for mode in ("dma", "onehot", "barrel", "interp", "full"):
    f = make_fused(mode, 6.0)
    timeit(f"fused[{mode}] span@6.0", lambda xs, f=f: f(xs, starts, af, n_valid))
f4 = make_fused("full", 4.0)
timeit("fused[full] span@4.0", lambda xs: f4(xs, starts, af, n_valid))
