"""v2 block-span gather: grid=(B,) with the NB block loop unrolled inside
the kernel (static NB, pl.when on validity), double-buffered span DMAs.
Cuts grid programs 8x — the bisect showed ~3.7 us fixed cost per grid
program dominating the kernel. Compare vs production kernel."""
import os, sys, time, functools
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from speedy_tpu.config import SpeedyConfig
from speedy_tpu.ops import wsola, wsola_fast

SR = 16000; B = 128; L = SR * 10; cfg = SpeedyConfig(SR)
minp, maxp, _, _ = wsola.plan(cfg, L, 1.0)
hop, cap, K = wsola_fast.plan_grid(cfg, L, 1.0)
Hs = hop; Wn = 2 * Hs
width = Wn + 1
R = 128
MAX_SPEED_PLAN = 6.0
need = (R - 1) * int(np.ceil(Hs * MAX_SPEED_PLAN)) + maxp + width + 32
w_span = -(-need // 1024) * 1024
pad_front = maxp
rng = np.random.default_rng(0)
Lp_sig = L + pad_front + 2 * maxp + maxp + Wn


def _kernel_v2(NB, rows_per_block, w_rows, nt, length_rows,
               nvb_ref, bases_ref, q8k_ref, r7k_ref, x_ref, out_ref,
               scratch, sems):
    b = pl.program_id(0)
    Rk = rows_per_block
    nvb = nvb_ref[b]

    def start_dma(nb, slot):
        s = b * length_rows + bases_ref[b, nb]
        row = pl.multiple_of(s, 8)
        pltpu.make_async_copy(
            x_ref.at[pl.ds(row, w_rows), :], scratch.at[slot], sems.at[slot]
        ).start()

    @pl.when(0 < nvb)
    def _():
        start_dma(0, 0)

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
            q8k = q8k_ref[0, nb, :, :]
            r7k = r7k_ref[0, nb, :, :]
            iota_rows = jax.lax.broadcasted_iota(jnp.int32, (Rk * nt, w_rows), 1)
            onehot = (iota_rows == q8k).astype(sp.dtype)
            slab = jnp.dot(onehot, sp, preferred_element_type=sp.dtype,
                           precision=jax.lax.Precision.HIGHEST)
            lane = jax.lax.broadcasted_iota(jnp.int32, (Rk * nt, 128), 1)
            for bit in range(7):
                sh = 1 << bit
                cur = pltpu.roll(slab, 128 - sh, 1)
                nxt = pltpu.roll(pltpu.roll(slab, Rk * nt - 1, 0), 128 - sh, 1)
                shifted = jnp.where(lane < 128 - sh, cur, nxt)
                slab = jnp.where((r7k & sh) != 0, shifted, slab)
            out_ref[0, nb, :, :] = slab


@functools.partial(jax.jit, static_argnames=())
def gather_v2(x, starts, n_valid):
    B_, L_ = x.shape
    K_ = starts.shape[1]
    NB = -(-K_ // R)
    if NB * R != K_:
        starts = jnp.concatenate([starts, jnp.tile(starts[:, -1:], (1, NB * R - K_))], axis=1)
    nt = (width + 127) // 128 + 1
    s2 = starts.reshape(B_, NB, R)
    base = jnp.min(s2, axis=2)
    base_al = (base // 1024) * 1024
    offs = (s2 - base_al[:, :, None]).astype(jnp.int32)
    q8 = offs // 128
    r7 = offs - q8 * 128
    ktile = jnp.arange(nt, dtype=jnp.int32)
    q8k = (q8[..., None] + ktile).reshape(B_, NB, R * nt, 1)
    r7k = jnp.broadcast_to(r7[..., None], (B_, NB, R, nt)).reshape(B_, NB, R * nt, 1)
    nvb = jnp.minimum(-(-n_valid // R), NB).astype(jnp.int32)
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
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, NB, R * nt, 128), lambda b, *_: (b, 0, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, w_rows, 128), x.dtype), pltpu.SemaphoreType.DMA((2,))],
    )
    kernel = functools.partial(_kernel_v2, NB, R, w_rows, nt, Lpq // 128)
    out = pl.pallas_call(kernel, out_shape=jax.ShapeDtypeStruct((B_, NB, R * nt, 128), x.dtype),
                         grid_spec=grid_spec)(nvb, (base_al // 128).astype(jnp.int32), q8k, r7k, x2)
    return out.reshape(B_, NB, R, nt * 128)[..., :width].reshape(B_, NB * R, width)[:, :K_]


def fresh():
    return jnp.asarray(rng.standard_normal((B, Lp_sig)).astype(np.float32) * 0.1)

c = np.cumsum(np.full((B, K), Hs * 3.51), axis=1).astype(np.float32)
a_i = np.clip(c.astype(np.int32), 0, L - 1) + pad_front
starts = jnp.asarray(a_i.astype(np.int32))
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
    print(f"{name:28s} {best / nit * 1e3:8.2f} ms/step")


from speedy_tpu.ops.pallas_kernels import gather_rows_block_pallas
timeit("noop", lambda xs: xs[:, :1] * 2.0)
timeit("production kernel", lambda xs: gather_rows_block_pallas(xs, starts, width, R, w_span, n_valid))
timeit("v2 (grid=B, unrolled NB)", lambda xs: gather_v2(xs, starts, n_valid))
xs = fresh()
a = gather_v2(xs, starts, n_valid)
bref = gather_rows_block_pallas(xs, starts, width, R, w_span, n_valid)
nv = int(n_valid[0])
print("match prod:", bool(jnp.all(a[:, :nv] == bref[:, :nv])))
