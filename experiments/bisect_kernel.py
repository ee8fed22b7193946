import os, sys, functools
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

which = sys.argv[1]
B, NB, R, nt = 2, 3, int(sys.argv[2]), 4
w_rows = int(sys.argv[3])
Lrows = 200000 // 128 * 128 * 128 // 128  # rows per batch (multiple of 8)
Lrows = 1600

def kern(nvb_ref, bases_ref, q8k_ref, x_ref, out_ref, scratch, sem):
    b = pl.program_id(0); nb = pl.program_id(1)
    q8k = q8k_ref[0, 0, :, :]
    if which in ("dma", "dot", "full"):
        @pl.when(nb < nvb_ref[b])
        def _():
            s = b * Lrows + bases_ref[b, nb]
            row = pl.multiple_of(s, 8)
            pltpu.make_async_copy(x_ref.at[pl.ds(row, w_rows), :], scratch, sem).start()
            pltpu.make_async_copy(x_ref.at[pl.ds(0, w_rows), :], scratch, sem).wait()
            if which in ("dot", "full"):
                iota = jax.lax.broadcasted_iota(jnp.int32, (R*nt, w_rows), 1)
                oh = (iota == q8k).astype(jnp.float32)
                slab = jnp.dot(oh, scratch[...], preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)
                if which == "full":
                    lane = jax.lax.broadcasted_iota(jnp.int32, (R*nt, 128), 1)
                    for bit in range(7):
                        sh = 1 << bit
                        cur = pltpu.roll(slab, 128 - sh, 1)
                        nxt = pltpu.roll(pltpu.roll(slab, R*nt - 1, 0), 128 - sh, 1)
                        shifted = jnp.where(lane < 128 - sh, cur, nxt)
                        slab = jnp.where((q8k & sh) != 0, shifted, slab)
                out_ref[0, 0, :, :] = slab
            else:
                out_ref[0, 0, :, :] = scratch[pl.ds(0, R*nt), :] * 1.0 + q8k.astype(jnp.float32)
    else:
        out_ref[0, 0, :, :] = jnp.broadcast_to(q8k.astype(jnp.float32), (R*nt, 128))

grid_spec = pltpu.PrefetchScalarGridSpec(
    num_scalar_prefetch=2,
    grid=(B, NB),
    in_specs=[
        pl.BlockSpec((1,1,R*nt,1), lambda b,nb,*_: (b,nb,0,0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.ANY),
    ],
    out_specs=pl.BlockSpec((1,1,R*nt,128), lambda b,nb,*_: (b,nb,0,0), memory_space=pltpu.VMEM),
    scratch_shapes=[pltpu.VMEM((w_rows,128), jnp.float32), pltpu.SemaphoreType.DMA],
)
rng = np.random.default_rng(0)
nvb = jnp.asarray(np.array([3,2], np.int32))
bases = jnp.asarray((rng.integers(0, 20, (B,NB))*8).astype(np.int32))
q8k = jnp.asarray(rng.integers(0, w_rows-1, (B,NB,R*nt,1)).astype(np.int32))
x2 = jnp.asarray(rng.standard_normal((B*Lrows + w_rows + 16, 128)).astype(np.float32))
out = pl.pallas_call(kern, out_shape=jax.ShapeDtypeStruct((B,NB,R*nt,128), jnp.float32), grid_spec=grid_spec)(nvb, bases, q8k, x2)
print(which, "ok:", float(jnp.sum(out[:, :, :1])))
