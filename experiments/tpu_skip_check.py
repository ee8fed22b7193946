"""TPU-only validation of the n_valid DMA-skip gather and the full step."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, jax, jax.numpy as jnp
from speedy_tpu.ops.pallas_kernels import gather_rows, gather_rows_reference
rng = np.random.default_rng(3)
B, K, width, L = 5, 96, 321, 30000
x = jnp.asarray(rng.standard_normal((B, L)).astype(np.float32))
starts = jnp.asarray(rng.integers(0, L - width, size=(B, K)).astype(np.int32))
nv = jnp.asarray(np.array([96, 17, 0, 50, 96], np.int32))
ref = np.asarray(gather_rows_reference(x, starts, width))
got = np.asarray(jax.jit(lambda x, s, n: gather_rows(x, s, width, n))(x, starts, nv))
ok = all(np.array_equal(ref[b, :int(nv[b])], got[b, :int(nv[b])]) for b in range(B))
print("TPU n_valid gather rows exact:", ok)
# full batch step vs CPU reference output
from speedy_tpu.config import SpeedyConfig
from speedy_tpu.parallel.batch import batched_nonlinear_speedup
sr = 16000; cfg = SpeedyConfig(sr)
t = np.arange(sr*3)/sr
xx = np.stack([(0.3*np.sin(2*np.pi*(180+20*i)*t)*np.clip(np.sin(2*np.pi*2.5*t),0,None)).astype(np.float32) for i in range(4)])
lens = jnp.asarray(np.full((4,), xx.shape[1], np.int32))
out_t = batched_nonlinear_speedup(jnp.asarray(xx), lens, cfg, 3.5, 1.0, 0.1)
v = np.asarray(out_t.valid_length); y_t = np.asarray(out_t.output)
print("tpu valid:", v)
# compare against CPU on a subprocess-free path: recompute with cpu backend? conftest trick not available; compare statistical sanity instead
for b in range(4):
    yy = y_t[b, :v[b]]
    print(b, "finite:", np.isfinite(yy).all(), "rms:", float(np.sqrt((yy**2).mean())))
print("tail zero:", float(np.abs(y_t[0, v[0]:]).max()))
