import os, sys, time, functools
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, jax, jax.numpy as jnp
from speedy_tpu.config import SpeedyConfig
from speedy_tpu.ops import wsola, wsola_fast
from speedy_tpu.ops.wsola_fast import _pitch_corr_matrices, _gather_rows
from speedy_tpu.ops.pallas_kernels import gather_rows_pallas
SR=16000; B=128; L=SR*10; cfg=SpeedyConfig(SR)
rng = np.random.default_rng(0)
base = rng.standard_normal((B, L)).astype(np.float32)*0.1
def fresh(): return jnp.asarray(base * rng.uniform(0.5,1.0,(B,1)).astype(np.float32))
sync = jax.jit(lambda x: jnp.sum(x))
minp, maxp, capS, steps = wsola.plan(cfg, L, 1.0)
hop, gcap, K = wsola_fast.plan_grid(cfg, L, 1.0)
dtype=jnp.float32; Hs=hop; Wn=2*Hs; taps=maxp; pad_front=maxp
seg_w=taps+maxp; G=Hs; n_lags=maxp-minp+1
M=-(-(seg_w+taps)//128)*128; nb=M//2+1
mats=_pitch_corr_matrices(taps, seg_w, minp, maxp, M)
Ea,Es,Inv,Band=(jnp.asarray(m) for m in mats)

def run(name, fj, mkargs, nit=8):
    ins=[mkargs() for _ in range(nit)]
    for a in ins:
        for x in a: float(sync(x.reshape(-1)[:1024].astype(jnp.float32))) if hasattr(x,'reshape') else None
    float(fj(*ins[0]))
    best=None
    for _ in range(2):
        t0=time.perf_counter()
        outs=[fj(*a) for a in ins]
        _=[float(s) for s in outs]
        dt=time.perf_counter()-t0
        best=dt if best is None else min(best,dt)
    print(f"{name:46s} {best/nit*1e3:8.2f} ms/call")

# ---- pitch variants ----
x0 = fresh()
x_pad = jnp.concatenate([jnp.zeros((B,pad_front),dtype), x0, jnp.zeros((B, 2*maxp+taps+Wn),dtype)],axis=1)
n_cells=(x_pad.shape[1]-pad_front)//G
m_strides=-(-seg_w//G)
n_grid=n_cells-m_strides+1
print("n_grid", n_grid)

def make_seg():
    xs = fresh()
    xp = jnp.concatenate([jnp.zeros((B,pad_front),dtype), xs, jnp.zeros((B, 2*maxp+taps+Wn),dtype)],axis=1)
    y=xp[:,pad_front:pad_front+n_cells*G].reshape(B,n_cells,G)
    return (jnp.concatenate([y[:,j:j+n_grid] for j in range(m_strides)],axis=-1)[:,:,:seg_w],)

def pitch_of(seg_c, prec):
    a0=seg_c[:,:,:taps]
    FA=jnp.einsum("bgt,tk->bgk",a0,Ea,precision=prec)
    FS=jnp.einsum("bgt,tk->bgk",seg_c,Es,precision=prec)
    AR,AI=FA[...,:nb],FA[...,nb:]; SR_,SI=FS[...,:nb],FS[...,nb:]
    prod=jnp.concatenate([AR*SR_+AI*SI, AR*SI-AI*SR_],axis=-1)
    cc=jnp.einsum("bgk,kl->bgl",prod,Inv,precision=prec)
    E=jnp.einsum("bgt,tl->bgl",seg_c*seg_c,Band,precision=prec)
    ssd=E[...,n_lags:]+E[...,:n_lags]-2.0*cc
    jmin=jnp.argmin(ssd,axis=-1); jc=jnp.clip(jmin,1,n_lags-2)
    take=lambda off: jnp.take_along_axis(ssd,(jc+off)[...,None],axis=2)[...,0]
    l_,m_,r_=take(-1),take(0),take(1)
    den=l_-2*m_+r_
    frac=jnp.where(jnp.abs(den)>1e-12,0.5*(l_-r_)/den,0.0)
    return (minp+jc).astype(dtype)+jnp.clip(frac,-0.5,0.5)

def chunked(gseg, prec):
    def f(seg):
        n_gpad=-(-n_grid//gseg)*gseg
        seg_p=jnp.concatenate([seg,jnp.zeros((B,n_gpad-n_grid,seg_w),dtype)],axis=1)
        seg_p=seg_p.reshape(B,n_gpad//gseg,gseg,seg_w).transpose(1,0,2,3)
        pg=jax.lax.map(lambda s: pitch_of(s, prec), seg_p)
        return jnp.sum(pg)
    return jax.jit(f)

def unchunked(prec):
    return jax.jit(lambda seg: jnp.sum(pitch_of(seg, prec)))

HI=jax.lax.Precision.HIGHEST; H=jax.lax.Precision.HIGH
run("pitch GSEG=128 HIGHEST (current)", chunked(128, HI), make_seg)
run("pitch GSEG=256 HIGHEST", chunked(256, HI), make_seg)
run("pitch GSEG=512 HIGHEST", chunked(512, HI), make_seg)
run("pitch unchunked HIGHEST", unchunked(HI), make_seg)
run("pitch unchunked HIGH", unchunked(H), make_seg)
run("pitch GSEG=256 HIGH", chunked(256, H), make_seg)

# ---- gather rpb variants ----
Lp = x_pad.shape[1]
def mk_g():
    xs = fresh()
    xp = jnp.concatenate([xs, jnp.zeros((B, Lp-L), dtype)],axis=1)
    starts = np.sort(rng.integers(0, L-(Wn+1), size=(B,K)).astype(np.int32),axis=1)
    return xp, jnp.asarray(starts)
nv = jnp.asarray(np.full((B,), 326, np.int32))
Kpad = -(-K//32)*32
def g(rpb):
    def f(x, s):
        s = jnp.concatenate([s, jnp.tile(s[:,-1:],(1,Kpad-K))],axis=1)
        return jnp.sum(gather_rows_pallas(x, s, Wn+1, rpb, nv)[:, :326])
    return jax.jit(f)
for rpb in (8, 16, 32):
    run(f"gather skip rpb={rpb}", g(rpb), mk_g)
