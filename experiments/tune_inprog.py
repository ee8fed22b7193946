import os, sys, time, functools
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, jax, jax.numpy as jnp
from speedy_tpu.config import SpeedyConfig
from speedy_tpu.ops import wsola, wsola_fast
from speedy_tpu.ops.wsola_fast import _pitch_corr_matrices, _gather_rows
from speedy_tpu.ops.pallas_kernels import gather_rows_pallas
SR=16000; B=128; L=SR*10; cfg=SpeedyConfig(SR)
T = cfg.num_frames(L, integer_step=True)
rng = np.random.default_rng(0)
base = rng.standard_normal((B, L)).astype(np.float32)*0.1
def fresh(): return jnp.asarray(base * rng.uniform(0.5,1.0,(B,1)).astype(np.float32))
lengths = jnp.asarray(np.full((B,), L, np.int32))
sync = jax.jit(lambda x: jnp.sum(x))
minp, maxp, capS, steps = wsola.plan(cfg, L, 1.0)
hop, gcap, K = wsola_fast.plan_grid(cfg, L, 1.0)
dtype=jnp.float32; Hs=hop; Wn=2*Hs; taps=maxp; pad_front=maxp
seg_w=taps+maxp; G=Hs; n_lags=maxp-minp+1
M=-(-(seg_w+taps)//128)*128; nb=M//2+1
mats=_pitch_corr_matrices(taps, seg_w, minp, maxp, M)
Ea,Es,Inv,Band=(jnp.asarray(m) for m in mats)
frame_step=cfg.frame_step_int

def wso(xs, l):
    sp = jnp.full((B, T), 3.51, dtype)
    return jnp.sum(wsola_fast._wsola_grid_batch(xs, l, sp, minp, maxp, frame_step, hop, gcap, K).output)

def seg_of(xs):
    xp = jnp.concatenate([jnp.zeros((B,pad_front),dtype), xs, jnp.zeros((B, 2*maxp+taps+Wn),dtype)],axis=1)
    n_cells=(xp.shape[1]-pad_front)//G
    m_strides=-(-seg_w//G)
    n_grid=n_cells-m_strides+1
    y=xp[:,pad_front:pad_front+n_cells*G].reshape(B,n_cells,G)
    return jnp.concatenate([y[:,j:j+n_grid] for j in range(m_strides)],axis=-1)[:,:,:seg_w], n_grid, xp

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

def pitch_extra(xs, gseg, prec):
    seg, n_grid, _ = seg_of(xs)
    if gseg is None:
        return jnp.sum(pitch_of(seg, prec))
    n_gpad=-(-n_grid//gseg)*gseg
    seg_p=jnp.concatenate([seg,jnp.zeros((B,n_gpad-n_grid,seg_w),dtype)],axis=1)
    seg_p=seg_p.reshape(B,n_gpad//gseg,gseg,seg_w).transpose(1,0,2,3)
    return jnp.sum(jax.lax.map(lambda s: pitch_of(s, prec), seg_p))

def gather_extra(xs, rpb):
    _, _, xp = seg_of(xs)
    c = jnp.cumsum(jnp.full((B,K), Hs*3.51, dtype),axis=1)
    a_i = jnp.clip(c.astype(jnp.int32), 0, L-1)
    nv = jnp.full((B,), 326, jnp.int32)
    Kpad=-(-K//rpb)*rpb
    s = jnp.concatenate([a_i+pad_front, jnp.tile(a_i[:,-1:]+pad_front,(1,Kpad-K))],axis=1)
    return jnp.sum(gather_rows_pallas(xp, s, Wn+1, rpb, nv)[:, :326])

def run(name, f, nit=8):
    fj=jax.jit(f)
    ins=[fresh() for _ in range(nit)]
    for x in ins: float(sync(x))
    float(fj(ins[0], lengths))
    best=None
    for _ in range(2):
        t0=time.perf_counter()
        outs=[fj(x,lengths) for x in ins]
        _=[float(s) for s in outs]
        dt=time.perf_counter()-t0
        best=dt if best is None else min(best,dt)
    return best/nit

t0 = run("base", lambda xs,l: wso(xs,l))
print(f"wsola baseline: {t0*1e3:.2f} ms")
HI=jax.lax.Precision.HIGHEST; H=jax.lax.Precision.HIGH
for name, f in [
    ("pitch GSEG=128 HIGHEST (current)", lambda xs,l: wso(xs,l)+pitch_extra(xs*1.0001, 128, HI)),
    ("pitch unchunked HIGHEST", lambda xs,l: wso(xs,l)+pitch_extra(xs*1.0001, None, HI)),
    ("pitch GSEG=256 HIGHEST", lambda xs,l: wso(xs,l)+pitch_extra(xs*1.0001, 256, HI)),
    ("pitch GSEG=128 HIGH", lambda xs,l: wso(xs,l)+pitch_extra(xs*1.0001, 128, H)),
    ("pitch unchunked HIGH", lambda xs,l: wso(xs,l)+pitch_extra(xs*1.0001, None, H)),
    ("gather rpb=8 (current)", lambda xs,l: wso(xs,l)+gather_extra(xs*1.0001, 8)),
    ("gather rpb=16", lambda xs,l: wso(xs,l)+gather_extra(xs*1.0001, 16)),
    ("gather rpb=32", lambda xs,l: wso(xs,l)+gather_extra(xs*1.0001, 32)),
]:
    t = run(name, f)
    print(f"{name:42s} delta {max(0,(t-t0))*1e3:6.2f} ms")
