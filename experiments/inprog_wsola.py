import os, sys, time, functools
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, jax, jax.numpy as jnp
from speedy_tpu.config import SpeedyConfig
from speedy_tpu.ops import wsola, wsola_fast
from speedy_tpu.ops.wsola_fast import _pitch_corr_matrices, _cola_hann, _gather_rows
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
frame_step=cfg.frame_step_int

def wso(xs, l):
    sp = jnp.full((B, T), 3.51, dtype)
    return jnp.sum(wsola_fast._wsola_grid_batch(xs, l, sp, minp, maxp, frame_step, hop, gcap, K).output)

# pieces, replicated at identical (CURRENT production) shapes
from speedy_tpu.ops.wsola_fast import _PITCH_PRECISION
seg_w = taps + maxp
G = -(-max(3 * Hs, seg_w) // 128) * 128  # as in _wsola_grid_batch

def pitch_extra(xs):
    x_pad = jnp.concatenate([jnp.zeros((B,pad_front),dtype), xs, jnp.zeros((B, 2*maxp+taps+Wn),dtype)],axis=1)
    n_cells=(x_pad.shape[1]-pad_front)//G
    m_strides=-(-seg_w//G)
    n_grid=n_cells-m_strides+1
    y=x_pad[:,pad_front:pad_front+n_cells*G].reshape(B,n_cells,G)
    seg=jnp.concatenate([y[:,j:j+n_grid] for j in range(m_strides)],axis=-1)[:,:,:seg_w]
    # replicate ssd_matmul + parabolic_min at production shapes
    w = seg.shape[-1]
    M = -(-max(w, taps + maxp)//128)*128; nb = M//2+1; n_lags = maxp-minp+1
    Ea, Es, Inv, Band = (jnp.asarray(m) for m in _pitch_corr_matrices(taps, w, minp, maxp, M))
    a0 = seg[..., :taps]
    prec=_PITCH_PRECISION
    FA=jnp.einsum("bgt,tk->bgk",a0,Ea,precision=prec)
    FS=jnp.einsum("bgt,tk->bgk",seg,Es,precision=prec)
    AR,AI=FA[...,:nb],FA[...,nb:]; SR_,SI=FS[...,:nb],FS[...,nb:]
    prod=jnp.concatenate([AR*SR_+AI*SI, AR*SI-AI*SR_],axis=-1)
    cc=jnp.einsum("bgk,kl->bgl",prod,Inv,precision=prec)
    E=jnp.einsum("bgt,tl->bgl",seg*seg,Band,precision=prec)
    ssd=E[...,n_lags:]+E[...,:n_lags]-2.0*cc
    jmin=jnp.argmin(ssd,axis=-1); jc=jnp.clip(jmin,1,n_lags-2)
    take=lambda off: jnp.take_along_axis(ssd,(jc+off)[...,None],axis=2)[...,0]
    l_,m_,r_=take(-1),take(0),take(1)
    den=l_-2*m_+r_
    frac=jnp.where(jnp.abs(den)>1e-12,0.5*(l_-r_)/den,0.0)
    pg=(minp+jc).astype(dtype)+jnp.clip(frac,-0.5,0.5)
    return jnp.sum(pg)

def gather_extra(xs):
    x_pad = jnp.concatenate([jnp.zeros((B,pad_front),dtype), xs, jnp.zeros((B, 2*maxp+taps+Wn),dtype)],axis=1)
    c = jnp.cumsum(jnp.full((B,K), Hs*3.51, dtype),axis=1)
    a_i = jnp.clip(c.astype(jnp.int32), 0, L-1)
    nv = jnp.full((B,), 326, jnp.int32)
    return jnp.sum(_gather_rows(x_pad, a_i + pad_front, Wn+1, nv)[:, :326])

def interp_ola_extra(xs):
    # fabricate wide from strided reshape (cheap) at the same shape
    x_pad = jnp.concatenate([xs, jnp.zeros((B, K*(Wn+1)-L+Wn), dtype)],axis=1)
    wide = x_pad[:, :K*(Wn+1)].reshape(B, K, Wn+1)
    af = jnp.full((B,K), 0.37, dtype)[:, :, None]
    win = jnp.asarray(_cola_hann(Wn))
    raw = wide[:,:,:-1]*(1-af)+wide[:,:,1:]*af
    rows = raw*win[None,None,:]
    firsts=rows[:,:,:Hs]; seconds=rows[:,:,Hs:]
    slots=firsts+jnp.concatenate([jnp.zeros((B,1,Hs),dtype),seconds[:,:-1]],axis=1)
    slots=jnp.concatenate([raw[:,:1,:Hs],slots[:,1:]],axis=1)
    out=slots.reshape(B,K*Hs)
    return jnp.sum(out)

def run(name, f, nit=8):
    fj = jax.jit(f)
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
    print(f"{name:40s} {best/nit*1e3:8.2f} ms/call")
    return best/nit

t0 = run("wsola", lambda xs,l: wso(xs,l))
t1 = run("wsola + extra pitch", lambda xs,l: wso(xs,l)+pitch_extra(xs*1.0001))
t2 = run("wsola + extra gather", lambda xs,l: wso(xs,l)+gather_extra(xs*1.0001))
t3 = run("wsola + extra interp/OLA", lambda xs,l: wso(xs,l)+interp_ola_extra(xs*1.0001))
print(f"=> pitch ~{(t1-t0)*1e3:.1f}  gather ~{(t2-t0)*1e3:.1f}  interp/OLA ~{(t3-t0)*1e3:.1f}  of wsola {t0*1e3:.1f}")
