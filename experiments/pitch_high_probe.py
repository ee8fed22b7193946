"""TPU quality probe: Teager gates with pitch precision HIGH vs HIGHEST."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np, jax, jax.numpy as jnp
from speedy_tpu.config import SpeedyConfig
from speedy_tpu.ops import wsola_fast

sr=16000; cfg=SpeedyConfig(sr)
def probe(tag):
    for speed in (0.4, 3.5, 6.0):
        t=np.arange(sr*3)/sr
        sine=(0.4*np.sin(2*np.pi*440*t)).astype(np.float32)
        T=cfg.num_frames(len(sine), integer_step=True)
        r=wsola_fast.time_scale_grid(jnp.asarray(sine), jnp.full((T,),speed,jnp.float32), cfg,
                                     min_speed_bound=min(0.25,speed), max_speed_bound=8.0)
        y=np.asarray(r.output)[400:int(r.valid_length)-400]
        tg=y[1:-1]**2-y[:-2]*y[2:]
        print(f"{tag} speed {speed}: mean-err {abs(tg.mean()/((0.4**2)*np.sin(2*np.pi*440/sr)**2)-1):.4f} rel-sigma {tg.std()/tg.mean():.4f}")
probe("HIGHEST")
wsola_fast._PITCH_PRECISION = jax.lax.Precision.HIGH
wsola_fast._wsola_grid_batch.clear_cache()
probe("HIGH   ")
