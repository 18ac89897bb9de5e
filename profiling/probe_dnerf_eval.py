"""Train dyn 8k (zr on), then sweep EVAL configs; also compare zr weights."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys, time, dataclasses
import numpy as np
from sealdnerf_tpu.utils.jaxsetup import setup_jax
setup_jax()
import jax
from sealdnerf_tpu.data.synthetic import make_synthetic_scene
from sealdnerf_tpu.models.cp import CPDNeRFConfig, make_cp_dnerf_field
from sealdnerf_tpu.train.trainer import TrainOptions
from sealdnerf_tpu.train.fast import FastTrainer

ZR = float(sys.argv[1]) if len(sys.argv) > 1 else 1e-2
_, train, val = make_synthetic_scene(n_train=36, n_val=4, res=256,
                                     dynamic=True, views_per_time=3)
opt = TrainOptions(iters=8200, num_rays=4096, bound=1.0, dt_gamma=0.0,
                   grid_size=128, march_res=64, n_intervals=16,
                   steps_per_interval=4, segment_steps=128,
                   update_extra_interval=16, workspace="/tmp/dyneval",
                   lr=1e-2, lr_net=1e-3, deform_zero_reg=ZR)
cfg = CPDNeRFConfig(bound=1.0)
field = make_cp_dnerf_field(jax.random.PRNGKey(0), cfg)
tr = FastTrainer("dyn", opt, field, workspace="/tmp/dyneval",
                 use_checkpoint="scratch", time_conditioned=True)
tr.mark_untrained_grid(train.poses, train.intrinsics)
data = train.device()
h, w, c, n = train.h, train.w, train.images.shape[-1], len(train)
t0 = time.time()
while tr.global_step < 8192:
    m = tr.train_segment(data, h, w, c, n, 128)
print(f"zr={ZR} trained 8192 in {time.time()-t0:.0f}s "
      f"loss={float(m['loss']):.5f}", flush=True)

def val_psnr(tag):
    ps = []
    for i in range(4):
        img, _ = tr.render_image(val.poses[i], val.intrinsics, val.h, val.w,
                                 time=val.times[i])
        g = val.images[i]
        gt = g[..., :3]*g[..., 3:] + (1-g[..., 3:])
        ps.append(-10*np.log10(np.mean((np.clip(img,0,1)-gt)**2)))
    print(f"zr={ZR} {tag}: val={np.mean(ps):.2f} "
          f"{['%.1f'%p for p in ps]}", flush=True)
    return float(np.mean(ps))

val_psnr("eval iv16 F4 (default)")
for (ni, f) in ((16, 8), (24, 4), (24, 8)):
    tr.render_cfg = dataclasses.replace(tr.render_cfg, n_intervals=ni,
                                        steps_per_interval=f)
    tr._renderers.clear()
    val_psnr(f"eval iv{ni} F{f}")
