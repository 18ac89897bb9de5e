"""Bucketed render speed+PSNR on the trained synthetic scene (TPU)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time
import numpy as np
from sealdnerf_tpu.utils.jaxsetup import setup_jax
setup_jax()
import jax, jax.numpy as jnp
from sealdnerf_tpu.data.synthetic import make_synthetic_scene
from sealdnerf_tpu.models.cp import CPConfig, make_cp_field
from sealdnerf_tpu.train.trainer import TrainOptions
from sealdnerf_tpu.train.fast import FastTrainer
from sealdnerf_tpu.ops.marching_dense import DenseMarchConfig, downsample_occ
from sealdnerf_tpu.render.fast_image import render_image_bucketed
from sealdnerf_tpu.ops.pallas_field import make_fused_forward_planar

_, train, val = make_synthetic_scene(n_train=24, n_val=2, res=256)
opt = TrainOptions(iters=1200, num_rays=4096, bound=1.0, dt_gamma=0.0,
                   grid_size=128, march_res=64, n_intervals=16,
                   steps_per_interval=4, segment_steps=128,
                   workspace="/tmp/prq2", update_extra_interval=16)
cfg = CPConfig(bound=1.0)
field = make_cp_field(jax.random.PRNGKey(0), cfg)
tr = FastTrainer("q", opt, field, workspace="/tmp/prq2", use_checkpoint="scratch")
tr.mark_untrained_grid(train.poses, train.intrinsics)
data = train.device()
h, w, c, n = train.h, train.w, train.images.shape[-1], len(train)
t0 = time.time()
tr.train_segment(data, h, w, c, n, 256)
for _ in range(7):
    tr.train_segment(data, h, w, c, n, 128)
print(f"trained in {time.time()-t0:.1f}s", flush=True)
params = tr._infer_params()
gt = val.images[0][..., :3]*val.images[0][..., 3:] + (1-val.images[0][..., 3:])
pose = jnp.asarray(val.poses[0], jnp.float32)
fwd = make_fused_forward_planar(cfg)

def run(rh, splits, label, n_rep=5):
    rcfg = DenseMarchConfig(bound=1.0, march_res=64, n_intervals=16, steps_per_interval=4)
    occ_m = downsample_occ(tr.grid_state["occ"][0], 64)
    intr = jnp.asarray(val.intrinsics, jnp.float32)*(rh/val.h)
    f = jax.jit(lambda p, o, ps, it: render_image_bucketed(
        p, o, ps, it, rh, rh, rcfg, fwd, jnp.ones(3), tile_px=8, dilate=1,
        planar=True, splits=splits))
    img, dep = f(params, occ_m, pose, intr); jax.block_until_ready(img)
    t0 = time.perf_counter()
    for _ in range(n_rep):
        img, dep = f(params, occ_m, pose, intr)
    jax.block_until_ready(img)
    ms = (time.perf_counter()-t0)/n_rep*1e3
    p = -10*np.log10(np.mean((np.clip(np.asarray(img),0,1)-gt)**2)) if rh==256 else float('nan')
    print(f"{label:44s} {ms:8.1f} ms PSNR={p:.2f}", flush=True)

run(256, ((0.55,4),(0.30,2),(1.0,1)), "bucket256 55/30/15")
run(800, ((0.55,4),(0.30,2),(1.0,1)), "bucket800 55/30/15")
run(800, ((0.70,4),(0.20,2),(1.0,1)), "bucket800 70/20/10")
run(800, ((0.55,8),(0.30,2),(1.0,1)), "bucket800 55(div8)/30/15")
run(256, ((0.70,4),(0.20,2),(1.0,1)), "bucket256 70/20/10")
