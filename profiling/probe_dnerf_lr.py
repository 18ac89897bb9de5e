"""Dynamic lr-schedule sweep (same graph; compile-cached)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time
import sys
import numpy as np
from sealdnerf_tpu.utils.jaxsetup import setup_jax
setup_jax()
import jax

from sealdnerf_tpu.data.synthetic import make_synthetic_scene
from sealdnerf_tpu.models.cp import CPDNeRFConfig, make_cp_dnerf_field
from sealdnerf_tpu.train.trainer import TrainOptions
from sealdnerf_tpu.train.fast import FastTrainer

LR, LRN, STEPS = float(sys.argv[1]), float(sys.argv[2]), int(sys.argv[3])

_, train, val = make_synthetic_scene(n_train=36, n_val=4, res=256,
                                     dynamic=True)
opt = TrainOptions(iters=STEPS, num_rays=4096, bound=1.0, dt_gamma=0.0,
                   grid_size=128, march_res=64, n_intervals=16,
                   steps_per_interval=4, segment_steps=128,
                   update_extra_interval=16, workspace="/tmp/dynlr",
                   lr=LR, lr_net=LRN)
field = make_cp_dnerf_field(jax.random.PRNGKey(0), CPDNeRFConfig(bound=1.0))
tr = FastTrainer("dyn", opt, field, workspace="/tmp/dynlr",
                 use_checkpoint="scratch", time_conditioned=True)
tr.mark_untrained_grid(train.poses, train.intrinsics)
data = train.device()
h, w, c, n = train.h, train.w, train.images.shape[-1], len(train)


def val_psnr():
    ps = []
    for i in range(3):
        img, _ = tr.render_image(val.poses[i], val.intrinsics, val.h, val.w,
                                 time=val.times[i])
        gtim = val.images[i]
        gt = gtim[..., :3] * gtim[..., 3:] + (1 - gtim[..., 3:])
        ps.append(-10 * np.log10(np.mean((np.clip(img, 0, 1) - gt) ** 2)))
    return float(np.mean(ps))


t0 = time.time()
while tr.global_step < STEPS:
    for _ in range(8):
        m = tr.train_segment(data, h, w, c, n, 128)
    _ = float(m["loss"])
    print(f"lr={LR}/{LRN} step {tr.global_step}: "
          f"loss={float(m['loss']):.5f} val={val_psnr():.2f} "
          f"wall={time.time()-t0:.0f}s", flush=True)
