import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# Dynamic quality ceiling: train the 3-view dynamic anchor (bench shapes)
# past the bench's 22-PSNR early exit and report PSNR at 2048/4096/8192
# steps. Informs whether DYN_PSNR_TARGET can be raised toward the
# 30-PSNR north star or whether the anchor scene/config saturates.
import time
import numpy as np

from sealdnerf_tpu.utils.jaxsetup import setup_jax
setup_jax()

import jax  # noqa: E402

from sealdnerf_tpu.data.synthetic import make_synthetic_scene  # noqa: E402
from sealdnerf_tpu.models.cp import CPDNeRFConfig, make_cp_dnerf_field  # noqa: E402
from sealdnerf_tpu.train.trainer import TrainOptions  # noqa: E402
from sealdnerf_tpu.train.fast import FastTrainer  # noqa: E402


def _psnr(img, gtimg):
    gt = gtimg[..., :3] * gtimg[..., 3:] + (1 - gtimg[..., 3:])
    return -10 * np.log10(max(np.mean((np.clip(img, 0, 1) - gt) ** 2),
                              1e-10))


_, train, val = make_synthetic_scene(n_train=36, n_val=4, res=256,
                                     dynamic=True, views_per_time=3)
opt = TrainOptions(iters=9300, num_rays=4096, bound=1.0, dt_gamma=0.0,
                   grid_size=128, march_res=64, n_intervals=16,
                   steps_per_interval=4, segment_steps=128,
                   update_extra_interval=16, workspace="/tmp/dyn_ceil",
                   lr=1e-2, lr_net=1e-3)
field = make_cp_dnerf_field(jax.random.PRNGKey(0), CPDNeRFConfig(bound=1.0))
tr = FastTrainer("dync", opt, field, workspace="/tmp/dyn_ceil",
                 use_checkpoint="scratch", time_conditioned=True)
tr.mark_untrained_grid(train.poses, train.intrinsics)
data = train.device()
h, w, c, n = train.h, train.w, train.images.shape[-1], len(train)
t0 = time.perf_counter()
tr.train_segment(data, h, w, c, n, 128)
print(f"[ceil] warmup {time.perf_counter() - t0:.0f}s", file=sys.stderr,
      flush=True)


def val_psnr():
    return float(np.mean([_psnr(tr.render_image(val.poses[i],
                                                val.intrinsics, val.h,
                                                val.w,
                                                time=val.times[i])[0],
                                val.images[i]) for i in range(len(val))]))


t0 = time.perf_counter()
for mark in (2048, 4096, 8192):
    while tr.global_step < mark:
        m = tr.train_segment(data, h, w, c, n, 128)
    _ = float(m["loss"])
    print(f"dyn ceiling: PSNR {val_psnr():.2f} @ step {mark} "
          f"({time.perf_counter() - t0:.0f}s)", flush=True)
