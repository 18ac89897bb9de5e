"""PSNR + speed for alternative CP scale pyramids (train 1.2k steps each)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys, time
import numpy as np
from sealdnerf_tpu.utils.jaxsetup import setup_jax
setup_jax()
import jax
from sealdnerf_tpu.data.synthetic import make_synthetic_scene
from sealdnerf_tpu.models.cp import CPConfig, make_cp_field
from sealdnerf_tpu.train.trainer import TrainOptions
from sealdnerf_tpu.train.fast import FastTrainer

SCALES = {
    "base": ((32, 32), (128, 48), (512, 64), (1408, 64)),
    "slim": ((64, 32), (256, 64), (1024, 64)),
    "slim2": ((32, 32), (128, 48), (512, 64), (1024, 64)),
}[sys.argv[1]]
_, train, val = make_synthetic_scene(n_train=24, n_val=6, res=256, hard=True)
opt = TrainOptions(iters=1300, num_rays=4096, bound=1.0, dt_gamma=0.0,
                   grid_size=128, march_res=64, n_intervals=16,
                   steps_per_interval=4, segment_steps=128,
                   workspace="/tmp/sc", update_extra_interval=16)
cfg = CPConfig(bound=1.0, scales=SCALES)
field = make_cp_field(jax.random.PRNGKey(0), cfg)
tr = FastTrainer("sc", opt, field, workspace="/tmp/sc",
                 use_checkpoint="scratch")
tr.mark_untrained_grid(train.poses, train.intrinsics)
data = train.device()
h, w, c, n = train.h, train.w, train.images.shape[-1], len(train)
tr.train_segment(data, h, w, c, n, 256)
t0 = time.perf_counter()
for _ in range(4):
    m = tr.train_segment(data, h, w, c, n, 128)
_ = float(m["loss"])
rate = 512 * 4096 / (time.perf_counter() - t0)
for _ in range(4):
    m = tr.train_segment(data, h, w, c, n, 128)
ps = []
for i in range(3):
    img, _ = tr.render_image(val.poses[i], val.intrinsics, val.h, val.w)
    g = val.images[i]
    gt = g[..., :3] * g[..., 3:] + (1 - g[..., 3:])
    ps.append(-10 * np.log10(np.mean((img - gt) ** 2)))
intr8 = np.asarray(val.intrinsics) * (800 / val.h)
tr.render_image(val.poses[0], intr8, 800, 800)
t0 = time.perf_counter()
for i in range(5):
    tr.render_image(val.poses[i % 6], intr8, 800, 800)
ms800 = (time.perf_counter() - t0) / 5 * 1e3
print(f"{sys.argv[1]} {SCALES}: train={rate:,.0f} rays/s "
      f"PSNR(hard,1280steps)={np.mean(ps):.2f} 800px={ms800:.0f} ms",
      flush=True)
