import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# Bound-2 (colmap-style) recipe rate + short PSNR with the round-3
# VM-plane flagship default (bench_bound2's exact shapes, short budget).
import time
import numpy as np

from sealdnerf_tpu.utils.jaxsetup import setup_jax
setup_jax()

import jax  # noqa: E402

from sealdnerf_tpu.data.synthetic import make_synthetic_scene  # noqa: E402
from sealdnerf_tpu.models.cp import CPConfig, make_cp_field  # noqa: E402
from sealdnerf_tpu.train.trainer import TrainOptions  # noqa: E402
from sealdnerf_tpu.train.fast import FastTrainer  # noqa: E402


def _psnr(img, gtimg):
    gt = gtimg[..., :3] * gtimg[..., 3:] + (1 - gtimg[..., 3:])
    return -10 * np.log10(max(np.mean((np.clip(img, 0, 1) - gt) ** 2),
                              1e-10))


_, train, val = make_synthetic_scene(n_train=12, n_val=1, res=128)
opt = TrainOptions(iters=4000, num_rays=4096, bound=2.0, dt_gamma=1 / 128,
                   grid_size=128, march_res=64, n_intervals=16,
                   steps_per_interval=4, segment_steps=128,
                   workspace="/tmp/b2p_ws")
field = make_cp_field(jax.random.PRNGKey(0), CPConfig(bound=2.0))
tr = FastTrainer("b2p", opt, field, workspace="/tmp/b2p_ws",
                 use_checkpoint="scratch")
tr.mark_untrained_grid(train.poses, train.intrinsics)
data = train.device()
h, w, c, n = train.h, train.w, train.images.shape[-1], len(train)
t0 = time.perf_counter()
tr.train_segment(data, h, w, c, n, 128)
print(f"[b2p] warmup {time.perf_counter() - t0:.0f}s", file=sys.stderr,
      flush=True)
m = tr.train_segment(data, h, w, c, n, 128)
_ = float(m["loss"])
t0 = time.perf_counter()
for _ in range(4):
    m = tr.train_segment(data, h, w, c, n, 128)
_ = float(m["loss"])
rate = 512 * 4096 / (time.perf_counter() - t0)
while tr.global_step < 2048:
    tr.train_segment(data, h, w, c, n, 128)
img, _ = tr.render_image(val.poses[0], val.intrinsics, val.h, val.w)
print(f"bound2+planes: {rate / 1e3:.1f}k rays/s, "
      f"PSNR@2048 {_psnr(img, val.images[0]):.2f}")
