"""Honest render timing: unique camera per call (axon dedupes identical
dispatches). Sweeps bucket splits and fine-scale resolution."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time
import numpy as np
from sealdnerf_tpu.utils.jaxsetup import setup_jax
setup_jax()
import jax
import jax.numpy as jnp
import dataclasses

from sealdnerf_tpu.data.synthetic import make_synthetic_scene
from sealdnerf_tpu.models.cp import CPConfig, make_cp_field
from sealdnerf_tpu.train.trainer import TrainOptions
from sealdnerf_tpu.train.fast import FastTrainer

_, train, val = make_synthetic_scene(n_train=24, n_val=6, res=256)
opt = TrainOptions(iters=1300, num_rays=4096, bound=1.0, dt_gamma=0.0,
                   grid_size=128, march_res=64, n_intervals=16,
                   steps_per_interval=4, segment_steps=128,
                   workspace="/tmp/rh", update_extra_interval=16)
cfg = CPConfig(bound=1.0)
field = make_cp_field(jax.random.PRNGKey(0), cfg)
tr = FastTrainer("rh", opt, field, workspace="/tmp/rh",
                 use_checkpoint="scratch")
tr.mark_untrained_grid(train.poses, train.intrinsics)
data = train.device()
h, w, c, n = train.h, train.w, train.images.shape[-1], len(train)
t0 = time.time()
tr.train_segment(data, h, w, c, n, 256)
for _ in range(8):
    tr.train_segment(data, h, w, c, n, 128)
print(f"trained {tr.global_step} in {time.time()-t0:.0f}s", flush=True)


def gt_img(i):
    g = val.images[i]
    return g[..., :3] * g[..., 3:] + (1 - g[..., 3:])


def bench(label, rh, n_frames=6, psnr_at_256=True):
    intr = np.asarray(val.intrinsics) * (rh / val.h)
    # warmup/compile on pose 0
    tr.render_image(val.poses[0], intr, rh, rh)
    t0 = time.perf_counter()
    for i in range(n_frames):
        img, _ = tr.render_image(val.poses[i % len(val)], intr, rh, rh)
    ms = (time.perf_counter() - t0) / n_frames * 1e3
    p = ""
    if rh == 256 and psnr_at_256:
        ps = []
        for i in range(3):
            im, _ = tr.render_image(val.poses[i], intr, rh, rh)
            ps.append(-10 * np.log10(np.mean((im - gt_img(i)) ** 2)))
        p = f" PSNR={np.mean(ps):.2f}"
    print(f"{label:44s} {ms:8.1f} ms/frame{p}", flush=True)


bench("default splits 70/20/10, 256px", 256)
bench("default splits 70/20/10, 800px", 800)
for splits in (((0.80, 4), (0.15, 2), (1.0, 1)),
               ((0.85, 8), (0.10, 2), (1.0, 1))):
    tr.opt = dataclasses.replace(tr.opt, render_splits=splits)
    tr._renderers.clear()
    tag = "/".join(f"{int(f*100)}d{d}" for f, d in splits)
    bench(f"splits {tag}, 256px", 256)
    bench(f"splits {tag}, 800px", 800)
