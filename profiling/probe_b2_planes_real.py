"""Bound-2 planes-on vs planes-off on REAL-capture statistics
(VERDICT r4 next #8 / weak #7: the driver-captured bound2 rate is
0.64x baseline with planes on; planes-off recovers ~0.95x; the 0.2 dB
planes gain was only ever measured on the CENTERED easy scene whose
outer cascade is empty).

Scene: scene_scale=2 spreads the spheres to |c| ~ 1.2 (content in BOTH
cascades of the bound-2 march), cameras at radius 4.5 -- the off-center
statistics of a colmap capture. Same recipe as bench_bound2 otherwise.

Prints rate + PSNR@2048 for planes=((128,8),) and planes=().

Usage: python profiling/probe_b2_planes_real.py
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np

from sealdnerf_tpu.utils.jaxsetup import setup_jax
setup_jax()

import jax

from sealdnerf_tpu.data.synthetic import make_synthetic_scene
from sealdnerf_tpu.models.cp import CPConfig, make_cp_field
from sealdnerf_tpu.train.trainer import TrainOptions
from sealdnerf_tpu.train.fast import FastTrainer


def _psnr(img, gtimg):
    gt = gtimg[..., :3] * gtimg[..., 3:] + (1 - gtimg[..., 3:])
    return -10 * np.log10(max(np.mean((np.clip(img, 0, 1) - gt) ** 2),
                              1e-10))


def run(planes, label):
    _, train, val = make_synthetic_scene(n_train=16, n_val=1, res=128,
                                         scene_scale=2.0, radius=4.5,
                                         hard=True)
    opt = TrainOptions(iters=4000, num_rays=4096, bound=2.0,
                       dt_gamma=1 / 128, grid_size=128, march_res=64,
                       n_intervals=16, steps_per_interval=4,
                       segment_steps=128,
                       workspace=f"/tmp/b2real_{label}")
    field = make_cp_field(jax.random.PRNGKey(0),
                          CPConfig(bound=2.0, planes=planes))
    tr = FastTrainer("b2r", opt, field, workspace=opt.workspace,
                     use_checkpoint="scratch")
    tr.mark_untrained_grid(train.poses, train.intrinsics)
    data = train.device()
    h, w, c, n = train.h, train.w, train.images.shape[-1], len(train)
    tr.train_segment(data, h, w, c, n, 128)
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
    p = _psnr(img, val.images[0])
    print(f"{label:12s} rate {rate/1e3:7.1f}k rays/s   PSNR@2048 {p:.2f}",
          flush=True)
    return rate, p


if __name__ == "__main__":
    run(((128, 8),), "planes-on")
    run((), "planes-off")
