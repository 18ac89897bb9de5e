"""Probe: is the ~25.5 PSNR plateau the FIELD or the fast RENDERER?

Every CP capacity variant saturates at ~25.5 PSNR @ 2048 steps
(probe_cp_capacity.py) while the NGP oracle reports 27.7 -- but the
oracle's eval goes through Trainer.render_image (per-ray chunked XLA
march) while the CP evals use FastTrainer.render_image (tile-band
bucketed). This probe trains one field, then renders the SAME params
through both paths and several fast-path budgets to isolate the
renderer's contribution.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import numpy as np

from sealdnerf_tpu.utils.jaxsetup import setup_jax
setup_jax()

import jax  # noqa: E402

from sealdnerf_tpu.data.synthetic import make_synthetic_scene  # noqa: E402
from sealdnerf_tpu.models.cp import CPConfig, make_cp_field  # noqa: E402
from sealdnerf_tpu.train.trainer import Trainer, TrainOptions  # noqa: E402
from sealdnerf_tpu.train.fast import FastTrainer  # noqa: E402


def _psnr(img, gtimg):
    gt = gtimg[..., :3] * gtimg[..., 3:] + (1 - gtimg[..., 3:])
    return -10 * np.log10(max(np.mean((np.clip(img, 0, 1) - gt) ** 2),
                              1e-10))


def main():
    _, train, val = make_synthetic_scene(n_train=24, n_val=2, res=256,
                                         hard=True)
    opt = TrainOptions(iters=4000, num_rays=4096, bound=1.0, dt_gamma=0.0,
                       grid_size=128, march_res=64, n_intervals=16,
                       steps_per_interval=4, segment_steps=128,
                       workspace="/tmp/probe_evalr")
    field = make_cp_field(jax.random.PRNGKey(0),
                          CPConfig(bound=1.0, planes=((128, 8),)))
    tr = FastTrainer("evalr", opt, field, workspace=opt.workspace,
                     use_checkpoint="scratch")
    tr.mark_untrained_grid(train.poses, train.intrinsics)
    data = train.device()
    h, w, c, n = train.h, train.w, train.images.shape[-1], len(train)
    while tr.global_step < 2048:
        tr.train_segment(data, h, w, c, n, 128)

    pose, intr = val.poses[0], val.intrinsics

    def report(tag, img):
        print(f"[evalr] {tag:28s} PSNR={_psnr(img, val.images[0]):5.2f}",
              file=sys.stderr, flush=True)

    img, _ = tr.render_image(pose, intr, val.h, val.w)
    report("fast tile-band (default)", img)

    # raise the fast-path eval budget
    tr.opt.render_n_intervals = 32
    tr.render_cfg = tr.render_cfg.__class__(
        bound=opt.bound, march_res=opt.march_res, n_intervals=32,
        steps_per_interval=4, min_near=opt.min_near, cascades=1,
        dt_gamma=0.0)
    tr._renderers = {}
    img, _ = tr.render_image(pose, intr, val.h, val.w)
    report("fast tile-band ni=32", img)

    tr.render_cfg = tr.render_cfg.__class__(
        bound=opt.bound, march_res=opt.march_res, n_intervals=16,
        steps_per_interval=8, min_near=opt.min_near, cascades=1,
        dt_gamma=0.0)
    tr._renderers = {}
    img, _ = tr.render_image(pose, intr, val.h, val.w)
    report("fast tile-band spi=8", img)

    # reference-shaped chunked renderer on the same params (what the
    # NGP oracle's PSNR flows through)
    tr.opt.max_ray_batch = 1024
    img, _ = Trainer.render_image(tr, pose, intr, val.h, val.w)
    report("Trainer.render_image (XLA)", img)


if __name__ == "__main__":
    main()
