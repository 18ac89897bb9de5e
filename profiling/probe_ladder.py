"""Probe: isolate the bucketed-ladder / interval-budget quality effects.

probe_eval_renderer said ni=32 renders a trained vm128 field at 29.6
PSNR; after defaulting render ni to 2x with rebalanced divisors, the
capacity probe read 22.5. Train once, then sweep (ni, splits, bucketed)
on the SAME params.
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
from sealdnerf_tpu.train.trainer import TrainOptions  # noqa: E402
from sealdnerf_tpu.train.fast import FastTrainer  # noqa: E402
from sealdnerf_tpu.ops.marching_dense import DenseMarchConfig  # noqa: E402


def _psnr(img, gtimg):
    gt = gtimg[..., :3] * gtimg[..., 3:] + (1 - gtimg[..., 3:])
    return -10 * np.log10(max(np.mean((np.clip(img, 0, 1) - gt) ** 2),
                              1e-10))


OLD = ((0.50, 16), (0.20, 8), (0.15, 4), (0.10, 2), (1.0, 1))
NEW = ((0.50, 32), (0.20, 16), (0.15, 8), (0.10, 4), (1.0, 1))


def main():
    _, train, val = make_synthetic_scene(n_train=24, n_val=2, res=256,
                                         hard=True)
    opt = TrainOptions(iters=4000, num_rays=4096, bound=1.0, dt_gamma=0.0,
                       grid_size=128, march_res=64, n_intervals=16,
                       steps_per_interval=4, segment_steps=128,
                       workspace="/tmp/probe_lad")
    field = make_cp_field(jax.random.PRNGKey(0),
                          CPConfig(bound=1.0, planes=((128, 8),)))
    tr = FastTrainer("lad", opt, field, workspace=opt.workspace,
                     use_checkpoint="scratch")
    tr.mark_untrained_grid(train.poses, train.intrinsics)
    data = train.device()
    h, w, c, n = train.h, train.w, train.images.shape[-1], len(train)
    while tr.global_step < 2048:
        tr.train_segment(data, h, w, c, n, 128)

    print(f"[lad] use_buckets={tr._use_buckets()} "
          f"occ_frac={tr._occ_frac}", file=sys.stderr, flush=True)

    pose, intr = val.poses[0], val.intrinsics

    def render_with(ni, splits, tag):
        tr.render_cfg = DenseMarchConfig(
            bound=opt.bound, march_res=opt.march_res, n_intervals=ni,
            steps_per_interval=4, min_near=opt.min_near, cascades=1,
            dt_gamma=0.0)
        tr.opt.render_splits = splits
        tr._renderers = {}
        img, _ = tr.render_image(pose, intr, val.h, val.w)
        print(f"[lad] {tag:24s} PSNR={_psnr(img, val.images[0]):5.2f}",
              file=sys.stderr, flush=True)

    render_with(16, OLD, "ni=16 old-ladder")
    render_with(32, OLD, "ni=32 old-divisors")
    render_with(32, NEW, "ni=32 new-divisors")
    render_with(64, NEW, "ni=64 new-divisors")


if __name__ == "__main__":
    main()
