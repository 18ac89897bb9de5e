"""Probe: per-segment timeline of the bench's dynamic config.

Times every 128-step train_segment and every val eval separately over the
first 2048 steps, to locate the early-phase cost (the zr1e3 curve hits
PSNR 20 around step ~600 but the first 512 steps cost ~57s vs ~9s steady,
dc_zr2.log).
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
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


def main():
    _, train, val = make_synthetic_scene(n_train=36, n_val=4, res=256,
                                         dynamic=True, views_per_time=3)
    opt = TrainOptions(iters=9192, num_rays=4096, bound=1.0, dt_gamma=0.0,
                       grid_size=128, march_res=64, n_intervals=16,
                       steps_per_interval=4, segment_steps=128,
                       update_extra_interval=16,
                       workspace="/tmp/probe_dtl", lr=1e-2, lr_net=1e-3)
    field = make_cp_dnerf_field(jax.random.PRNGKey(0), CPDNeRFConfig(bound=1.0))
    tr = FastTrainer("dyn_3view", opt, field, workspace=opt.workspace,
                     use_checkpoint="scratch", time_conditioned=True)
    tr.mark_untrained_grid(train.poses, train.intrinsics)
    data = train.device()
    h, w, c, n = train.h, train.w, train.images.shape[-1], len(train)
    t0 = time.perf_counter()
    tr.train_segment(data, h, w, c, n, 128)
    print(f"[dtl] warmup segment (compile) {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)

    def val_psnr():
        ps = [_psnr(tr.render_image(val.poses[i], val.intrinsics, val.h,
                                    val.w, time=val.times[i])[0],
                    val.images[i]) for i in range(len(val))]
        return float(np.mean(ps))

    t0 = time.perf_counter()
    val_psnr()
    tr.warm_renderers(val.h, val.w, pose=val.poses[0],
                      intrinsics=val.intrinsics, time=float(val.times[0]))
    print(f"[dtl] eval warm (compile, both variants) "
          f"{time.perf_counter()-t0:.1f}s", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    m = tr.train_segment(data, h, w, c, n, 128)
    _ = float(m["loss"])
    print(f"[dtl] re-warm segment {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)
    tr.global_step = 0
    tstart = time.perf_counter()
    while tr.global_step < 2048:
        for _ in range(4):
            s0 = time.perf_counter()
            m = tr.train_segment(data, h, w, c, n, 128)
            _ = float(m["loss"])
            print(f"[dtl] seg @{tr.global_step:5d} "
                  f"{time.perf_counter()-s0:6.2f}s", file=sys.stderr,
                  flush=True)
        e0 = time.perf_counter()
        p = val_psnr()
        print(f"[dtl] eval @{tr.global_step:5d} {time.perf_counter()-e0:6.2f}s "
              f"PSNR={p:5.2f} wall={time.perf_counter()-tstart:6.1f}s",
              file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
