"""Dynamic grid-refresh cadence sweep (r3 bench regression hunt).

r2's bench (update_extra_interval=16) hit 20.6 PSNR at step 1024; r3's
(=100, 'reference cadence') needs ~6000 steps for the same quality at
5.8x the step rate -- a net loss. With the refresh now riding the fused
planar forward its cost may be negligible: measure PSNR-at-step and
rays/s for intervals {100, 32, 16}.

Usage: python profiling/probe_dyn_interval.py [steps=1536]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np

from sealdnerf_tpu.utils.jaxsetup import setup_jax
setup_jax()

import jax

from sealdnerf_tpu.data.synthetic import make_synthetic_scene
from sealdnerf_tpu.models.cp import CPDNeRFConfig, make_cp_dnerf_field
from sealdnerf_tpu.train.trainer import TrainOptions
from sealdnerf_tpu.train.fast import FastTrainer

STEPS = int(_sys.argv[1]) if len(_sys.argv) > 1 else 1536


def psnr(img, gtimg):
    gt = gtimg[..., :3] * gtimg[..., 3:] + (1 - gtimg[..., 3:])
    return -10 * np.log10(max(np.mean((np.clip(img, 0, 1) - gt) ** 2),
                              1e-10))


def main():
    _, train, val = make_synthetic_scene(n_train=36, n_val=4, res=256,
                                         dynamic=True, views_per_time=3)
    data = None
    for interval in (100, 32, 16):
        opt = TrainOptions(iters=STEPS + 1000, num_rays=4096, bound=1.0,
                           dt_gamma=0.0, grid_size=128, march_res=64,
                           n_intervals=16, steps_per_interval=4,
                           segment_steps=128,
                           update_extra_interval=interval,
                           workspace=f"/tmp/dyn_iv{interval}",
                           lr=1e-2, lr_net=1e-3, render_n_intervals=24)
        field = make_cp_dnerf_field(jax.random.PRNGKey(0),
                                    CPDNeRFConfig(bound=1.0))
        tr = FastTrainer(f"iv{interval}", opt, field,
                         workspace=opt.workspace, use_checkpoint="scratch",
                         time_conditioned=True)
        tr.mark_untrained_grid(train.poses, train.intrinsics)
        data = train.device()
        h, w, c, n = train.h, train.w, train.images.shape[-1], len(train)
        tr.train_segment(data, h, w, c, n, 128)  # warmup sweeps + compile
        tr.global_step = 0
        marks = {}
        t0 = time.perf_counter()
        while tr.global_step < STEPS:
            for _ in range(4):
                m = tr.train_segment(data, h, w, c, n, 128)
            _ = float(m["loss"])
            ps = float(np.mean([psnr(
                tr.render_image(val.poses[i], val.intrinsics, val.h,
                                val.w, time=val.times[i])[0],
                val.images[i]) for i in range(len(val))]))
            marks[tr.global_step] = ps
        dt = time.perf_counter() - t0
        rate = STEPS * opt.num_rays / dt
        print(f"iv={interval:3d} rate~{rate:,.0f} rays/s (incl evals)  " +
              "  ".join(f"{s}:{p:.2f}" for s, p in marks.items()),
              flush=True)


if __name__ == "__main__":
    main()
