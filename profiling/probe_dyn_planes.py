"""Probe: VM planes on the dynamic (CP-D-NeRF) field.

CPDNeRFConfig inherits the flagship's planes=((128,8),) default; planes
at res 128 <= deform_grad_res_cutoff also back-drive the warp, adding
three stage-1-sized matmuls per pair to the dynamic backward. Measures
steady rate + PSNR trajectory on the 3-view dynamic anchor with planes
on vs off to decide the dynamic default.
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


def run(name, planes):
    _, train, val = make_synthetic_scene(n_train=36, n_val=4, res=256,
                                         dynamic=True, views_per_time=3)
    opt = TrainOptions(iters=9000, num_rays=4096, bound=1.0, dt_gamma=0.0,
                       grid_size=128, march_res=64, n_intervals=16,
                       steps_per_interval=4, segment_steps=128,
                       update_extra_interval=16, lr=1e-2, lr_net=1e-3,
                       workspace=f"/tmp/probe_dynp_{name}")
    field = make_cp_dnerf_field(jax.random.PRNGKey(0), CPDNeRFConfig(
        bound=1.0, planes=planes))
    tr = FastTrainer(f"dynp_{name}", opt, field, workspace=opt.workspace,
                     use_checkpoint="scratch", time_conditioned=True)
    tr.mark_untrained_grid(train.poses, train.intrinsics)
    data = train.device()
    h, w, c, n = train.h, train.w, train.images.shape[-1], len(train)
    tr.train_segment(data, h, w, c, n, 128)    # compile + warm
    t_start = time.perf_counter()
    tr.global_step = 0

    def val_psnr():
        ps = [_psnr(tr.render_image(val.poses[i], val.intrinsics, val.h,
                                    val.w, time=val.times[i])[0],
                    val.images[i]) for i in range(len(val))]
        return float(np.mean(ps))

    while tr.global_step < 2048:
        for _ in range(4):
            m = tr.train_segment(data, h, w, c, n, 128)
        _ = float(m["loss"])
        p = val_psnr()
        print(f"[dynp] {name} step {tr.global_step:5d} "
              f"t={time.perf_counter() - t_start:6.1f}s PSNR={p:5.2f}",
              file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    for _ in range(4):
        m = tr.train_segment(data, h, w, c, n, 128)
    _ = float(m["loss"])
    rate = 512 * opt.num_rays / (time.perf_counter() - t0)
    print(f"[dynp] {name} steady rate: {rate:.0f} rays/s",
          file=sys.stderr, flush=True)


if __name__ == "__main__":
    for name in (sys.argv[1:] or ["vm", "novm"]):
        run(name, ((128, 8),) if name == "vm" else ())
