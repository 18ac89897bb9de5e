"""Dynamic diagnosis: train 12k steps; eval multiple views/times via the
fast tiled path AND the slow reference-shaped path; train-view PSNR too."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time
import numpy as np
from sealdnerf_tpu.utils.jaxsetup import setup_jax
setup_jax()
import jax

from sealdnerf_tpu.data.synthetic import make_synthetic_scene
from sealdnerf_tpu.models.cp import CPDNeRFConfig, make_cp_dnerf_field
from sealdnerf_tpu.train.trainer import TrainOptions, Trainer
from sealdnerf_tpu.train.fast import FastTrainer


def main():
    _, train, val = make_synthetic_scene(n_train=36, n_val=4, res=256,
                                         dynamic=True)
    opt = TrainOptions(iters=12000, num_rays=4096, bound=1.0, dt_gamma=0.0,
                       grid_size=128, march_res=64, n_intervals=16,
                       steps_per_interval=4, segment_steps=128,
                       update_extra_interval=16, workspace="/tmp/dynb2",
                       lr=1e-2, lr_net=1e-3)
    cfg = CPDNeRFConfig(bound=1.0)
    field = make_cp_dnerf_field(jax.random.PRNGKey(0), cfg)
    tr = FastTrainer("dyn", opt, field, workspace="/tmp/dynb2",
                     use_checkpoint="scratch", time_conditioned=True)
    tr.mark_untrained_grid(train.poses, train.intrinsics)
    data = train.device()
    h, w, c, n = train.h, train.w, train.images.shape[-1], len(train)

    def psnr_img(img, gtimg):
        gt = gtimg[..., :3] * gtimg[..., 3:] + (1 - gtimg[..., 3:])
        return -10 * np.log10(np.mean((np.clip(img, 0, 1) - gt) ** 2))

    t_start = time.time()
    while tr.global_step < 12000:
        for _ in range(8):
            m = tr.train_segment(data, h, w, c, n, 128)
        _ = float(m["loss"])
        ps = [psnr_img(tr.render_image(val.poses[i], val.intrinsics, val.h,
                                       val.w, time=val.times[i])[0],
                       val.images[i]) for i in range(2)]
        ptrain = psnr_img(
            tr.render_image(train.poses[0], train.intrinsics, train.h,
                            train.w, time=train.times[0])[0],
            train.images[0])
        print(f"step {tr.global_step}: loss={float(m['loss']):.5f} "
              f"val_psnr={np.mean(ps):.2f} (t={val.times[0]:.2f}:"
              f"{ps[0]:.2f}, t={val.times[1]:.2f}:{ps[1]:.2f}) "
              f"train_view_psnr={ptrain:.2f} "
              f"wall={time.time()-t_start:.0f}s", flush=True)

    # slow-path cross-check at the same params (render_occ via base class)
    img_fast, _ = tr.render_image(val.poses[0], val.intrinsics, val.h,
                                  val.w, time=val.times[0])
    img_slow, _ = Trainer.render_image(tr, val.poses[0], val.intrinsics,
                                       val.h, val.w, time=val.times[0])
    print("fast path PSNR:", psnr_img(img_fast, val.images[0]),
          "slow path PSNR:", psnr_img(img_slow, val.images[0]),
          "fast-vs-slow diff:",
          float(np.abs(img_fast - img_slow).mean()), flush=True)


if __name__ == "__main__":
    main()
