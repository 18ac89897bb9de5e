"""Dynamic fast path on TPU: steps/s + time-to-PSNR on the dynamic
synthetic scene."""
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


def main():
    print("device:", jax.devices()[0], flush=True)
    _, train, val = make_synthetic_scene(n_train=36, n_val=2, res=256,
                                         dynamic=True)
    opt = TrainOptions(iters=6000, num_rays=4096, bound=1.0, dt_gamma=0.0,
                       grid_size=128, march_res=64, n_intervals=16,
                       steps_per_interval=4, segment_steps=128,
                       update_extra_interval=16, workspace="/tmp/dynb",
                       lr=1e-2, lr_net=1e-3)
    cfg = CPDNeRFConfig(bound=1.0)
    field = make_cp_dnerf_field(jax.random.PRNGKey(0), cfg)
    tr = FastTrainer("dyn", opt, field, workspace="/tmp/dynb",
                     use_checkpoint="scratch", time_conditioned=True)
    tr.mark_untrained_grid(train.poses, train.intrinsics)
    data = train.device()
    h, w, c, n = train.h, train.w, train.images.shape[-1], len(train)

    t_start = time.time()
    t0 = time.time()
    m = tr.train_segment(data, h, w, c, n, 128)
    print(f"first segment (compile+128): {time.time()-t0:.1f}s "
          f"loss={float(m['loss']):.5f}", flush=True)

    def eval_psnr(nviews=1):
        ps = []
        for i in range(nviews):
            t = val.times[i] if val.times is not None else 0.0
            img, _ = tr.render_image(val.poses[i], val.intrinsics,
                                     val.h, val.w, time=t)
            gt = val.images[i][..., :3] * val.images[i][..., 3:] + \
                (1 - val.images[i][..., 3:])
            ps.append(-10 * np.log10(np.mean((img - gt) ** 2)))
        return float(np.mean(ps))

    while tr.global_step < 4000:
        t0 = time.time()
        for _ in range(4):
            m = tr.train_segment(data, h, w, c, n, 128)
        _ = float(m["loss"])
        dt = time.time() - t0
        p = eval_psnr()
        print(f"step {tr.global_step}: {512/dt:.1f} steps/s "
              f"({512*4096/dt:,.0f} rays/s) loss={float(m['loss']):.5f} "
              f"PSNR={p:.2f} wall={time.time()-t_start:.0f}s", flush=True)
        if p >= 30.0:
            print(f"TIME TO 30 PSNR: {time.time()-t_start:.1f}s "
                  f"({tr.global_step} steps)", flush=True)
            break


if __name__ == "__main__":
    main()
