"""Fast-path throughput on the real TPU: flagship config."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time
import numpy as np
from sealdnerf_tpu.utils.jaxsetup import setup_jax
setup_jax()

import jax
import jax.numpy as jnp

from sealdnerf_tpu.data.synthetic import make_synthetic_scene
from sealdnerf_tpu.models.cp import CPConfig, make_cp_field
from sealdnerf_tpu.train.trainer import TrainOptions
from sealdnerf_tpu.train.fast import FastTrainer


def main():
    print("device:", jax.devices()[0], flush=True)
    _, train, val = make_synthetic_scene(n_train=24, n_val=2, res=256)
    opt = TrainOptions(iters=4000, num_rays=4096, bound=1.0, dt_gamma=0.0,
                       grid_size=128, march_res=64, n_intervals=16,
                       steps_per_interval=4, segment_steps=128,
                       workspace="/tmp/fast_tpu", update_extra_interval=16)
    cfg = CPConfig(bound=1.0)
    field = make_cp_field(jax.random.PRNGKey(0), cfg)
    tr = FastTrainer("fast", opt, field, workspace="/tmp/fast_tpu",
                     use_checkpoint="scratch")
    tr.mark_untrained_grid(train.poses, train.intrinsics)
    data = train.device()
    h, w, c, n = train.h, train.w, train.images.shape[-1], len(train)

    t0 = time.time()
    m = tr.train_segment(data, h, w, c, n, 256)  # warmup segment (16 full upd)
    print(f"warmup seg (256 steps): {time.time()-t0:.1f}s "
          f"loss={float(m['loss']):.5f} nsamp/step={int(m['n_samples'])}",
          flush=True)

    t0 = time.time()
    m = tr.train_segment(data, h, w, c, n, 128)  # compile steady variant
    print(f"steady compile+run (128): {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    n_steps = 0
    for _ in range(4):
        m = tr.train_segment(data, h, w, c, n, 128)
        n_steps += 128
    _ = float(m["loss"])
    dt = time.time() - t0
    rays_s = n_steps * opt.num_rays / dt
    print(f"steady: {n_steps} steps in {dt:.2f}s = "
          f"{n_steps/dt:.1f} steps/s = {rays_s:,.0f} rays/s "
          f"loss={float(m['loss']):.5f} nsamp={int(m['n_samples'])}",
          flush=True)

    # render timing
    t0 = time.time()
    img, dep = tr.render_image(val.poses[0], val.intrinsics, val.h, val.w)
    print(f"render 256px (compile+run): {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    for i in range(5):
        img, dep = tr.render_image(val.poses[i % 2], val.intrinsics,
                                   val.h, val.w)
    print(f"render 256px: {(time.time()-t0)/5*1e3:.1f} ms/frame", flush=True)

    # PSNR sanity after ~900 steps
    gt = val.images[0][..., :3] * val.images[0][..., 3:] + \
        (1 - val.images[0][..., 3:])
    mse = float(np.mean((img - gt) ** 2))
    # img is pose[(i)%2]... re-render pose 0 for PSNR
    img, _ = tr.render_image(val.poses[0], val.intrinsics, val.h, val.w)
    mse = float(np.mean((img - gt) ** 2))
    print(f"PSNR@{tr.global_step} steps: {-10*np.log10(mse):.2f}", flush=True)

    # 800x800 render
    t0 = time.time()
    img8, _ = tr.render_image(val.poses[0], val.intrinsics * (800 / 256),
                              800, 800)
    print(f"render 800px compile+run: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    for i in range(3):
        img8, _ = tr.render_image(val.poses[i % 2], val.intrinsics * (800 / 256),
                                  800, 800)
    print(f"render 800px: {(time.time()-t0)/3*1e3:.1f} ms/frame "
          f"= {3/(time.time()-t0):.2f} FPS", flush=True)


if __name__ == "__main__":
    main()
