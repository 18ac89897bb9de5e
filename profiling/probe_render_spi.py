"""Does halving render_steps_per_interval (4 -> 2) buy device time at
acceptable quality? Uses the /tmp/fps800i checkpoint; reports device ms
+ PSNR vs GT at 256px eval and the 800px device ms, for spi 4 / 3 / 2,
all on the l5 ladder.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import glob
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

WS = "/tmp/fps800i"
L5 = ((0.50, 16), (0.20, 8), (0.15, 4), (0.10, 2), (1.0, 1))


def psnr(img, gtimg):
    gt = gtimg[..., :3] * gtimg[..., 3:] + (1 - gtimg[..., 3:])
    return -10 * np.log10(max(np.mean((np.clip(img, 0, 1) - gt) ** 2),
                              1e-10))


def main():
    _, train, val = make_synthetic_scene(n_train=24, n_val=2, res=256,
                                         hard=True)
    opt = TrainOptions(iters=2560, num_rays=4096, bound=1.0,
                       grid_size=128, march_res=64, n_intervals=16,
                       steps_per_interval=4, segment_steps=128,
                       workspace=WS)
    opt.render_splits = L5
    field = make_cp_field(jax.random.PRNGKey(0), CPConfig(bound=1.0))
    tr = FastTrainer("fps", opt, field, workspace=WS,
                     use_checkpoint="scratch")
    tr.load_checkpoint(sorted(glob.glob(f"{WS}/checkpoints/*.npz"))[-1])

    intr8 = val.intrinsics * (800 / val.h)
    for spi in (4, 3, 2):
        tr.opt.render_steps_per_interval = spi
        tr._renderers.clear()
        # quality at eval res vs GT
        ps = [psnr(tr.render_image(val.poses[i], val.intrinsics, val.h,
                                   val.w)[0], val.images[i])
              for i in range(len(val))]
        # 800px device ms (varied poses, 1-element fetch)
        key = (800, 800, tr.opt.render_tile_px, tr._use_buckets(), "rgb8")
        if key not in tr._renderers:
            tr.render_image_async(val.poses[0], intr8, 800, 800,
                                  pack="rgb8").get()
        fn = tr._renderers[key]
        params = tr._infer_params()
        occ = tr.grid_state["occ"]
        cams = []
        for i in range(8):
            cam = np.empty(24, np.float32)
            cam[:16] = np.asarray(val.poses[i % len(val)],
                                  np.float32).reshape(-1)[:16]
            cam[16] = intr8[0] * (1 + 1e-4 * i)  # defeat tunnel dedupe
            cam[17:20] = np.asarray(intr8[1:], np.float32)
            cam[20:23] = 1.0
            cam[23] = 0.0
            cams.append(jnp.asarray(cam))
        _ = np.asarray(fn(params, occ, cams[0]).ravel()[0])
        t0 = time.perf_counter()
        outs = [fn(params, occ, cm) for cm in cams]
        _ = [np.asarray(o.ravel()[0]) for o in outs]
        dev = (time.perf_counter() - t0) / 8 * 1e3
        print(f"spi={spi}  psnr={np.mean(ps):.2f}  dev800={dev:6.1f}ms",
              flush=True)


if __name__ == "__main__":
    main()
