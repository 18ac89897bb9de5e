"""Probe: Pareto sweep of bucket ladders on a trained vm128 field.

The un-truncated eval budget costs 158.8 ms/frame @ 800px (6 FPS) vs the
old truncated ladder's 90 ms (15.9 FPS). Sweep candidate ladders and
report PSNR (256px vs GT) + device ms (800px) to pick the shipping
default from measurements instead of guessing.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import numpy as np

from sealdnerf_tpu.utils.jaxsetup import setup_jax
setup_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sealdnerf_tpu.data.synthetic import make_synthetic_scene  # noqa: E402
from sealdnerf_tpu.models.cp import CPConfig, make_cp_field  # noqa: E402
from sealdnerf_tpu.train.trainer import TrainOptions  # noqa: E402
from sealdnerf_tpu.train.fast import FastTrainer  # noqa: E402


def _psnr(img, gtimg):
    gt = gtimg[..., :3] * gtimg[..., 3:] + (1 - gtimg[..., 3:])
    return -10 * np.log10(max(np.mean((np.clip(img, 0, 1) - gt) ** 2),
                              1e-10))


# (name, splits) -- divisors vs render ni=32; budgets in the comment
LADDERS = [
    ("b2-4-8-16-32", ((0.50, 16), (0.20, 8), (0.15, 4), (0.10, 2),
                      (1.0, 1))),
    ("b1-4-8-16-32", ((0.50, 32), (0.20, 8), (0.15, 4), (0.10, 2),
                      (1.0, 1))),
    ("b2-4-8-16-16", ((0.50, 16), (0.20, 8), (0.15, 4), (0.10, 2),
                      (1.0, 2))),
    ("fine6", ((0.35, 32), (0.15, 16), (0.15, 8), (0.15, 4), (0.10, 2),
               (1.0, 1))),
    ("b2-8-32", ((0.55, 16), (0.30, 4), (1.0, 1))),
    ("b2-4-16-32", ((0.50, 16), (0.25, 8), (0.15, 2), (1.0, 1))),
    ("b2-4-8-8-16", ((0.50, 16), (0.20, 8), (0.15, 4), (0.10, 4),
                     (1.0, 2))),
    ("b2-4-8-8-8", ((0.50, 16), (0.20, 8), (0.15, 4), (0.10, 4),
                    (1.0, 4))),
    ("b2-4-4-8-16", ((0.50, 16), (0.20, 8), (0.15, 8), (0.10, 4),
                     (1.0, 2))),
]


def main():
    _, train, val = make_synthetic_scene(n_train=24, n_val=2, res=256,
                                         hard=True)
    opt = TrainOptions(iters=4000, num_rays=4096, bound=1.0, dt_gamma=0.0,
                       grid_size=128, march_res=64, n_intervals=16,
                       steps_per_interval=4, segment_steps=128,
                       workspace="/tmp/probe_lsw")
    field = make_cp_field(jax.random.PRNGKey(0),
                          CPConfig(bound=1.0, planes=((128, 8),)))
    tr = FastTrainer("lsw", opt, field, workspace=opt.workspace,
                     use_checkpoint="latest")   # reuse across invocations
    if tr.global_step < 2048:
        tr.mark_untrained_grid(train.poses, train.intrinsics)
        data = train.device()
        h, w, c, n = train.h, train.w, train.images.shape[-1], len(train)
        while tr.global_step < 2048:
            tr.train_segment(data, h, w, c, n, 128)
        tr.save_checkpoint(full=True)

    rh = 800
    intr800 = val.intrinsics * (rh / val.h)
    params = tr._infer_params()
    occ = tr.grid_state["occ"]

    want = set(sys.argv[1:])
    for name, splits in LADDERS:
        if want and name not in want:
            continue
        tr.opt.render_splits = splits
        tr._renderers = {}
        img, _ = tr.render_image(val.poses[0], val.intrinsics, val.h,
                                 val.w)
        p = _psnr(img, val.images[0])
        # device ms at 800px (full-frame fetch per dispatch)
        tr.render_image_async(val.poses[0], intr800, rh, rh,
                              pack="preview").get()
        key = (rh, rh, tr.opt.render_tile_px, tr._use_buckets(), "preview")
        fn = tr._renderers[key]
        cams = []
        for i in range(8):
            cam = np.empty(24, np.float32)
            cam[:16] = np.asarray(val.poses[i % len(val)],
                                  np.float32).reshape(-1)[:16]
            cam[16:20] = np.asarray(intr800 * (1 + 1e-4 * i), np.float32)
            cam[20:23] = 1.0
            cam[23] = 0.0
            cams.append(jnp.asarray(cam))
        _ = np.asarray(fn(params, occ, cams[0]))
        t0 = time.perf_counter()
        outs = [fn(params, occ, cm) for cm in cams]
        _ = [np.asarray(o) for o in outs]
        ms = (time.perf_counter() - t0) / 8 * 1e3
        print(f"[lsw] {name:14s} PSNR={p:5.2f} dev_ms={ms:6.1f}",
              file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
