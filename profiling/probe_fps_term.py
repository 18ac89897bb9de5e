"""End-to-end 800px FPS for (render_splits, termination) candidates --
the bench's exact pipelined fps() loop (preview pack, 8-worker fetch
pool, dedupe-busting intrinsics jitter) on the trained
/tmp/term_probe checkpoint (run profiling/probe_term_trim.py first).

Also reports the rgb8 full-fidelity PSNR at eval res per candidate (the
quality guard bench.py emits as psnr_at_3000_steps would see).

Usage: python profiling/probe_fps_term.py
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np

from sealdnerf_tpu.utils.jaxsetup import setup_jax
setup_jax()

import jax

from sealdnerf_tpu.data.synthetic import make_synthetic_scene
from sealdnerf_tpu.models.cp import CPConfig, make_cp_field
from sealdnerf_tpu.train.trainer import TrainOptions
from sealdnerf_tpu.train.fast import FastTrainer

DEFAULT = ((0.50, 16), (0.20, 8), (0.15, 4), (0.10, 2), (1.0, 2))
L1 = ((0.50, 32), (0.20, 16), (0.15, 8), (0.10, 4), (1.0, 2))
L6 = ((0.60, 32), (0.18, 16), (0.12, 8), (0.07, 4), (1.0, 2))
L7 = ((0.60, 32), (0.15, 16), (0.15, 8), (0.07, 4), (1.0, 2))
L8 = ((0.60, 32), (0.15, 16), (0.15, 4), (0.07, 2), (1.0, 2))
# (label, splits, term_intervals, stride, tau, tile_px_800)
CANDS = [
    ("L8/s2/t7/tp10", L8, 16, 2, 7.0, 10),
    ("L7/s2/t5/tp10", L7, 16, 2, 5.0, 10),
    ("L7/s1/t7/tp10", L7, 16, 1, 7.0, 10),
    ("L1/s2/t5/tp10", L1, 16, 2, 5.0, 10),
]


def _psnr(img, gtimg):
    gt = gtimg[..., :3] * gtimg[..., 3:] + (1 - gtimg[..., 3:])
    return -10 * np.log10(max(np.mean((np.clip(img, 0, 1) - gt) ** 2),
                              1e-10))


def main():
    from concurrent.futures import ThreadPoolExecutor
    _, train, val = make_synthetic_scene(n_train=24, n_val=2, res=256,
                                         hard=True)
    opt = TrainOptions(iters=4000, num_rays=4096, bound=1.0, dt_gamma=0.0,
                       grid_size=128, march_res=64, n_intervals=16,
                       steps_per_interval=4, segment_steps=128,
                       workspace="/tmp/term_probe")
    field = make_cp_field(jax.random.PRNGKey(0), CPConfig(bound=1.0))
    tr = FastTrainer("term", opt, field, workspace="/tmp/term_probe",
                     use_checkpoint="latest")
    assert tr.global_step >= 3000, "run probe_term_trim.py first"
    pool = ThreadPoolExecutor(8)

    def fps(rh, n_frames=16):
        intr = val.intrinsics * (rh / val.h)
        tr.render_image_async(val.poses[0], intr, rh, rh,
                              pack="preview").get()

        def one(i):
            return tr.render_image_async(
                val.poses[i % len(val)], intr * (1 + 1e-4 * i), rh, rh,
                pack="preview").get()

        rates = []
        for b in range(8):
            t0 = time.perf_counter()
            list(pool.map(one, range(300 + n_frames * b,
                                     300 + n_frames * (b + 1))))
            if b >= 3:
                rates.append(n_frames / (time.perf_counter() - t0))
        return float(sorted(rates)[max(-2, -len(rates))])

    for label, splits, term, stride, tau, tp in CANDS:
        tr.opt.render_splits = splits
        tr.opt.render_term_intervals = term
        tr.opt.render_term_stride = stride
        tr.opt.render_term_tau = tau
        tr.opt.render_tile_px = tp
        tr._renderers = {}
        f = fps(800)
        tr.opt.render_tile_px = 8   # gt256 quality at the eval tile size
        tr._renderers = {}
        img, _ = tr.render_image(val.poses[0], val.intrinsics, val.h,
                                 val.w)
        p = _psnr(img, val.images[0])
        print(f"{label:16s} fps800 {f:6.2f}   gt256(rgb8) {p:6.2f} dB",
              flush=True)


if __name__ == "__main__":
    main()
