"""Verify the round-5 DEFAULT render config on the real TPU.

No overrides: TrainOptions defaults (eval ladder L8 + term trim s2/t7,
preview ladder L6, tile picker 10px at 800) must reproduce the swept
numbers: ~15.8 FPS @ 800px preview wire, ~29.98 dB gt256 eval wire.
Uses the trained /tmp/term_probe checkpoint (profiling/probe_term_trim.py).
"""
import time

import numpy as np

from sealdnerf_tpu.utils.jaxsetup import setup_jax
setup_jax()

import jax

from sealdnerf_tpu.data.synthetic import make_synthetic_scene
from sealdnerf_tpu.models.cp import CPConfig, make_cp_field
from sealdnerf_tpu.train.trainer import TrainOptions
from sealdnerf_tpu.train.fast import FastTrainer


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
    assert tr.global_step >= 3000
    assert tr._pick_tile(800, 800) == 10 and tr._pick_tile(256, 256) == 8
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

    img, _ = tr.render_image(val.poses[0], val.intrinsics, val.h, val.w)
    print(f"gt256 (eval rgb8 wire, defaults): {_psnr(img, val.images[0]):.2f} dB",
          flush=True)
    print(f"fps800 (preview wire, defaults):  {fps(800):.2f}", flush=True)


if __name__ == "__main__":
    main()
