"""Verify the shipping FPS path: l5 default ladder + render_image_async
with push-model downloads, 8-worker pool -- the bench's fps() loop."""
import glob
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from sealdnerf_tpu.utils.jaxsetup import setup_jax
setup_jax()

import jax

from sealdnerf_tpu.data.synthetic import make_synthetic_scene
from sealdnerf_tpu.models.cp import CPConfig, make_cp_field
from sealdnerf_tpu.train.trainer import TrainOptions
from sealdnerf_tpu.train.fast import FastTrainer

WS = "/tmp/fps800i"


def main():
    _, train, val = make_synthetic_scene(n_train=24, n_val=2, res=256,
                                         hard=True)
    opt = TrainOptions(iters=2560, num_rays=4096, bound=1.0,
                       grid_size=128, march_res=64, n_intervals=16,
                       steps_per_interval=4, segment_steps=128,
                       workspace=WS)
    assert opt.render_splits[0] == (0.50, 16), "l5 default not active"
    field = make_cp_field(jax.random.PRNGKey(0), CPConfig(bound=1.0))
    tr = FastTrainer("fps", opt, field, workspace=WS,
                     use_checkpoint="scratch")
    tr.load_checkpoint(sorted(glob.glob(f"{WS}/checkpoints/*.npz"))[-1])

    fps_pool = [None]

    def fps(rh, n_frames):
        intr = val.intrinsics * (rh / val.h)
        tr.render_image_async(val.poses[0], intr, rh, rh,
                              pack="preview").get()

        def one(i):
            return tr.render_image_async(
                val.poses[i % len(val)], intr * (1 + 1e-4 * i), rh, rh,
                pack="preview").get()

        if fps_pool[0] is None:
            fps_pool[0] = ThreadPoolExecutor(8)
        rates = []
        for b in range(5):
            t0 = time.perf_counter()
            out = list(fps_pool[0].map(
                one, range(300 + n_frames * b, 300 + n_frames * (b + 1))))
            rates.append(n_frames / (time.perf_counter() - t0))
        assert all(o[0].shape == (rh, rh, 3) for o in out)
        print("   rounds:", " ".join(f"{r:.1f}" for r in rates), flush=True)
        return float(sorted(rates)[-2])

    print(f"256px FPS: {fps(256, 16):6.2f}", flush=True)
    for rep in range(3):
        print(f"800px FPS: {fps(800, 16):6.2f}", flush=True)


if __name__ == "__main__":
    main()
