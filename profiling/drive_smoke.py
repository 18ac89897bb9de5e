"""Round-3 smoke: shipping-config static rate + preview render FPS on the
real TPU. Mirrors bench_static's setup (same shapes/flags) but with a short
budget, so the driver's full bench won't hit a cold surprise.

Run: python profiling/drive_smoke.py   (TPU by default; never PYTHONPATH)
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import numpy as np

from sealdnerf_tpu.utils.jaxsetup import setup_jax
setup_jax()


def main():
    import jax
    from sealdnerf_tpu.data.synthetic import make_synthetic_scene
    from sealdnerf_tpu.models.cp import CPConfig, make_cp_field
    from sealdnerf_tpu.train.trainer import TrainOptions
    from sealdnerf_tpu.train.fast import FastTrainer

    print(f"device: {jax.devices()[0]}", flush=True)
    _, train, val = make_synthetic_scene(n_train=24, n_val=2, res=256,
                                         hard=True)
    opt = TrainOptions(iters=4000, num_rays=4096, bound=1.0, dt_gamma=0.0,
                       grid_size=128, march_res=64, n_intervals=16,
                       steps_per_interval=4, segment_steps=128,
                       workspace="/tmp/smoke_ws")
    field = make_cp_field(jax.random.PRNGKey(0), CPConfig(bound=1.0))
    tr = FastTrainer("smoke", opt, field, workspace="/tmp/smoke_ws",
                     use_checkpoint="scratch")
    tr.mark_untrained_grid(train.poses, train.intrinsics)
    data = train.device()
    h, w, c, n = train.h, train.w, train.images.shape[-1], len(train)

    t0 = time.perf_counter()
    tr.train_segment(data, h, w, c, n, 256)
    print(f"warmup: {time.perf_counter() - t0:.1f}s", flush=True)
    m = tr.train_segment(data, h, w, c, n, 128)
    _ = float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(4):
        m = tr.train_segment(data, h, w, c, n, 128)
    _ = float(m["loss"])
    dt = time.perf_counter() - t0
    print(f"static train (shipping cfg, planes on): "
          f"{512 * 4096 / dt / 1e3:.1f}k rays/s", flush=True)

    # preview render path (the lod-skip kernel, pack=preview) at 800px
    intr = val.intrinsics * (800 / val.h)
    tr.render_image_async(val.poses[0], intr, 800, 800,
                          pack="preview").get()
    from concurrent.futures import ThreadPoolExecutor
    pool = ThreadPoolExecutor(8)

    def one(i):
        return tr.render_image_async(val.poses[i % len(val)],
                                     intr * (1 + 1e-4 * i), 800, 800,
                                     pack="preview").get()

    rates = []
    for b in range(5):
        t0 = time.perf_counter()
        list(pool.map(one, range(300 + 16 * b, 300 + 16 * (b + 1))))
        if b >= 2:
            rates.append(16 / (time.perf_counter() - t0))
    # NOTE: by this point the trainer has run ~900 steps (256 warmup +
    # 5x128 segments) + mark_untrained_grid, so the occupancy is already
    # partially trained/sparsified -- this is a warm-ish measurement,
    # not a worst case (ADVICE r3 #4).
    print(f"preview 800px FPS (~900-step occ, no buckets, 3 rounds): "
          f"{sorted(rates)[-2]:.1f}", flush=True)

    # full-fidelity eval render parity sanity (lossless path)
    img, _ = tr.render_image(val.poses[0], val.intrinsics, val.h, val.w)
    assert np.isfinite(img).all(), "non-finite eval render"
    print("eval render OK", flush=True)


if __name__ == "__main__":
    main()
