"""Benchmark: training throughput of the flagship TPU fast path on the
procedural synthetic scene (the reference publishes no numbers; BASELINE.md's
north star is rays/sec/chip + time-to-PSNR).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} plus
auxiliary fields. vs_baseline is measured against a fixed reference point of
2.6e5 train rays/sec/chip -- a torch-ngp-class single-GPU figure (4096 rays *
~64 it/s), so 1.0 means GPU-reference-class throughput on one TPU chip.

Pipeline under test (round-2 fast path, PERF_NOTES.md):
- CP-factorized field (models/cp.py) -- MXU hat-matmul interpolation.
- Dense two-level march (ops/marching_dense.py).
- In-graph multi-step training segments (train/fast.py) to amortize the
  axon tunnel's per-dispatch transfer costs.
"""

import json
import time

import numpy as np

from sealdnerf_tpu.utils.jaxsetup import setup_jax
setup_jax()


BASELINE_TRAIN_RAYS_PER_SEC = 2.6e5


def main():
    import sys
    import jax
    from sealdnerf_tpu.data.synthetic import make_synthetic_scene
    from sealdnerf_tpu.models.cp import CPConfig, make_cp_field
    from sealdnerf_tpu.train.trainer import TrainOptions
    from sealdnerf_tpu.train.fast import FastTrainer

    _, train, val = make_synthetic_scene(n_train=24, n_val=2, res=256)
    opt = TrainOptions(iters=4000, num_rays=4096, bound=1.0, dt_gamma=0.0,
                       grid_size=128, march_res=64, n_intervals=16,
                       steps_per_interval=4, segment_steps=128,
                       workspace="/tmp/bench_ws")
    field = make_cp_field(jax.random.PRNGKey(0), CPConfig(bound=1.0))
    tr = FastTrainer("bench", opt, field, workspace="/tmp/bench_ws",
                     use_checkpoint="scratch")
    tr.mark_untrained_grid(train.poses, train.intrinsics)
    data = train.device()
    h, w, c, n_images = train.h, train.w, train.images.shape[-1], len(train)

    print("[bench] warmup (compile + 16 full grid sweeps)...",
          file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    tr.train_segment(data, h, w, c, n_images, 256)
    warmup_s = time.perf_counter() - t0
    m = tr.train_segment(data, h, w, c, n_images, 128)  # steady compile
    _ = float(m["loss"])

    print("[bench] timing...", file=sys.stderr, flush=True)
    n_steps = 512
    t0 = time.perf_counter()
    for _ in range(n_steps // 128):
        m = tr.train_segment(data, h, w, c, n_images, 128)
    _ = float(m["loss"])  # host fetch: block_until_ready unreliable on axon
    dt = time.perf_counter() - t0
    rays_per_sec = n_steps * opt.num_rays / dt

    print("[bench] training to PSNR anchor...", file=sys.stderr, flush=True)
    t_train0 = time.perf_counter()
    while tr.global_step < 1200:
        m = tr.train_segment(data, h, w, c, n_images, 128)
    psnr = tr.evaluate_one_epoch(val)

    # Render FPS at eval resolution and at the 800x800 target.
    img, _ = tr.render_image(val.poses[0], val.intrinsics, val.h, val.w)
    t0 = time.perf_counter()
    n_frames = 5
    for i in range(n_frames):
        tr.render_image(val.poses[i % len(val)], val.intrinsics, val.h, val.w)
    render_fps = n_frames / (time.perf_counter() - t0)

    scale8 = 800 / val.h
    tr.render_image(val.poses[0], val.intrinsics * scale8, 800, 800)
    t0 = time.perf_counter()
    for i in range(3):
        tr.render_image(val.poses[i % len(val)], val.intrinsics * scale8,
                        800, 800)
    fps800 = 3 / (time.perf_counter() - t0)

    print(json.dumps({
        "metric": "train_rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / BASELINE_TRAIN_RAYS_PER_SEC, 3),
        "aux": {
            "psnr_at_1200_steps": round(float(psnr), 2),
            "steps_per_sec": round(n_steps / dt, 2),
            "render_fps_at_256px": round(render_fps, 2),
            "render_fps_at_800px": round(fps800, 2),
            "warmup_seconds": round(warmup_s, 1),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
