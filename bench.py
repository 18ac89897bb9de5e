"""Benchmark: training throughput of the flagship static NGP pipeline on the
procedural synthetic scene (the reference publishes no numbers; BASELINE.md's
north star is rays/sec/chip + time-to-PSNR).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} plus
auxiliary fields. vs_baseline is measured against a fixed reference point of
2.6e5 train rays/sec/chip -- a torch-ngp-class single-GPU figure (4096 rays *
~64 it/s), so 1.0 means GPU-reference-class throughput on one TPU chip.
"""

import json
import time

import numpy as np

from sealdnerf_tpu.utils.jaxsetup import setup_jax
setup_jax()


BASELINE_TRAIN_RAYS_PER_SEC = 2.6e5


def main():
    import jax
    from sealdnerf_tpu.cli import base_parser, postprocess, to_train_options
    from sealdnerf_tpu.data.synthetic import make_synthetic_scene
    from sealdnerf_tpu.models.api import make_ngp_field
    from sealdnerf_tpu.models.ngp import NGPConfig
    from sealdnerf_tpu.train.trainer import Trainer

    _, train, val = make_synthetic_scene(n_train=24, n_val=2, res=256)
    opt = postprocess(base_parser().parse_args(
        ["synthetic", "-O", "--bound", "1", "--dt_gamma", "0",
         "--iters", "2000", "--num_rays", "4096",
         "--workspace", "/tmp/bench_ws", "--ckpt", "scratch"]))
    cfg = NGPConfig(bound=1.0)
    field = make_ngp_field(jax.random.PRNGKey(0), cfg)
    topt = to_train_options(opt, name="bench")
    tr = Trainer("bench", topt, field, workspace="/tmp/bench_ws",
                 use_checkpoint="scratch")

    data_dev = train.device()
    h, w, c, n_images = train.h, train.w, train.images.shape[-1], len(train)
    tr.mark_untrained_grid(train.poses, train.intrinsics)

    import sys
    print("[bench] compiling + warmup...", file=sys.stderr, flush=True)
    tr.update_extra_state()
    # Warm past the first 16 full grid updates so the adaptive sample budget
    # (mean_count) settles and the steady-state step is what gets timed.
    for _ in range(340):
        if tr.global_step % topt.update_extra_interval == 0:
            tr.update_extra_state()
        loss, _ = tr.train_step(data_dev, h, w, c, n_images)
    _ = float(loss)

    print("[bench] timing...", file=sys.stderr, flush=True)
    # Timed run (includes periodic grid updates -- real training cadence).
    n_steps = 300
    t0 = time.perf_counter()
    for _ in range(n_steps):
        if tr.global_step % topt.update_extra_interval == 0:
            tr.update_extra_state()
        loss, _ = tr.train_step(data_dev, h, w, c, n_images)
    _ = float(loss)  # host fetch: block_until_ready is unreliable on axon
    dt = time.perf_counter() - t0
    rays_per_sec = n_steps * opt.num_rays / dt

    print("[bench] training to PSNR anchor...", file=sys.stderr, flush=True)
    # Quality anchor: continue to 1200 steps and report PSNR.
    while tr.global_step < 1200:
        if tr.global_step % topt.update_extra_interval == 0:
            tr.update_extra_state()
        tr.train_step(data_dev, h, w, c, n_images)
    psnr = tr.evaluate_one_epoch(val)

    # Render FPS at the synthetic eval resolution.
    t0 = time.perf_counter()
    n_frames = 5
    for i in range(n_frames):
        tr.render_image(val.poses[i % len(val)], val.intrinsics, val.h, val.w)
    render_fps = n_frames / (time.perf_counter() - t0)

    print(json.dumps({
        "metric": "train_rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / BASELINE_TRAIN_RAYS_PER_SEC, 3),
        "aux": {
            "psnr_at_1200_steps": round(float(psnr), 2),
            "render_fps_at_256px": round(render_fps, 2),
            "steps_per_sec": round(n_steps / dt, 2),
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
