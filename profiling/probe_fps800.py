"""800x800 render FPS breakdown (VERDICT r2 missing #3: 5.23 FPS vs >=15).

Trains the static CP field briefly (realistic sparse occupancy), then for
each bucket-split preset measures:
  - device_ms: on-device frame time (fetch only one element -> no
    download in the timed path; pose varied per call to defeat the
    tunnel's dispatch dedupe)
  - fetch_ms: packed [rh, rw, 5]-u8 frame download cost
  - pipelined FPS via render_image_async (the bench's measurement)
  - PSNR vs the full-budget tiled render (quality guard: splits must not
    visibly truncate geometry)

Usage: python profiling/probe_fps800.py [steps=1536] [res=800]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import jax
import numpy as np

from sealdnerf_tpu.data.synthetic import make_synthetic_scene
from sealdnerf_tpu.models.cp import CPConfig, make_cp_field
from sealdnerf_tpu.train.trainer import TrainOptions
from sealdnerf_tpu.train.fast import FastTrainer

STEPS = int(_sys.argv[1]) if len(_sys.argv) > 1 else 1536
RES = int(_sys.argv[2]) if len(_sys.argv) > 2 else 800

PRESETS = {
    "tiled": None,   # full-budget tiled render (no buckets) -- reference
    "default": ((0.70, 4), (0.20, 2), (1.0, 1)),
    "agg": ((0.55, 8), (0.25, 4), (0.12, 2), (1.0, 1)),
    "vagg": ((0.70, 8), (0.20, 4), (0.06, 2), (1.0, 1)),
}


def main():
    _, train, val = make_synthetic_scene(n_train=24, n_val=2, res=256,
                                         hard=True)
    opt = TrainOptions(iters=STEPS + 1024, num_rays=4096, bound=1.0,
                       grid_size=128, march_res=64, n_intervals=16,
                       steps_per_interval=4, segment_steps=128,
                       workspace="/tmp/fps800")
    field = make_cp_field(jax.random.PRNGKey(0), CPConfig(bound=1.0))
    tr = FastTrainer("fps", opt, field, workspace="/tmp/fps800",
                     use_checkpoint="scratch")
    tr.mark_untrained_grid(train.poses, train.intrinsics)
    data = train.device()
    h, w, c, n = train.h, train.w, train.images.shape[-1], len(train)
    t0 = time.perf_counter()
    while tr.global_step < STEPS:
        m = tr.train_segment(data, h, w, c, n, 128)
    _ = float(m["loss"])
    print(f"trained {STEPS} steps in {time.perf_counter()-t0:.0f}s; "
          f"occ_frac={float(np.mean(np.asarray(tr.grid_state['occ']))):.4f}",
          flush=True)

    intr = val.intrinsics * (RES / val.h)
    poses = [val.poses[i % len(val)] for i in range(8)]

    ref_img = None
    for name, splits in PRESETS.items():
        tr._renderers.clear()
        tr._occ_frac = 0.0 if splits is not None else 1.0  # force gate
        if splits is not None:
            tr.opt.render_splits = splits
        # compile + warm
        img0, _ = tr.render_image(poses[0], intr, RES, RES)
        if name == "tiled":
            ref_img = img0

        # on-device time: fetch a single element per frame
        key = list(tr._renderers)[-1]
        fn = tr._renderers[key]
        params = tr._infer_params()
        cams = []
        for p in poses:
            cam = np.empty(24, np.float32)
            cam[:16] = np.asarray(p, np.float32).reshape(-1)[:16]
            cam[16:20] = np.asarray(intr, np.float32)
            cam[20:23] = 1.0
            cam[23] = 0.0
            cams.append(jax.numpy.asarray(cam))
        occ = tr.grid_state["occ"]
        _ = np.asarray(fn(params, occ, cams[0])[0, 0])  # sync
        t0 = time.perf_counter()
        outs = [fn(params, occ, cm) for cm in cams]
        _ = [np.asarray(o[0, 0]) for o in outs]
        device_ms = (time.perf_counter() - t0) / len(cams) * 1e3

        out = fn(params, occ, cams[0])
        _ = np.asarray(out[0, 0])
        t0 = time.perf_counter()
        _ = np.asarray(out)
        fetch_ms = (time.perf_counter() - t0) * 1e3

        # pipelined FPS, rgb8 and the yuv420 GUI wire format
        def pipe(pack):
            tr.render_image_async(poses[0], intr, RES, RES,
                                  pack=pack).get()
            t0 = time.perf_counter()
            pending = None
            for i in range(8):
                nxt = tr.render_image_async(poses[i], intr, RES, RES,
                                            pack=pack)
                if pending is not None:
                    pending.get()
                pending = nxt
            pending.get()
            return 8 / (time.perf_counter() - t0)

        fps = pipe("rgb8")
        fps_yuv = pipe("yuv420")

        if ref_img is not None and name != "tiled":
            d = np.abs(img0 - ref_img)
            err = f"q99={np.quantile(d, 0.99):.4f} max={d.max():.3f}"
        else:
            err = "ref"
        print(f"{name:8s} device={device_ms:7.1f}ms fetch={fetch_ms:6.1f}ms "
              f"fps={fps:5.2f} fps_yuv={fps_yuv:5.2f} vs_tiled[{err}]",
              flush=True)


if __name__ == "__main__":
    main()
