"""Can the axon tunnel overlap DISPATCHES like it overlaps fetches?

probe_render_spi/fps_iter show per-frame time ~= 35 ms dispatch
round-trip + ~55 ms compute, serialized. Measures the 800px l5 render:

  serial    dispatch loop, 1-elem fetches         (baseline ~90 ms)
  threads2  dispatches from a 2-thread pool
  threads4  dispatches from a 4-thread pool
  batch4    one jitted call rendering 4 cams (vmapped), RT amortized

Uses the /tmp/fps800i checkpoint.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import glob
import time
from concurrent.futures import ThreadPoolExecutor

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
RES = 800
N = 8


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

    intr = val.intrinsics * (RES / val.h)
    tr.render_image_async(val.poses[0], intr, RES, RES,
                          pack="preview").get()
    key = (RES, RES, tr.opt.render_tile_px, tr._use_buckets(), "preview")
    fn = tr._renderers[key]
    params = tr._infer_params()
    occ = tr.grid_state["occ"]

    def cam_for(i, j=0):
        cam = np.empty(24, np.float32)
        cam[:16] = np.asarray(val.poses[i % len(val)],
                              np.float32).reshape(-1)[:16]
        cam[16] = intr[0] * (1 + 1e-4 * i + 1e-6 * j)
        cam[17:20] = np.asarray(intr[1:], np.float32)
        cam[20:23] = 1.0
        cam[23] = 0.0
        return jnp.asarray(cam)

    cams = [cam_for(i) for i in range(N)]
    _ = np.asarray(fn(params, occ, cams[0]).ravel()[0])

    # serial
    t0 = time.perf_counter()
    outs = [fn(params, occ, c) for c in cams]
    _ = [np.asarray(o.ravel()[0]) for o in outs]
    print(f"serial    {(time.perf_counter()-t0)/N*1e3:7.1f} ms/frame",
          flush=True)

    # threaded dispatch + fetch
    for nt in (2, 4):
        cams_t = [cam_for(i, j=nt) for i in range(N)]

        def one(c):
            return np.asarray(fn(params, occ, c).ravel()[0])

        with ThreadPoolExecutor(nt) as ex:
            t0 = time.perf_counter()
            list(ex.map(one, cams_t))
            dt = time.perf_counter() - t0
        print(f"threads{nt}  {dt/N*1e3:7.1f} ms/frame", flush=True)

    # batched cams in one dispatch
    bfn = jax.jit(jax.vmap(fn, in_axes=(None, None, 0)))
    for k in (2, 4):
        groups = [jnp.stack([cam_for(i, j=10 + k) for i in
                             range(g * k, (g + 1) * k)])
                  for g in range(N // k)]
        _ = np.asarray(bfn(params, occ, groups[0]).ravel()[0])
        t0 = time.perf_counter()
        outs = [bfn(params, occ, g) for g in groups]
        _ = [np.asarray(o.ravel()[0]) for o in outs]
        print(f"batch{k}    {(time.perf_counter()-t0)/N*1e3:7.1f} ms/frame",
              flush=True)


if __name__ == "__main__":
    main()
