"""800px render device-time breakdown (fps800 follow-up).

probe_fps800.py showed: device 129-181 ms depending on bucket splits,
with a marginal field cost of only ~5.4 ms/M samples -- implying a large
fixed cost that is not field evaluation. This probe isolates the stages:

  march      tile-center march + counts only
  rays       per-pixel get_rays at full res
  noop       render_image_bucketed with a constant-output forward_fn
  real       render_image_bucketed with the fused Pallas field
  real_t2048 same, field tile=2048

Timing forces a 1-element fetch per call with varied pose (axon dedupe).

Usage: python profiling/probe_render_breakdown.py [steps=1536] [res=800]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import functools
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
from sealdnerf_tpu.ops import near_far_from_aabb
from sealdnerf_tpu.ops.pallas_field import make_fused_forward_planar
from sealdnerf_tpu.render.fast_image import (render_image_bucketed,
                                             _march_tiles)
from sealdnerf_tpu.data.rays import get_rays

STEPS = int(_sys.argv[1]) if len(_sys.argv) > 1 else 1536
RES = int(_sys.argv[2]) if len(_sys.argv) > 2 else 800
SPLITS = ((0.55, 8), (0.25, 4), (0.12, 2), (1.0, 1))


def timeit(fn, poses, n=8, reps=3):
    """Median-of-reps per-call ms; per-rep = dispatch n calls with varied
    poses (axon dedupe), then fetch 1 element of each."""
    _ = np.asarray(fn(poses[0]))
    ms = []
    for _r in range(reps):
        t0 = time.perf_counter()
        outs = [fn(poses[i % len(poses)]) for i in range(n)]
        _ = [np.asarray(o.ravel()[0]) for o in outs]
        ms.append((time.perf_counter() - t0) / n * 1e3)
    return float(np.median(ms)), float(np.min(ms)), float(np.max(ms))


def main():
    _, train, val = make_synthetic_scene(n_train=24, n_val=2, res=256,
                                         hard=True)
    opt = TrainOptions(iters=STEPS + 1024, num_rays=4096, bound=1.0,
                       grid_size=128, march_res=64, n_intervals=16,
                       steps_per_interval=4, segment_steps=128,
                       workspace="/tmp/fps800b")
    field = make_cp_field(jax.random.PRNGKey(0), CPConfig(bound=1.0))
    tr = FastTrainer("fps", opt, field, workspace="/tmp/fps800b",
                     use_checkpoint="scratch")
    tr.mark_untrained_grid(train.poses, train.intrinsics)
    data = train.device()
    h, w, c, n = train.h, train.w, train.images.shape[-1], len(train)
    while tr.global_step < STEPS:
        m = tr.train_segment(data, h, w, c, n, 128)
    _ = float(m["loss"])
    from sealdnerf_tpu.ops.marching_dense import downsample_occ
    # the real renderer downsamples the raw [cas, H, H, H] grid in-graph
    # (train/fast.py:_build_renderer); replicate that here
    occ = jax.jit(lambda o: downsample_occ(o[0], tr.render_cfg.march_res))(
        tr.grid_state["occ"])
    print(f"occ_frac={float(jnp.mean(occ)):.4f}", flush=True)

    intr = jnp.asarray(val.intrinsics * (RES / val.h))
    poses = [jnp.asarray(val.poses[i % len(val)]) for i in range(8)]
    cfg = tr.render_cfg
    params = tr._infer_params()
    fwd = make_fused_forward_planar(field.cfg)
    fwd2048 = make_fused_forward_planar(field.cfg, tile=2048)

    # --- march only ---
    @jax.jit
    def march_only(pose):
        th = tw = RES // 8
        b = cfg.bound
        aabb = jnp.array([-b] * 3 + [b] * 3, dtype=jnp.float32)
        trr = get_rays(jax.random.PRNGKey(0), pose[None], intr / 8, th, tw,
                       -1)
        to, td = trr["rays_o"][0], trr["rays_d"][0]
        tnear, tfar = near_far_from_aabb(to, td, aabb, cfg.min_near)
        te, ivdt, ivv, far = _march_tiles(to, td, tnear, tfar, occ, cfg, 1)
        return te.sum() + ivv.sum() + far.sum()

    # --- per-pixel rays only ---
    @jax.jit
    def rays_only(pose):
        pr = get_rays(jax.random.PRNGKey(0), pose[None], intr, RES, RES, -1)
        return pr["rays_o"][0].sum() + pr["rays_d"][0].sum()

    def noop_fwd(params, x3, d3):
        m = x3.shape[1]
        row = jnp.broadcast_to(0.5 * x3[0:1, :], (1, m))
        return jnp.concatenate(
            [row, row, row, row, jnp.zeros((4, m), jnp.float32)], axis=0)

    def make_render(fwd_fn):
        @jax.jit
        def r(pose):
            img, dep = render_image_bucketed(
                params, occ, pose, intr, RES, RES, cfg, fwd_fn,
                jnp.ones(3, jnp.float32), splits=SPLITS, planar=True)
            return img
        return r

    @jax.jit
    def dilate_only(pose):
        from sealdnerf_tpu.ops.marching_dense import dilate_occ
        return dilate_occ(occ, 1).sum() + pose.sum()

    for name, fn in [
        ("dilate", dilate_only),
        ("march", march_only),
        ("rays", rays_only),
        ("noop", make_render(noop_fwd)),
        ("real", make_render(fwd)),
        ("real_t2048", make_render(fwd2048)),
    ]:
        med, lo, hi = timeit(fn, poses)
        print(f"{name:11s} {med:8.1f} ms  [{lo:.1f}, {hi:.1f}]", flush=True)


if __name__ == "__main__":
    main()
