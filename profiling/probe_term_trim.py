"""Termination-trim tuning probe (VERDICT r4 next #1: 9.13 -> >=15 FPS
at 800px full fidelity, quality-guarded).

Trains the bench static recipe to 3000 steps, then sweeps bucket
ladders x termination-trim settings on the 800px render:

  device ms        1-elem-fetch frame time (includes ~30 ms tunnel floor)
  psnr_vs_exact    vs render_image_tiled at the FULL 32-interval budget
  psnr_gt_256      bucketed render at eval res vs synthetic GT

plus pre/post-trim tile interval-count histograms (what the ladder
should be shaped to).

Usage: python profiling/probe_term_trim.py [steps=3000] [res=800]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

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
                                             render_image_tiled,
                                             _march_tiles,
                                             _termination_trim)
from sealdnerf_tpu.ops.marching_dense import downsample_occ
from sealdnerf_tpu.data.rays import get_rays

STEPS = int(_sys.argv[1]) if len(_sys.argv) > 1 else 3000
RES = int(_sys.argv[2]) if len(_sys.argv) > 2 else 800

DEFAULT = ((0.50, 16), (0.20, 8), (0.15, 4), (0.10, 2), (1.0, 2))
CANDS = [
    ("default/term0", DEFAULT, 0, 13.8),
    ("default/term16", DEFAULT, 16, 13.8),
    ("L1/term16", ((0.50, 32), (0.20, 16), (0.15, 8), (0.10, 4), (1.0, 2)),
     16, 13.8),
    ("L2/term16", ((0.55, 32), (0.25, 16), (0.10, 8), (0.06, 4), (1.0, 2)),
     16, 13.8),
    ("L3/term16", ((0.60, 32), (0.22, 16), (0.10, 8), (0.05, 4), (1.0, 1)),
     16, 13.8),
    ("L1/term8", ((0.50, 32), (0.20, 16), (0.15, 8), (0.10, 4), (1.0, 2)),
     8, 13.8),
    ("L1/tau7", ((0.50, 32), (0.20, 16), (0.15, 8), (0.10, 4), (1.0, 2)),
     16, 7.0),
]


def _psnr(a, b):
    return -10 * np.log10(max(np.mean((np.clip(np.asarray(a), 0, 1)
                                       - np.clip(np.asarray(b), 0, 1)) ** 2),
                              1e-10))


def timeit(fn, intrs, n=8, reps=3):
    _ = np.asarray(fn(intrs[0]).ravel()[0])
    ms = []
    for _r in range(reps):
        t0 = time.perf_counter()
        outs = [fn(intrs[i]) for i in range(n)]
        _ = [np.asarray(o.ravel()[0]) for o in outs]
        ms.append((time.perf_counter() - t0) / n * 1e3)
    return float(np.median(ms))


def main():
    _, train, val = make_synthetic_scene(n_train=24, n_val=2, res=256,
                                         hard=True)
    opt = TrainOptions(iters=STEPS + 1024, num_rays=4096, bound=1.0,
                       dt_gamma=0.0, grid_size=128, march_res=64,
                       n_intervals=16, steps_per_interval=4,
                       segment_steps=128, workspace="/tmp/term_probe")
    field = make_cp_field(jax.random.PRNGKey(0), CPConfig(bound=1.0))
    tr = FastTrainer("term", opt, field, workspace="/tmp/term_probe",
                     use_checkpoint="latest")
    if tr.global_step < STEPS:
        tr.mark_untrained_grid(train.poses, train.intrinsics)
        data = train.device()
        h, w, c, n = train.h, train.w, train.images.shape[-1], len(train)
        t0 = time.perf_counter()
        while tr.global_step < STEPS:
            m = tr.train_segment(data, h, w, c, n, 128)
        _ = float(m["loss"])
        print(f"trained {STEPS} steps in {time.perf_counter()-t0:.0f}s",
              flush=True)
        tr.save_checkpoint(full=True)
    else:
        print(f"loaded checkpoint at step {tr.global_step}", flush=True)

    cfg = tr.render_cfg
    occ = jax.jit(lambda o: downsample_occ(o[0], cfg.march_res))(
        tr.grid_state["occ"])
    params = tr._infer_params()
    fwd = make_fused_forward_planar(field.cfg)
    gt = val.images[0]
    gt = gt[..., :3] * gt[..., 3:] + (1 - gt[..., 3:])
    bg = jnp.ones(3, jnp.float32)

    intr800 = np.asarray(val.intrinsics, np.float32) * (RES / val.h)
    intrs = [jnp.asarray(intr800 * (1 + 1e-4 * i)) for i in range(8)]
    pose = jnp.asarray(val.poses[0])
    intr256 = jnp.asarray(val.intrinsics)

    # ---- count histograms pre/post trim ----------------------------------
    @jax.jit
    def counts_fn(intr):
        th = tw = RES // 8
        b = cfg.bound
        aabb = jnp.array([-b] * 3 + [b] * 3, dtype=jnp.float32)
        trr = get_rays(jax.random.PRNGKey(0), pose[None], intr / 8, th, tw,
                       -1)
        to, td = trr["rays_o"][0], trr["rays_d"][0]
        tnear, tfar = near_far_from_aabb(to, td, aabb, cfg.min_near)
        te, ivdt, ivv, far = _march_tiles(to, td, tnear, tfar, occ, cfg, 1)
        pr = get_rays(jax.random.PRNGKey(0), pose[None], intr, RES, RES, -1)
        o0 = pr["rays_o"][0][0]
        ivv2 = _termination_trim(params, o0, pose, intr / 8, th, tw, 8,
                                 te, ivv, ivdt, cfg, fwd, True, 1.0,
                                 13.8, 16, ())
        return (jnp.sum(ivv.astype(jnp.int32), -1),
                jnp.sum(ivv2.astype(jnp.int32), -1))
    c_pre, c_post = counts_fn(intrs[0])
    for name, cc in [("pre ", c_pre), ("post", c_post)]:
        cc = np.asarray(cc)
        qs = np.percentile(cc, [50, 75, 90, 95, 99, 100])
        print(f"counts {name}: mean {cc.mean():.2f} zero-frac "
              f"{(cc == 0).mean():.3f} q50/75/90/95/99/max "
              f"{'/'.join(str(int(q)) for q in qs)}", flush=True)

    # ---- exact reference: full-budget tiled render ------------------------
    @jax.jit
    def exact_fn(intr):
        img, _ = render_image_tiled(params, occ, pose, intr, RES, RES,
                                    cfg, fwd, bg, planar=True)
        return img
    exact = np.asarray(exact_fn(intrs[0]))
    print("exact ready", flush=True)

    @jax.jit
    def exact256_fn(intr):
        img, _ = render_image_tiled(params, occ, pose, intr, 256, 256,
                                    cfg, fwd, bg, planar=True)
        return img
    exact256 = np.asarray(exact256_fn(intr256))
    print(f"psnr exact256 vs GT: {_psnr(exact256, gt):.2f}", flush=True)

    for label, splits, term, tau in CANDS:
        def mk(rh, rw):
            @jax.jit
            def f(intr):
                img, _ = render_image_bucketed(
                    params, occ, pose, intr, rh, rw, cfg, fwd, bg,
                    splits=splits, term_probe=term, term_tau=tau,
                    planar=True)
                return img
            return f
        f800, f256 = mk(RES, RES), mk(256, 256)
        img800 = np.asarray(f800(intrs[0]))
        ms = timeit(f800, intrs)
        p_exact = _psnr(img800, exact)
        p_gt = _psnr(np.asarray(f256(intr256)), gt)
        print(f"{label:16s} {ms:7.1f} ms  vs_exact {p_exact:6.2f} dB  "
              f"gt256 {p_gt:6.2f} dB", flush=True)


if __name__ == "__main__":
    main()
