"""Probe: WHERE does dynamic quality go?

Static training on the smooth synthetic scene reaches ~33 PSNR; the
dynamic 3-view anchor plateaus ~20-22. This diagnoses the gap on a
trained dynamic model: per-time PSNR on fresh orbit views (the val set
is 3x t=0 + 1x t=1, so the mean barely samples intermediate times),
canonical-frame quality, and deform-tower magnitudes vs the GT motion.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import numpy as np

from sealdnerf_tpu.utils.jaxsetup import setup_jax
setup_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sealdnerf_tpu.data.synthetic import make_synthetic_scene, _orbit_pose  # noqa: E402
from sealdnerf_tpu.models.cp import CPDNeRFConfig, make_cp_dnerf_field  # noqa: E402
from sealdnerf_tpu.train.trainer import TrainOptions  # noqa: E402
from sealdnerf_tpu.train.fast import FastTrainer  # noqa: E402


def main():
    scene, train, val = make_synthetic_scene(n_train=36, n_val=4, res=256,
                                             dynamic=True, views_per_time=3)
    opt = TrainOptions(iters=9000, num_rays=4096, bound=1.0, dt_gamma=0.0,
                       grid_size=128, march_res=64, n_intervals=16,
                       steps_per_interval=4, segment_steps=128,
                       update_extra_interval=16, lr=1e-2, lr_net=1e-3,
                       workspace="/tmp/probe_dyndiag")
    field = make_cp_dnerf_field(jax.random.PRNGKey(0),
                                CPDNeRFConfig(bound=1.0))
    tr = FastTrainer("dynp_vm", opt, field, workspace=opt.workspace,
                     use_checkpoint="latest", time_conditioned=True)
    if tr.global_step < 2048:
        tr.mark_untrained_grid(train.poses, train.intrinsics)
        data = train.device()
        h, w, c, n = train.h, train.w, train.images.shape[-1], len(train)
        while tr.global_step < 2048:
            tr.train_segment(data, h, w, c, n, 128)
        tr.save_checkpoint(full=True)

    res = 256
    fl = res / (2 * np.tan(0.9 / 2))
    intr = np.array([fl, fl, res / 2, res / 2], dtype=np.float32)

    def gt_image(pose, t):
        ii, jj = np.meshgrid(np.arange(res) + 0.5, np.arange(res) + 0.5,
                             indexing="xy")
        d = np.stack([(ii - res / 2) / fl, (jj - res / 2) / fl,
                      np.ones_like(ii)], axis=-1)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        rays_d = d.reshape(-1, 3) @ pose[:3, :3].T
        rays_o = np.broadcast_to(pose[:3, 3], rays_d.shape)
        rgb, _, alpha = scene.render(rays_o, rays_d, t)
        rgb = rgb * alpha[:, None] + (1 - alpha[:, None])
        return rgb.reshape(res, res, 3)

    for t in (0.0, 0.25, 0.5, 0.75, 1.0):
        ps = []
        for k in range(3):
            pose = _orbit_pose(np.pi / 2 + 0.3 * np.sin(k * 2.1),
                               2 * np.pi * (k + 0.37) / 3, 2.0)
            img, _ = tr.render_image(pose, intr, res, res, time=t)
            gt = gt_image(pose, t)
            ps.append(-10 * np.log10(max(np.mean(
                (np.clip(img, 0, 1) - gt) ** 2), 1e-10)))
        print(f"[diag] t={t:4.2f} PSNR={np.mean(ps):5.2f} "
              f"({['%.1f' % p for p in ps]})", file=sys.stderr, flush=True)

    # deform magnitude on points near the moving sphere, vs GT motion
    params = tr._infer_params()
    pts = jnp.asarray(np.random.default_rng(0).uniform(
        -0.6, 0.6, (4096, 3)).astype(np.float32))
    for t in (0.0, 0.25, 0.5):
        from sealdnerf_tpu.models.cp import cp_dnerf_deform
        dfm = cp_dnerf_deform(params, tr.field.cfg, pts, t)
        mag = np.asarray(jnp.linalg.norm(dfm, axis=-1))
        gt_off = scene.at_time(t)[0] - scene.centers[0]
        print(f"[diag] t={t:4.2f} |deform| mean={mag.mean():.4f} "
              f"p95={np.percentile(mag, 95):.4f} "
              f"gt_motion={np.linalg.norm(gt_off):.4f}",
              file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
