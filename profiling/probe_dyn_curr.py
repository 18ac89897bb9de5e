"""Probe: reproduce the bench's dyn[3view] 17.9-PSNR flatline and test
the time curriculum as the robustness fix.

BENCH run (iters=9192, name dyn_3view) flatlined at 17.9 while
probe_dyn_planes (iters=9000, name dynp_vm) reached 22.1 on the same
scene/seed -- a deform/canonical bifurcation on benign jitter. Runs the
EXACT bench config with curriculum off (repro) and on (fix).
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import numpy as np

from sealdnerf_tpu.utils.jaxsetup import setup_jax
setup_jax()

import jax  # noqa: E402

from sealdnerf_tpu.data.synthetic import make_synthetic_scene  # noqa: E402
from sealdnerf_tpu.models.cp import CPDNeRFConfig, make_cp_dnerf_field  # noqa: E402
from sealdnerf_tpu.train.trainer import TrainOptions  # noqa: E402
from sealdnerf_tpu.train.fast import FastTrainer  # noqa: E402


def _psnr(img, gtimg):
    gt = gtimg[..., :3] * gtimg[..., 3:] + (1 - gtimg[..., 3:])
    return -10 * np.log10(max(np.mean((np.clip(img, 0, 1) - gt) ** 2),
                              1e-10))


VARIANTS = {
    # tag -> dict of TrainOptions overrides
    "repro": {},
    "curr": {"time_curriculum_steps": 1000},
    "ar128": {"dyn_anneal_res": 128},
    "ar64": {"dyn_anneal_res": 64},
    "as2048": {"dyn_anneal_steps": 2048},
    "ar64s2048": {"dyn_anneal_res": 64, "dyn_anneal_steps": 2048},
    "off": {"dyn_anneal_steps": 0},
    # deform_zero_reg=0.1 PINS the deform tower: its gradient through
    # the (near-zero-init) last layer exceeds the ~5e-3 photometric
    # warp gradient, so |deform| stays ~0 forever (probe_dyn_diag.py)
    "zr1e3": {"deform_zero_reg": 1e-3},
    "zr0": {"deform_zero_reg": 0.0},
    "zr1e3_noann": {"deform_zero_reg": 1e-3, "dyn_anneal_steps": 0},
}


def run(tag, curriculum=None):
    _, train, val = make_synthetic_scene(n_train=36, n_val=4, res=256,
                                         dynamic=True, views_per_time=3)
    opt = TrainOptions(iters=9192, num_rays=4096, bound=1.0, dt_gamma=0.0,
                       grid_size=128, march_res=64, n_intervals=16,
                       steps_per_interval=4, segment_steps=128,
                       update_extra_interval=16,
                       workspace=f"/tmp/probe_dc_{tag}",
                       lr=1e-2, lr_net=1e-3,
                       **VARIANTS.get(tag, {}))
    curriculum = opt.time_curriculum_steps
    field = make_cp_dnerf_field(jax.random.PRNGKey(0),
                                CPDNeRFConfig(bound=1.0))
    tr = FastTrainer("dyn_3view", opt, field, workspace=opt.workspace,
                     use_checkpoint="scratch", time_conditioned=True)
    if curriculum:
        train = tr.enable_time_curriculum(train)
    tr.mark_untrained_grid(train.poses, train.intrinsics)
    data = train.device()
    h, w, c, n = train.h, train.w, train.images.shape[-1], len(train)
    tr.train_segment(data, h, w, c, n, 128)

    def val_psnr():
        ps = [_psnr(tr.render_image(val.poses[i], val.intrinsics, val.h,
                                    val.w, time=val.times[i])[0],
                    val.images[i]) for i in range(len(val))]
        return float(np.mean(ps))

    def deform_mag(t):
        from sealdnerf_tpu.models.cp import cp_dnerf_deform
        import jax.numpy as jnp
        pts = jnp.asarray(np.random.default_rng(0).uniform(
            -0.6, 0.6, (4096, 3)).astype(np.float32))
        dfm = cp_dnerf_deform(tr._infer_params(), tr.field.cfg, pts, t)
        return float(jnp.abs(jnp.linalg.norm(dfm, axis=-1)).max())

    val_psnr()
    t0 = time.perf_counter()
    tr.global_step = 0
    while tr.global_step < 2048:
        for _ in range(4):
            m = tr.train_segment(data, h, w, c, n, 128)
        _ = float(m["loss"])
        print(f"[dc] {tag} step {tr.global_step:5d} "
              f"t={time.perf_counter() - t0:6.1f}s PSNR={val_psnr():5.2f} "
              f"|deform|max(t=.25)={deform_mag(0.25):.4f}",
              file=sys.stderr, flush=True)


if __name__ == "__main__":
    for tag in (sys.argv[1:] or ["repro", "curr"]):
        run(tag)
