"""Tripwires for the dynamic (D-NeRF) training recipe's documented
fragility (VERDICT r3 weak #5 / task 4):

- train/trainer.py documents that deform_zero_reg=0.1 silently killed
  the deformation tower for all early round-3 runs (PSNR was scored on
  canonical ghosting), and that benign LR-schedule jitter can bifurcate
  the same recipe by ~4 dB. These tests fail loudly if a change
  re-kills the deform tower or re-opens the bifurcation at small scale.

Small-scale CPU analog of the bench's 3-view anchor: CP-D-NeRF on the
fast path, 3 views per timestamp, 512-768 steps.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sealdnerf_tpu.data.synthetic import make_synthetic_scene
from sealdnerf_tpu.models.cp import CPDNeRFConfig, make_cp_dnerf_field
from sealdnerf_tpu.train.trainer import TrainOptions
from sealdnerf_tpu.train.fast import FastTrainer


def _psnr(img, gtimg):
    gt = gtimg[..., :3] * gtimg[..., 3:] + (1 - gtimg[..., 3:])
    return -10 * np.log10(max(np.mean((np.clip(img, 0, 1) - gt) ** 2),
                              1e-10))


_CFG = CPDNeRFConfig(bound=1.0, scales=((16, 8), (48, 16)), planes=(),
                     num_layers_deform=3, hidden_dim_deform=32)


def _train_dyn(ws, lr, steps, seed=0, zero_reg=None):
    _, train, val = make_synthetic_scene(n_train=18, n_val=2, res=64,
                                         dynamic=True, views_per_time=3)
    kw = dict(iters=steps + 100, num_rays=1024, bound=1.0, dt_gamma=0.0,
              grid_size=32, march_res=16, n_intervals=8,
              steps_per_interval=3, segment_steps=64,
              update_extra_interval=8, lr=lr, lr_net=lr / 10,
              eval_interval=1000, workspace=ws, seed=seed)
    if zero_reg is not None:
        kw["deform_zero_reg"] = zero_reg
    opt = TrainOptions(**kw)
    field = make_cp_dnerf_field(jax.random.PRNGKey(seed), _CFG)
    tr = FastTrainer("dyn", opt, field, workspace=ws,
                     use_checkpoint="scratch", time_conditioned=True)
    tr.dyn_grid_cfg = dataclasses.replace(tr.dyn_grid_cfg, time_size=8,
                                          bins_per_call=4)
    from sealdnerf_tpu.render.dynamic_grid import init_dyn_grid_state
    tr.grid_state = init_dyn_grid_state(tr.dyn_grid_cfg)
    tr.mark_untrained_grid(train.poses, train.intrinsics)
    data = train.device()
    h, w, c, n = train.h, train.w, train.images.shape[-1], len(train)
    while tr.global_step < steps:
        tr.train_segment(data, h, w, c, n, 64)
    ps = [_psnr(tr.render_image(val.poses[i], val.intrinsics, val.h,
                                val.w, time=val.times[i])[0],
                val.images[i]) for i in range(len(val))]
    return tr, float(np.mean(ps))


def _deform_mag(tr, t):
    """Mean |deform| over scene points at time t (probe_dyn_diag.py's
    liveness measurement)."""
    x = jax.random.uniform(jax.random.PRNGKey(7), (2048, 3),
                           minval=-0.8, maxval=0.8)
    from sealdnerf_tpu.models.cp import cp_dnerf_deform
    d = cp_dnerf_deform(tr.params, _CFG, x, jnp.asarray(t))
    return float(jnp.mean(jnp.abs(d)))


@pytest.mark.slow
def test_deform_tower_alive_after_training(tmp_path):
    """The shipping recipe must train a LIVE deformation tower: round 3
    shipped weeks of runs with |deform| == 0 at every t (dead tower,
    train/trainer.py:109-121). Also pins the t==0 canonical gate."""
    tr, psnr = _train_dyn(str(tmp_path), lr=1e-2, steps=512)
    mag_t1 = _deform_mag(tr, 1.0)
    mag_t0 = _deform_mag(tr, 0.0)
    assert mag_t1 > 1e-3, \
        f"deformation tower is dead at t=1 (|deform|={mag_t1:.2e}); " \
        "check deform_zero_reg / anneal / freeze interactions"
    assert mag_t0 == 0.0, f"canonical frame not anchored: {mag_t0}"
    # collapse floor, not a quality grade (measured 13.0 at 512 steps)
    assert psnr > 11.5, f"small-scale dynamic anchor collapsed: {psnr}"


@pytest.mark.slow
def test_deform_zero_reg_tripwire(tmp_path):
    """deform_zero_reg=0.1 pins the near-zero-init deform output at zero
    (the round-3 dead-tower bug). This tripwire exists so the failure
    mode stays reproducible and LOUD: if someone 'simplifies' the reg
    handling and this stops showing a live-vs-dead contrast, the guard
    in test_deform_tower_alive_after_training is what matters."""
    tr_big, _ = _train_dyn(str(tmp_path / "big"), lr=1e-2, steps=256,
                           zero_reg=0.1)
    tr_ok, _ = _train_dyn(str(tmp_path / "ok"), lr=1e-2, steps=256,
                          zero_reg=1e-3)
    assert _deform_mag(tr_ok, 1.0) > _deform_mag(tr_big, 1.0), \
        "the documented dead-tower mechanism no longer reproduces; " \
        "update train/trainer.py:109-121's rationale"


@pytest.mark.slow
def test_dyn_recipe_lr_perturbation_spread(tmp_path):
    """+/-5% LR must not bifurcate the recipe (round 3 documented a 2%
    LR-schedule change flipping 22.1 <-> 17.9 PSNR at full scale,
    train/trainer.py:97-107). Small-scale analog: spread < 3 dB."""
    psnrs = []
    for i, f in enumerate([0.95, 1.05]):
        _, p = _train_dyn(str(tmp_path / f"lr{i}"), lr=1e-2 * f, steps=640)
        psnrs.append(p)
    spread = max(psnrs) - min(psnrs)
    assert spread < 3.0, f"LR-perturbation bifurcation: {psnrs}"
    assert min(psnrs) > 12.0, f"recipe floor breached: {psnrs}"


def test_resolve_time_curriculum_auto():
    """-1 = auto: ON (512) only for monocular data -- one camera per
    timestamp; OFF for multi-view-per-time (bench.py dyn3view note:
    the curriculum'd multi-view recipe is high-variance). Explicit
    values pass through untouched (VERDICT r4 weak #3 / next #4)."""
    mono_times = np.linspace(0, 1, 12)
    multi_times = np.repeat(np.linspace(0, 1, 4), 3)
    f = FastTrainer.resolve_time_curriculum
    assert f(-1, mono_times) == 512
    assert f(-1, multi_times) == 0
    assert f(-1, None) == 0
    assert f(0, mono_times) == 0          # explicit off
    assert f(768, multi_times) == 768     # explicit force
    # float fuzz on "the same" timestamp must not read as monocular
    fuzz = np.repeat(np.linspace(0, 1, 4), 3) + 1e-9
    assert f(-1, fuzz) == 0
