"""Regression tests for round-1 VERDICT/ADVICE findings.

Each test pins a concrete bug: the StudentTrainer optimizer reset, the
anchor single-click crash, the silently-zero LPIPS report, the
string-matching OOM detector, and best-checkpoint occupancy rebuild."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_lpips_meter_reports_unavailable():
    """LPIPSMeter must not report 0.000000 when gated off
    (VERDICT.md weak #8)."""
    from sealdnerf_tpu.train.metrics import LPIPSMeter
    m = LPIPSMeter()
    if m.available:
        pytest.skip("lpips weights present in this image")
    assert "0.000000" not in m.report()
    assert "unavailable" in m.report()


def test_oom_matcher_rejects_non_oom():
    """A generic error mentioning 'memory' must not trigger the eval
    chunk-halving retry (VERDICT.md weak #3)."""
    from sealdnerf_tpu.train.trainer import _is_oom_error

    class XlaRuntimeError(Exception):
        pass

    assert not _is_oom_error(ValueError("bad memory layout in transpose"))
    assert not _is_oom_error(XlaRuntimeError("INVALID_ARGUMENT: memory"))
    assert _is_oom_error(XlaRuntimeError(
        "RESOURCE_EXHAUSTED: Out of memory while trying to allocate"))
    assert _is_oom_error(XlaRuntimeError("Ran out of memory in memory space"))


def test_anchor_single_click_no_crash():
    """A click without a drag leaves ((x, y), None); build_config must not
    crash on it (VERDICT.md weak #5)."""
    from sealdnerf_tpu.gui.edit_controller import EditController, EditState

    class _Trainer:
        pass

    ctl = EditController.__new__(EditController)
    ctl.state = EditState.ANCHOR
    ctl.anchors = [((10.0, 12.0), None)]
    ctl.anchor_radius = 0.1
    ctl.brush_pixels = []
    ctl.texture_rect = None
    cfg = EditController.build_seal_config(ctl)
    assert cfg is None  # incomplete anchor: no config yet


class TestStudentOptimizerStability:
    """Rebuilding the train step for a new ray-batch signature must not
    re-wrap the optimizer or discard its state (VERDICT.md weak #4)."""

    @pytest.fixture(scope="class")
    def student(self, tmp_path_factory):
        from sealdnerf_tpu.models.api import make_dnerf_field
        from sealdnerf_tpu.models.dnerf import DNeRFConfig
        from sealdnerf_tpu.train.trainer import Trainer, TrainOptions
        from sealdnerf_tpu.editing.student import StudentTrainer
        ws = str(tmp_path_factory.mktemp("stud"))
        cfg = DNeRFConfig(bound=1.0, num_layers_deform=2,
                          hidden_dim_deform=16, log2_hashmap_size=12)
        tfield = make_dnerf_field(jax.random.PRNGKey(0), cfg)
        opt = TrainOptions(iters=10, num_rays=64, bound=1.0, dt_gamma=0.0,
                           grid_size=32, workspace=ws, max_steps=32,
                           fast=False)
        teacher = Trainer("t", opt, tfield, workspace=ws + "/t",
                          use_checkpoint="scratch", time_conditioned=True)
        sfield = make_dnerf_field(jax.random.PRNGKey(1), cfg)
        student = StudentTrainer("s", opt, sfield, teacher,
                                 workspace=ws + "/s",
                                 use_checkpoint="scratch",
                                 time_conditioned=True)
        return student

    def test_no_nested_wrap_or_state_reset(self, student):
        student._build_train_step(16, 16, 4, 2)
        tx1 = student.tx
        st1 = student.opt_state
        # second build with a different signature (adaptive re-bucketing)
        student._build_train_step(16, 16, 4, 4)
        assert student.tx is tx1, "optimizer re-wrapped on rebuild"
        assert student.opt_state is st1, "optimizer state re-initialized"


def test_best_checkpoint_occ_rebuilt(tmp_path):
    """Loading a slim (density-grid-stripped) checkpoint must rebuild the
    occupancy grid so renders are not blank (ADVICE.md r1 #2)."""
    from sealdnerf_tpu.models.cp import CPConfig, make_cp_field
    from sealdnerf_tpu.train.trainer import Trainer, TrainOptions

    ws = str(tmp_path)
    cfg = CPConfig(bound=1.0, scales=((8, 4),), planes=())
    field = make_cp_field(jax.random.PRNGKey(0), cfg)
    opt = TrainOptions(iters=10, num_rays=64, bound=1.0, dt_gamma=0.0,
                       grid_size=32, workspace=ws, density_thresh=1e-4)
    tr = Trainer("c", opt, field, workspace=ws, use_checkpoint="scratch")
    # make the grid state look trained, save a best checkpoint (slim)
    tr.update_extra_state()
    tr.stats["results"].append(30.0)
    tr.save_checkpoint(full=False, best=True)
    occ_before = int(jnp.sum(tr.grid_state["occ"]))

    field2 = make_cp_field(jax.random.PRNGKey(0), cfg)
    tr2 = Trainer("c", opt, field2, workspace=ws, use_checkpoint="scratch")
    import os
    tr2.load_checkpoint(os.path.join(ws, "checkpoints", "c.npz"))
    occ_after = int(jnp.sum(tr2.grid_state["occ"]))
    if occ_before > 0:
        assert occ_after > 0, "occ not rebuilt after slim checkpoint load"


def test_scatter_spill_overflow_not_dropped():
    """Gradient mass must survive a spill-budget overflow: > 2^14 updates
    landing outside their chunk window (ADVICE.md r1 #4)."""
    from sealdnerf_tpu.ops.scatter_add import sorted_chunk_scatter_add
    rows, c = 1 << 14, 2
    m = 1 << 15  # random idx over a big table + tiny window => all spill
    rng = np.random.default_rng(0)
    idx = rng.integers(0, rows, size=m).astype(np.int32)
    vals = rng.normal(size=(m, c)).astype(np.float32)
    got = np.asarray(sorted_chunk_scatter_add(
        jnp.asarray(idx), jnp.asarray(vals), rows, chunk=4096, window=256,
        force_histogram=True))
    want = np.zeros((rows, c), np.float32)
    np.add.at(want, idx, vals)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_patch_criterion_identical_images_zero():
    from sealdnerf_tpu.train.patch_loss import patch_criterion, patch_ssim_loss
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.random((64, 3), np.float32))
    assert patch_criterion(img, img, 1) == 0.0
    loss_same = float(patch_ssim_loss(img, img, 8))
    assert loss_same < 1e-5
    other = jnp.asarray(rng.random((64, 3), np.float32))
    assert float(patch_ssim_loss(img, other, 8)) > loss_same


def test_semantic_rand_pose_branch(tmp_path):
    """--rand_pose GT-free branch: with an injected semantic loss the step
    runs, updates params, and reduces the loss (VERDICT.md missing #3;
    CLIP weights themselves are gated-degrade offline)."""
    from sealdnerf_tpu.models.cp import CPConfig, make_cp_field
    from sealdnerf_tpu.train.trainer import Trainer, TrainOptions
    ws = str(tmp_path)
    cfg = CPConfig(bound=1.0, scales=((8, 4), (16, 8)), planes=())
    field = make_cp_field(jax.random.PRNGKey(0), cfg)
    opt = TrainOptions(iters=50, num_rays=64, bound=1.0, dt_gamma=0.0,
                       grid_size=32, workspace=ws, clip_res=16,
                       rand_pose=0, max_steps=64, samples_per_ray=16)
    tr = Trainer("sem", opt, field, workspace=ws, use_checkpoint="scratch")
    tr.update_extra_state()
    # inject a mock semantic objective: make the render darker
    tr.semantic_loss_fn = lambda img: jnp.mean(img ** 2)
    p0 = np.asarray(jax.tree_util.tree_leaves(tr.params)[0]).copy()
    l0 = tr.train_step_semantic(np.array([16.0, 16.0, 8.0, 8.0]), 16)
    for _ in range(10):
        l1 = tr.train_step_semantic(np.array([16.0, 16.0, 8.0, 8.0]), 16)
    p1 = np.asarray(jax.tree_util.tree_leaves(tr.params)[0])
    assert tr.global_step == 11
    assert not np.array_equal(p0, p1), "semantic step did not update params"
    assert np.isfinite(l0) and np.isfinite(l1)


def test_planes_default_resolved_by_bound():
    """VERDICT r4 next #8: bound>1 recipes default the VM planes OFF
    (0.64x baseline with planes on for ~0.2 dB on the bound-2 anchor);
    bound<=1 keeps the (128, 8) flagship scale. '--planes' overrides."""
    from sealdnerf_tpu.models.cp import default_planes, parse_planes

    assert default_planes(1.0) == ((128, 8),)
    assert default_planes(2.0) == ()
    assert parse_planes("auto", 1.0) == ((128, 8),)
    assert parse_planes("auto", 2.0) == ()
    assert parse_planes("off", 1.0) == ()
    assert parse_planes("256,4;64,8", 2.0) == ((256, 4), (64, 8))


def test_cli_planes_flag_reaches_field(tmp_path):
    from sealdnerf_tpu.cli import base_parser, build_trainer

    parser = base_parser()
    opt = parser.parse_args(
        ["data", "--bound", "2.0", "--workspace", str(tmp_path),
         "--backbone", "cp"])
    tr, field = build_trainer(opt, name="t", use_checkpoint="scratch")
    assert field.cfg.planes == ()
    opt = parser.parse_args(
        ["data", "--bound", "2.0", "--planes", "128,8",
         "--workspace", str(tmp_path), "--backbone", "cp"])
    tr, field = build_trainer(opt, name="t", use_checkpoint="scratch")
    assert field.cfg.planes == ((128, 8),)
