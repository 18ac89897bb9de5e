"""Headless GUI controller tests: camera, pacing, back-projection, edit state
machine (the logic half of the reference dearpygui viewers)."""

import numpy as np
import jax
import pytest

from sealdnerf_tpu.gui.orbit import OrbitCamera
from sealdnerf_tpu.gui.controller import GUIController
from sealdnerf_tpu.gui.edit_controller import EditController, EditState


def test_orbit_camera():
    cam = OrbitCamera(640, 480, r=2.0, fovy=60.0)
    p0 = cam.pose
    assert p0.shape == (4, 4)
    np.testing.assert_allclose(np.linalg.norm(p0[:3, 3]), 2.0, atol=1e-5)
    cam.orbit(100, 0)
    assert not np.allclose(cam.pose, p0)
    cam.scale(1)
    assert cam.radius < 2.0
    intr = cam.intrinsics
    assert intr[2] == 320 and intr[3] == 240


@pytest.fixture(scope="module")
def small_trainer(tmp_path_factory):
    from sealdnerf_tpu.cli import base_parser, postprocess, to_train_options
    from sealdnerf_tpu.data.synthetic import make_synthetic_scene
    from sealdnerf_tpu.models.api import make_ngp_field
    from sealdnerf_tpu.models.ngp import NGPConfig
    from sealdnerf_tpu.train.trainer import Trainer
    ws = str(tmp_path_factory.mktemp("gui_ws"))
    _, train, _ = make_synthetic_scene(n_train=6, n_val=1, res=64)
    opt = postprocess(base_parser().parse_args(
        ["synthetic", "-O", "--bound", "1", "--dt_gamma", "0",
         "--iters", "100", "--num_rays", "512", "--workspace", ws,
         "--max_steps", "128", "--eval_samples_per_ray", "64",
         "--max_ray_batch", "1024", "--W", "64", "--H", "64"]))
    field = make_ngp_field(jax.random.PRNGKey(0),
                           NGPConfig(bound=1.0, num_levels=4,
                                     log2_hashmap_size=12))
    tr = Trainer("gui", to_train_options(opt, name="gui", grid_size=16),
                 field, workspace=ws, use_checkpoint="scratch")
    tr.update_extra_state()
    return opt, tr, train


@pytest.mark.slow
def test_controller_train_and_render(small_trainer):
    opt, tr, train = small_trainer
    ctl = GUIController(opt, tr, train)
    ctl.training = True
    ctl.train_steps = 4
    out = ctl.train_frame()
    assert out is not None and np.isfinite(out["loss"])
    img, dt = ctl.render_frame()
    assert img.shape == (opt.H, opt.W, 3)
    # SPP accumulation continues at fixed view
    img2, _ = ctl.render_frame()
    assert ctl.spp >= 1


def test_back_projection(small_trainer):
    opt, tr, train = small_trainer
    ctl = GUIController(opt, tr, train)
    ctl.render_frame()
    pts, mask = ctl.back_project(np.array([[32.0, 32.0], [1.0, 1.0]]))
    assert pts.shape == (2, 3)


def test_depth_on_demand():
    """Preview frames ship the depth-free pack (need_depth=False); the
    depth buffer goes stale-free (None) and back_project triggers one
    depth render on demand. Paint tools flip need_depth on."""

    class _Opt:
        W = H = 64
        radius = 2.0
        fovy = 60.0

    class _StubTrainer:
        time_conditioned = False

        def __init__(self):
            self.depth_requests = []

        def test_gui(self, pose, intrinsics, w, h, bg_color=None, spp=1,
                     downscale=1, time=None, need_depth=True):
            self.depth_requests.append(need_depth)
            d = h // downscale
            img = np.zeros((d, d, 3), np.float32)
            dep = np.full((d, d), 2.0, np.float32) if need_depth else None
            return {"image": img, "depth": dep}

    tr = _StubTrainer()
    ctl = GUIController(_Opt(), tr)
    ctl.render_frame()
    assert tr.depth_requests == [False]
    assert ctl.depth_buffer is None
    pts, mask = ctl.back_project(np.array([[32.0, 32.0]]))
    assert tr.depth_requests == [False, True]   # one on-demand render
    assert pts.shape == (1, 3) and mask.all()
    ctl.need_depth = True                       # paint tool active
    ctl.need_update = True
    ctl.spp = ctl.max_spp
    ctl.render_frame()
    assert tr.depth_requests[-1] is True
    assert ctl.depth_buffer is not None


def test_pipelined_preview():
    """Fast-path trainers render through a one-deep async pipeline:
    frame i displays while frame i+1 is in flight (one frame latency
    during motion), need_update clears at dispatch, SPP accumulates."""

    class _Opt:
        W = H = 64
        radius = 2.0
        fovy = 60.0
        max_spp = 4

    class _AsyncStub:
        time_conditioned = False

        def __init__(self):
            self.dispatches = []

        def render_image_async(self, pose, intrinsics, h, w, **kw):
            self.dispatches.append(kw["pack"])
            ds = kw.get("downscale", 1)
            img = np.full((h // ds, w // ds, 3),
                          len(self.dispatches) / 10.0, np.float32)
            dep = (np.full((h // ds, w // ds), 2.0, np.float32)
                   if kw["pack"] == "yuv420" else None)

            class _H:
                def get(_self):
                    return img, dep

            return _H()

    tr = _AsyncStub()
    ctl = GUIController(_Opt(), tr)
    # first frame: dispatched and consumed synchronously
    img, dt = ctl.render_frame()
    assert img is not None and tr.dispatches == ["preview"]
    assert not ctl.need_update
    # steady accumulation: each call dispatches one, displays previous
    ctl.render_frame()
    assert len(tr.dispatches) == 2 and ctl.spp >= 1
    # camera motion: need_update -> fresh frame replaces the buffer
    ctl.on_drag(10, 0)
    assert ctl.need_update
    ctl.render_frame()
    assert not ctl.need_update
    # paint tool active: depth rides the wire (yuv420 pack)
    ctl.need_depth = True
    ctl.need_update = True
    ctl.render_frame()   # dispatches yuv420
    ctl.render_frame()   # displays it
    assert "yuv420" in tr.dispatches
    assert ctl.depth_buffer is not None


@pytest.mark.slow
def test_edit_state_machine(small_trainer, tmp_path):
    from sealdnerf_tpu.editing.student import StudentTrainer
    from sealdnerf_tpu.models.api import make_ngp_field
    from sealdnerf_tpu.models.ngp import NGPConfig
    from sealdnerf_tpu.cli import to_train_options, base_parser, postprocess
    opt, teacher, train = small_trainer
    sfield = make_ngp_field(jax.random.PRNGKey(1),
                            NGPConfig(bound=1.0, num_levels=4,
                                      log2_hashmap_size=12))
    sfield.params = jax.tree_util.tree_map(lambda x: x.copy(), teacher.params)
    topt = to_train_options(opt, name="student", grid_size=16)
    student = StudentTrainer("student", topt, sfield, teacher,
                             workspace=str(tmp_path),
                             use_checkpoint="scratch")
    student.params = sfield.params
    student.grid_state = jax.tree_util.tree_map(lambda x: x.copy(),
                                                teacher.grid_state)
    ctl = EditController(opt, teacher, student, train)
    ctl.render_frame()
    ctl.set_state(EditState.BRUSH)
    for x in range(24, 40, 2):
        for y in range(24, 40, 4):
            ctl.paint(float(x), float(y))
    cfg = ctl.start_edit_training(pretraining_epochs=1,
                                  local_point_step=0.05,
                                  surrounding_point_step=0.1,
                                  global_point_step=-1)
    assert cfg["type"] == "brush" and len(cfg["raw"]) > 4
    assert ctl.state is EditState.TRAIN
    out = ctl.train_frame()   # pretrain epoch
    assert out["phase"] == "pretrain"
    out = ctl.train_frame()   # distill steps need proxied data; uses raw GT
    ctl.override_teacher()
    assert ctl.state is EditState.PREVIEW
    assert ctl.trainer.mapper is None


def test_brush_mask_paint_erase_undo_overlay():
    """Editor depth (VERDICT #27): disk-stamp brush mask, eraser, undo,
    and display overlays -- headless."""
    from sealdnerf_tpu.gui.edit_controller import EditController, EditState

    class _Opt:
        W, H = 64, 64
        radius, fovy = 2.0, 60

    ctl = EditController.__new__(EditController)
    ctl.opt = _Opt()
    ctl.state = EditState.BRUSH
    ctl.brush_pixels = []
    ctl._brush_mask = None
    ctl._stroke_log = []
    ctl.brush_size = 3
    ctl.texture_rect = None
    ctl.anchors = []

    ctl.paint(20, 20)
    assert ctl.brush_mask[20, 20] == 255 and ctl.brush_mask[22, 20] == 255
    assert ctl.brush_mask[30, 30] == 0
    ctl.paint(40, 40)
    n_two = int((ctl.brush_mask > 0).sum())
    ctl.undo_stroke()
    assert ctl.brush_mask[40, 40] == 0 and ctl.brush_mask[20, 20] == 255
    assert int((ctl.brush_mask > 0).sum()) < n_two
    ctl.paint(40, 40)
    ctl.paint(40, 40, erase=True)
    assert ctl.brush_mask[40, 40] == 0

    img = np.zeros((64, 64, 3), np.float32)
    out = ctl.display_frame(img)
    assert out[20, 20, 0] > 0.4  # red overlay where painted
    assert out[5, 5, 0] == 0.0
    ctl.texture_rect = (2, 2, 10, 10)
    ctl.anchors = [((50.0, 50.0), (55.0, 55.0))]
    out = ctl.display_frame(img)
    assert out[2, 5, 1] > 0.5    # green rect outline
    assert out[50, 50, 0] > 0.5  # anchor marker

    ctl.clear_tool()
    assert not ctl.brush_pixels and ctl.texture_rect is None
    assert not ctl.anchors
