"""Model + renderer tests: shapes, gradients, uniform-vs-occupancy path
consistency (the differential-testing oracle pairing of the reference)."""

import numpy as np
import jax
import jax.numpy as jnp

from sealdnerf_tpu.models.api import make_ngp_field
from sealdnerf_tpu.models.ngp import NGPConfig
from sealdnerf_tpu.models.dnerf import DNeRFConfig, init_dnerf, dnerf_forward, \
    dnerf_deform
from sealdnerf_tpu.ops.marching import MarchConfig
from sealdnerf_tpu.render import RenderSettings
from sealdnerf_tpu.render.renderer import render_occ, render_uniform
from sealdnerf_tpu.render.grid import GridConfig, init_grid_state, \
    update_density_grid, mark_untrained_grid


def small_cfg(**kw):
    return NGPConfig(bound=1.0, num_levels=4, log2_hashmap_size=12, **kw)


def test_ngp_shapes_and_grad():
    cfg = small_cfg()
    field = make_ngp_field(jax.random.PRNGKey(0), cfg)
    x = jnp.zeros((17, 3))
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (17, 1))
    sigma, rgb = jax.jit(field.forward)(field.params, x, d)
    assert sigma.shape == (17,) and rgb.shape == (17, 3)
    assert float(rgb.min()) >= 0 and float(rgb.max()) <= 1
    g = jax.jit(jax.grad(
        lambda p: jnp.sum(field.forward(p, x, d)[0])))(field.params)
    norms = [float(jnp.abs(l).max()) for l in jax.tree_util.tree_leaves(g)]
    assert any(n > 0 for n in norms)


def test_ngp_background():
    cfg = small_cfg(bg_radius=2.0)
    field = make_ngp_field(jax.random.PRNGKey(0), cfg)
    sph = jnp.zeros((5, 2))
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (5, 1))
    rgb = field.background(field.params, sph, d)
    assert rgb.shape == (5, 3)


def test_dnerf_variants_forward():
    for variant in ["deform", "basis", "hyper"]:
        cfg = DNeRFConfig(bound=1.0, variant=variant, num_levels=4,
                          log2_hashmap_size=12, num_layers_deform=2,
                          hidden_dim_deform=32, num_layers_basis=2)
        params = init_dnerf(jax.random.PRNGKey(0), cfg)
        x = jnp.zeros((9, 3))
        d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (9, 1))
        sigma, rgb, deform = jax.jit(
            lambda p, t: dnerf_forward(p, cfg, x, d, t))(
                params, jnp.asarray(0.5))
        assert sigma.shape == (9,) and rgb.shape == (9, 3)
        assert deform.shape == (9, 3)


def test_dnerf_deform_zero_at_t0():
    """t == 0 is the canonical frame (dnerf/network.py:139-141)."""
    cfg = DNeRFConfig(bound=1.0, num_levels=4, log2_hashmap_size=12,
                      num_layers_deform=3, hidden_dim_deform=32)
    params = init_dnerf(jax.random.PRNGKey(1), cfg)
    x = jnp.asarray(np.random.default_rng(0).random((7, 3)) - 0.5,
                    dtype=jnp.float32)
    d0 = dnerf_deform(params, cfg, x, jnp.asarray(0.0))
    np.testing.assert_array_equal(np.asarray(d0), 0.0)
    d1 = dnerf_deform(params, cfg, x, jnp.asarray(0.7))
    assert float(jnp.abs(d1).max()) > 0


def _setup_render(rng):
    cfg = small_cfg()
    field = make_ngp_field(jax.random.PRNGKey(0), cfg)
    march = MarchConfig(bound=1.0, cascades=1, grid_size=32, dt_gamma=0.0,
                        max_steps=256)
    settings = RenderSettings(march=march, samples_per_ray=64, num_steps=96,
                              upsample_steps=0)
    n = 64
    o = np.zeros((n, 3), np.float32)
    o[:, 2] = -2.5
    o[:, 0] = rng.random(n) * 0.6 - 0.3
    d = np.zeros((n, 3), np.float32)
    d[:, 2] = 1.0
    return field, settings, jnp.asarray(o), jnp.asarray(d)


def test_occ_path_matches_uniform_oracle(rng):
    """With a fully-occupied grid and matched step counts, the fast path must
    agree with the uniform oracle to rendering tolerance."""
    field, settings, o, d = _setup_render(rng)
    occ = jnp.ones((1, 32, 32, 32), dtype=bool)
    out_occ = render_occ(field.params, occ, o, d, settings, field.forward,
                         m_budget=o.shape[0] * 256)
    out_uni = render_uniform(field.params, o, d, settings, field.density,
                             field.color)
    # a randomly-initialized field is near-transparent; both paths should see
    # nearly the same (small) weights_sum and near-background image.
    np.testing.assert_allclose(np.asarray(out_occ["weights_sum"]),
                               np.asarray(out_uni["weights_sum"]), atol=0.02)
    np.testing.assert_allclose(np.asarray(out_occ["image"]),
                               np.asarray(out_uni["image"]), atol=0.02)


def test_render_occ_grad_flows(rng):
    field, settings, o, d = _setup_render(rng)
    occ = jnp.ones((1, 32, 32, 32), dtype=bool)

    def loss(p):
        out = render_occ(p, occ, o, d, settings, field.forward,
                         m_budget=o.shape[0] * 32)
        return jnp.mean(out["image"] ** 2)

    g = jax.grad(loss)(field.params)
    total = sum(float(jnp.sum(jnp.abs(l)))
                for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total) and total > 0


def test_grid_update_and_mark():
    cfg = small_cfg()
    field = make_ngp_field(jax.random.PRNGKey(0), cfg)
    march = MarchConfig(bound=1.0, cascades=1, grid_size=16)
    gcfg = GridConfig(march=march, density_thresh=0.01)
    state = init_grid_state(gcfg)

    state = update_density_grid(state, field.params, field.density,
                                jax.random.PRNGKey(1), gcfg, full=True)
    assert int(state["iter_density"]) == 1
    assert float(state["mean_density"]) > 0  # random init sigma ~ e^0
    assert bool(jnp.any(state["occ"]))

    # partial update keeps shapes and advances the counter
    state = update_density_grid(state, field.params, field.density,
                                jax.random.PRNGKey(2), gcfg, full=False)
    assert int(state["iter_density"]) == 2

    # a camera at -z looking at origin covers the front cells only
    pose = np.eye(4, dtype=np.float32)
    pose[2, 3] = -2.0
    state2 = init_grid_state(gcfg)
    state2 = mark_untrained_grid(state2, jnp.asarray(pose[None]),
                                 jnp.asarray([20.0, 20.0, 8.0, 8.0]), gcfg)
    dg = np.asarray(state2["density_grid"])
    assert (dg == -1).any() and (dg == 0).any()


def test_termination_trim_exact_and_effective():
    """Eval-side early termination (render/fast_image.py:
    _termination_trim, the TPU form of the reference's alive-ray kill,
    raymarching.cu:834-914): at the shipping tau=13.8 the bucketed
    render is bit-identical on a trained-like field; at an aggressive
    tau it must actually trim (the machinery is alive); trimmed counts
    decrease monotonically with tau."""
    from sealdnerf_tpu.data.synthetic import make_synthetic_scene
    from sealdnerf_tpu.models.cp import CPConfig, make_cp_field
    from sealdnerf_tpu.train.trainer import TrainOptions
    from sealdnerf_tpu.train.fast import FastTrainer
    from sealdnerf_tpu.render.fast_image import render_image_bucketed
    from sealdnerf_tpu.ops.marching_dense import downsample_occ

    _, train, val = make_synthetic_scene(n_train=8, n_val=1, res=64)
    opt = TrainOptions(iters=400, num_rays=512, bound=1.0, dt_gamma=0.0,
                       grid_size=32, march_res=16, n_intervals=8,
                       steps_per_interval=3, segment_steps=64,
                       workspace="/tmp/term_trim_ws")
    field = make_cp_field(jax.random.PRNGKey(0),
                          CPConfig(bound=1.0, scales=((16, 8), (48, 16)),
                                   planes=()))
    tr = FastTrainer("t", opt, field, workspace="/tmp/term_trim_ws",
                     use_checkpoint="scratch")
    tr.mark_untrained_grid(train.poses, train.intrinsics)
    data = train.device()
    h, w, c, n = train.h, train.w, train.images.shape[-1], len(train)
    for _ in range(6):
        tr.train_segment(data, h, w, c, n, 64)
    occ = downsample_occ(tr.grid_state["occ"][0], tr.render_cfg.march_res)
    params = tr._infer_params()
    pose = jnp.asarray(val.poses[0])
    intr = jnp.asarray(val.intrinsics)
    kw = dict(tile_px=8, planar=False, splits=((0.5, 4), (1.0, 1)))

    def render(term, tau=13.8):
        img, _ = render_image_bucketed(params, occ, pose, intr, 64, 64,
                                       tr.render_cfg, field.forward,
                                       jnp.ones(3), term_probe=term,
                                       term_tau=tau, **kw)
        return np.asarray(img)

    base = render(0)
    np.testing.assert_array_equal(render(8), base)  # tau=13.8: exact
    aggressive = render(8, tau=0.02)
    assert np.abs(aggressive - base).max() > 0.05  # machinery alive
