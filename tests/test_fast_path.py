"""Tests for the round-2 TPU fast path: hat interpolation, the CP field,
the dense two-level march, the dense renderer, and FastTrainer segments.

All run on CPU (conftest forces an 8-device virtual mesh)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sealdnerf_tpu.ops.hat import hat_basis, line_interp
from sealdnerf_tpu.ops.marching_dense import (
    DenseMarchConfig, march_dense, downsample_occ,
)
from sealdnerf_tpu.ops import near_far_from_aabb
from sealdnerf_tpu.models.cp import CPConfig, make_cp_field
from sealdnerf_tpu.render.fast import render_dense


def _ball_occ(res, r=0.5):
    g = jnp.linspace(-1, 1, res)
    x, y, z = jnp.meshgrid(g, g, g, indexing="ij")
    return (x ** 2 + y ** 2 + z ** 2) < r ** 2


def _rays_at_ball(n, key=0):
    """Rays from z=-1.5 pointing forward with small angular spread."""
    k = jax.random.PRNGKey(key)
    o = jnp.tile(jnp.array([[0.0, 0.0, -1.5]]), (n, 1))
    d = jnp.concatenate(
        [0.15 * jax.random.normal(k, (n, 2)), jnp.ones((n, 1))], -1)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


class TestHat:
    def test_rows_sum_to_one(self):
        x = jax.random.uniform(jax.random.PRNGKey(0), (64,))
        u = hat_basis(x, 33, dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(u.sum(-1)), 1.0, atol=1e-5)

    def test_linear_ramp_exact(self):
        x = jnp.array([0.0, 0.1, 0.5, 0.73, 1.0])
        tab = jnp.linspace(0.0, 10.0, 21)[:, None]
        out = line_interp(x, tab, compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(out).ravel(),
                                   np.asarray(x) * 10, atol=1e-4)

    def test_clamps_out_of_range(self):
        tab = jnp.arange(8, dtype=jnp.float32)[:, None]
        out = line_interp(jnp.array([-0.5, 1.5]), tab,
                          compute_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(out).ravel(), [0.0, 7.0])


class TestCPField:
    def test_forward_shapes_and_grads(self):
        cfg = CPConfig(scales=((16, 8), (64, 16)), planes=())
        f = make_cp_field(jax.random.PRNGKey(0), cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (32, 3)) * 0.4
        d = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
        sigma, rgb = f.forward(f.params, x, d)
        assert sigma.shape == (32,) and rgb.shape == (32, 3)
        assert bool(jnp.all(sigma >= 0)) and bool(jnp.all((rgb >= 0)
                                                          & (rgb <= 1)))
        g = jax.grad(lambda p: jnp.sum(f.forward(p, x, d)[0]))(f.params)
        for s in range(2):
            for a in range(3):
                assert float(jnp.abs(g["lines"][s][a]).max()) > 0
        assert float(jnp.abs(g["sigma_mlp"]["w"][0]).max()) > 0

    def test_dx_gradient_flows(self):
        # the D-NeRF deform tower needs d(feature)/dx through the hats
        cfg = CPConfig(scales=((32, 8),), planes=())
        f = make_cp_field(jax.random.PRNGKey(0), cfg)
        x = jnp.array([[0.1, -0.2, 0.3]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        gx = jax.grad(lambda xx: jnp.sum(f.forward(f.params, xx, d)[0]))(x)
        assert float(jnp.abs(gx).max()) > 0


class TestMarchDense:
    def test_samples_inside_occupied(self):
        cfg = DenseMarchConfig(bound=1.0, march_res=32, n_intervals=8,
                               steps_per_interval=4)
        occ = _ball_occ(32)
        o, d = _rays_at_ball(32)
        aabb = jnp.array([-1.0, -1, -1, 1, 1, 1])
        nears, fars = near_far_from_aabb(o, d, aabb, 0.05)
        mr = march_dense(o, d, nears, fars, occ, cfg)
        ts, valid = np.asarray(mr["ts"]), np.asarray(mr["valid"])
        pos = np.asarray(o)[:, None] + ts[..., None] * np.asarray(d)[:, None]
        r = np.linalg.norm(pos, axis=-1)
        vox_diag = np.sqrt(3) * cfg.voxel
        assert r[valid].max() < 0.5 + vox_diag

    def test_ts_ascending(self):
        cfg = DenseMarchConfig(bound=1.0, march_res=32, n_intervals=8,
                               steps_per_interval=4)
        occ = _ball_occ(32)
        o, d = _rays_at_ball(16)
        nears, fars = near_far_from_aabb(
            o, d, jnp.array([-1.0, -1, -1, 1, 1, 1]), 0.05)
        mr = march_dense(o, d, nears, fars, occ, cfg)
        ts, valid = np.asarray(mr["ts"]), np.asarray(mr["valid"])
        for i in range(ts.shape[0]):
            v = ts[i][valid[i]]
            assert np.all(np.diff(v) > 0)

    def test_center_ray_covers_chord(self):
        cfg = DenseMarchConfig(bound=1.0, march_res=32, n_intervals=24,
                               steps_per_interval=4)
        occ = _ball_occ(32)
        o = jnp.array([[0.0, 0.0, -1.5]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        nears, fars = near_far_from_aabb(
            o, d, jnp.array([-1.0, -1, -1, 1, 1, 1]), 0.05)
        mr = march_dense(o, d, nears, fars, occ, cfg)
        ts, valid = np.asarray(mr["ts"])[0], np.asarray(mr["valid"])[0]
        z = -1.5 + ts[valid]
        assert z.min() < -0.45 and z.max() > 0.45  # spans the ball chord

    def test_downsample_occ(self):
        occ = jnp.zeros((64, 64, 64), bool).at[3, 5, 7].set(True)
        ds = downsample_occ(occ, 32)
        assert ds.shape == (32, 32, 32)
        assert bool(ds[1, 2, 3])
        assert int(ds.sum()) == 1

    def test_empty_grid_no_samples(self):
        cfg = DenseMarchConfig(bound=1.0, march_res=16, n_intervals=4,
                               steps_per_interval=2)
        occ = jnp.zeros((16, 16, 16), bool)
        o, d = _rays_at_ball(8)
        nears, fars = near_far_from_aabb(
            o, d, jnp.array([-1.0, -1, -1, 1, 1, 1]), 0.05)
        mr = march_dense(o, d, nears, fars, occ, cfg)
        assert int(mr["counts"].sum()) == 0


class TestRenderDense:
    def test_silhouette(self):
        cfg = DenseMarchConfig(bound=1.0, march_res=32, n_intervals=16,
                               steps_per_interval=4)
        occ = _ball_occ(32)

        def fwd(params, x, d):
            r = jnp.linalg.norm(x, axis=-1)
            sigma = jnp.where(r < 0.5, 200.0, 0.0)
            rgb = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]),
                                   x.shape[:-1] + (3,))
            return sigma, rgb

        hit_o = jnp.array([[0.0, 0.0, -1.5]])
        hit_d = jnp.array([[0.0, 0.0, 1.0]])
        miss_d = jnp.array([[0.6, 0.6, 0.52]])
        miss_d = miss_d / jnp.linalg.norm(miss_d)
        res_hit = render_dense(None, occ, hit_o, hit_d, cfg, fwd,
                               bg_color=jnp.zeros(3))
        res_miss = render_dense(None, occ, hit_o, miss_d, cfg, fwd,
                                bg_color=jnp.zeros(3))
        assert float(res_hit["weights_sum"][0]) > 0.99
        assert float(res_hit["image"][0, 0]) > 0.99
        assert float(res_miss["weights_sum"][0]) < 0.01
        # depth ~ distance to sphere front face (1.0)
        assert abs(float(res_hit["depth"][0]) - 1.0) < 0.1


def test_fast_trainer_ngp_backbone(tmp_path):
    """The bench's NGP-oracle path: FastTrainer segments + staged eval on
    the hash field (the fused Pallas path serves CP only; NGP rides the
    XLA forward inside the same segment machinery)."""
    from sealdnerf_tpu.data.synthetic import make_synthetic_scene
    from sealdnerf_tpu.models.api import make_ngp_field
    from sealdnerf_tpu.models.ngp import NGPConfig
    from sealdnerf_tpu.train.trainer import TrainOptions, Trainer
    from sealdnerf_tpu.train.fast import FastTrainer
    _, train, val = make_synthetic_scene(n_train=6, n_val=1, res=32)
    opt = TrainOptions(iters=200, num_rays=256, bound=1.0, dt_gamma=0.0,
                       grid_size=32, march_res=16, n_intervals=6,
                       steps_per_interval=3, segment_steps=16,
                       update_extra_interval=8, max_ray_batch=512,
                       workspace=str(tmp_path))
    field = make_ngp_field(jax.random.PRNGKey(0),
                           NGPConfig(bound=1.0, num_levels=4,
                                     log2_hashmap_size=12))
    tr = FastTrainer("ngp_fast", opt, field, workspace=str(tmp_path),
                     use_checkpoint="scratch")
    tr.mark_untrained_grid(train.poses, train.intrinsics)
    data = train.device()
    h, w, c, n = train.h, train.w, train.images.shape[-1], len(train)
    m0 = tr.train_segment(data, h, w, c, n, 16)
    m = tr.train_segment(data, h, w, c, n, 16)
    assert np.isfinite(float(m["loss"]))
    # the bench oracle evaluates through the parent's staged render
    img, _ = Trainer.render_image(tr, val.poses[0], val.intrinsics,
                                  val.h, val.w)
    assert img.shape == (32, 32, 3) and np.isfinite(img).all()


class TestFastTrainer:
    @pytest.fixture(scope="class")
    def trainer(self, tmp_path_factory):
        from sealdnerf_tpu.data.synthetic import make_synthetic_scene
        from sealdnerf_tpu.train.trainer import TrainOptions
        from sealdnerf_tpu.train.fast import FastTrainer
        ws = str(tmp_path_factory.mktemp("fast_ws"))
        _, train, val = make_synthetic_scene(n_train=6, n_val=1, res=32)
        opt = TrainOptions(iters=200, num_rays=256, bound=1.0, dt_gamma=0.0,
                           grid_size=32, march_res=16, n_intervals=6,
                           steps_per_interval=3, segment_steps=32,
                           update_extra_interval=8, workspace=ws)
        cfg = CPConfig(bound=1.0, scales=((16, 8), (64, 16)), planes=())
        field = make_cp_field(jax.random.PRNGKey(0), cfg)
        tr = FastTrainer("t", opt, field, workspace=ws,
                         use_checkpoint="scratch")
        tr.mark_untrained_grid(train.poses, train.intrinsics)
        return tr, train, val

    def test_segments_reduce_loss(self, trainer):
        tr, train, val = trainer
        data = train.device()
        h, w, c, n = train.h, train.w, train.images.shape[-1], len(train)
        m0 = tr.train_segment(data, h, w, c, n, 32)
        for _ in range(3):
            m = tr.train_segment(data, h, w, c, n, 32)
        assert float(m["loss"]) < float(m0["loss"])
        assert tr.global_step == 128
        assert int(tr.grid_state["iter_density"]) == 16

    def test_render_image(self, trainer):
        tr, train, val = trainer
        img, depth = tr.render_image(val.poses[0], val.intrinsics,
                                     val.h, val.w)
        assert img.shape == (32, 32, 3) and depth.shape == (32, 32)
        assert np.isfinite(img).all()

    def test_depth_roundtrip_through_packed_frame(self, trainer):
        """u8+f16 frame packing: depth must survive the byte roundtrip."""
        tr, train, val = trainer
        img, dep = tr.render_image(val.poses[0], val.intrinsics,
                                   val.h, val.w)
        assert np.isfinite(dep).all()
        assert dep.max() < 100.0 and dep.min() >= 0.0
        # rgb is u8-quantized: all values on the 1/255 lattice
        q = img * 255.0
        assert np.abs(q - np.round(q)).max() < 1e-3

    def test_yuv420_wire_format_matches_rgb8(self, trainer):
        """The GUI wire format (Y full-res + 2x2-subsampled chroma +
        half-res f16 depth) must reproduce the rgb8 frame up to chroma
        subsampling error; depth must agree exactly at the kept pixels."""
        tr, train, val = trainer
        img, dep = tr.render_image(val.poses[0], val.intrinsics,
                                   val.h, val.w)
        h2 = tr.render_image_async(val.poses[0], val.intrinsics,
                                   val.h, val.w, pack="yuv420")
        img_y, dep_y = h2.get()
        assert img_y.shape == img.shape and dep_y.shape == dep.shape
        # luma is full-res: the Y-projected error is quantization only
        ly = (0.299 * img[..., 0] + 0.587 * img[..., 1]
              + 0.114 * img[..., 2])
        ly2 = (0.299 * img_y[..., 0] + 0.587 * img_y[..., 1]
               + 0.114 * img_y[..., 2])
        assert np.abs(ly - ly2).max() < 0.02
        # rgb differs only by chroma subsampling (smooth scenes: small)
        assert np.abs(img - img_y).mean() < 0.03
        np.testing.assert_allclose(dep_y[::2, ::2], dep[::2, ::2],
                                   atol=1e-3)
        # the depth-free preview pack: same rgb, depth=None, and its
        # wire is exactly the yuv420 planes minus the depth bytes
        h3 = tr.render_image_async(val.poses[0], val.intrinsics,
                                   val.h, val.w, pack="preview")
        img_p, dep_p = h3.get()
        assert dep_p is None
        np.testing.assert_allclose(img_p, img_y, atol=1e-6)
        # prefetch=True fetches on the background pool; same frame
        h4 = tr.render_image_async(val.poses[0], val.intrinsics,
                                   val.h, val.w, pack="preview",
                                   prefetch=True)
        img_f, dep_f = h4.get()
        assert dep_f is None
        np.testing.assert_allclose(img_f, img_p, atol=1e-6)

    def test_checkpoint_roundtrip(self, trainer):
        tr, train, val = trainer
        tr.save_checkpoint(full=True)
        import glob, os
        ck = sorted(glob.glob(os.path.join(tr.workspace, "checkpoints",
                                           "*.npz")))[-1]
        step = tr.global_step
        loss_params = jax.tree_util.tree_leaves(tr.params)[0]
        tr.load_checkpoint(ck)
        assert tr.global_step == step
        np.testing.assert_array_equal(
            np.asarray(jax.tree_util.tree_leaves(tr.params)[0]),
            np.asarray(loss_params))


class TestPallasField:
    def test_parity_vs_xla(self):
        """Fused kernel (interpret mode on CPU) == cp_forward exactly for
        f32-representable cases (same bf16 matmul layout)."""
        from sealdnerf_tpu.ops.pallas_field import cp_forward_fused
        cfg = CPConfig(bound=1.0, scales=((8, 8), (16, 16)), planes=())
        f = make_cp_field(jax.random.PRNGKey(3), cfg)
        k1, k2 = jax.random.split(jax.random.PRNGKey(4))
        x = jax.random.uniform(k1, (100, 3), minval=-1.0, maxval=1.0)
        d = jax.random.normal(k2, (100, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        s0, r0 = f.forward(f.params, x, d)
        s1, r1 = cp_forward_fused(f.params, cfg, x, d, tile=64,
                                  interpret=True)
        np.testing.assert_allclose(np.asarray(s0), np.asarray(s1),
                                   rtol=2e-2, atol=1e-4)
        np.testing.assert_allclose(np.asarray(r0), np.asarray(r1),
                                   rtol=2e-2, atol=1e-3)

    def test_parity_vs_xla_with_planes(self):
        """VM plane-line scales (cfg.planes) evaluate identically in the
        fused kernel and the XLA path."""
        from sealdnerf_tpu.ops.pallas_field import cp_forward_fused
        cfg = CPConfig(bound=1.0, scales=((8, 8), (16, 16)),
                       planes=((8, 4), (16, 2)))
        f = make_cp_field(jax.random.PRNGKey(7), cfg)
        assert "planes" in f.params and len(f.params["planes"]) == 2
        k1, k2 = jax.random.split(jax.random.PRNGKey(8))
        x = jax.random.uniform(k1, (100, 3), minval=-1.0, maxval=1.0)
        d = jax.random.normal(k2, (100, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        s0, r0 = f.forward(f.params, x, d)
        s1, r1 = cp_forward_fused(f.params, cfg, x, d, tile=64,
                                  interpret=True)
        np.testing.assert_allclose(np.asarray(s0), np.asarray(s1),
                                   rtol=2e-2, atol=1e-4)
        np.testing.assert_allclose(np.asarray(r0), np.asarray(r1),
                                   rtol=2e-2, atol=1e-3)

    def test_lod_skip_matches_zeroed_lines(self):
        """Mip-LOD (lod_skip): the kernel skipping scale s equals the XLA
        forward with that scale's line tables zeroed (identical towers,
        zero feature rows)."""
        from sealdnerf_tpu.ops.pallas_field import cp_forward_fused_planar
        cfg = CPConfig(bound=1.0, scales=((8, 8), (16, 16), (32, 8)),
                       planes=((8, 4),))
        f = make_cp_field(jax.random.PRNGKey(11), cfg)
        k1, k2 = jax.random.split(jax.random.PRNGKey(12))
        x = jax.random.uniform(k1, (100, 3), minval=-1.0, maxval=1.0)
        d = jax.random.normal(k2, (100, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        pz = dict(f.params)
        pz["lines"] = [[jnp.zeros_like(a) for a in ax] if s == 2 else ax
                       for s, ax in enumerate(f.params["lines"])]
        s0, r0 = f.forward(pz, x, d)
        out = cp_forward_fused_planar(f.params, cfg, x.T, d.T, tile=64,
                                      interpret=True, lod_skip=(2,))
        np.testing.assert_allclose(np.asarray(s0), np.asarray(out[0]),
                                   rtol=2e-2, atol=1e-4)
        np.testing.assert_allclose(np.asarray(r0), np.asarray(out[1:4].T),
                                   rtol=2e-2, atol=1e-3)

    def test_padding_tail(self):
        """S not a multiple of the tile: tail rows are exact, pad ignored."""
        from sealdnerf_tpu.ops.pallas_field import cp_forward_fused
        cfg = CPConfig(bound=1.0, scales=((8, 4),), planes=())
        f = make_cp_field(jax.random.PRNGKey(5), cfg)
        x = jax.random.uniform(jax.random.PRNGKey(6), (33, 3),
                               minval=-1.0, maxval=1.0)
        d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (33, 1))
        s1, r1 = cp_forward_fused(f.params, cfg, x, d, tile=32,
                                  interpret=True)
        assert s1.shape == (33,) and r1.shape == (33, 3)
        s0, _ = f.forward(f.params, x, d)
        np.testing.assert_allclose(np.asarray(s0), np.asarray(s1),
                                   rtol=2e-2, atol=1e-4)


class TestTiledRender:
    def test_matches_per_ray_render(self):
        """Tile-band render == per-ray dense render on a solid ball
        (the conservative band only adds zero-density samples)."""
        from sealdnerf_tpu.render.fast_image import render_image_tiled
        cfg = DenseMarchConfig(bound=1.0, march_res=32, n_intervals=16,
                               steps_per_interval=4)
        occ = _ball_occ(32)

        def fwd(params, x, d):
            r = jnp.linalg.norm(x, axis=-1)
            sigma = jnp.where(r < 0.5, 100.0, 0.0)
            rgb = jnp.stack([jnp.clip(x[..., 0] + 0.5, 0, 1),
                             jnp.clip(x[..., 1] + 0.5, 0, 1),
                             jnp.broadcast_to(0.5, x.shape[:-1])], -1)
            return sigma, rgb

        rh = rw = 32
        pose = jnp.eye(4).at[2, 3].set(-2.0).at[2, 2].set(1.0)
        intr = jnp.array([32.0, 32.0, rw / 2, rh / 2])
        img_t, dep_t = render_image_tiled(
            None, occ, pose, intr, rh, rw, cfg, fwd,
            jnp.zeros(3), tile_px=8, dilate=1)

        from sealdnerf_tpu.data.rays import get_rays
        from sealdnerf_tpu.ops import near_far_from_aabb
        rays = get_rays(jax.random.PRNGKey(0), pose[None], intr, rh, rw, -1)
        res = render_dense(None, occ, rays["rays_o"][0], rays["rays_d"][0],
                           cfg, fwd, bg_color=jnp.zeros(3))
        img_r = np.asarray(res["image"]).reshape(rh, rw, 3)
        # agreement on the solid interior; silhouette pixels may differ by
        # a voxel of band placement
        diff = np.abs(np.asarray(img_t) - np.clip(img_r, 0, 1))
        assert np.quantile(diff, 0.95) < 0.05, float(diff.max())

    def test_empty_scene_is_background(self):
        from sealdnerf_tpu.render.fast_image import render_image_tiled
        cfg = DenseMarchConfig(bound=1.0, march_res=16, n_intervals=4,
                               steps_per_interval=2)
        occ = jnp.zeros((16, 16, 16), bool)

        def fwd(params, x, d):
            return jnp.full(x.shape[:-1], 100.0), jnp.ones(x.shape[:-1] + (3,))

        pose = jnp.eye(4).at[2, 3].set(-2.0)
        intr = jnp.array([16.0, 16.0, 8.0, 8.0])
        img, dep = render_image_tiled(None, occ, pose, intr, 16, 16, cfg,
                                      fwd, jnp.array([0.2, 0.4, 0.6]),
                                      tile_px=8, dilate=1)
        np.testing.assert_allclose(np.asarray(img),
                                   np.broadcast_to([0.2, 0.4, 0.6],
                                                   (16, 16, 3)), atol=1e-5)

    def test_sharded_image_render_matches_single(self):
        """Row-band sharded eval == single-device tiled render."""
        from sealdnerf_tpu.render.fast_image import (
            render_image_tiled, make_sharded_image_renderer)
        from sealdnerf_tpu.parallel.mesh import make_mesh
        cfg = DenseMarchConfig(bound=1.0, march_res=32, n_intervals=8,
                               steps_per_interval=2)
        occ = _ball_occ(32)

        def fwd(params, x, d):
            r = jnp.linalg.norm(x, axis=-1)
            return jnp.where(r < 0.5, 100.0, 0.0), \
                jnp.broadcast_to(jnp.array([0.9, 0.4, 0.1]),
                                 x.shape[:-1] + (3,))

        rh = rw = 64
        pose = jnp.eye(4).at[2, 3].set(-2.0)
        intr = jnp.array([64.0, 64.0, rw / 2, rh / 2])
        bg = jnp.zeros(3)
        img1, dep1 = render_image_tiled(None, occ, pose, intr, rh, rw, cfg,
                                        fwd, bg, tile_px=8, dilate=1)
        mesh = make_mesh(jax.devices()[:8])
        rfn = make_sharded_image_renderer(mesh, rh, rw, cfg, fwd, tile_px=8,
                                          dilate=1)
        img8, dep8 = rfn(None, occ, pose, intr, bg)
        np.testing.assert_allclose(np.asarray(img8), np.asarray(img1),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(dep8), np.asarray(dep1),
                                   atol=1e-4)

    def test_sharded_dynamic_render_matches_single(self):
        """Time-conditioned row-band sharded eval == single-device render
        at the same t (VERDICT r2 missing #4)."""
        from sealdnerf_tpu.render.fast_image import (
            render_image_tiled, make_sharded_image_renderer)
        from sealdnerf_tpu.parallel.mesh import make_mesh
        cfg = DenseMarchConfig(bound=1.0, march_res=32, n_intervals=8,
                               steps_per_interval=2)
        occ = _ball_occ(32)

        def fwd(params, x, d, t):
            # time modulates radius and color so a wrong/missing t shows
            r = jnp.linalg.norm(x, axis=-1)
            sig = jnp.where(r < 0.35 + 0.2 * t, 100.0, 0.0)
            rgb = jnp.stack([jnp.broadcast_to(t, x.shape[:-1]),
                             jnp.clip(x[..., 1] + 0.5, 0, 1),
                             jnp.broadcast_to(0.5, x.shape[:-1])], -1)
            return sig, rgb

        rh = rw = 64
        pose = jnp.eye(4).at[2, 3].set(-2.0)
        intr = jnp.array([64.0, 64.0, rw / 2, rh / 2])
        bg = jnp.zeros(3)
        mesh = make_mesh(jax.devices()[:8])
        rfn = make_sharded_image_renderer(mesh, rh, rw, cfg, fwd, tile_px=8,
                                          dilate=1, time_conditioned=True)
        for t in (0.15, 0.8):
            tv = jnp.asarray(t, jnp.float32)
            img1, dep1 = render_image_tiled(None, occ, pose, intr, rh, rw,
                                            cfg, fwd, bg, tile_px=8,
                                            dilate=1, extra=(tv,))
            img8, dep8 = rfn(None, occ, pose, intr, bg, tv)
            np.testing.assert_allclose(np.asarray(img8), np.asarray(img1),
                                       atol=1e-5)
            np.testing.assert_allclose(np.asarray(dep8), np.asarray(dep1),
                                       atol=1e-4)

    def test_sharded_bucketed_matches_single_bucketed(self):
        """Buckets compose with row-band sharding: each band sorts its own
        tiles; a truncation-free occupancy must match exactly."""
        from sealdnerf_tpu.render.fast_image import (
            render_image_bucketed, make_sharded_image_renderer)
        from sealdnerf_tpu.parallel.mesh import make_mesh
        cfg = DenseMarchConfig(bound=1.0, march_res=32, n_intervals=8,
                               steps_per_interval=2)
        occ = _ball_occ(32, r=0.3)

        def fwd(params, x, d):
            r = jnp.linalg.norm(x, axis=-1)
            return jnp.where(r < 0.3, 100.0, 0.0), \
                jnp.broadcast_to(jnp.array([0.9, 0.4, 0.1]),
                                 x.shape[:-1] + (3,))

        rh = rw = 64
        pose = jnp.eye(4).at[2, 3].set(-2.0)
        intr = jnp.array([64.0, 64.0, rw / 2, rh / 2])
        bg = jnp.array([0.1, 0.2, 0.3])
        splits = ((0.55, 4), (0.30, 2), (1.0, 1))
        img1, _ = render_image_bucketed(None, occ, pose, intr, rh, rw, cfg,
                                        fwd, bg, tile_px=8, dilate=1,
                                        planar=False, splits=splits)
        mesh = make_mesh(jax.devices()[:8])
        rfn = make_sharded_image_renderer(mesh, rh, rw, cfg, fwd, tile_px=8,
                                          dilate=1, buckets=True,
                                          splits=splits)
        img8, _ = rfn(None, occ, pose, intr, bg)
        # band-local sorting can only move truncation boundaries; on a
        # truncation-free occupancy both must match the tiled reference
        np.testing.assert_allclose(np.asarray(img8), np.asarray(img1),
                                   atol=1e-5)


@pytest.mark.slow
class TestFastDynamic:
    """Time-conditioned fast path: CP-D-NeRF field + in-graph dynamic grid
    round-robin + time-routed tile-band rendering."""

    @pytest.fixture(scope="class")
    def trainer(self, tmp_path_factory):
        from sealdnerf_tpu.data.synthetic import make_synthetic_scene
        from sealdnerf_tpu.models.cp import (CPDNeRFConfig,
                                             make_cp_dnerf_field)
        from sealdnerf_tpu.train.trainer import TrainOptions
        from sealdnerf_tpu.train.fast import FastTrainer
        ws = str(tmp_path_factory.mktemp("fastdyn"))
        _, train, val = make_synthetic_scene(n_train=6, n_val=1, res=32,
                                             dynamic=True)
        opt = TrainOptions(iters=200, num_rays=256, bound=1.0, dt_gamma=0.0,
                           grid_size=32, march_res=16, n_intervals=6,
                           steps_per_interval=3, segment_steps=16,
                           update_extra_interval=4, workspace=ws)
        cfg = CPDNeRFConfig(bound=1.0, scales=((16, 8), (64, 16)),
                            num_layers_deform=3, hidden_dim_deform=32, planes=())
        field = make_cp_dnerf_field(jax.random.PRNGKey(0), cfg)
        tr = FastTrainer("dyn", opt, field, workspace=ws,
                         use_checkpoint="scratch", time_conditioned=True)
        # small dynamic grid for CPU tests
        import dataclasses
        tr.dyn_grid_cfg = dataclasses.replace(tr.dyn_grid_cfg, time_size=8,
                                              bins_per_call=4)
        from sealdnerf_tpu.render.dynamic_grid import init_dyn_grid_state
        tr.grid_state = init_dyn_grid_state(tr.dyn_grid_cfg)
        tr.mark_untrained_grid(train.poses, train.intrinsics)
        return tr, train, val

    def test_dyn_segments_reduce_loss(self, trainer):
        tr, train, val = trainer
        data = train.device()
        h, w, cc, n = train.h, train.w, train.images.shape[-1], len(train)
        m0 = tr.train_segment(data, h, w, cc, n, 16)
        for _ in range(5):
            m = tr.train_segment(data, h, w, cc, n, 16)
        assert float(m["loss"]) < float(m0["loss"])
        assert int(tr.grid_state["iter_density"]) > 0
        assert int(tr.grid_state["bin_cursor"]) >= 0

    def test_dyn_render_image_times(self, trainer):
        tr, train, val = trainer
        img0, dep0 = tr.render_image(val.poses[0], val.intrinsics,
                                     val.h, val.w, time=0.0)
        img1, dep1 = tr.render_image(val.poses[0], val.intrinsics,
                                     val.h, val.w, time=0.9)
        assert img0.shape == (32, 32, 3)
        assert np.isfinite(img0).all() and np.isfinite(img1).all()

    def test_dyn_freeze_calls_reference_step_horizon(self, trainer):
        """The freeze threshold lands at the reference's step horizon
        (100 updates x 16-step interval = step 1600, dnerf/
        renderer.py:454-520), independent of our call cadence."""
        tr, train, val = trainer
        upd = tr._segment_update_interval()
        wc = tr._warmup_calls()
        fz = tr._dyn_freeze_calls(upd)
        warmup_span = wc * upd
        freeze_step = warmup_span + (fz - wc) * 2 * upd
        horizon = 16 * tr.dyn_grid_cfg.freeze_after
        assert warmup_span <= horizon
        assert abs(freeze_step - horizon) < 2 * upd

    def test_warm_renderers_builds_both_bucket_variants(self, trainer):
        tr, train, val = trainer
        tr.warm_renderers(val.h, val.w, pose=val.poses[0],
                          intrinsics=val.intrinsics, time=0.5)
        variants = {k[3] for k in tr._renderers
                    if k[0] == val.h and k[4] == "rgb8"}
        assert variants == {False, True}


class TestCoarseToFineAnneal:
    """BARF-style dynamic annealing (TrainOptions.dyn_anneal_steps): a
    pure column scaling of the first sigma matrix, so fine scales/planes
    contribute 0 at step 0 and exactly the raw params after the ramp."""

    def _trainer(self, tmp_path, **opt_kw):
        from sealdnerf_tpu.models.cp import (CPDNeRFConfig,
                                             make_cp_dnerf_field)
        from sealdnerf_tpu.train.trainer import TrainOptions
        from sealdnerf_tpu.train.fast import FastTrainer
        opt = TrainOptions(iters=100, num_rays=32, bound=1.0,
                           grid_size=16, march_res=16, n_intervals=4,
                           steps_per_interval=2, segment_steps=4,
                           workspace=str(tmp_path), **opt_kw)
        cfg = CPDNeRFConfig(bound=1.0, scales=((16, 8), (512, 4)),
                            planes=((8, 2),), num_layers_deform=2,
                            hidden_dim_deform=8)
        field = make_cp_dnerf_field(jax.random.PRNGKey(0), cfg)
        return FastTrainer("ann", opt, field, workspace=str(tmp_path),
                           use_checkpoint="scratch",
                           time_conditioned=True), cfg

    def test_mask_rows_and_endpoints(self, tmp_path):
        tr, cfg = self._trainer(tmp_path, dyn_anneal_steps=64,
                                dyn_anneal_res=256)
        from sealdnerf_tpu.ops.freq_encode import freq_output_dim
        mask = np.asarray(tr._anneal_mask)
        assert mask.shape == (cfg.feat_dim,)
        # rows: 8 (res16, coarse) + 4 (res512, fine) + 6 (planes res8,
        # coarse) + freq
        assert not mask[:8].any() and mask[8:12].all()
        assert not mask[12:18].any()
        assert not mask[-freq_output_dim(3, cfg.freq_degree):].any()
        p0 = tr._anneal_params(tr.params, 0)
        w0 = np.asarray(p0["sigma_mlp"]["w"][0])
        assert np.all(w0[8:12] == 0.0)
        assert np.array_equal(w0[:8],
                              np.asarray(tr.params["sigma_mlp"]["w"][0][:8]))
        pfull = tr._anneal_params(tr.params, 64)
        np.testing.assert_array_equal(
            np.asarray(pfull["sigma_mlp"]["w"][0]),
            np.asarray(tr.params["sigma_mlp"]["w"][0]))
        # only the sigma tower is touched
        for s in range(len(cfg.scales)):
            for a in range(3):
                assert p0["lines"][s][a] is tr.params["lines"][s][a]

    def test_off_when_no_fine_scales(self, tmp_path):
        tr, _ = self._trainer(tmp_path, dyn_anneal_steps=64,
                              dyn_anneal_res=512)
        assert tr._anneal_mask is None

    def test_student_disables_anneal(self, tmp_path):
        from sealdnerf_tpu.editing.student import FastStudentTrainer
        assert FastStudentTrainer._build_anneal_mask(object()) is None


class TestBucketedRender:
    """render_image_bucketed is the renderer behind the bench's
    PSNR/SSIM/FPS once occ_frac < 0.15 (train/fast.py:_use_buckets);
    VERDICT r2 weak #3: it had zero tests."""

    cfg = DenseMarchConfig(bound=1.0, march_res=16, n_intervals=8,
                           steps_per_interval=2)

    @staticmethod
    def _fwd(params, x, d):
        r = jnp.linalg.norm(x, axis=-1)
        sigma = jnp.where(r < 0.45, 80.0, 0.0)
        rgb = jnp.stack([jnp.clip(x[..., 0] + 0.5, 0, 1),
                         jnp.clip(x[..., 1] + 0.5, 0, 1),
                         jnp.broadcast_to(0.5, x.shape[:-1])], -1)
        return sigma, rgb

    @staticmethod
    def _cam(rh, rw):
        pose = jnp.eye(4).at[2, 3].set(-2.0)
        intr = jnp.array([float(rw), float(rh), rw / 2, rh / 2])
        return pose, intr

    def _render_both(self, occ, splits):
        from sealdnerf_tpu.render.fast_image import (render_image_tiled,
                                                     render_image_bucketed)
        rh = rw = 32
        pose, intr = self._cam(rh, rw)
        bg = jnp.array([0.1, 0.2, 0.3])
        img_t, dep_t = render_image_tiled(
            None, occ, pose, intr, rh, rw, self.cfg, self._fwd, bg,
            tile_px=4, dilate=1, planar=False)
        img_b, dep_b = render_image_bucketed(
            None, occ, pose, intr, rh, rw, self.cfg, self._fwd, bg,
            tile_px=4, dilate=1, planar=False, splits=splits)
        return np.asarray(img_t), np.asarray(img_b), np.asarray(dep_t), \
            np.asarray(dep_b)

    def _tile_budgets_and_counts(self, occ, splits, rh=32, rw=32, tp=4):
        """Replicate the renderer's bucket assignment: per-tile occupied
        interval count and the interval budget its bucket grants."""
        from sealdnerf_tpu.render.fast_image import _tile_major
        from sealdnerf_tpu.ops.marching_dense import (dilate_occ,
                                                      march_intervals)
        from sealdnerf_tpu.data.rays import get_rays
        from sealdnerf_tpu.ops import near_far_from_aabb
        th, tw = rh // tp, rw // tp
        pose, intr = self._cam(rh, rw)
        occ_d = dilate_occ(occ, 1)
        trr = get_rays(jax.random.PRNGKey(0), pose[None], intr / tp,
                       th, tw, -1)
        to, td = trr["rays_o"][0], trr["rays_d"][0]
        b = self.cfg.bound
        aabb = jnp.array([-b] * 3 + [b] * 3, dtype=jnp.float32)
        tnear, tfar = near_far_from_aabb(to, td, aabb, self.cfg.min_near)
        tfar = tfar + self.cfg.voxel * 2
        _, iv = march_intervals(to, td, tnear, tfar, occ_d, self.cfg)
        counts = np.asarray(jnp.sum(iv.astype(jnp.int32), -1))
        order = np.argsort(counts, kind="stable")
        n_tiles = th * tw
        sc = self.cfg.n_intervals
        budgets = np.zeros(n_tiles, np.int32)
        start = 0
        for i, (frac, div) in enumerate(splits):
            end = n_tiles if i == len(splits) - 1 else \
                min(start + int(round(n_tiles * frac)), n_tiles)
            budgets[order[start:end]] = max(sc // div, 1)
            start = end
        return counts, budgets

    def test_sparse_occupancy_matches_tiled(self):
        """Trained-like sparse occupancy: every tile's count fits its
        bucket budget, so bucketed == tiled bit-for-bit (same samples,
        masked tails contribute zero)."""
        occ = _ball_occ(16, r=0.3)
        splits = ((0.55, 4), (0.30, 2), (1.0, 1))
        counts, budgets = self._tile_budgets_and_counts(occ, splits)
        assert (counts <= budgets).all(), "fixture must be truncation-free"
        img_t, img_b, dep_t, dep_b = self._render_both(occ, splits)
        np.testing.assert_allclose(img_b, img_t, atol=1e-5)
        np.testing.assert_allclose(dep_b, dep_t, atol=1e-4)

    def test_adversarial_occupancy_subsamples_over_budget_tiles(self):
        """Occupancy dense enough that small buckets overflow. Over-
        budget tiles are SUBSAMPLED across their depth range (coarser
        steps, coverage conserved), never cut: positional truncation
        dropped geometry outright on dense tile populations -- the r4
        bench's band-crop anchor read 15.6 PSNR against a full-image
        28.9, an impossible pair for a correct crop (the band is 1/4 of
        the rows, so full <= band + 6 dB)."""
        occ = _ball_occ(16, r=0.85)        # fat ball: most tiles full
        splits = ((0.55, 4), (0.30, 2), (1.0, 1))
        counts, budgets = self._tile_budgets_and_counts(occ, splits)
        over = counts > budgets
        assert over.any(), "fixture must actually overflow some buckets"
        img_t, img_b, dep_t, dep_b = self._render_both(occ, splits)
        tp, th, tw = 4, 8, 8
        diff = np.abs(img_b - img_t).max(axis=-1)
        tile_diff = diff.reshape(th, tp, tw, tp).max(axis=(1, 3)).reshape(-1)
        assert (tile_diff[~over] < 1e-5).all(), float(tile_diff[~over].max())
        # geometry preservation: coarser in-interval sampling may lose a
        # few GRAZING pixels (fine samples straddling a thin
        # intersection -- an LOD artifact, bounded by the stride), but
        # never whole depth ranges; and the mean coarsening error stays
        # small (measured: 6/172 grazing pixels, mean diff 0.0018 on
        # this fixture)
        hit_t, hit_b = dep_t > 1e-3, dep_b > 1e-3
        missed = (hit_t & ~hit_b).sum()
        assert missed <= 0.05 * hit_t.sum(), (int(missed),
                                              int(hit_t.sum()))
        assert np.abs(img_b - img_t).mean() < 0.01

    def test_subsample_intervals_identity_and_conservation(self):
        """subsample_intervals: exact re-packing when count <= budget;
        coverage (sum of stretched steps == count * voxel) conserved
        and entries an ascending subset when count > budget."""
        from sealdnerf_tpu.ops.marching_dense import subsample_intervals
        rng = np.random.RandomState(0)
        sc, vox = 12, 0.125
        counts = np.array([0, 1, 3, 4, 5, 7, 9, 12])
        te = np.zeros((len(counts), sc), np.float32)
        iv = np.zeros((len(counts), sc), bool)
        for r, c in enumerate(counts):
            ts = np.sort(rng.rand(c)).astype(np.float32)
            te[r, :c] = ts
            iv[r, :c] = True
        for sc_b in (4, 6, 12):
            o_te, o_iv, o_dt = map(np.asarray, subsample_intervals(
                jnp.asarray(te), jnp.asarray(iv), sc_b, voxel=vox))
            for r, c in enumerate(counts):
                sel_te = o_te[r][o_iv[r]]
                # coverage conserved exactly
                np.testing.assert_allclose(o_dt[r][o_iv[r]].sum(),
                                           c * vox, rtol=1e-6)
                # entries are a subset of the source, ascending
                assert np.isin(sel_te, te[r, :c]).all()
                assert (np.diff(sel_te) > 0).all() or len(sel_te) <= 1
                if c <= sc_b:   # identity: full interval set, unit steps
                    assert len(sel_te) == c
                    np.testing.assert_allclose(np.sort(sel_te), te[r, :c])
                    np.testing.assert_allclose(o_dt[r][o_iv[r]], vox)
                else:           # budget respected, first+coverage kept
                    assert len(sel_te) == sc_b
                    assert sel_te[0] == te[r, 0]

    def test_subsample_intervals_cascade_dt(self):
        """Per-interval dt (cascade march): a run is priced at its first
        interval's pitch times the run length."""
        from sealdnerf_tpu.ops.marching_dense import subsample_intervals
        te = jnp.asarray(np.arange(8, dtype=np.float32)[None] / 8.0)
        iv = jnp.ones((1, 8), bool)
        dt = jnp.asarray((np.arange(8, dtype=np.float32)[None] + 1) / 64)
        o_te, o_iv, o_dt = map(np.asarray,
                               subsample_intervals(te, iv, 4, iv_dt=dt))
        assert o_iv.all()
        np.testing.assert_allclose(o_te[0], [0.0, 0.25, 0.5, 0.75])
        # runs [0,1],[2,3],[4,5],[6,7] at first-of-run pitch x 2
        np.testing.assert_allclose(o_dt[0],
                                   np.array([1, 3, 5, 7]) / 64 * 2)

    def test_use_buckets_gate(self):
        """FastTrainer._use_buckets: dense occupancy (early training,
        indoor scenes) must route to the untruncated tiled path."""
        from sealdnerf_tpu.train.fast import FastTrainer
        tr = object.__new__(FastTrainer)   # gate only touches these attrs
        tr._occ_frac = None
        tr.grid_state = {"occ": jnp.ones((1, 16, 16, 16), bool)}
        assert tr._use_buckets() is False
        tr._occ_frac = None
        tr.grid_state = {"occ": jnp.zeros((1, 16, 16, 16), bool)
                         .at[0, 8, 8, 8].set(True)}
        assert tr._use_buckets() is True


class TestFusedTrainKernel:
    def test_gradient_parity_within_bf16_noise(self):
        """Fused Pallas backward vs XLA autodiff: both are bf16 paths, so
        each is compared against the f32 reference; the fused kernel must
        not be meaningfully noisier than the XLA path it replaces."""
        from sealdnerf_tpu.models.cp import CPConfig, init_cp, cp_forward
        from sealdnerf_tpu.ops.pallas_field import cp_train_fused
        cfg = CPConfig(bound=1.0, scales=((8, 8), (16, 16)), planes=())
        params = init_cp(jax.random.PRNGKey(0), cfg)
        s = 96
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.rand(s, 3).astype(np.float32) * 2 - 1)
        d0 = rng.randn(s, 3).astype(np.float32)
        d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
        d = jnp.asarray(d0)
        w = jnp.asarray(rng.rand(s).astype(np.float32))
        cw = jnp.asarray(rng.rand(s, 3).astype(np.float32))

        def loss_xla(p):
            sig, r = cp_forward(p, cfg, x, d)
            return jnp.sum(sig * w) + jnp.sum(r * cw)

        def loss_fused(p):
            out = cp_train_fused(cfg, 64, True, p, x.T, d.T)
            return jnp.sum(out[0] * w) + jnp.sum(out[1:4].T * cw)

        l0, g_xla = jax.value_and_grad(loss_xla)(params)
        l1, g_fused = jax.value_and_grad(loss_fused)(params)
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-3)
        for (k, v0), (_, v1) in zip(
                jax.tree_util.tree_leaves_with_path(g_xla),
                jax.tree_util.tree_leaves_with_path(g_fused)):
            denom = np.abs(np.asarray(v0)).max() + 1e-6
            err = np.abs(np.asarray(v0) - np.asarray(v1)).max() / denom
            # measured bf16-vs-f32 noise on this config reaches ~0.21 on
            # the fine tables; the fused path must stay in that regime
            assert err < 0.35, (jax.tree_util.keystr(k), err)

    def test_gradient_parity_with_planes(self):
        """VM plane/vm_line gradients from the fused Pallas backward match
        XLA autodiff within the bf16 noise envelope."""
        from sealdnerf_tpu.models.cp import CPConfig, init_cp, cp_forward
        from sealdnerf_tpu.ops.pallas_field import cp_train_fused
        cfg = CPConfig(bound=1.0, scales=((8, 8),), planes=((8, 4), (16, 2)))
        params = init_cp(jax.random.PRNGKey(2), cfg)
        s = 96
        rng = np.random.RandomState(4)
        x = jnp.asarray(rng.rand(s, 3).astype(np.float32) * 2 - 1)
        d0 = rng.randn(s, 3).astype(np.float32)
        d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
        d = jnp.asarray(d0)
        w = jnp.asarray(rng.rand(s).astype(np.float32))
        cw = jnp.asarray(rng.rand(s, 3).astype(np.float32))

        def loss_xla(p):
            sig, r = cp_forward(p, cfg, x, d)
            return jnp.sum(sig * w) + jnp.sum(r * cw)

        def loss_fused(p):
            out = cp_train_fused(cfg, 64, True, p, x.T, d.T)
            return jnp.sum(out[0] * w) + jnp.sum(out[1:4].T * cw)

        l0, g_xla = jax.value_and_grad(loss_xla)(params)
        l1, g_fused = jax.value_and_grad(loss_fused)(params)
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-3)
        for (k, v0), (_, v1) in zip(
                jax.tree_util.tree_leaves_with_path(g_xla),
                jax.tree_util.tree_leaves_with_path(g_fused)):
            denom = np.abs(np.asarray(v0)).max() + 1e-6
            err = np.abs(np.asarray(v0) - np.asarray(v1)).max() / denom
            assert err < 0.35, (jax.tree_util.keystr(k), err)
        # the plane grads themselves must be non-trivial (the test would
        # silently pass if the kernel ignored the planes AND the XLA path
        # did too)
        assert float(jnp.abs(g_fused["planes"][0][0]).max()) > 0.0
        assert float(jnp.abs(g_fused["vm_lines"][1][2]).max()) > 0.0

    def test_input_grads_are_zero(self):
        """x/d are non-differentiable through the fused train op (static
        scenes; the dynamic path keeps the XLA field for d(deform)/dx)."""
        from sealdnerf_tpu.models.cp import CPConfig, init_cp
        from sealdnerf_tpu.ops.pallas_field import cp_train_fused
        cfg = CPConfig(bound=1.0, scales=((8, 4),), planes=())
        params = init_cp(jax.random.PRNGKey(0), cfg)
        x = jnp.zeros((32, 3))
        d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (32, 1))
        gx = jax.grad(lambda xx: jnp.sum(
            cp_train_fused(cfg, 32, True, params, xx.T, d.T)))(x)
        assert float(jnp.abs(gx).max()) == 0.0


class TestDynFusedTrainKernel:
    def test_gradient_parity_within_bf16_noise(self):
        """Fused Pallas dynamic backward (deform tower in-kernel) vs XLA
        autodiff of cp_dnerf_forward: every leaf including the deform
        weights must match within the bf16-path noise envelope."""
        from sealdnerf_tpu.models.cp import (CPDNeRFConfig, init_cp_dnerf,
                                             cp_dnerf_forward)
        from sealdnerf_tpu.ops.pallas_field import cp_dnerf_train_fused
        cfg = CPDNeRFConfig(bound=1.0, scales=((8, 8), (16, 16)),
                            planes=((8, 2),),  # warp grads flow through
                            num_layers_deform=3, hidden_dim_deform=16,
                            multires_deform=2)
        params = init_cp_dnerf(jax.random.PRNGKey(0), cfg)
        # fatten the near-zero deform init so warp grads are not noise
        params["deform_mlp"]["w"][-1] = params["deform_mlp"]["w"][-1] * 100.0
        rng = np.random.RandomState(2)
        s = 64
        x = jnp.asarray(rng.rand(s, 3).astype(np.float32) * 1.6 - 0.8)
        d0 = rng.randn(s, 3).astype(np.float32)
        d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
        d = jnp.asarray(d0)
        w = jnp.asarray(rng.rand(s).astype(np.float32))
        cw = jnp.asarray(rng.rand(s, 3).astype(np.float32))

        # t traced (not closed over) so both time values share ONE
        # compile of the interpret-mode kernels -- this test is on the
        # default gate and eager/per-t compiles put it at 56 s
        def loss_xla(p, t):
            sig, rgb, _ = cp_dnerf_forward(p, cfg, x, d, t)
            return jnp.sum(sig * w) + jnp.sum(rgb * cw)

        def loss_fused(p, t):
            out = cp_dnerf_train_fused(cfg, 32, True, p, x.T, d.T, t)
            return jnp.sum(out[0] * w) + jnp.sum(out[1:4].T * cw)

        f_xla = jax.jit(jax.value_and_grad(loss_xla))
        f_fused = jax.jit(jax.value_and_grad(loss_fused))
        for t in (0.37, 0.0):
            l0, g0 = f_xla(params, t)
            l1, g1 = f_fused(params, t)
            np.testing.assert_allclose(float(l0), float(l1), rtol=2e-3)
            for (k, v0), (_, v1) in zip(
                    jax.tree_util.tree_leaves_with_path(g0),
                    jax.tree_util.tree_leaves_with_path(g1)):
                denom = np.abs(np.asarray(v0)).max() + 1e-6
                err = np.abs(np.asarray(v0) - np.asarray(v1)).max() / denom
                assert err < 0.35, (t, jax.tree_util.keystr(k), err)
            if t == 0.0:
                # t==0 is the canonical frame: deform grads must be zero
                # through the tflag gate (dnerf/network.py:139-141)
                for gw in g1["deform_mlp"]["w"]:
                    assert float(jnp.abs(gw).max()) == 0.0

    @pytest.mark.slow
    def test_coarse_only_warp_grad_routing(self):
        """deform_grad_res_cutoff: with the cutoff below every scale,
        only the freq features back-drive the warp -- parity must hold
        against the XLA model applying the same policy. (slow: ~48 s of
        interpret-mode compile; the policy itself rarely changes)"""
        from sealdnerf_tpu.models.cp import (CPDNeRFConfig, init_cp_dnerf,
                                             cp_dnerf_forward)
        from sealdnerf_tpu.ops.pallas_field import cp_dnerf_train_fused
        cfg = CPDNeRFConfig(bound=1.0, scales=((8, 8), (16, 16)),
                            num_layers_deform=3, hidden_dim_deform=32,
                            multires_deform=4, deform_grad_res_cutoff=4, planes=())
        params = init_cp_dnerf(jax.random.PRNGKey(1), cfg)
        params["deform_mlp"]["w"][-1] = params["deform_mlp"]["w"][-1] * 100.0
        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.rand(64, 3).astype(np.float32) * 1.6 - 0.8)
        d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (64, 1))
        t = 0.61

        def loss_xla(p):
            sig, rgb, _ = cp_dnerf_forward(p, cfg, x, d, t)
            return jnp.sum(sig) + jnp.sum(rgb)

        def loss_fused(p):
            out = cp_dnerf_train_fused(cfg, 32, True, p, x.T, d.T, t)
            return jnp.sum(out[0]) + jnp.sum(out[1:4])

        g0 = jax.grad(loss_xla)(params)["deform_mlp"]["w"][0]
        g1 = jax.grad(loss_fused)(params)["deform_mlp"]["w"][0]
        err = np.abs(np.asarray(g0) - np.asarray(g1)).max() / \
            (np.abs(np.asarray(g0)).max() + 1e-9)
        assert err < 0.35, err


class TestDynPallasField:
    def test_parity_vs_xla(self):
        from sealdnerf_tpu.models.cp import (CPDNeRFConfig, init_cp_dnerf,
                                             cp_dnerf_forward)
        from sealdnerf_tpu.ops.pallas_field import (
            cp_dnerf_forward_fused_planar)
        cfg = CPDNeRFConfig(bound=1.0, scales=((8, 8), (16, 16)),
                            num_layers_deform=3, hidden_dim_deform=32,
                            multires_deform=4, planes=())
        params = init_cp_dnerf(jax.random.PRNGKey(0), cfg)
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.rand(90, 3).astype(np.float32) * 2 - 1)
        d0 = rng.randn(90, 3).astype(np.float32)
        d0 /= np.linalg.norm(d0, axis=1, keepdims=True)
        d = jnp.asarray(d0)
        for t in (0.0, 0.37):
            s0, r0, _ = cp_dnerf_forward(params, cfg, x, d, t)
            out = cp_dnerf_forward_fused_planar(params, cfg, x.T, d.T, t,
                                                tile=32, interpret=True)
            np.testing.assert_allclose(np.asarray(out[0]), np.asarray(s0),
                                       rtol=2e-2, atol=1e-3)
            np.testing.assert_allclose(np.asarray(out[1:4].T),
                                       np.asarray(r0), rtol=2e-2, atol=2e-3)


class TestCascadeMarch:
    """bound > 1 / dt_gamma > 0 on the dense fast path (VERDICT r2
    missing #2): cascade coarse ladder + per-mip occupancy, parity
    against the reference-shaped render_occ oracle."""

    @staticmethod
    def _fwd(params, x, d):
        # two balls: one inside cascade 0, one out at radius ~1.5
        r0 = jnp.linalg.norm(x - jnp.array([0.0, 0.0, 0.0]), axis=-1)
        r1 = jnp.linalg.norm(x - jnp.array([1.4, 0.0, 0.0]), axis=-1)
        sigma = jnp.where(r0 < 0.4, 60.0, 0.0) + jnp.where(r1 < 0.4, 60.0,
                                                           0.0)
        rgb = jnp.stack([jnp.where(r1 < 0.4, 0.9, 0.2),
                         jnp.where(r0 < 0.4, 0.8, 0.3),
                         jnp.broadcast_to(0.5, x.shape[:-1])], -1)
        return sigma, rgb

    @staticmethod
    def _occ_cas(hres, cascades, bound):
        """Exact occupancy of the two balls per cascade."""
        occs = []
        for c in range(cascades):
            cb = min(2.0 ** c, bound)
            g = (jnp.arange(hres) + 0.5) / hres * 2.0 - 1.0
            x, y, z = jnp.meshgrid(g * cb, g * cb, g * cb, indexing="ij")
            p = jnp.stack([x, y, z], -1)
            r0 = jnp.linalg.norm(p, axis=-1)
            r1 = jnp.linalg.norm(p - jnp.array([1.4, 0.0, 0.0]), axis=-1)
            occs.append((r0 < 0.5) | (r1 < 0.5))
        return jnp.stack(occs)

    def _rays(self, n=128):
        rng = np.random.RandomState(0)
        # rays from a shell at radius 3.5 aimed near the two balls
        o = rng.randn(n, 3).astype(np.float32)
        o /= np.linalg.norm(o, axis=1, keepdims=True)
        o *= 3.5
        target = np.where(rng.rand(n, 1) < 0.5,
                          np.zeros((n, 3), np.float32),
                          np.array([[1.4, 0.0, 0.0]], np.float32))
        d = target + rng.randn(n, 3).astype(np.float32) * 0.1 - o
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        return jnp.asarray(o), jnp.asarray(d)

    def test_matches_render_occ_oracle(self):
        from sealdnerf_tpu.ops.marching import MarchConfig
        from sealdnerf_tpu.render.renderer import (RenderSettings,
                                                   render_occ)
        bound, cascades = 2.0, 2
        dt_gamma = 1.0 / 128
        occ128 = self._occ_cas(128, cascades, bound)
        occ_m = self._occ_cas(64, cascades, bound)
        o, d = self._rays()

        mc = MarchConfig(bound=bound, cascades=cascades, grid_size=128,
                         dt_gamma=dt_gamma, max_steps=1024, min_near=0.05)
        st = RenderSettings(march=mc, samples_per_ray=256)
        ref = render_occ(None, occ128, o, d, st, self._fwd,
                         bg_color=jnp.zeros(3))

        cfg = DenseMarchConfig(bound=bound, march_res=64, n_intervals=32,
                               steps_per_interval=4, min_near=0.05,
                               cascades=cascades, dt_gamma=dt_gamma)
        assert cfg.multi and cfg.k_coarse > 64
        res = render_dense(None, occ_m, o, d, cfg, self._fwd,
                           bg_color=jnp.zeros(3))
        img_f = np.asarray(res["image"])
        img_r = np.clip(np.asarray(ref["image"]), 0, 1)
        diff = np.abs(img_f - img_r)
        # same geometry, different sample lattices: agree away from
        # silhouettes (the oracle itself has voxel-level band placement)
        assert np.quantile(diff, 0.9) < 0.06, (
            float(np.quantile(diff, 0.9)), float(diff.max()))
        assert np.median(diff) < 0.02

    def test_outer_cascade_geometry_is_reached(self):
        """A ray aimed only at the outer-cascade ball must shade it
        (bound-1 marching would miss everything beyond [-1,1])."""
        cfg = DenseMarchConfig(bound=2.0, march_res=64, n_intervals=32,
                               steps_per_interval=4, min_near=0.05,
                               cascades=2, dt_gamma=1.0 / 128)
        occ_m = self._occ_cas(64, 2, 2.0)
        o = jnp.array([[1.4, 0.0, -3.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        res = render_dense(None, occ_m, o, d, cfg, self._fwd,
                           bg_color=jnp.zeros(3))
        img = np.asarray(res["image"])[0]
        assert img[0] > 0.5, img          # the red outer ball
        assert float(res["weights_sum"][0]) > 0.9

    def test_dt_gamma_zero_cascades(self):
        """cascades > 1 with dt_gamma == 0: fixed fine-pitch ladder."""
        cfg = DenseMarchConfig(bound=2.0, march_res=32, n_intervals=24,
                               steps_per_interval=2, min_near=0.05,
                               cascades=2, dt_gamma=0.0)
        occ_m = self._occ_cas(32, 2, 2.0)
        o, d = self._rays(32)
        res = render_dense(None, occ_m, o, d, cfg, self._fwd,
                           bg_color=jnp.zeros(3))
        assert np.isfinite(np.asarray(res["image"])).all()
        assert int(res["n_samples"]) > 0

    def _cam(self, rh, rw):
        # camera at z=-3.2 looking +z at the origin-ball / outer-ball pair
        pose = (jnp.eye(4).at[2, 3].set(-3.2).at[2, 2].set(1.0)
                .at[0, 3].set(0.7))
        intr = jnp.array([rh * 0.9, rh * 0.9, rw / 2, rh / 2])
        return pose, intr

    def test_tiled_matches_per_ray_cascade(self):
        """The tile-band renderer serves cascade configs (bound>1 /
        dt_gamma>0): parity vs the per-ray cascade march. This is the
        render path that keeps bound-2 scenes at tile-band speed instead
        of the per-ray fallback."""
        from sealdnerf_tpu.render.fast_image import render_image_tiled
        from sealdnerf_tpu.data.rays import get_rays
        cfg = DenseMarchConfig(bound=2.0, march_res=64, n_intervals=32,
                               steps_per_interval=4, min_near=0.05,
                               cascades=2, dt_gamma=1.0 / 128)
        occ_m = self._occ_cas(64, 2, 2.0)
        rh = rw = 64
        pose, intr = self._cam(rh, rw)
        img_t, dep_t = render_image_tiled(
            None, occ_m, pose, intr, rh, rw, cfg, self._fwd,
            jnp.zeros(3), tile_px=8, dilate=1)
        rays = get_rays(jax.random.PRNGKey(0), pose[None], intr, rh, rw,
                        -1)
        res = render_dense(None, occ_m, rays["rays_o"][0],
                           rays["rays_d"][0], cfg, self._fwd,
                           bg_color=jnp.zeros(3))
        img_r = np.clip(np.asarray(res["image"]).reshape(rh, rw, 3), 0, 1)
        diff = np.abs(np.asarray(img_t) - img_r)
        assert np.quantile(diff, 0.95) < 0.06, (
            float(np.quantile(diff, 0.95)), float(diff.max()))
        # both balls visible in the tiled image (outer cascade reached)
        assert np.asarray(img_t)[..., 0].max() > 0.5

    def test_bucketed_matches_tiled_cascade(self):
        from sealdnerf_tpu.render.fast_image import (render_image_tiled,
                                                     render_image_bucketed)
        cfg = DenseMarchConfig(bound=2.0, march_res=64, n_intervals=32,
                               steps_per_interval=4, min_near=0.05,
                               cascades=2, dt_gamma=1.0 / 128)
        occ_m = self._occ_cas(64, 2, 2.0)
        rh = rw = 64
        pose, intr = self._cam(rh, rw)
        img_t, _ = render_image_tiled(
            None, occ_m, pose, intr, rh, rw, cfg, self._fwd,
            jnp.zeros(3), tile_px=8, dilate=1)
        img_b, _ = render_image_bucketed(
            None, occ_m, pose, intr, rh, rw, cfg, self._fwd,
            jnp.zeros(3), tile_px=8, dilate=1, planar=False,
            splits=((0.55, 4), (0.30, 2), (1.0, 1)))
        diff = np.abs(np.asarray(img_t) - np.asarray(img_b))
        # truncation affects only the bucket-boundary tiles
        assert np.quantile(diff, 0.98) < 0.05, (
            float(np.quantile(diff, 0.98)), float(diff.max()))
