"""Coverage for the remaining workloads: TensoRF (VM + CP + upsample +
CCNeRF compose), SDF fitting, converters, random-orbit dataset."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sealdnerf_tpu.models.tensorf import (
    TensoRFConfig, init_tensorf, tensorf_forward, upsample_tensorf,
    tensorf_l1_reg, make_tensorf_field, cc_compose_forward,
)


def test_tensorf_vm_forward_and_grad():
    cfg = TensoRFConfig(bound=1.0, resolution=32, sigma_rank=(4, 4, 4),
                        color_rank=(8, 8, 8))
    params = init_tensorf(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.default_rng(0).random((33, 3)) * 2 - 1,
                    jnp.float32)
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (33, 1))
    sigma, rgb = jax.jit(
        lambda p: tensorf_forward(p, cfg, x, d))(params)
    assert sigma.shape == (33,) and rgb.shape == (33, 3)
    assert float(jnp.min(sigma)) >= 0

    g = jax.jit(jax.grad(lambda p: jnp.sum(
        tensorf_forward(p, cfg, x, d)[0])))(params)
    gn = sum(float(jnp.sum(jnp.abs(l)))
             for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gn) and gn > 0
    assert float(tensorf_l1_reg(params)) > 0


def test_tensorf_cp_and_upsample():
    cfg = TensoRFConfig(bound=1.0, decomposition="cp", resolution=16,
                        sigma_rank=(8,), color_rank=(8,))
    params = init_tensorf(jax.random.PRNGKey(1), cfg)
    x = jnp.zeros((5, 3))
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (5, 1))
    s0, _ = jax.jit(lambda p: tensorf_forward(p, cfg, x, d))(params)
    params2, cfg2 = upsample_tensorf(params, cfg, 32)
    assert cfg2.resolution == 32
    s1, _ = jax.jit(lambda p: tensorf_forward(p, cfg2, x, d))(params2)
    # upsampling is (tri)linear: values at the same point barely change
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), atol=0.05)


def test_ccnerf_compose():
    cfg = TensoRFConfig(bound=1.0, decomposition="cp", resolution=16,
                        sigma_rank=(4,), color_rank=(4,))
    f1 = make_tensorf_field(jax.random.PRNGKey(0), cfg)
    f2 = make_tensorf_field(jax.random.PRNGKey(1), cfg)
    fwd = cc_compose_forward([f1, f2])
    x = jnp.zeros((7, 3))
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (7, 1))
    sigma, rgb = jax.jit(fwd)([f1.params, f2.params], x, d)
    s1 = jax.jit(f1.forward)(f1.params, x, d)[0]
    s2 = jax.jit(f2.forward)(f2.params, x, d)[0]
    np.testing.assert_allclose(np.asarray(sigma), np.asarray(s1 + s2),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_sdf_fit_sphere(tmp_path):
    """Fit the SDF net to an analytic sphere mesh for a few steps; the zero
    level set should approach radius 0.55-ish (normalized)."""
    import optax
    from sealdnerf_tpu.models.sdf import SDFConfig, init_sdf, sdf_forward
    from sealdnerf_tpu.ops import mape_loss
    import main_sdf
    mesh_path = str(tmp_path / "sphere.ply")
    main_sdf._make_sphere_mesh(mesh_path)
    from sealdnerf_tpu.data.sdf_provider import SDFDataset
    ds = SDFDataset(mesh_path, size=4, num_samples=4096)
    cfg = SDFConfig()
    params = init_sdf(jax.random.PRNGKey(0), cfg)
    tx = optax.adam(1e-3, b1=0.9, b2=0.99, eps=1e-15)
    state = tx.init(params)

    @jax.jit
    def step(params, state, pts, sdfs):
        def loss_fn(p):
            return mape_loss(sdf_forward(p, cfg, pts), sdfs[:, 0])
        loss, g = jax.value_and_grad(loss_fn)(params)
        u, state = tx.update(g, state, params)
        return optax.apply_updates(params, u), state, loss

    losses = []
    for _ in range(60):
        b = ds.sample_batch()
        params, state, loss = step(params, state, jnp.asarray(b["points"]),
                                   jnp.asarray(b["sdfs"]))
        losses.append(float(loss))
    assert np.mean(losses[-10:]) < np.mean(losses[:10]), losses[:3] + losses[-3:]


def test_sdf_dataset_signs(tmp_path):
    import main_sdf
    mesh_path = str(tmp_path / "sphere.ply")
    main_sdf._make_sphere_mesh(mesh_path)
    from sealdnerf_tpu.data.sdf_provider import SDFDataset
    ds = SDFDataset(mesh_path, size=1, num_samples=4096)
    # pysdf convention: positive inside -> our stored sdf = -query
    q = np.asarray(ds._sdf_query(jnp.array([[0.0, 0.0, 0.0],
                                            [0.9, 0.9, 0.9]])))
    assert q[0] > 0 and q[1] < 0  # center inside, corner outside


def test_llff_converter(tmp_path):
    # synthesize a tiny LLFF dir
    import scripts.llff2nerf as conv
    n = 3
    poses = np.zeros((n, 3, 5))
    for i in range(n):
        poses[i, :, :3] = np.eye(3)
        poses[i, :, 3] = [0, 0, 2 + i]
        poses[i, :, 4] = [100, 120, 90.0]  # h, w, focal
    pb = np.concatenate([poses.reshape(n, 15), np.tile([1.0, 10.0], (n, 1))],
                        axis=1)
    np.save(tmp_path / "poses_bounds.npy", pb)
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    import cv2
    for i in range(n):
        cv2.imwrite(str(img_dir / f"{i:03d}.png"),
                    np.zeros((100, 120, 3), np.uint8))
    conv.convert(str(tmp_path))
    with open(tmp_path / "transforms.json") as f:
        t = json.load(f)
    assert len(t["frames"]) == n and t["fl_x"] == 90.0


def test_random_orbit_dataset():
    from sealdnerf_tpu.data.provider import NeRFDataset
    ds = NeRFDataset.random_orbit(8, 64, 64, [80, 80, 32, 32], radius=2.0)
    assert len(ds) == 8 and ds.images is None
    r = np.linalg.norm(ds.poses[:, :3, 3], axis=-1)
    np.testing.assert_allclose(r, 2.0, atol=1e-4)


@pytest.mark.slow
def test_ccnerf_k_loss_trains(tmp_path):
    """Rank-residual K-loss: training with truncation levels reduces the
    loss and the truncated forward renders (VERDICT.md missing #5;
    reference nerf/utils.py:531-533)."""
    from sealdnerf_tpu.data.synthetic import make_synthetic_scene
    from sealdnerf_tpu.models.tensorf import tensorf_forward_trunc
    from sealdnerf_tpu.train.trainer import Trainer, TrainOptions

    _, train, val = make_synthetic_scene(n_train=4, n_val=1, res=32)
    cfg = TensoRFConfig(bound=1.0, decomposition="cp", resolution=32,
                        sigma_rank=(16,), color_rank=(16,))
    field = make_tensorf_field(jax.random.PRNGKey(0), cfg)
    opt = TrainOptions(iters=160, num_rays=512, bound=1.0, dt_gamma=0.0,
                       grid_size=32, max_steps=64, samples_per_ray=16,
                       workspace=str(tmp_path), fast=False, lr=2e-2,
                       k_rank_fracs=(0.25, 0.5), update_extra_interval=8)
    tr = Trainer("cc", opt, field, workspace=str(tmp_path),
                 use_checkpoint="scratch")
    tr.train(train, None, max_epochs=40)
    losses = tr.stats["loss"]
    assert np.mean(losses[-3:]) < np.mean(losses[:3]), losses

    # truncated forward produces valid output and differs from full rank
    x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (32, 3)),
                    jnp.float32)
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (32, 1))
    s_lo, rgb_lo = tensorf_forward_trunc(tr.params, cfg, x, d, 0.25)
    s_hi, rgb_hi = tensorf_forward_trunc(tr.params, cfg, x, d, 1.0)
    assert np.isfinite(np.asarray(s_lo)).all()
    assert not np.allclose(np.asarray(s_lo), np.asarray(s_hi))


def test_colmap_converter_dynamic_hold(tmp_path):
    """--dynamic writes per-frame time; --hold splits train/val/test
    (reference colmap2nerf.py:320-368)."""
    import subprocess, sys
    text = tmp_path / "colmap_text"
    text.mkdir()
    (text / "cameras.txt").write_text(
        "# cams\n1 PINHOLE 64 48 60.0 60.0 32.0 24.0\n")
    lines = ["# images"]
    for i in range(10):
        lines.append(f"{i+1} 1 0 0 0 0 0 {2.0+i*0.1} 1 img_{i:03d}.png")
        lines.append("0 0 -1")
    (text / "images.txt").write_text("\n".join(lines) + "\n")
    r = subprocess.run(
        [sys.executable, "scripts/colmap2nerf.py", str(tmp_path),
         "--dynamic", "--hold", "4"],
        capture_output=True, text=True, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr
    with open(tmp_path / "transforms_train.json") as f:
        tr = json.load(f)
    with open(tmp_path / "transforms_test.json") as f:
        te = json.load(f)
    assert len(te["frames"]) == 3 and len(tr["frames"]) == 7
    ts = [fr["time"] for fr in tr["frames"] + te["frames"]]
    assert min(ts) == 0.0 and max(ts) == 1.0
    assert (tmp_path / "transforms_val.json").exists()


def test_hyper2nerf_converter(tmp_path):
    """dataset.json split + scene recentering + normalized time
    (reference scripts/hyper2nerf.py)."""
    import scripts.hyper2nerf as conv
    ids = [f"{i:05d}" for i in range(6)]
    (tmp_path / "camera").mkdir()
    for i, name in enumerate(ids):
        angle = i * np.pi / 3
        pos = [2 * np.cos(angle), 2 * np.sin(angle), 0.5]
        cam = {"orientation": np.eye(3).tolist(), "position": pos,
               "focal_length": 100.0, "principal_point": [32.0, 24.0],
               "image_size": [64, 48]}
        with open(tmp_path / "camera" / f"{name}.json", "w") as f:
            json.dump(cam, f)
    with open(tmp_path / "metadata.json", "w") as f:
        json.dump({name: {"time_id": i} for i, name in enumerate(ids)}, f)
    with open(tmp_path / "dataset.json", "w") as f:
        json.dump({"ids": ids, "train_ids": ids[:5], "val_ids": ids[5:]},
                  f)
    conv.convert(str(tmp_path), downscale=2)
    with open(tmp_path / "transforms_train.json") as f:
        tr = json.load(f)
    assert len(tr["frames"]) == 5
    assert tr["fl_x"] == 50.0 and tr["w"] == 32
    times = [fr["time"] for fr in tr["frames"]]
    assert max(times) <= 1.0 and times == sorted(times)
    # recentring: camera ring should be centered near origin
    cs = np.array([np.asarray(fr["transform_matrix"])[:3, 3]
                   for fr in tr["frames"]])
    assert np.linalg.norm(cs.mean(0)) < 2.0
    assert (tmp_path / "transforms_val.json").exists()
