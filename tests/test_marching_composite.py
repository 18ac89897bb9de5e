"""Marching + compositing: parity against a straightforward per-ray python
re-implementation of the reference CUDA semantics (raymarching.cu:312-490,
:501-601)."""

import numpy as np
import jax
import jax.numpy as jnp

from sealdnerf_tpu.ops import (
    MarchConfig, march_rays, composite_packed, composite_rays,
    near_far_from_aabb,
)

SQRT3 = 1.7320508075688772


def _ref_march(o, d, near, far, occ, cfg):
    """Serial port of kernel_march_rays_train semantics (dt_gamma=0)."""
    h = cfg.grid_size
    dt = cfg.dt_min
    t = near
    out = []
    while t < far and len(out) < cfg.max_steps:
        p = np.clip(o + t * d, -cfg.bound, cfg.bound)
        mx = np.max(np.abs(p))
        exp = np.frexp(mx)[1]
        lvl_pos = min(cfg.cascades - 1, max(0, exp))
        exp_dt = np.frexp(dt * h * 0.5)[1]
        lvl = max(lvl_pos, min(cfg.cascades - 1, max(0, exp_dt)))
        mb = min(2.0 ** lvl, cfg.bound)
        n = np.clip(0.5 * (p / mb + 1) * h, 0, h - 1).astype(int)
        if occ[lvl, n[0], n[1], n[2]]:
            out.append((t, dt))
        t += dt  # uniform lattice: skip lands on same lattice anyway
    return out


def test_march_matches_reference_uniform(rng):
    cfg = MarchConfig(bound=1.0, cascades=1, grid_size=32, dt_gamma=0.0,
                      max_steps=256)
    occ = rng.random((1, 32, 32, 32)) > 0.7
    n_rays = 32
    o = (rng.random((n_rays, 3)) * 0.2 - 0.1).astype(np.float32)
    o[:, 2] = -2.5
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    d[:, 2] = np.abs(d[:, 2]) + 1.0
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    aabb = jnp.array([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])
    nears, fars = near_far_from_aabb(jnp.asarray(o), jnp.asarray(d), aabb)
    res = march_rays(jnp.asarray(o), jnp.asarray(d), nears, fars,
                     jnp.asarray(occ), cfg, m_budget=n_rays * 64)

    ray_id = np.asarray(res["ray_id"])
    valid = np.asarray(res["valid"])
    ts = np.asarray(res["ts"])
    nears_np, fars_np = np.asarray(nears), np.asarray(fars)

    for r in range(n_rays):
        expected = _ref_march(o[r], d[r], nears_np[r], fars_np[r], occ, cfg)
        mine = ts[valid & (ray_id == r)]
        assert len(mine) == len(expected), f"ray {r}: {len(mine)} vs {len(expected)}"
        if expected:
            np.testing.assert_allclose(mine, [e[0] for e in expected], atol=1e-4)


def test_march_budget_drop(rng):
    """Samples beyond m_budget are dropped, like the mean_count overflow."""
    cfg = MarchConfig(bound=1.0, cascades=1, grid_size=16, max_steps=128)
    occ = jnp.ones((1, 16, 16, 16), dtype=bool)
    o = jnp.tile(jnp.array([[0.0, 0.0, -2.0]]), (8, 1))
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (8, 1))
    nears, fars = near_far_from_aabb(o, d, jnp.array([-1., -1., -1., 1., 1., 1.]))
    res = march_rays(o, d, nears, fars, occ, cfg, m_budget=64)
    assert int(jnp.sum(res["valid"])) == 64
    assert int(res["total"]) > 64  # would have produced more


def _ref_composite(samples, sigmas, rgbs, t_thresh):
    """Serial port of kernel_composite_rays_train_forward."""
    T = 1.0
    ws = 0.0
    img = np.zeros(3)
    depth = 0.0
    for (t, dt), s, c in zip(samples, sigmas, rgbs):
        alpha = 1.0 - np.exp(-s * dt)
        w = alpha * T
        img += w * c
        depth += w * t
        ws += w
        T *= 1.0 - alpha
        if T < t_thresh:
            break
    return ws, depth, img


def test_composite_packed_matches_serial(rng):
    n_rays = 16
    counts = rng.integers(0, 20, size=n_rays)
    m = 512
    ray_id, ts, dts, sig, rgb, valid = [], [], [], [], [], []
    for r in range(n_rays):
        t = 0.5
        for _ in range(counts[r]):
            dt = 0.01
            ray_id.append(r); ts.append(t); dts.append(dt)
            sig.append(rng.random() * 50); rgb.append(rng.random(3)); t += dt
            valid.append(True)
    pad = m - len(ray_id)
    ray_id += [n_rays - 1] * pad
    ts += [0.0] * pad; dts += [0.0] * pad
    sig += [0.0] * pad; rgb += [np.zeros(3)] * pad
    valid += [False] * pad

    out = composite_packed(
        jnp.asarray(np.array(sig), dtype=jnp.float32),
        jnp.asarray(np.array(rgb), dtype=jnp.float32),
        jnp.asarray(np.array(dts), dtype=jnp.float32),
        jnp.asarray(np.array(ts), dtype=jnp.float32),
        jnp.asarray(np.array(ray_id), dtype=jnp.int32),
        jnp.asarray(np.array(valid)),
        n_rays=n_rays, t_thresh=1e-4)

    i = 0
    for r in range(n_rays):
        samples = []
        ssig, srgb = [], []
        for _ in range(counts[r]):
            samples.append((ts[i], dts[i])); ssig.append(sig[i]); srgb.append(rgb[i]); i += 1
        ws, depth, img = _ref_composite(samples, ssig, srgb, 1e-4)
        np.testing.assert_allclose(float(out["weights_sum"][r]), ws, atol=1e-4)
        np.testing.assert_allclose(float(out["depth"][r]), depth, atol=1e-4)
        np.testing.assert_allclose(np.asarray(out["image"][r]), img, atol=1e-4)


def test_composite_packed_differentiable(rng):
    m, n = 64, 4
    sig = jnp.asarray(rng.random(m).astype(np.float32) * 10)
    rgb = jnp.asarray(rng.random((m, 3)).astype(np.float32))
    dts = jnp.full((m,), 0.01, dtype=jnp.float32)
    ts = jnp.tile(jnp.arange(m // n, dtype=jnp.float32) * 0.01 + 0.5, n)
    ray_id = jnp.repeat(jnp.arange(n, dtype=jnp.int32), m // n)
    valid = jnp.ones((m,), dtype=bool)

    def loss(s, c):
        out = composite_packed(s, c, dts, ts, ray_id, valid, n_rays=n)
        return jnp.sum(out["image"] ** 2) + jnp.sum(out["weights_sum"])

    gs, gc = jax.grad(loss, argnums=(0, 1))(sig, rgb)
    assert np.all(np.isfinite(np.asarray(gs)))
    assert np.all(np.isfinite(np.asarray(gc)))
    # numeric check on a few sigma entries
    eps = 1e-3
    for i in [0, 17, 40]:
        sp = sig.at[i].add(eps); sm = sig.at[i].add(-eps)
        num = (float(loss(sp, rgb)) - float(loss(sm, rgb))) / (2 * eps)
        np.testing.assert_allclose(float(gs[i]), num, atol=1e-2, rtol=1e-2)


def test_composite_dense_basic():
    sig = jnp.array([[10.0, 10.0, 10.0]])
    rgb = jnp.ones((1, 3, 3)) * 0.5
    dt = jnp.full((1, 3), 0.1)
    out = composite_rays(sig, rgb, dt)
    a = 1 - np.exp(-1.0)
    w0, w1 = a, a * (1 - a)
    w2 = a * (1 - a) ** 2
    np.testing.assert_allclose(float(out["weights_sum"][0]), w0 + w1 + w2, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out["image"][0]), 0.5 * (w0 + w1 + w2),
                               rtol=1e-4)
