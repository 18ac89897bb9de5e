"""Tests for morton, ray-AABB, packbits, freq encode, trunc_exp, losses."""

import numpy as np
import jax
import jax.numpy as jnp

from sealdnerf_tpu.ops import (
    morton3d, morton3d_invert, near_far_from_aabb, sph_from_ray,
    packbits, unpackbits, freq_encode, freq_output_dim, trunc_exp,
    mape_loss, huber_loss, eff_distloss,
)


def _morton_ref(x, y, z):
    out = 0
    for i in range(10):
        out |= ((x >> i) & 1) << (3 * i)
        out |= ((y >> i) & 1) << (3 * i + 1)
        out |= ((z >> i) & 1) << (3 * i + 2)
    return out


def test_morton_roundtrip(rng):
    coords = rng.integers(0, 128, size=(1000, 3)).astype(np.int32)
    codes = np.asarray(morton3d(jnp.asarray(coords)))
    expected = np.array([_morton_ref(*c) for c in coords])
    np.testing.assert_array_equal(codes, expected)
    back = np.asarray(morton3d_invert(jnp.asarray(codes)))
    np.testing.assert_array_equal(back, coords)


def test_near_far_aabb(rng):
    aabb = jnp.array([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])
    # Ray from outside pointing at the box center.
    o = jnp.array([[0.0, 0.0, -3.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    near, far = near_far_from_aabb(o, d, aabb, min_near=0.2)
    np.testing.assert_allclose(np.asarray(near), [2.0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(far), [4.0], atol=1e-5)
    # Ray missing the box.
    o2 = jnp.array([[0.0, 5.0, -3.0]])
    near2, far2 = near_far_from_aabb(o2, d, aabb, min_near=0.2)
    assert float(near2[0]) > 1e9 and float(far2[0]) >= float(near2[0])
    # Ray starting inside: near clamps to min_near.
    o3 = jnp.array([[0.0, 0.0, 0.0]])
    near3, far3 = near_far_from_aabb(o3, d, aabb, min_near=0.2)
    np.testing.assert_allclose(np.asarray(near3), [0.2], atol=1e-5)
    np.testing.assert_allclose(np.asarray(far3), [1.0], atol=1e-5)


def test_sph_from_ray():
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 1.0, 0.0]])  # straight up (+y): theta = 0
    c = np.asarray(sph_from_ray(o, d, radius=2.0))
    np.testing.assert_allclose(c[0, 0], -1.0, atol=1e-5)  # 2*0/pi - 1


def test_packbits_roundtrip(rng):
    grid = rng.standard_normal(2 * 128 * 128 * 128 // 64).astype(np.float32)
    bf = packbits(jnp.asarray(grid), 0.1)
    bits = unpackbits(bf)
    np.testing.assert_array_equal(np.asarray(bits), grid > 0.1)


def test_freq_encode():
    x = jnp.array([[0.5, -0.3, 0.1]])
    out = freq_encode(x, degree=4)
    assert out.shape == (1, freq_output_dim(3, 4))
    np.testing.assert_allclose(np.asarray(out[0, :3]), [0.5, -0.3, 0.1])
    np.testing.assert_allclose(float(out[0, 3]), np.sin(0.5), atol=1e-6)
    np.testing.assert_allclose(float(out[0, 6]), np.cos(0.5), atol=1e-6)
    np.testing.assert_allclose(float(out[0, 9]), np.sin(1.0), atol=1e-6)


def test_trunc_exp_grad_clamped():
    g = jax.grad(lambda x: trunc_exp(x))(20.0)
    np.testing.assert_allclose(float(g), np.exp(15.0), rtol=1e-5)
    g2 = jax.grad(lambda x: trunc_exp(x))(1.0)
    np.testing.assert_allclose(float(g2), np.exp(1.0), rtol=1e-5)


def test_losses(rng):
    pred = jnp.asarray(rng.random((16, 3)).astype(np.float32))
    target = jnp.asarray(rng.random((16, 3)).astype(np.float32))
    assert float(mape_loss(pred, target)) > 0
    assert float(huber_loss(pred, target)) >= 0
    # huber: quadratic inside delta, linear outside
    np.testing.assert_allclose(
        float(huber_loss(jnp.array(0.05), jnp.array(0.0), delta=0.1)),
        0.5 / 0.1 * 0.05 ** 2, rtol=1e-5)
    np.testing.assert_allclose(
        float(huber_loss(jnp.array(0.5), jnp.array(0.0), delta=0.1)),
        0.5 - 0.05, rtol=1e-5)


def test_eff_distloss_matches_naive(rng):
    """O(N) distortion loss == O(N^2) definition."""
    w = jnp.asarray(rng.random((4, 16)).astype(np.float32)) * 0.1
    m = jnp.sort(jnp.asarray(rng.random((4, 16)).astype(np.float32)), axis=-1)
    interval = 0.01
    fast = float(eff_distloss(w, m, interval))
    # naive: sum_ij w_i w_j |m_i - m_j| + 1/3 sum_i w_i^2 interval
    naive = (
        jnp.sum(w[:, :, None] * w[:, None, :] * jnp.abs(m[:, :, None] - m[:, None, :]))
        + (1.0 / 3.0) * interval * jnp.sum(w ** 2)
    ) / w.shape[0]
    np.testing.assert_allclose(fast, float(naive), rtol=1e-4)
