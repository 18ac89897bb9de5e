"""SH encoder parity tests.

Oracle: the hard-coded Cartesian polynomials from the reference's
shencoder/src/shencoder.cu:49-90 (standard real-SH constants, degree <= 5)
and the analytic orthonormality property for degrees 6-8.
"""

import numpy as np
import jax
import jax.numpy as jnp

from sealdnerf_tpu.ops import sh_encode, sh_output_dim


def reference_sh_deg5(d):
    """Hard-coded real SH (Condon-Shortley), components 0..24, from the
    reference CUDA (public math constants)."""
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    xy, xz, yz = x * y, x * z, y * z
    x2, y2, z2 = x * x, y * y, z * z
    x4, y4, z4 = x2 * x2, y2 * y2, z2 * z2
    out = [
        0.28209479177387814 * np.ones_like(x),
        -0.48860251190291987 * y,
        0.48860251190291987 * z,
        -0.48860251190291987 * x,
        1.0925484305920792 * xy,
        -1.0925484305920792 * yz,
        0.94617469575755997 * z2 - 0.31539156525251999,
        -1.0925484305920792 * xz,
        0.54627421529603959 * x2 - 0.54627421529603959 * y2,
        0.59004358992664352 * y * (-3.0 * x2 + y2),
        2.8906114426405538 * xy * z,
        0.45704579946446572 * y * (1.0 - 5.0 * z2),
        0.3731763325901154 * z * (5.0 * z2 - 3.0),
        0.45704579946446572 * x * (1.0 - 5.0 * z2),
        1.4453057213202769 * z * (x2 - y2),
        0.59004358992664352 * x * (-x2 + 3.0 * y2),
        2.5033429417967046 * xy * (x2 - y2),
        1.7701307697799304 * yz * (-3.0 * x2 + y2),
        0.94617469575756008 * xy * (7.0 * z2 - 1.0),
        0.66904654355728921 * yz * (3.0 - 7.0 * z2),
        -3.1735664074561294 * z2 + 3.7024941420321507 * z4 + 0.31735664074561293,
        0.66904654355728921 * xz * (3.0 - 7.0 * z2),
        0.47308734787878004 * (x2 - y2) * (7.0 * z2 - 1.0),
        1.7701307697799304 * xz * (-x2 + 3.0 * y2),
        -3.7550144126950569 * x2 * y2 + 0.62583573544917614 * x4 + 0.62583573544917614 * y4,
        0.65638205684017015 * y * (10.0 * x2 * y2 - 5.0 * x4 - y4),
        8.3026492595241645 * xy * z * (x2 - y2),
        -0.48923829943525038 * y * (3.0 * x2 - y2) * (9.0 * z2 - 1.0),
        4.7935367849733241 * xy * z * (3.0 * z2 - 1.0),
        0.45294665119569694 * y * (14.0 * z2 - 21.0 * z4 - 1.0),
        0.1169503224534236 * z * (-70.0 * z2 + 63.0 * z4 + 15.0),
        0.45294665119569694 * x * (14.0 * z2 - 21.0 * z4 - 1.0),
        2.3967683924866621 * z * (x2 - y2) * (3.0 * z2 - 1.0),
        -0.48923829943525038 * x * (x2 - 3.0 * y2) * (9.0 * z2 - 1.0),
        2.0756623148810411 * z * (-6.0 * x2 * y2 + x4 + y4),
        0.65638205684017015 * x * (10.0 * x2 * y2 - x4 - 5.0 * y4),
    ]
    return np.stack(out, axis=-1)


def _unit_dirs(rng, n=256):
    d = rng.normal(size=(n, 3))
    return (d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)


def test_sh_matches_reference_constants(rng):
    d = _unit_dirs(rng)
    expected = reference_sh_deg5(d)
    for degree in range(1, 7):
        got = np.asarray(sh_encode(jnp.asarray(d), degree=degree))
        assert got.shape == (d.shape[0], sh_output_dim(degree))
        c = min(got.shape[1], expected.shape[1])
        np.testing.assert_allclose(got[:, :c], expected[:, :c], atol=2e-5)


def test_sh_orthonormality(rng):
    """Monte-carlo orthonormality over the sphere for all degrees up to 8:
    integral of Y_i Y_j over S^2 = delta_ij (checks degrees 6-8 where we have
    no hard-coded oracle)."""
    n = 200_000
    d = _unit_dirs(np.random.default_rng(0), n)
    y = np.asarray(jax.jit(lambda v: sh_encode(v, degree=8))(
        jnp.asarray(d)))  # [n, 64]
    gram = (y.T @ y) * (4.0 * np.pi / n)
    np.testing.assert_allclose(gram, np.eye(64), atol=0.15)


def test_sh_differentiable():
    d = jnp.array([0.3, -0.5, 0.81])
    d = d / jnp.linalg.norm(d)
    g = jax.jacobian(lambda v: sh_encode(v, degree=4))(d)
    assert g.shape == (16, 3)
    assert np.all(np.isfinite(np.asarray(g)))
