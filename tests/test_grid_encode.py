"""Hash/tiled grid encoder tests: structure, reference-semantic parity on a
hand-checkable config, gradcheck (the reference's only real correctness test,
testing/test_hashgrid_grad.py), and OOB behavior."""

import numpy as np
import jax
import jax.numpy as jnp

from sealdnerf_tpu.ops import GridEncodeConfig, init_grid_table, grid_encode

PRIMES = (1, 2654435761, 805459861)


def test_offsets_match_reference_formula():
    """Table sizing matches gridencoder/grid.py:117-127 for the NGP default."""
    cfg = GridEncodeConfig(input_dim=3, num_levels=16, level_dim=2,
                           base_resolution=16, log2_hashmap_size=19,
                           desired_resolution=2048)
    s = np.exp2(np.log2(2048 / 16) / (16 - 1))
    offsets = [0]
    off = 0
    for i in range(16):
        res = int(np.ceil(16 * s ** i))
        p = min(2 ** 19, (res + 1) ** 3)
        p = int(np.ceil(p / 8) * 8)
        off += p
        offsets.append(off)
    assert list(cfg.offsets) == offsets
    assert cfg.output_dim == 32


def _ref_encode_one_level(x, table, resolution, hashmap_size, offset,
                          gridtype, align_corners, scale):
    """Straight port of gridencoder.cu:88-197 semantics, numpy, one level."""
    n = x.shape[0]
    c = table.shape[1]
    out = np.zeros((n, c), dtype=np.float64)
    for b in range(n):
        if np.any(x[b] < 0) or np.any(x[b] > 1):
            continue
        pos = x[b] * scale + (0.0 if align_corners else 0.5)
        pg = np.floor(pos).astype(np.uint64)
        frac = pos - pg
        for idx in range(8):
            w = 1.0
            pgl = pg.copy()
            for d in range(3):
                if (idx >> d) & 1:
                    w *= frac[d]
                    pgl[d] += 1
                else:
                    w *= 1 - frac[d]
            stride = 1
            index = 0
            for d in range(3):
                if stride > hashmap_size:
                    break
                index += int(pgl[d]) * stride
                stride *= resolution if align_corners else resolution + 1
            if gridtype == "hash" and stride > hashmap_size:
                h = 0
                for d in range(3):
                    h ^= (int(pgl[d]) * PRIMES[d]) & 0xFFFFFFFF
                index = h & 0xFFFFFFFF
            index = index % hashmap_size
            out[b] += w * table[offset + index]
    return out


def test_encode_matches_cuda_semantics(rng):
    """Bit-level parity of indexing/interp with the reference kernel, on a
    config where both dense and hashed levels occur."""
    cfg = GridEncodeConfig(input_dim=3, num_levels=4, level_dim=2,
                           base_resolution=16, log2_hashmap_size=12,
                           desired_resolution=128)
    table = np.asarray(init_grid_table(jax.random.PRNGKey(0), cfg))
    x = rng.random((64, 3)).astype(np.float32)
    got = np.asarray(grid_encode(jnp.asarray(x), jnp.asarray(table), cfg))

    s = cfg.per_level_scale
    for lvl in range(cfg.num_levels):
        scale = np.exp2(lvl * np.log2(s)) * cfg.base_resolution - 1.0
        resolution = int(np.ceil(scale)) + 1
        hms = cfg.offsets[lvl + 1] - cfg.offsets[lvl]
        ref = _ref_encode_one_level(x.astype(np.float64), table.astype(np.float64),
                                    resolution, hms, cfg.offsets[lvl],
                                    "hash", False, scale)
        np.testing.assert_allclose(got[:, lvl * 2:(lvl + 1) * 2], ref, atol=1e-5)


def test_tiled_matches_semantics(rng):
    cfg = GridEncodeConfig(input_dim=3, num_levels=2, level_dim=2,
                           base_resolution=16, log2_hashmap_size=10,
                           desired_resolution=32, gridtype="tiled")
    table = np.asarray(init_grid_table(jax.random.PRNGKey(1), cfg))
    x = rng.random((32, 3)).astype(np.float32)
    got = np.asarray(grid_encode(jnp.asarray(x), jnp.asarray(table), cfg))
    s = cfg.per_level_scale
    for lvl in range(2):
        scale = np.exp2(lvl * np.log2(s)) * cfg.base_resolution - 1.0
        resolution = int(np.ceil(scale)) + 1
        hms = cfg.offsets[lvl + 1] - cfg.offsets[lvl]
        ref = _ref_encode_one_level(x.astype(np.float64), table.astype(np.float64),
                                    resolution, hms, cfg.offsets[lvl],
                                    "tiled", False, scale)
        np.testing.assert_allclose(got[:, lvl * 2:(lvl + 1) * 2], ref, atol=1e-5)


def test_oob_is_zero(rng):
    cfg = GridEncodeConfig(num_levels=2, desired_resolution=32)
    table = init_grid_table(jax.random.PRNGKey(0), cfg) + 1.0  # nonzero table
    x = jnp.array([[1.5, 0.5, 0.5], [-0.1, 0.2, 0.2]])
    out = np.asarray(grid_encode(x, table, cfg))
    np.testing.assert_array_equal(out, 0.0)


def test_gradcheck_table(rng):
    """Numeric gradcheck of d(output)/d(table), the analog of the reference's
    testing/test_hashgrid_grad.py:51-62."""
    cfg = GridEncodeConfig(input_dim=3, num_levels=2, level_dim=2,
                           base_resolution=4, log2_hashmap_size=6,
                           desired_resolution=8)
    table = np.asarray(
        init_grid_table(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
    ).astype(np.float64)
    x = jnp.asarray(rng.random((8, 3)), dtype=jnp.float64)

    def f(t):
        return jnp.sum(grid_encode(x, t, cfg) ** 2)

    g_auto = np.asarray(jax.grad(f)(jnp.asarray(table)))
    eps = 1e-4
    flat_idx = [(i, j) for i in range(0, table.shape[0], 17) for j in range(2)]
    for (i, j) in flat_idx[:40]:
        tp = table.copy(); tp[i, j] += eps
        tm = table.copy(); tm[i, j] -= eps
        num = (float(f(jnp.asarray(tp))) - float(f(jnp.asarray(tm)))) / (2 * eps)
        np.testing.assert_allclose(g_auto[i, j], num, atol=1e-5)


def test_gradcheck_inputs(rng):
    """d(output)/d(x) numeric check (dy_dx path in the reference)."""
    cfg = GridEncodeConfig(input_dim=3, num_levels=2, level_dim=2,
                           base_resolution=4, log2_hashmap_size=6,
                           desired_resolution=8)
    table = init_grid_table(jax.random.PRNGKey(0), cfg).astype(jnp.float64)
    x = np.asarray(rng.random((4, 3)) * 0.8 + 0.1)

    def f(xx):
        return jnp.sum(grid_encode(xx, table, cfg) ** 2)

    g_auto = np.asarray(jax.grad(f)(jnp.asarray(x)))
    eps = 1e-5
    for i in range(4):
        for d in range(3):
            xp = x.copy(); xp[i, d] += eps
            xm = x.copy(); xm[i, d] -= eps
            num = (float(f(jnp.asarray(xp))) - float(f(jnp.asarray(xm)))) / (2 * eps)
            np.testing.assert_allclose(g_auto[i, d], num, atol=1e-4)


def test_grid_tv_loss_parity_dense():
    """grid_tv_loss vs a naive dense TV on a small TILED grid where every
    cell is dense-indexed: sampling one point per cell must reproduce the
    mean forward-difference energy exactly (VERDICT.md missing #7)."""
    from sealdnerf_tpu.ops.grid_encode import (
        GridEncodeConfig, init_grid_table, grid_tv_loss)
    cfg = GridEncodeConfig(input_dim=3, num_levels=1, level_dim=2,
                           base_resolution=8, desired_resolution=8,
                           log2_hashmap_size=19, gridtype="tiled",
                           align_corners=True)
    table = init_grid_table(jax.random.PRNGKey(0), cfg) * 1e4  # O(1) values
    res = cfg.resolutions[0]
    # one sample per cell center
    g = (np.arange(res - 1) + 0.5) / (res - 1)  # cells 0..res-2
    xs = np.stack(np.meshgrid(g, g, g, indexing="ij"), -1).reshape(-1, 3)
    got = float(grid_tv_loss(table, cfg, jnp.asarray(xs, jnp.float32)))

    # naive dense: mean over cells of sum_d 0.5*|v[c]-v[c+e_d]|^2
    tab = np.asarray(table)
    stride = [1, res, res * res]  # _grid_index: index += pg[d]*stride_d

    def val(i, j, k):
        return tab[(i * stride[0] + j * stride[1] + k * stride[2])
                   % tab.shape[0]]

    acc = []
    for i in range(res - 1):
        for j in range(res - 1):
            for k in range(res - 1):
                v0 = val(i, j, k)
                e = 0.0
                for d, nb in enumerate([(i + 1, j, k), (i, j + 1, k),
                                        (i, j, k + 1)]):
                    ni, nj, nk = [min(v, res - 1) for v in nb]
                    e += 0.5 * np.sum((v0 - val(ni, nj, nk)) ** 2)
                acc.append(e)
    want = float(np.mean(acc))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_grid_tv_loss_gradient_flows():
    from sealdnerf_tpu.ops.grid_encode import (
        GridEncodeConfig, init_grid_table, grid_tv_loss)
    cfg = GridEncodeConfig(input_dim=3, num_levels=4, level_dim=2,
                           base_resolution=4, desired_resolution=32,
                           log2_hashmap_size=10)
    table = init_grid_table(jax.random.PRNGKey(1), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(2), (128, 3))
    g = jax.grad(lambda t: grid_tv_loss(t, cfg, x))(table)
    assert float(jnp.abs(g).max()) > 0
    assert np.isfinite(np.asarray(g)).all()
