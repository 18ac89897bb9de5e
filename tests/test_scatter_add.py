"""Correctness tests for the sort-and-accumulate scatter (the TPU
replacement for XLA scatter in the hash-encoder backward)."""
import numpy as np
import jax.numpy as jnp
from sealdnerf_tpu.ops.scatter_add import sorted_chunk_scatter_add


def _check(idx, vals, tbl, **kw):
    ref = np.zeros((tbl, vals.shape[1]), np.float32)
    np.add.at(ref, idx, vals)
    got = np.asarray(sorted_chunk_scatter_add(
        jnp.asarray(idx, jnp.int32), jnp.asarray(vals), tbl,
        force_histogram=True, **kw))
    np.testing.assert_allclose(got, ref, atol=5e-4)


def test_uniform(rng):
    _check(rng.integers(0, 50000, 100000),
           rng.standard_normal((100000, 2)).astype(np.float32), 50000,
           chunk=2048)


def test_dense_collisions(rng):
    _check(rng.integers(0, 500, 100000),
           rng.standard_normal((100000, 2)).astype(np.float32), 500,
           chunk=2048)


def test_skewed(rng):
    idx = (rng.random(65536) ** 4 * 200000).astype(np.int64)
    _check(idx, rng.standard_normal((65536, 2)).astype(np.float32), 200000,
           chunk=1024)


def test_tiny_table(rng):
    _check(rng.integers(0, 64, 5000),
           rng.standard_normal((5000, 2)).astype(np.float32), 64, chunk=512)


def test_empty_and_single(rng):
    _check(np.array([3]), np.array([[1.0, 2.0]], np.float32), 10, chunk=256)
