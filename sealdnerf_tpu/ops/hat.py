"""Hat-basis (one-hot linear interpolation) primitives.

The TPU performance model (PERF_NOTES.md) rules out random access: XLA
gather runs at 0.14 G elements/s while the MXU does 227 TFLOP/s. These
primitives express 1-D linear interpolation of a dense table as a
matmul with a sparse-in-theory, dense-in-practice "hat" basis matrix:

    u[s, i] = max(0, 1 - |x_s * (res-1) - i|)        (2 nonzeros/row)
    interp(x, table) = u @ table                      [S, R]

This is exact linear interpolation, differentiable in both x (through
the hat) and the table (the backward is u^T @ g -- another matmul, which
also replaces the reference's atomicAdd scatter in
gridencoder/src/gridencoder.cu:249-341 for the factorized field).

Used by the TPU-native factorized field (models/cp.py) and anywhere a
small dense axis table must be sampled at arbitrary coordinates.
"""

from functools import partial

import jax
import jax.numpy as jnp


def hat_basis(x01, res: int, dtype=jnp.bfloat16):
    """Hat basis matrix for positions x01 in [0, 1].

    Args:
      x01: [...] float positions; values outside [0, 1] are clamped.
      res: number of grid points along the axis.

    Returns:
      [..., res] basis with rows summing to 1 (two nonzero entries:
      the linear-interpolation weights of the two surrounding points).
    """
    x = jnp.clip(x01, 0.0, 1.0) * (res - 1)
    i = jnp.arange(res, dtype=jnp.float32)
    u = jnp.maximum(0.0, 1.0 - jnp.abs(x[..., None] - i))
    return u.astype(dtype)


def line_interp(x01, table, compute_dtype=jnp.bfloat16):
    """Linearly interpolate a 1-D table at positions x01.

    Args:
      x01: [S] positions in [0, 1].
      table: [res, R] values at the grid points.

    Returns:
      [S, R] float32.
    """
    u = hat_basis(x01, table.shape[0], dtype=compute_dtype)
    return jnp.dot(u, table.astype(compute_dtype),
                   preferred_element_type=jnp.float32)
