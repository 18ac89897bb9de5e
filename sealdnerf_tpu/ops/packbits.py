"""Density grid <-> occupancy bitfield.

Parity with reference raymarching/src/raymarching.cu:268-300 (kernel_packbits):
cell i of byte n is bit (1 << i) and is set when grid[n*8+i] > thresh.

In this framework the marching kernels consume a plain bool occupancy grid
(byte-packing is a GPU memory-bandwidth trick; on TPU a bool gather is the fast
path), but packbits/unpackbits are kept for checkpoint compatibility and for
the Seal `hack_bitfield` machinery that edits occupancy at byte granularity.
"""

import jax.numpy as jnp

_BITS = jnp.array([1, 2, 4, 8, 16, 32, 64, 128], dtype=jnp.uint8)


def packbits(grid, thresh):
    """grid: float [..., 8*K] -> uint8 [..., K] bitfield (LSB-first)."""
    occ = (grid > thresh).reshape(*grid.shape[:-1], -1, 8).astype(jnp.uint8)
    return jnp.sum(occ * _BITS, axis=-1).astype(jnp.uint8)


def unpackbits(bitfield):
    """uint8 [..., K] -> bool [..., 8*K] (LSB-first)."""
    bits = (bitfield[..., None] & _BITS) > 0
    return bits.reshape(*bitfield.shape[:-1], -1)
