"""3D Morton (Z-order) curve encode / decode, vectorized bit-twiddling.

Parity with reference raymarching/src/raymarching.cu:29-81 (__morton3D /
__morton3D_invert via __expand_bits / __compact_bits). Supports coords in
[0, 1024) (10 bits per axis, 30-bit codes), which covers the 128^3 grids used
everywhere in the framework.

Unlike the reference, the occupancy grid in this framework is stored in raster
(x-major) order -- Morton order is a GPU cache-locality trick that buys nothing
for XLA gathers -- but these ops are kept for API parity (seal-mapper edit
region precomputation and tests use them).
"""

import jax.numpy as jnp


def _expand_bits(v):
    # v: uint32 in [0, 1024). Spreads bits so there are 2 zero bits between each.
    v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return v


def _compact_bits(v):
    v = v & jnp.uint32(0x49249249)
    v = (v | (v >> 2)) & jnp.uint32(0xC30C30C3)
    v = (v | (v >> 4)) & jnp.uint32(0x0F00F00F)
    v = (v | (v >> 8)) & jnp.uint32(0xFF0000FF)
    v = (v | (v >> 16)) & jnp.uint32(0x0000FFFF)
    return v


def morton3d(coords):
    """coords: int array [..., 3] in [0, 1024) -> int32 Morton codes [...]."""
    c = coords.astype(jnp.uint32)
    code = (
        _expand_bits(c[..., 0])
        | (_expand_bits(c[..., 1]) << 1)
        | (_expand_bits(c[..., 2]) << 2)
    )
    return code.astype(jnp.int32)


def morton3d_invert(codes):
    """codes: int array [...] -> int32 coords [..., 3]."""
    v = codes.astype(jnp.uint32)
    x = _compact_bits(v >> 0)
    y = _compact_bits(v >> 1)
    z = _compact_bits(v >> 2)
    return jnp.stack([x, y, z], axis=-1).astype(jnp.int32)
