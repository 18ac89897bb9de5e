"""Differentiable RGB <-> HSV conversions and the Seal color modifiers.

Parity with reference SealNeRF/color_utils.py:7-81 (rgb2hsv_torch /
hsv2rgb_torch; the reference's "hsl" functions are the same HSV code under a
different name and modify_rgb uses the hsv pair) and seal_utils.py:747-777
(modify_hsv / modify_rgb).
"""

import jax.numpy as jnp


def rgb_to_hsv(rgb, eps: float = 1e-8):
    """rgb: [..., 3] in [0,1] -> hsv: [..., 3], h in [0,1)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.max(rgb, axis=-1)
    minc = jnp.min(rgb, axis=-1)
    v = maxc
    delta = maxc - minc
    s = delta / (maxc + eps)
    # hue
    rc = (maxc - r) / (delta + eps)
    gc = (maxc - g) / (delta + eps)
    bc = (maxc - b) / (delta + eps)
    h = jnp.where(r == maxc, bc - gc,
                  jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc))
    h = (h / 6.0) % 1.0
    h = jnp.where(delta < eps, 0.0, h)
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(hsv):
    """hsv: [..., 3], h in [0,1) -> rgb [..., 3]."""
    h, s, v = hsv[..., 0] % 1.0, jnp.clip(hsv[..., 1], 0, 1), hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.choose(i, [v, q, p, p, t, v], mode="clip")
    g = jnp.choose(i, [t, v, v, q, p, p], mode="clip")
    b = jnp.choose(i, [p, p, t, v, v, q], mode="clip")
    return jnp.stack([r, g, b], axis=-1)


def modify_hsv(rgb, modification):
    """Add an (dh, ds, dv) offset in HSV space (seal_utils.py:747-759)."""
    hsv = rgb_to_hsv(rgb)
    return hsv_to_rgb(hsv + jnp.asarray(modification)[None])


def modify_rgb(rgb, target_rgb, light_offset: float = 0.0):
    """Replace hue+saturation with the target color's, keeping relative
    lightness variation (seal_utils.py:762-777)."""
    hsv = rgb_to_hsv(rgb)
    target = rgb_to_hsv(jnp.asarray(target_rgb, dtype=rgb.dtype).reshape(-1, 3))
    raw_v = hsv[..., 2]
    v_offset = raw_v - jnp.mean(raw_v)
    new_v = jnp.clip(target[..., 2] + v_offset + light_offset, 0.0, 1.0)
    out = jnp.stack([
        jnp.broadcast_to(target[..., 0], hsv[..., 0].shape),
        jnp.broadcast_to(target[..., 1], hsv[..., 1].shape),
        new_v,
    ], axis=-1)
    return hsv_to_rgb(out)
