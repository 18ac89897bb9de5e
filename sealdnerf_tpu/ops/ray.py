"""Ray utilities: AABB slab intersection and background-sphere coordinates.

Parity with reference raymarching/src/raymarching.cu:
- near_far_from_aabb (:92-156): per-ray slab test against a (possibly
  rectangular) AABB; misses get near = far = a huge sentinel so downstream
  marching generates zero samples.
- sph_from_ray (:163-209): intersection of the ray with a background sphere of
  given radius, returned as (theta, phi) normalized to [-1, 1] (y-up).
"""

import jax.numpy as jnp

_MISS = 1e10


def near_far_from_aabb(rays_o, rays_d, aabb, min_near=0.2):
    """Slab-test rays against an AABB.

    Args:
      rays_o, rays_d: [..., 3] float. Directions need not be normalized.
      aabb: [6] float (xmin, ymin, zmin, xmax, ymax, zmax).
      min_near: clamp for the near plane.

    Returns:
      nears, fars: [...] float. Misses get near = far = 1e10.
    """
    rd = 1.0 / rays_d  # inf on zero components is fine: IEEE slab test
    t0 = (aabb[:3] - rays_o) * rd
    t1 = (aabb[3:] - rays_o) * rd
    tmin = jnp.minimum(t0, t1)
    tmax = jnp.maximum(t0, t1)
    near = jnp.max(tmin, axis=-1)
    far = jnp.min(tmax, axis=-1)
    miss = near > far
    near = jnp.maximum(near, min_near)
    near = jnp.where(miss, _MISS, near)
    far = jnp.where(miss | (far < near), near, far)
    return near, far


def sph_from_ray(rays_o, rays_d, radius):
    """Intersect rays with the background sphere ||o + t d|| = radius.

    Returns [..., 2] coords (theta, phi) in [-1, 1] with y the up axis,
    matching raymarching.cu:163-209 (always takes the larger/positive root).
    """
    a = jnp.sum(rays_d * rays_d, axis=-1)
    b = jnp.sum(rays_o * rays_d, axis=-1)  # actually B/2
    c = jnp.sum(rays_o * rays_o, axis=-1) - radius * radius
    disc = jnp.maximum(b * b - a * c, 0.0)
    t = (-b + jnp.sqrt(disc)) / a
    p = rays_o + t[..., None] * rays_d
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    theta = jnp.arctan2(jnp.sqrt(x * x + z * z), y)  # [0, pi)
    phi = jnp.arctan2(z, x)  # [-pi, pi)
    return jnp.stack([2.0 * theta / jnp.pi - 1.0, phi / jnp.pi], axis=-1)
