"""On-device ray generation.

Parity with reference nerf/utils.py:54-137 (get_rays: full-image, random,
error-map-weighted, and patch pixel sampling) and nerf/provider.py:57-91
(rand_poses orbit sampler). All functions are jit-able; the train step calls
them on device so there is no host dataloader in the hot path.
"""

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp


def _pixel_dirs(i, j, intrinsics):
    """Camera-space unit directions for pixel centers i (x), j (y)."""
    fx, fy, cx, cy = intrinsics[0], intrinsics[1], intrinsics[2], intrinsics[3]
    zs = jnp.ones_like(i)
    xs = (i - cx) / fx
    ys = (j - cy) / fy
    d = jnp.stack([xs, ys, zs], axis=-1)
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


@partial(jax.jit, static_argnames=("h", "w", "n", "patch_size"))
def get_rays(rng, poses, intrinsics, h: int, w: int, n: int = -1,
             error_map: Optional[jax.Array] = None, patch_size: int = 1,
             inds: Optional[jax.Array] = None):
    """Generate rays for a batch of poses.

    Args:
      rng: PRNG key (unused when n <= 0 or inds is given).
      poses: [B, 4, 4] cam2world.
      intrinsics: [4] (fx, fy, cx, cy).
      h, w: image size. n: rays per image (-1 = all pixels).
      error_map: optional [B, 128*128] sampling weights.
      patch_size: sample n//p^2 random p x p patches instead (LPIPS loss).
      inds: optional [B, N] precomputed flat pixel indices (host-resident
        no-preload path: pixels are sampled host-side, the matching rays
        are generated here).

    Returns dict(rays_o [B,N,3], rays_d [B,N,3], inds [B,N] or None,
                 inds_coarse [B,N] or None).
    """
    b = poses.shape[0]
    out = {"inds": None, "inds_coarse": None}

    if inds is not None:
        i = (inds % w).astype(jnp.float32) + 0.5
        j = (inds // w).astype(jnp.float32) + 0.5
        out["inds"] = inds
    elif n > 0:
        n = min(n, h * w)
        if patch_size > 1:
            num_patch = n // (patch_size ** 2)
            n = num_patch * patch_size ** 2
            kx, ky = jax.random.split(rng)
            ix = jax.random.randint(kx, (b, num_patch), 0, h - patch_size)
            iy = jax.random.randint(ky, (b, num_patch), 0, w - patch_size)
            px, py = jnp.meshgrid(jnp.arange(patch_size), jnp.arange(patch_size),
                                  indexing="ij")
            offs = jnp.stack([px.reshape(-1), py.reshape(-1)], -1)  # [p^2, 2]
            gx = ix[..., None] + offs[None, None, :, 0]
            gy = iy[..., None] + offs[None, None, :, 1]
            inds = (gx * w + gy).reshape(b, n)
        elif error_map is None:
            inds = jax.random.randint(rng, (n,), 0, h * w)
            inds = jnp.broadcast_to(inds, (b, n))
        else:
            # weighted sample on the fixed 128x128 error grid, then jitter to
            # full res (nerf/utils.py:104-114).
            k1, k2, k3 = jax.random.split(rng, 3)
            logits = jnp.log(jnp.maximum(error_map, 1e-12))
            inds_coarse = jax.random.categorical(k1, logits[:, None, :],
                                                 shape=(b, n))
            cx_, cy_ = inds_coarse // 128, inds_coarse % 128
            sx, sy = h / 128.0, w / 128.0
            ix = jnp.clip((cx_ * sx + jax.random.uniform(k2, (b, n)) * sx)
                          .astype(jnp.int32), 0, h - 1)
            iy = jnp.clip((cy_ * sy + jax.random.uniform(k3, (b, n)) * sy)
                          .astype(jnp.int32), 0, w - 1)
            inds = ix * w + iy
            out["inds_coarse"] = inds_coarse
        i = (inds % w).astype(jnp.float32) + 0.5  # x pixel coord
        j = (inds // w).astype(jnp.float32) + 0.5  # y pixel coord
        out["inds"] = inds
    else:
        inds = jnp.arange(h * w)
        i = jnp.broadcast_to((inds % w).astype(jnp.float32) + 0.5, (b, h * w))
        j = jnp.broadcast_to((inds // w).astype(jnp.float32) + 0.5, (b, h * w))

    d_cam = _pixel_dirs(i, j, intrinsics)  # [B, N, 3]
    rays_d = jnp.einsum("bnc,bdc->bnd", d_cam, poses[:, :3, :3])
    rays_o = jnp.broadcast_to(poses[:, None, :3, 3], rays_d.shape)
    out["rays_o"] = rays_o
    out["rays_d"] = rays_d
    return out


def rand_poses(rng, size: int, radius: float = 1.0,
               theta_range=(jnp.pi / 3, 2 * jnp.pi / 3),
               phi_range=(0.0, 2 * jnp.pi)):
    """Random orbit-camera poses (reference nerf/provider.py:57-91), y-up."""
    k1, k2 = jax.random.split(rng)
    thetas = jax.random.uniform(k1, (size,), minval=theta_range[0],
                                maxval=theta_range[1])
    phis = jax.random.uniform(k2, (size,), minval=phi_range[0],
                              maxval=phi_range[1])
    centers = jnp.stack([
        radius * jnp.sin(thetas) * jnp.sin(phis),
        radius * jnp.cos(thetas),
        radius * jnp.sin(thetas) * jnp.cos(phis),
    ], axis=-1)

    def normalize(v):
        return v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-10)

    forward = -normalize(centers)
    up = jnp.broadcast_to(jnp.array([0.0, -1.0, 0.0]), forward.shape)
    right = normalize(jnp.cross(forward, up))
    up = normalize(jnp.cross(right, forward))
    rot = jnp.stack([right, up, forward], axis=-1)  # [B, 3, 3]
    poses = jnp.tile(jnp.eye(4), (size, 1, 1))
    poses = poses.at[:, :3, :3].set(rot).at[:, :3, 3].set(centers)
    return poses
