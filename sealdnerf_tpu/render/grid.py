"""Occupancy (density) grid state and maintenance.

Parity with reference nerf/renderer.py:
- state (:87-101): density_grid [CAS, H^3] float (-1 marks untrained cells),
  occupancy bool grid (the bitfield, kept unpacked -- see ops/packbits.py),
  mean_density, iter_density. Here it is an explicit pytree dict, updated
  functionally inside jit, not module buffers.
- mark_untrained_grid (:380-442): camera-frustum coverage test; uncovered
  cells are set to -1 and never turn occupied.
- update_density_grid (:445-538): density re-query sweep + EMA
  max(grid * decay, new), mean-density threshold, occupancy refresh.
  Full 128^3-per-cascade sweep for the first 16 updates; after that the
  reference samples H^3/4 random + H^3/4 currently-occupied cells -- the
  occupied-resampling needs dynamic shapes, so here the partial update draws
  2 * H^3/4 uniform random cells instead (same expected coverage; stale
  occupied cells decay at half the reference rate). Documented deviation.

Grid layout: raster (x, y, z) order, NOT Morton -- Morton is a GPU
cache-locality trick; XLA gathers prefer plain strides.
"""

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from ..ops.marching import MarchConfig


@dataclass(frozen=True)
class GridConfig:
    march: MarchConfig
    density_thresh: float = 0.01
    density_scale: float = 1.0
    decay: float = 0.95

    @property
    def cascades(self):
        return self.march.cascades

    @property
    def grid_size(self):
        return self.march.grid_size

    @property
    def bound(self):
        return self.march.bound


def init_grid_state(cfg: GridConfig):
    h3 = cfg.grid_size ** 3
    return {
        "density_grid": jnp.zeros((cfg.cascades, h3), dtype=jnp.float32),
        "occ": jnp.zeros((cfg.cascades,) + (cfg.grid_size,) * 3, dtype=bool),
        "mean_density": jnp.zeros((), dtype=jnp.float32),
        "iter_density": jnp.zeros((), dtype=jnp.int32),
    }


def _cell_coords(cfg: GridConfig):
    """[H^3, 3] int32 raster-order cell coords."""
    h = cfg.grid_size
    idx = jnp.arange(h ** 3, dtype=jnp.int32)
    x = idx // (h * h)
    y = (idx // h) % h
    z = idx % h
    return jnp.stack([x, y, z], axis=-1)


def _cas_bound(cfg: GridConfig, cas: int):
    return min(float(1 << cas), cfg.bound)


@partial(jax.jit, static_argnames=("cfg",))
def mark_untrained_grid(state, poses, intrinsics, cfg: GridConfig):
    """Set cells never seen by any training camera to -1.

    poses: [B, 4, 4] cam2world; intrinsics: [4] (fx, fy, cx, cy).
    Mirrors nerf/renderer.py:380-442.
    """
    h = cfg.grid_size
    fx, fy, cx, cy = intrinsics[0], intrinsics[1], intrinsics[2], intrinsics[3]
    coords = _cell_coords(cfg).astype(jnp.float32)
    world = 2.0 * coords / (h - 1) - 1.0  # [H^3, 3] in [-1, 1]

    rot = poses[:, :3, :3]  # [B, 3, 3]
    trans = poses[:, :3, 3]  # [B, 3]

    def covered(cas_world, half):
        # cam_xyzs = (world - t) @ R  (world2cam; R is c2w rotation)
        def one_chunk(chunk):
            cam = jnp.einsum("nc,bcd->bnd", chunk, rot) - jnp.einsum(
                "bc,bcd->bd", trans, rot)[:, None, :]
            mz = cam[..., 2] > 0
            mx = jnp.abs(cam[..., 0]) < cx / fx * cam[..., 2] + half * 2
            my = jnp.abs(cam[..., 1]) < cy / fy * cam[..., 2] + half * 2
            return jnp.any(mz & mx & my, axis=0)  # [n]

        csize = min(2 ** 15, cas_world.shape[0])
        chunks = cas_world.reshape(-1, csize, 3)
        return jax.lax.map(one_chunk, chunks).reshape(-1)

    grid = state["density_grid"]
    for cas in range(cfg.cascades):
        bound = _cas_bound(cfg, cas)
        half = bound / h
        seen = covered(world * (bound - half), half)
        grid = grid.at[cas].set(jnp.where(seen, grid[cas], -1.0))
    return {**state, "density_grid": grid}


def _query_chunked(density_fn, params, xyzs, chunk=2 ** 16):
    """Evaluate density over [N, 3] points in fixed-size chunks via lax.map."""
    n = xyzs.shape[0]
    chunk = min(chunk, n)
    pad = (-n) % chunk
    x = jnp.concatenate([xyzs, jnp.zeros((pad, 3), xyzs.dtype)], axis=0)
    x = x.reshape(-1, chunk, 3)
    sig = jax.lax.map(lambda c: density_fn(params, c)[0], x)
    return sig.reshape(-1)[:n]


@partial(jax.jit, static_argnames=("density_fn", "cfg", "full"))
def update_density_grid(state, params, density_fn, rng, cfg: GridConfig,
                        full: bool):
    """One density-grid refresh step. density_fn(params, x) -> (sigma, aux).

    full=True: sweep all cells (first 16 updates, nerf/renderer.py:456-484).
    full=False: 2 * H^3/4 uniform random cells (partial, :488-514 modulo the
    occupied-resampling deviation documented above).
    """
    h = cfg.grid_size
    h3 = h ** 3
    grid = state["density_grid"]
    tmp = jnp.full_like(grid, -1.0)

    if full:
        coords = _cell_coords(cfg)  # [H^3, 3]
        n_pts = h3
        indices = jnp.arange(h3, dtype=jnp.int32)
    else:
        n_pts = h3 // 2
        rng, k = jax.random.split(rng)
        coords = jax.random.randint(k, (n_pts, 3), 0, h, dtype=jnp.int32)
        indices = (coords[:, 0] * h + coords[:, 1]) * h + coords[:, 2]

    xyz01 = 2.0 * coords.astype(jnp.float32) / (h - 1) - 1.0  # [-1, 1]
    for cas in range(cfg.cascades):
        bound = _cas_bound(cfg, cas)
        half = bound / h
        rng, k = jax.random.split(rng)
        noise = (jax.random.uniform(k, (n_pts, 3)) * 2.0 - 1.0) * half
        pts = xyz01 * (bound - half) + noise
        sig = _query_chunked(density_fn, params, pts) * cfg.density_scale
        tmp = tmp.at[cas, indices].set(sig)

    valid = (grid >= 0) & (tmp >= 0)
    grid = jnp.where(valid, jnp.maximum(grid * cfg.decay, tmp), grid)
    mean_density = jnp.mean(jnp.clip(grid, 0.0, None))
    thresh = jnp.minimum(mean_density, cfg.density_thresh)
    occ = (grid > thresh).reshape((cfg.cascades,) + (h,) * 3)
    return {
        "density_grid": grid,
        "occ": occ,
        "mean_density": mean_density,
        "iter_density": state["iter_density"] + 1,
    }


def occupancy_bitfield(state, cfg: GridConfig):
    """Packed uint8 bitfield view for checkpoint parity (nerf/renderer.py:530)."""
    from ..ops.packbits import packbits
    thresh = jnp.minimum(state["mean_density"], cfg.density_thresh)
    return packbits(state["density_grid"].reshape(-1), thresh)
