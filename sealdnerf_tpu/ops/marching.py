"""Occupancy-grid-accelerated ray marching, TPU-native.

Replaces reference raymarching/src/raymarching.cu:312-490 (march_rays_train,
a two-pass per-ray loop with atomicAdd compaction) and :701-914 (march_rays,
iterative alive-ray compaction). Those are GPU-shaped algorithms: dynamic
output sizes, atomics, warp-serial inner loops. The TPU design here keeps the
exact sampling semantics but is fully parallel with static shapes:

1. Candidate lattice: every ray gets K = max_steps candidate positions
   t_k = t0 + k*dt (dt_gamma = 0) or a geometric-growth sequence (dt_gamma > 0),
   the same t sequence the CUDA stepper visits through occupied space. The
   CUDA empty-space skip ("jump to next voxel boundary, keep stepping") lands
   on this same lattice when dt_gamma = 0, so samples are identical; for
   dt_gamma > 0 the lattice phase differs slightly inside occupied regions
   (documented deviation; quality-equivalent).
2. Occupancy test: one vectorized gather per candidate against a bool
   [cascades, H, H, H] grid, with the reference's mip-level selection
   (max(mip_from_pos, mip_from_dt), raymarching.cu:368-379).
3. Compaction: a global cumsum over the [N*K] validity mask assigns each kept
   sample a slot in a packed buffer of static size M (the atomicAdd counter
   becomes a prefix sum). Samples beyond the budget are dropped, mirroring the
   reference's mean_count buffer-overflow drop (raymarching/raymarching.py:
   196-203, raymarching.cu:416).

The packed output (xyzs/dirs/dts/ts/ray_id/valid) feeds the network once and
then `ops.composite.composite_packed`, which replaces the per-ray rays
(idx, offset, count) triple with segment ids.

Deviation from reference: depth uses absolute t (sum w*t_k) rather than
t relative to the ray's perturbed start (raymarching.cu:460-461), which makes
GUI depth back-projection (rays_o + depth*rays_d, nerf/utils.py:828) exact.
"""

import math
from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

SQRT3 = 1.7320508075688772


@dataclass(frozen=True)
class MarchConfig:
    """Static marching configuration (hashable; safe as a jit static)."""

    bound: float = 1.0
    cascades: int = 1        # C: 1 + ceil(log2(bound)) in practice
    grid_size: int = 128     # H
    dt_gamma: float = 0.0    # cone angle: step growth factor
    max_steps: int = 1024    # K: candidate count and per-ray sample cap
    min_near: float = 0.2

    @property
    def dt_min(self) -> float:
        return 2.0 * SQRT3 / self.max_steps

    @property
    def dt_max(self) -> float:
        return 2.0 * SQRT3 * (1 << (self.cascades - 1)) / self.grid_size


def _mip_from_val(mx, cascades):
    """frexp-style exponent: [0.5,1)->0, [1,2)->1, ... clamped to [0, C-1].

    Matches raymarching.cu:42-55 (mip_from_pos / mip_from_dt share this).
    """
    e = jnp.ceil(jnp.log2(jnp.maximum(mx, 1e-10)))
    # frexp exponent: mx in [2^(e-1), 2^e) -> e; log2 then ceil gives e except
    # at exact powers of two where log2 is integral -- nudge up by comparing.
    e = jnp.where(mx >= jnp.exp2(e), e + 1.0, e)
    return jnp.clip(e, 0, cascades - 1).astype(jnp.int32)


def candidate_ts(nears, cfg: MarchConfig, noise=None):
    """Per-ray candidate t lattice [N, K] plus the step sizes [N, K].

    dt_gamma == 0: closed-form uniform lattice. dt_gamma > 0: K-step scan of
    t += clamp(t * dt_gamma, dt_min, dt_max) (raymarching.cu:365, 397).
    """
    k = cfg.max_steps
    dt0 = jnp.clip(nears * cfg.dt_gamma, cfg.dt_min, cfg.dt_max)
    t0 = nears if noise is None else nears + dt0 * noise
    if cfg.dt_gamma == 0.0:
        # Cover the whole AABB: for bound > 1 a dt_min-pitch lattice of K
        # steps spans only 2*sqrt(3) world units, while the reference's
        # empty-space skip advances t without consuming sample slots
        # (raymarching.cu march loop) and reaches the full extent. Scale
        # the pitch with the scene bound (residual deviation: coarser
        # uniform resolution than the reference's adaptive skip;
        # ADVICE.md r1).
        dt = cfg.dt_min * max(cfg.bound, 1.0)
        ks = jnp.arange(k, dtype=jnp.float32)
        ts = t0[:, None] + ks[None, :] * dt
        dts = jnp.full_like(ts, dt)
        return ts, dts

    def step(t, _):
        dt = jnp.clip(t * cfg.dt_gamma, cfg.dt_min, cfg.dt_max)
        return t + dt, (t, dt)

    _, (ts, dts) = jax.lax.scan(step, t0, None, length=k)
    return ts.T, dts.T  # scan stacks along axis 0 = step; transpose to [N, K]


def occupancy_at(xyzs, dts, occ_grid, cfg: MarchConfig):
    """Occupancy lookup with reference mip-level selection.

    Args:
      xyzs: [..., 3] positions (already clamped to +-bound).
      dts: [...] step sizes (for mip_from_dt).
      occ_grid: bool [cascades, H, H, H].
    Returns: bool [...].
    """
    h = cfg.grid_size
    mx = jnp.max(jnp.abs(xyzs), axis=-1)
    level = jnp.maximum(
        _mip_from_val(mx, cfg.cascades),
        _mip_from_val(dts * h * 0.5, cfg.cascades),
    )
    mip_bound = jnp.minimum(jnp.exp2(level.astype(jnp.float32)), cfg.bound)
    nxyz = jnp.clip(
        0.5 * (xyzs / mip_bound[..., None] + 1.0) * h, 0.0, h - 1
    ).astype(jnp.int32)
    flat = (
        (level * h + nxyz[..., 0]) * h + nxyz[..., 1]
    ) * h + nxyz[..., 2]
    return jnp.take(occ_grid.reshape(-1), flat.reshape(-1)).reshape(flat.shape)


@partial(jax.jit, static_argnames=("cfg", "m_budget"))
def march_rays(rays_o, rays_d, nears, fars, occ_grid, cfg: MarchConfig,
               m_budget: int, noise: Optional[jax.Array] = None):
    """March N rays into a packed sample buffer of static size m_budget.

    Args:
      rays_o, rays_d: [N, 3] float32.
      nears, fars: [N] float32 from near_far_from_aabb.
      occ_grid: bool [cascades, H, H, H].
      cfg: MarchConfig.
      m_budget: static packed-buffer size (total samples across all rays).
      noise: optional [N] in [0,1) start-offset perturbation.

    Returns dict with:
      xyzs [M,3], dirs [M,3], dts [M], ts [M], ray_id [M] int32 (ascending),
      valid [M] bool, counts [N] int32 (kept samples per ray),
      total int32 (kept before budget drop).
    """
    n = rays_o.shape[0]
    k = cfg.max_steps

    ts, dts = candidate_ts(nears, cfg, noise)  # [N, K]
    pos = rays_o[:, None, :] + ts[..., None] * rays_d[:, None, :]
    pos = jnp.clip(pos, -cfg.bound, cfg.bound)
    occ = occupancy_at(pos, dts, occ_grid, cfg)  # [N, K]
    valid = occ & (ts < fars[:, None])  # [N, K]

    # Global compaction: row-major flatten keeps each ray's samples contiguous
    # and in ascending-t order, so packed ray_id is ascending.
    vflat = valid.reshape(-1)
    cum = jnp.cumsum(vflat.astype(jnp.int32))
    slot = cum - 1
    keep = vflat & (slot < m_budget)
    total = cum[-1]

    # Scatter the flat candidate index; dropped samples go to overflow slot M.
    tgt = jnp.where(keep, slot, m_budget)
    src = jnp.full((m_budget + 1,), n * k, dtype=jnp.int32)
    src = src.at[tgt].set(jnp.arange(n * k, dtype=jnp.int32))[:m_budget]

    packed_valid = src < n * k
    src = jnp.minimum(src, n * k - 1)  # clamp padding for safe gathers
    ray_id = src // k

    t_p = ts.reshape(-1)[src]
    dt_p = dts.reshape(-1)[src]
    o_p = rays_o[ray_id]
    d_p = rays_d[ray_id]
    xyz_p = jnp.clip(o_p + t_p[:, None] * d_p, -cfg.bound, cfg.bound)

    counts = jax.ops.segment_sum(
        keep.astype(jnp.int32), (jnp.arange(n * k, dtype=jnp.int32) // k),
        num_segments=n, indices_are_sorted=True)

    return {
        "xyzs": xyz_p,
        "dirs": d_p,
        "dts": dt_p,
        "ts": t_p,
        "ray_id": ray_id,
        "valid": packed_valid,
        "counts": counts,
        "total": total,
    }
