"""Dense two-level ray marching -- the TPU fast path.

Replaces the round-1 candidate-lattice march (ops/marching.py) for the
training/inference hot loop. That design tested occupancy at N x 1024
candidates per step (4.2M XLA gathers at 0.14 G/s plus a 4.2M cumsum and
scatter -- ~100 ms/step). This one keeps everything dense and fixed-shape:

1. Coarse pass: step every ray at voxel pitch through a march-resolution
   occupancy grid (occ max-pooled to `march_res`): K_c = ceil(sqrt(3) *
   march_res) steps/ray. One XLA gather of [N, K_c] bools (the only
   random access left; ~0.5M lookups at 64^3).
2. Interval compaction: keep the first `n_intervals` occupied steps per
   ray via a row-wise cumsum + one-hot einsum (MXU/VPU, no scatter).
3. Fine expansion: each kept interval emits `steps_per_interval` samples
   at pitch voxel/F, giving a dense [N, S = n_intervals * F] sample set
   with a validity mask. Samples stay in ascending-t order per ray.

Semantics vs reference raymarching/src/raymarching.cu:312-490
(march_rays_train): the CUDA kernel advances t by dt_min through
occupied voxels and leaps over empty ones; this produces the same
sample distribution when march_res == grid_size and F == voxel/dt_min
(each occupied voxel contributes ~voxel/dt_min samples at dt_min pitch).
Deviations (documented):
- march_res may be coarser than the 128^3 occupancy grid (empty 128^3
  voxels inside an occupied march voxel get sampled; their density is
  below threshold so the contribution is ~0, but some sample budget is
  spent there).
- per-ray sample budget is n_intervals * F with per-ray dropping of
  intervals beyond the budget (the reference drops samples globally via
  its mean_count buffer, raymarching/raymarching.py:196-203).
- fine pitch is voxel/F (uniform in each interval) rather than the
  global dt_min lattice phase; with perturb this is an equivalent jitter.
- cascades > 1 / dt_gamma > 0 fall back to the reference-shaped path
  (render_occ); this fast path serves the bound<=1, dt_gamma=0 recipes
  (the benchmark/headline configs, scripts/run_nerf.sh:4).
"""

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

SQRT3 = 1.7320508075688772


@dataclass(frozen=True)
class DenseMarchConfig:
    """Static config for the dense march (hashable; safe as a jit static)."""

    bound: float = 1.0
    march_res: int = 64          # coarse march grid resolution
    n_intervals: int = 16        # kept occupied voxel-steps per ray
    steps_per_interval: int = 4  # fine samples per kept interval
    min_near: float = 0.05

    @property
    def voxel(self) -> float:
        return 2.0 * self.bound / self.march_res

    @property
    def k_coarse(self) -> int:
        import math
        return int(math.ceil(SQRT3 * self.march_res))

    @property
    def samples_per_ray(self) -> int:
        return self.n_intervals * self.steps_per_interval

    @property
    def dt(self) -> float:
        return self.voxel / self.steps_per_interval


def downsample_occ(occ, march_res: int):
    """Max-pool a bool occupancy grid [H, H, H] to [M, M, M] (M <= H)."""
    h = occ.shape[-1]
    if h == march_res:
        return occ
    f = h // march_res
    assert f * march_res == h, (h, march_res)
    return occ.reshape(march_res, f, march_res, f, march_res, f).any(
        axis=(1, 3, 5))


def march_intervals(rays_o, rays_d, nears, fars, occ_m,
                    cfg: DenseMarchConfig):
    """Coarse pass + interval compaction.

    Returns (t_entry [N, Sc] f32, iv_valid [N, Sc] bool): entry distance
    of the first Sc occupied voxel-steps per ray.
    """
    n = rays_o.shape[0]
    m = cfg.march_res
    kc = cfg.k_coarse
    sc = cfg.n_intervals
    vox = cfg.voxel

    # --- coarse pass: occupancy at voxel-pitch midpoints -------------------
    ks = (jnp.arange(kc, dtype=jnp.float32) + 0.5) * vox
    t_mid = nears[:, None] + ks[None, :]                    # [N, Kc]
    pos = rays_o[:, None, :] + t_mid[..., None] * rays_d[:, None, :]
    ijk = jnp.clip(((pos / cfg.bound) * 0.5 + 0.5) * m, 0.0,
                   m - 1).astype(jnp.int32)                 # [N, Kc, 3]
    flat = (ijk[..., 0] * m + ijk[..., 1]) * m + ijk[..., 2]
    inside = jnp.all(jnp.abs(pos) <= cfg.bound, axis=-1)
    hit = jnp.take(occ_m.reshape(-1), flat.reshape(-1)).reshape(n, kc)
    hit = hit & inside & (t_mid - 0.5 * vox < fars[:, None])

    # --- interval compaction: first Sc occupied steps per ray --------------
    slot = jnp.cumsum(hit.astype(jnp.int32), axis=-1) - 1   # [N, Kc]
    keep = hit & (slot < sc)
    onehot = (slot[..., None] == jnp.arange(sc)[None, None, :]) & \
        keep[..., None]                                     # [N, Kc, Sc]
    t_entry = jnp.einsum("nk,nks->ns", t_mid - 0.5 * vox,
                         onehot.astype(jnp.float32))        # [N, Sc]
    iv_valid = jnp.any(onehot, axis=1)                      # [N, Sc]
    return t_entry, iv_valid


def expand_intervals(t_entry, iv_valid, fars, cfg: DenseMarchConfig,
                     noise=None):
    """Fine expansion of [N, Sc] intervals into [N, Sc*F] samples."""
    n, sc = t_entry.shape
    f = cfg.steps_per_interval
    dt = cfg.dt
    ph = jnp.zeros((n, 1, 1)) if noise is None else noise[:, None, None]
    fine = (jnp.arange(f, dtype=jnp.float32)[None, None, :] + ph) * dt
    ts = t_entry[..., None] + fine                          # [N, Sc, F]
    valid = iv_valid[..., None] & (ts < fars[:, None, None])
    ts = ts.reshape(n, sc * f)
    valid = valid.reshape(n, sc * f)
    dts = jnp.full_like(ts, dt)
    counts = jnp.sum(valid.astype(jnp.int32), axis=-1)
    return {"ts": ts, "dts": dts, "valid": valid, "counts": counts}


def dilate_occ(occ, r: int = 1):
    """Conservative 1-voxel-radius dilation, applied r times (3^3 max-pool
    stride 1). Used by the tile-band renderer so one occupancy row can
    cover every ray in a pixel tile (render/fast_image.py)."""
    for _ in range(r):
        p = jnp.pad(occ, 1)
        acc = jnp.zeros_like(occ)
        for dx in (0, 1, 2):
            for dy in (0, 1, 2):
                for dz in (0, 1, 2):
                    acc = acc | p[dx:dx + occ.shape[0],
                                  dy:dy + occ.shape[1],
                                  dz:dz + occ.shape[2]]
        occ = acc
    return occ


@partial(jax.jit, static_argnames=("cfg",))
def march_dense(rays_o, rays_d, nears, fars, occ_m, cfg: DenseMarchConfig,
                noise=None):
    """March rays into a dense [N, S] sample set.

    Args:
      rays_o, rays_d: [N, 3] f32.
      nears, fars: [N] f32 (from near_far_from_aabb).
      occ_m: bool [M, M, M] occupancy at march resolution.
      cfg: DenseMarchConfig.
      noise: optional [N] in [0, 1): fine-phase jitter (perturb).

    Returns dict:
      ts [N, S] sample positions along ray, dts [N, S] step sizes,
      valid [N, S] bool, counts [N] int32.
    """
    t_entry, iv_valid = march_intervals(rays_o, rays_d, nears, fars, occ_m,
                                        cfg)
    return expand_intervals(t_entry, iv_valid, fars, cfg, noise=noise)
