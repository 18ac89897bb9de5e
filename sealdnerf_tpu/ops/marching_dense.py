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
    """Static config for the dense march (hashable; safe as a jit static).

    cascades == 1 and dt_gamma == 0 (the synthetic/headline recipes) use
    the fixed-pitch single-grid march. cascades > 1 or dt_gamma > 0
    (colmap-style captures, --bound 2 --dt_gamma 1/128) use the cascade
    march: a cone-growth coarse ladder with per-mip occupancy selection
    (reference raymarching.cu:345-379 semantics), per-interval dt carried
    through compaction, fine pitch dt/steps_per_interval."""

    bound: float = 1.0
    march_res: int = 64          # coarse march grid resolution
    n_intervals: int = 16        # kept occupied voxel-steps per ray
    steps_per_interval: int = 4  # fine samples per kept interval
    min_near: float = 0.05
    cascades: int = 1            # 1 + ceil(log2(bound)) in practice
    dt_gamma: float = 0.0        # cone angle: step growth factor

    @property
    def multi(self) -> bool:
        return self.cascades > 1 or self.dt_gamma > 0.0

    @property
    def voxel(self) -> float:
        return 2.0 * self.bound / self.march_res

    def cas_bound(self, c: int) -> float:
        return min(float(1 << c), self.bound)

    def vox(self, c: int) -> float:
        """March-voxel edge of cascade c (cascade c covers
        [-cas_bound, cas_bound]^3 at march_res^3)."""
        return 2.0 * self.cas_bound(c) / self.march_res

    @property
    def coarse_growth(self) -> float:
        """Coarse ladder growth: dt_gamma scaled so the FINE pitch
        (coarse dt / steps_per_interval) grows at the reference's
        dt_gamma rate."""
        return self.dt_gamma * self.steps_per_interval

    @property
    def k_coarse(self) -> int:
        import math
        if not self.multi:
            return int(math.ceil(SQRT3 * self.march_res))
        # ladder length from min_near to the worst-case far (the AABB's
        # longest chord), simulated at config time (static)
        g = self.coarse_growth
        lo, hi = self.vox(0), self.vox(self.cascades - 1)
        far = 2.0 * SQRT3 * self.bound
        t, k = self.min_near, 0
        cap = 4 * self.march_res * self.cascades + 2048
        while t < far and k < cap:
            t += min(max(t * g, lo), hi) if g > 0 else lo
            k += 1
        return k

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
                     noise=None, iv_dt=None):
    """Fine expansion of [N, Sc] intervals into [N, Sc*F] samples.

    iv_dt: optional per-interval coarse step [N, Sc] (the cascade march);
    None = the fixed coarse pitch cfg.voxel."""
    n, sc = t_entry.shape
    f = cfg.steps_per_interval
    ph = jnp.zeros((n, 1, 1)) if noise is None else noise[:, None, None]
    if iv_dt is None:
        dt_f = jnp.full((n, sc, 1), cfg.dt)
    else:
        dt_f = (iv_dt / f)[..., None]                       # [N, Sc, 1]
    fine = (jnp.arange(f, dtype=jnp.float32)[None, None, :] + ph) * dt_f
    ts = t_entry[..., None] + fine                          # [N, Sc, F]
    valid = iv_valid[..., None] & (ts < fars[:, None, None])
    ts = ts.reshape(n, sc * f)
    valid = valid.reshape(n, sc * f)
    dts = jnp.broadcast_to(dt_f, (n, sc, f)).reshape(n, sc * f)
    counts = jnp.sum(valid.astype(jnp.int32), axis=-1)
    return {"ts": ts, "dts": dts, "valid": valid, "counts": counts}


def subsample_intervals(t_entry, iv_valid, sc_b: int, iv_dt=None,
                        voxel: float = None):
    """Coarsen front-compacted intervals [N, Sc] to at most sc_b slots.

    Positional truncation (`te[:, :sc_b]`) silently DROPS every occupied
    interval beyond the budget; on views whose tile population is dense
    (indoor scenes, cropped renders) that cut geometry outright -- the
    r4 bench's center-band anchor read 15.6 PSNR where the full image
    read 28.9, a mathematically impossible pair for a correct crop.
    Here slot k of sc_b represents the source-interval run
    [floor(k*count/sc_b), floor((k+1)*count/sc_b)): it samples at the
    run's first interval entry and stretches its coarse step by the run
    length, so total covered length (count * dt) is conserved and
    geometry degrades to COARSER SAMPLING instead of vanishing. When
    count <= sc_b every run has length <= 1 and this is an exact
    re-packing of the input (same interval set, same steps).

    Approximations when count > sc_b: a run's intervals may be disjoint
    along the ray (the stretched step then also integrates the gaps),
    and in the cascade march a run is priced at its first interval's
    pitch. Both are the standard LOD-coarsening trade.

    Args:
      t_entry: [N, Sc] f32 interval entry distances (ascending, front-
        compacted -- march_intervals/march_intervals_cascade layout).
      iv_valid: [N, Sc] bool.
      sc_b: slot budget (static).
      iv_dt: optional [N, Sc] per-interval coarse step (cascade march);
        None = fixed pitch `voxel`.
      voxel: the fixed coarse pitch; required when iv_dt is None.

    Returns (te [N, sc_b], valid [N, sc_b] bool, dt [N, sc_b] f32); dt
    is the STRETCHED coarse step per slot (divide by steps_per_interval
    for the fine pitch, i.e. feed as `iv_dt` to expand_intervals).
    """
    n, sc = t_entry.shape
    count = jnp.sum(iv_valid.astype(jnp.int32), axis=-1, keepdims=True)
    k = jnp.arange(sc_b, dtype=jnp.int32)[None, :]
    lo = (k * count) // sc_b                                # [N, sc_b]
    hi = ((k + 1) * count) // sc_b
    valid = hi > lo
    src = jnp.clip(lo, 0, sc - 1)
    te = jnp.take_along_axis(t_entry, src, axis=1)
    if iv_dt is None:
        dt_src = jnp.full((n, sc_b), voxel, jnp.float32)
    else:
        dt_src = jnp.take_along_axis(iv_dt, src, axis=1)
    dt = dt_src * (hi - lo).astype(jnp.float32)
    return te, valid, dt


def march_intervals_cascade(rays_o, rays_d, nears, fars, occ_cas,
                            cfg: DenseMarchConfig):
    """Cascade coarse pass + interval compaction.

    occ_cas: bool [CAS, M, M, M] march-res occupancy per cascade.
    Coarse steps follow the reference's cone growth
    dt = clamp(t * dt_gamma, dt_min, dt_max) (raymarching.cu:365) at
    march-voxel granularity, with per-step mip selection
    max(mip_from_pos, mip_from_dt) (raymarching.cu:368-379).

    Returns (t_entry [N, Sc], iv_dt [N, Sc], iv_valid [N, Sc]).
    """
    from .marching import _mip_from_val
    n = rays_o.shape[0]
    m = cfg.march_res
    kc = cfg.k_coarse
    sc = cfg.n_intervals
    g = cfg.coarse_growth
    lo, hi = cfg.vox(0), cfg.vox(cfg.cascades - 1)

    if g == 0.0:
        ks = jnp.arange(kc, dtype=jnp.float32)
        t_ent = nears[:, None] + ks[None, :] * lo           # [N, Kc]
        dt_c = jnp.full_like(t_ent, lo)
    else:
        def step(t, _):
            dt = jnp.clip(t * g, lo, hi)
            return t + dt, (t, dt)

        _, (t_ent, dt_c) = jax.lax.scan(step, nears, None, length=kc)
        t_ent, dt_c = t_ent.T, dt_c.T                       # [N, Kc]

    t_mid = t_ent + 0.5 * dt_c
    pos = rays_o[:, None, :] + t_mid[..., None] * rays_d[:, None, :]
    mx = jnp.max(jnp.abs(pos), axis=-1)                     # [N, Kc]
    # mip_from_dt: smallest cascade whose MARCH voxel >= dt. The frexp
    # convention rounds exact powers UP ([1,2) -> 1), which would send
    # dt == vox(0) to cascade 1 and blind the march to the fine
    # occupancy everywhere; nudge down so exact-voxel steps stay in
    # their own cascade.
    level = jnp.maximum(
        _mip_from_val(mx, cfg.cascades),
        _mip_from_val(dt_c * (m * 0.5) * (1.0 - 1e-6), cfg.cascades))
    mip_bound = jnp.minimum(jnp.exp2(level.astype(jnp.float32)), cfg.bound)
    ijk = jnp.clip(0.5 * (pos / mip_bound[..., None] + 1.0) * m,
                   0.0, m - 1).astype(jnp.int32)
    flat = ((level * m + ijk[..., 0]) * m + ijk[..., 1]) * m + ijk[..., 2]
    inside = mx <= cfg.bound
    hit = jnp.take(occ_cas.reshape(-1), flat.reshape(-1)).reshape(n, kc)
    hit = hit & inside & (t_ent < fars[:, None])

    slot = jnp.cumsum(hit.astype(jnp.int32), axis=-1) - 1
    keep = hit & (slot < sc)
    onehot = ((slot[..., None] == jnp.arange(sc)[None, None, :])
              & keep[..., None]).astype(jnp.float32)        # [N, Kc, Sc]
    t_entry = jnp.einsum("nk,nks->ns", t_ent, onehot)
    iv_dt = jnp.einsum("nk,nks->ns", dt_c, onehot)
    iv_valid = jnp.any(onehot > 0, axis=1)
    return t_entry, iv_dt, iv_valid


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
      occ_m: bool [M, M, M] occupancy at march resolution, or
        [CAS, M, M, M] when cfg.multi (cascades > 1 / dt_gamma > 0).
      cfg: DenseMarchConfig.
      noise: optional [N] in [0, 1): fine-phase jitter (perturb).

    Returns dict:
      ts [N, S] sample positions along ray, dts [N, S] step sizes,
      valid [N, S] bool, counts [N] int32.
    """
    if cfg.multi:
        occ_cas = occ_m if occ_m.ndim == 4 else occ_m[None]
        t_entry, iv_dt, iv_valid = march_intervals_cascade(
            rays_o, rays_d, nears, fars, occ_cas, cfg)
        return expand_intervals(t_entry, iv_valid, fars, cfg, noise=noise,
                                iv_dt=iv_dt)
    if occ_m.ndim == 4:
        occ_m = occ_m[0]
    t_entry, iv_valid = march_intervals(rays_o, rays_d, nears, fars, occ_m,
                                        cfg)
    return expand_intervals(t_entry, iv_valid, fars, cfg, noise=noise)
