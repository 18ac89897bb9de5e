"""Tile-band whole-image rendering — the TPU real-time path.

Per-ray occupancy marching costs Kc~111 random gathers per ray; at
800x800 that is ~70M XLA gathers at 0.14 G/s (~0.5 s/frame of pure
gather, profile_render.py). Camera rays are spatially coherent, so this
renderer shares the march across pixel tiles:

1. March only the TILE CENTER rays (e.g. 8x8 px tiles -> 64x fewer
   gathers) against a CONSERVATIVELY DILATED occupancy grid
   (ops/marching_dense.py:dilate_occ). For a pinhole camera all rays
   share the origin, so a sample at distance t along the tile-center ray
   lies within tile_footprint(t) of the same point on any ray of the
   tile; dilating occupancy by >= that footprint (in voxels) makes the
   tile's interval set cover every pixel in it.
2. Broadcast the tile's compacted intervals to its pixels (pure
   reshape/broadcast, zero gathers) and expand to fine samples per ray.
3. Evaluate the field (fused Pallas kernel when available) and
   composite densely.

Semantics: same output as render_dense up to the conservative band
(extra samples land in empty voxels whose density is below threshold).
The reference's analog is the per-ray alive-ray loop
(nerf/renderer.py:341-367 + raymarching.cu:701-914), which is
latency-oriented on CUDA; tile-banding is the throughput-oriented TPU
equivalent.
"""

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from ..ops import near_far_from_aabb, composite_rays
from ..ops.marching_dense import (DenseMarchConfig, dilate_occ,
                                  march_intervals, march_intervals_cascade,
                                  expand_intervals, subsample_intervals)
from ..data.rays import get_rays


def _march_tiles(to, td, tnear, tfar, occ_m, cfg: DenseMarchConfig,
                 dilate: int):
    """Tile-center coarse march, single-grid or cascade.

    occ_m: [M,M,M] (single) or [CAS,M,M,M] (cfg.multi). Returns
    (t_entry [T,Sc], iv_dt [T,Sc] or None, iv_valid [T,Sc], far [T]).
    Dilation is applied per cascade; the far pad uses the coarsest
    cascade's voxel so inherited pixel rays reach the band."""
    if cfg.multi:
        occ_c = occ_m if occ_m.ndim == 4 else occ_m[None]
        occ_d = jnp.stack([dilate_occ(occ_c[c], dilate)
                           for c in range(occ_c.shape[0])])
        far = tfar + cfg.vox(cfg.cascades - 1) * (dilate + 1)
        t_entry, iv_dt, iv_valid = march_intervals_cascade(
            to, td, tnear, far, occ_d, cfg)
        return t_entry, iv_dt, iv_valid, far
    occ_d = dilate_occ(occ_m if occ_m.ndim == 3 else occ_m[0], dilate)
    far = tfar + cfg.voxel * (dilate + 1)
    t_entry, iv_valid = march_intervals(to, td, tnear, far, occ_d, cfg)
    return t_entry, None, iv_valid, far


@partial(jax.jit, static_argnames=("rh", "rw", "tile_px", "cfg",
                                   "forward_fn", "planar", "dilate",
                                   "density_scale", "t_thresh"))
def render_image_tiled(params, occ_m, pose, intr, rh: int, rw: int,
                       cfg: DenseMarchConfig, forward_fn: Callable,
                       bg_color, tile_px: int = 8, dilate: int = 1,
                       density_scale: float = 1.0, t_thresh: float = 1e-4,
                       planar: bool = False, extra=()):
    """Render a full image in one dispatch.

    Args:
      params: field params.
      occ_m: bool [M, M, M] occupancy at cfg.march_res.
      pose: [4, 4] cam2world. intr: [4] fx fy cx cy (at render res).
      rh, rw: render resolution (must be multiples of tile_px).
      forward_fn: (params, x [S,3], d [S,3]) -> (sigma, rgb) when
        planar=False; (params, x3 [3,M], d3 [3,M]) -> out [8,M] when
        planar=True (the fused kernel's native layout).
      bg_color: [3].

    TPU layout note: everything stays PLANAR -- no [*, 3] or [N, S, 3]
    array is ever materialized at sample scale. TPU tiling pads a
    3-lane minor dim to 128 (42x memory blowup; an 800px render OOM'd
    on a 20 GB pad of a 491 MB logical dirs array).

    Returns (image [rh, rw, 3], depth [rh, rw]).
    """
    assert rh % tile_px == 0 and rw % tile_px == 0, (rh, rw, tile_px)
    th, tw = rh // tile_px, rw // tile_px
    b = cfg.bound
    aabb = jnp.array([-b] * 3 + [b] * 3, dtype=jnp.float32)

    # --- tile-center rays: the image downsampled by tile_px ---------------
    key = jax.random.PRNGKey(0)  # unused (n=-1)
    tr = get_rays(key, pose[None], intr / tile_px, th, tw, -1)
    to, td = tr["rays_o"][0], tr["rays_d"][0]              # [T, 3]
    tnear, tfar = near_far_from_aabb(to, td, aabb, cfg.min_near)
    t_entry, iv_dt, iv_valid, tfar = _march_tiles(to, td, tnear, tfar,
                                                  occ_m, cfg, dilate)

    # --- broadcast intervals to pixels (reshape only, no gather) ----------
    sc = cfg.n_intervals

    def to_pixels(a):
        return jnp.broadcast_to(
            a.reshape(th, 1, tw, 1, sc), (th, tile_px, tw, tile_px, sc)
        ).reshape(rh * rw, sc)

    pe = to_pixels(t_entry)
    pv = to_pixels(iv_valid)
    pdt = to_pixels(iv_dt) if iv_dt is not None else None
    pfar = jnp.broadcast_to(
        tfar.reshape(th, 1, tw, 1), (th, tile_px, tw, tile_px)
    ).reshape(rh * rw)

    # --- per-pixel rays and fine samples ----------------------------------
    pr = get_rays(key, pose[None], intr, rh, rw, -1)
    ro, rd = pr["rays_o"][0], pr["rays_d"][0]              # [P, 3]
    mr = expand_intervals(pe, pv, pfar, cfg, iv_dt=pdt)
    ts, dts, valid = mr["ts"], mr["dts"], mr["valid"]
    s = ts.shape[1]
    n = rh * rw

    # planar positions/dirs: three [n, s] planes -> flat [M] rows
    planes_x, planes_d = [], []
    for a in range(3):
        da = rd[:, a]                                       # [n]
        pa = jnp.clip(ro[:, a][:, None] + ts * da[:, None], -b, b)
        planes_x.append(pa.reshape(1, n * s))
        planes_d.append(jnp.broadcast_to(da[:, None],
                                         (n, s)).reshape(1, n * s))
    x3 = jnp.concatenate(planes_x, axis=0)                  # [3, M]
    d3 = jnp.concatenate(planes_d, axis=0)

    if planar:
        out = forward_fn(params, x3, d3, *extra)            # [8, M]
        sigma = out[0].reshape(n, s)
        rgb_rows = (out[1].reshape(n, s), out[2].reshape(n, s),
                    out[3].reshape(n, s))
    else:
        out = forward_fn(params, x3.T, d3.T, *extra)
        sigma, rgb = out[0], out[1]
        sigma = sigma.reshape(n, s)
        rgb = rgb.reshape(n, s, 3)
        rgb_rows = (rgb[..., 0], rgb[..., 1], rgb[..., 2])
    sigma = jnp.where(valid, sigma * density_scale, 0.0)

    # --- planar compositing (ops/composite.py semantics, channel rows) ----
    alphas = 1.0 - jnp.exp(-sigma * dts)
    trans = jnp.cumprod(1.0 - alphas + 1e-15, axis=-1)
    trans = jnp.concatenate([jnp.ones_like(trans[..., :1]),
                             trans[..., :-1]], axis=-1)
    weights = alphas * trans
    if t_thresh > 0.0:
        weights = weights * (trans >= t_thresh)
    weights_sum = jnp.sum(weights, axis=-1)                 # [n]
    depth = jnp.sum(weights * ts, axis=-1)
    bg = jnp.asarray(bg_color, jnp.float32)
    chans = [jnp.sum(weights * cr, axis=-1) + (1.0 - weights_sum) * bg[ci]
             for ci, cr in enumerate(rgb_rows)]
    image = jnp.clip(jnp.stack(chans, axis=-1), 0.0, 1.0)  # [n, 3]
    return image.reshape(rh, rw, 3), depth.reshape(rh, rw)


def make_sharded_image_renderer(mesh, rh: int, rw: int,
                                cfg: DenseMarchConfig,
                                forward_fn: Callable, tile_px: int = 8,
                                dilate: int = 1, density_scale: float = 1.0,
                                t_thresh: float = 1e-4,
                                planar: bool = False,
                                buckets: bool = False, splits=None,
                                term_probe: int = 0, term_tau: float = 13.8,
                                term_stride: int = 1,
                                time_conditioned: bool = False):
    """Multi-chip eval: shard pixel-row bands of the image across the mesh
    (each device renders rh/ndev rows via the tiled -- or bucketed --
    renderer with a shifted principal point), concatenated by shard_map's
    output spec. The TPU equivalent of the reference's eval all_gather
    (nerf/utils.py:962-977) -- no chip idles during eval.

    buckets=True runs render_image_bucketed per band (each band sorts its
    own tiles); time_conditioned adds a trailing scalar time argument
    threaded into the field (dnerf eval, dnerf/utils.py test_step).

    Requires rh % (ndev * tile_px) == 0 (caller falls back to the
    single-device path otherwise). Returns a cached jitted
    fn(params, occ_m, pose, intr, bg[, t]) -> (image [rh,rw,3], depth).
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    ndev = mesh.devices.size
    rows_per = rh // ndev
    assert rows_per * ndev == rh and rows_per % tile_px == 0, (rh, ndev,
                                                              tile_px)
    if splits is None:
        splits = ((0.55, 4), (0.30, 2), (1.0, 1))

    def device_render(params, occ_m, pose, intr, bg, *t_arg):
        di = jax.lax.axis_index("data")
        row0 = (di * rows_per).astype(jnp.float32)
        intr_local = intr.at[3].add(-row0)   # cy shifts with the row band
        kw = dict(tile_px=tile_px, dilate=dilate,
                  density_scale=density_scale, t_thresh=t_thresh,
                  planar=planar, extra=t_arg)
        if buckets:
            img, dep = render_image_bucketed(
                params, occ_m, pose, intr_local, rows_per, rw, cfg,
                forward_fn, bg, splits=splits, term_probe=term_probe,
                term_tau=term_tau, term_stride=term_stride, **kw)
        else:
            img, dep = render_image_tiled(
                params, occ_m, pose, intr_local, rows_per, rw, cfg,
                forward_fn, bg, **kw)
        return img, dep

    n_in = 6 if time_conditioned else 5
    fn = shard_map(device_render, mesh=mesh,
                   in_specs=(P(),) * n_in,
                   out_specs=(P("data"), P("data")), check_vma=False)
    return jax.jit(fn)


def _termination_trim(params, o, pose, intr_t, th, tw, tile_px,
                      t_entry, iv_valid, iv_dt, cfg: DenseMarchConfig,
                      forward_fn, planar, density_scale, tau, n_probe,
                      extra, stride: int = 1):
    """Per-tile early termination -- the TPU form of the reference's
    alive-ray kill (raymarching.cu:834-914 composite_rays' per-ray stop
    at T < thresh; nerf/renderer.py:341-367 alive compaction loop).

    Bounds each tile's transmittance with one mid-interval sigma tap per
    interval along the tile's 4 CORNER pixel rays, and drops every
    interval all four probes agree is behind an opaque surface
    (cumulative optical depth at interval entry > tau). tau=13.8 bounds
    the dropped contribution at exp(-tau) ~ 1e-6 per probe -- 100x below
    the composite kill threshold t_thresh=1e-4, so the margin absorbs
    within-tile density variation the corners do not sample. Only the
    first n_probe intervals are probed (the tap is a full field eval;
    termination almost always lands in the first few surface intervals);
    un-crossed tiles keep their full interval set.

    Returns iv_valid with the terminated suffix cleared (prefix trim --
    the compacted front layout is preserved), so downstream counts,
    bucket sort, and subsampling all see the post-termination workload.

    Exactness: intervals at entry transmittance <= exp(-tau) contribute
    below f32 rounding to the composite (which itself zeroes weights at
    trans < t_thresh); any PSNR effect is measured, not assumed
    (profiling/probe_term_trim.py).
    """
    n_tiles, sc = t_entry.shape
    b = cfg.bound
    key = jax.random.PRNGKey(0)  # unused (n=-1)

    # stride > 1 taps every stride-th interval but still credits only the
    # tapped interval's own width -- the skipped intervals' density is
    # simply not counted, so the optical-depth estimate only DECREASES:
    # termination gets later, never earlier (strictly conservative), at
    # 1/stride of the probe's field-eval cost. Coverage (in intervals)
    # stays n_probe; taps = n_probe / stride.
    cover = min(n_probe, sc)
    idx = jnp.arange(0, cover, stride)                      # tap indices
    npb = int(idx.shape[0])

    # corner pixel rays: the downsampled (th, tw) grid samples pixel
    # centers (i+0.5)*tp; shifting the downsampled principal point by
    # +/-(tp-1)/(2*tp) lands on the tile's first/last pixel CENTERS
    d = (tile_px - 1) / (2.0 * tile_px)
    dirs = []
    for sx in (-d, d):
        for sy in (-d, d):
            ic = intr_t.at[2].add(sx).at[3].add(sy)
            r = get_rays(key, pose[None], ic, th, tw, -1)
            dirs.append(r["rays_d"][0])                     # [Tt, 3]
    npr = len(dirs)

    width = iv_dt[:, idx] if iv_dt is not None else \
        jnp.full((n_tiles, npb), cfg.voxel, jnp.float32)
    t_mid = t_entry[:, idx] + 0.5 * width                   # [Tt, npb]
    vmask = iv_valid[:, idx]

    if planar:
        planes_x, planes_d = [], []
        for a in range(3):
            da = jnp.stack([dd[:, a] for dd in dirs])       # [P, Tt]
            pa = jnp.clip(o[a] + t_mid[None] * da[..., None], -b, b)
            planes_x.append(pa.reshape(1, npr * n_tiles * npb))
            planes_d.append(jnp.broadcast_to(
                da[..., None], (npr, n_tiles, npb)).reshape(
                1, npr * n_tiles * npb))
        out = forward_fn(params, jnp.concatenate(planes_x, axis=0),
                         jnp.concatenate(planes_d, axis=0), *extra)
        sigma = out[0].reshape(npr, n_tiles, npb)
    else:
        dall = jnp.stack(dirs)                              # [P, Tt, 3]
        x = jnp.clip(o[None, None, None]
                     + t_mid[None, ..., None] * dall[:, :, None, :],
                     -b, b)
        dd = jnp.broadcast_to(dall[:, :, None, :],
                              (npr, n_tiles, npb, 3))
        out = forward_fn(params, x.reshape(-1, 3), dd.reshape(-1, 3),
                         *extra)
        sigma = out[0].reshape(npr, n_tiles, npb)

    od = jnp.where(vmask[None], sigma * density_scale * width[None], 0.0)
    cum = jnp.cumsum(od, axis=-1)
    entry = jnp.min(cum - od, axis=0)                       # [Tt, npb]
    kept = jnp.sum((entry <= tau).astype(jnp.int32), axis=-1)  # live taps
    # termination at tap k trims from interval idx[k]; no crossing
    # within the probed coverage keeps the full interval set
    idxp = jnp.concatenate([idx, jnp.array([sc], idx.dtype)])
    k_term = idxp[kept]                                     # [Tt]
    return iv_valid & (jnp.arange(sc)[None, :] < k_term[:, None])


def _tile_major(plane, th, tw, tp):
    """[th*tp, tw*tp] pixel-major -> [th*tw, tp*tp] tile-major (2-D only,
    planar-safe)."""
    return plane.reshape(th, tp, tw, tp).transpose(0, 2, 1, 3).reshape(
        th * tw, tp * tp)


def _untile(tiles, th, tw, tp):
    """[th*tw, tp*tp] -> [th*tp, tw*tp]."""
    return tiles.reshape(th, tw, tp, tp).transpose(0, 2, 1, 3).reshape(
        th * tp, tw * tp)


@partial(jax.jit, static_argnames=("rh", "rw", "tile_px", "cfg",
                                   "forward_fn", "planar", "dilate",
                                   "density_scale", "t_thresh", "splits",
                                   "term_probe", "term_tau", "term_stride"))
def render_image_bucketed(params, occ_m, pose, intr, rh: int, rw: int,
                          cfg: DenseMarchConfig, forward_fn: Callable,
                          bg_color, tile_px: int = 8, dilate: int = 1,
                          density_scale: float = 1.0, t_thresh: float = 1e-4,
                          planar: bool = True,
                          splits=((0.55, 4), (0.30, 2), (1.0, 1)),
                          term_probe: int = 0, term_tau: float = 13.8,
                          term_stride: int = 1, extra=()):
    """Tile-band render with per-tile sample budgets.

    After training, most tiles intersect little or no occupied space
    (empty background, simple interiors) yet the dense layout pays the
    full per-ray budget everywhere. Here tiles are sorted by occupied
    interval count and rendered in static-size buckets:

      splits = ((frac_of_tiles, budget_divisor), ...) cumulative; e.g.
      the default renders the emptiest 55% of tiles with sc/4 intervals,
      the next 30% with sc/2, the rest with the full sc.

    All reordering is at TILE granularity (~(rh/tp)*(rw/tp) rows), so
    the gathers cost microseconds; pixels travel with their tile via
    reshape/transpose only. Because tiles are sorted ascending, a
    bucket's tiles have the smallest counts in the image -- truncation
    (count > bucket budget) can only affect the boundary between
    buckets, and the last bucket always has the full budget.

    Same contract as render_image_tiled.
    """
    assert rh % tile_px == 0 and rw % tile_px == 0, (rh, rw, tile_px)
    th, tw = rh // tile_px, rw // tile_px
    tp2 = tile_px * tile_px
    n_tiles = th * tw
    b = cfg.bound
    sc = cfg.n_intervals
    f = cfg.steps_per_interval
    aabb = jnp.array([-b] * 3 + [b] * 3, dtype=jnp.float32)

    key = jax.random.PRNGKey(0)
    tr = get_rays(key, pose[None], intr / tile_px, th, tw, -1)
    to, td = tr["rays_o"][0], tr["rays_d"][0]
    tnear, tfar = near_far_from_aabb(to, td, aabb, cfg.min_near)
    t_entry, iv_dt, iv_valid, tfar = _march_tiles(to, td, tnear, tfar,
                                                  occ_m, cfg, dilate)
    if term_probe > 0:
        # early termination: trim intervals behind an opaque surface
        # BEFORE counting, so the bucket sort sees the post-termination
        # workload and trained scenes land in the cheap buckets
        pr0 = get_rays(key, pose[None], intr, rh, rw, -1)
        o0 = pr0["rays_o"][0][0]                              # pinhole
        iv_valid = _termination_trim(
            params, o0, pose, intr / tile_px, th, tw, tile_px,
            t_entry, iv_valid, iv_dt, cfg, forward_fn, planar,
            density_scale, term_tau, term_probe, extra,
            stride=term_stride)
    counts = jnp.sum(iv_valid.astype(jnp.int32), axis=-1)     # [Tt]

    order = jnp.argsort(counts)                               # ascending
    inv = jnp.zeros((n_tiles,), jnp.int32).at[order].set(
        jnp.arange(n_tiles, dtype=jnp.int32))

    # pixel ray dirs, tile-major planes gathered into sorted order
    pr = get_rays(key, pose[None], intr, rh, rw, -1)
    ro, rd = pr["rays_o"][0], pr["rays_d"][0]
    o = ro[0]                                                 # pinhole
    rd_tiles = [_tile_major(rd[:, a].reshape(rh, rw), th, tw,
                            tile_px)[order] for a in range(3)]
    te_s = t_entry[order]
    iv_s = iv_valid[order]
    dt_s = iv_dt[order] if iv_dt is not None else None
    far_s = tfar[order]

    # bucket boundaries (static): each split takes `frac` of the tiles
    # (the last split absorbs the remainder)
    bounds = []
    start = 0
    for frac, div in splits:
        end = min(start + int(round(n_tiles * frac)), n_tiles)
        bounds.append((start, end, max(sc // div, 1)))
        start = end
    bounds[-1] = (bounds[-1][0], n_tiles, bounds[-1][2])

    img_parts = [[], [], []]
    dep_parts = []
    bg = jnp.asarray(bg_color, jnp.float32)
    for (s0, s1, sc_b) in bounds:
        nb = s1 - s0
        if nb == 0:
            continue
        s_b = sc_b * f
        far_b = far_s[s0:s1]
        if sc_b < sc:
            # over-budget tiles are SUBSAMPLED across their full depth
            # range (dt stretched to conserve coverage), not cut at the
            # budget -- positional truncation dropped geometry outright
            # on dense tile populations (ops/marching_dense.py:
            # subsample_intervals)
            te_b, iv_b, dt_b = subsample_intervals(
                te_s[s0:s1], iv_s[s0:s1], sc_b,
                iv_dt=None if dt_s is None else dt_s[s0:s1],
                voxel=cfg.voxel)
        else:
            te_b = te_s[s0:s1]                                # [nb, sc]
            iv_b = iv_s[s0:s1]
            dt_b = dt_s[s0:s1] if dt_s is not None else None
        d_planes = [rd_tiles[a][s0:s1].reshape(nb * tp2) for a in range(3)]

        def eval_bucket(op, sc_b=sc_b, s_b=s_b, nb=nb,
                        d_planes=d_planes):
            te_b, iv_b, far_b, dt_b = op
            npix = nb * tp2
            pe = jnp.broadcast_to(te_b[:, None, :],
                                  (nb, tp2, sc_b)).reshape(npix, sc_b)
            pv = jnp.broadcast_to(iv_b[:, None, :],
                                  (nb, tp2, sc_b)).reshape(npix, sc_b)
            pdt = None
            if dt_b is not None:
                pdt = jnp.broadcast_to(dt_b[:, None, :],
                                       (nb, tp2, sc_b)).reshape(npix, sc_b)
            pfar = jnp.broadcast_to(far_b[:, None], (nb, tp2)).reshape(npix)
            mr = expand_intervals(pe, pv, pfar, cfg, iv_dt=pdt)
            ts, dts, valid = mr["ts"], mr["dts"], mr["valid"]  # [npix, s_b]

            planes_x = [jnp.clip(o[a] + ts * d_planes[a][:, None], -b,
                                 b).reshape(1, npix * s_b) for a in range(3)]
            planes_d = [jnp.broadcast_to(d_planes[a][:, None],
                                         (npix, s_b)).reshape(1, npix * s_b)
                        for a in range(3)]
            x3 = jnp.concatenate(planes_x, axis=0)
            d3 = jnp.concatenate(planes_d, axis=0)
            if planar:
                out = forward_fn(params, x3, d3, *extra)
                sigma = out[0].reshape(npix, s_b)
                rgb_rows = (out[1].reshape(npix, s_b),
                            out[2].reshape(npix, s_b),
                            out[3].reshape(npix, s_b))
            else:
                out = forward_fn(params, x3.T, d3.T, *extra)
                sigma = out[0].reshape(npix, s_b)
                rgb = out[1].reshape(npix, s_b, 3)
                rgb_rows = (rgb[..., 0], rgb[..., 1], rgb[..., 2])
            sigma = jnp.where(valid, sigma * density_scale, 0.0)

            alphas = 1.0 - jnp.exp(-sigma * dts)
            trans = jnp.cumprod(1.0 - alphas + 1e-15, axis=-1)
            trans = jnp.concatenate([jnp.ones_like(trans[..., :1]),
                                     trans[..., :-1]], axis=-1)
            weights = alphas * trans
            if t_thresh > 0.0:
                weights = weights * (trans >= t_thresh)
            wsum = jnp.sum(weights, axis=-1)
            dep = jnp.sum(weights * ts, axis=-1).reshape(nb, tp2)
            chans = [(jnp.sum(weights * cr, axis=-1)
                      + (1.0 - wsum) * bg[ci]).reshape(nb, tp2)
                     for ci, cr in enumerate(rgb_rows)]
            return dep, chans[0], chans[1], chans[2]

        def skip_bucket(op, nb=nb):
            # all tiles in this bucket are empty: no samples -> pure bg
            # and zero depth, exactly what compositing zero weights gives
            z = jnp.zeros((nb, tp2), jnp.float32)
            return (z, z + bg[0], z + bg[1], z + bg[2])

        # buckets are sorted ascending by interval count, so the low
        # buckets of a trained object-centric scene are often ALL empty
        # (pure background tiles); skipping their field eval is exact and
        # cuts the dominant per-frame cost (field ~8 ms/M samples,
        # profiling/probe_render_breakdown.py)
        op = (te_b, iv_b, far_b, dt_b)
        dep, c0, c1, c2 = jax.lax.cond(
            jnp.any(iv_b), eval_bucket, skip_bucket, op)
        dep_parts.append(dep)
        img_parts[0].append(c0)
        img_parts[1].append(c1)
        img_parts[2].append(c2)

    # stitch buckets back: concat (sorted order) -> inverse perm -> untile
    image_planes = []
    for ci in range(3):
        sorted_tiles = jnp.concatenate(img_parts[ci], axis=0)  # [Tt, tp2]
        image_planes.append(_untile(sorted_tiles[inv], th, tw, tile_px))
    depth = _untile(jnp.concatenate(dep_parts, axis=0)[inv], th, tw,
                    tile_px)
    image = jnp.clip(jnp.stack(image_planes, axis=-1), 0.0, 1.0)
    return image, depth
