"""The two render paths as pure functions.

- render_uniform: uniform z sampling + optional PDF importance upsampling +
  exclusive-cumprod compositing -- the reference's pure-torch `run` path
  (nerf/renderer.py:125-253). It is the differential-testing oracle for the
  fast path, exactly as `run` is the oracle for `run_cuda` in torch-ngp.
- render_occ: occupancy-grid marching -> packed field evaluation -> segmented
  compositing -- the `-O` fast path (reference run_cuda, nerf/renderer.py:
  256-377). One code path serves training and inference (the reference's
  alive-ray compaction inference loop is replaced by a larger static sample
  budget + transmittance masking).

A "field" is the pair of pure functions forward_fn(params, x, d)->(sigma, rgb)
and optionally bg_fn(params, sph, d)->rgb, passed as static arguments; the
Seal teacher hooks (map_to_origin before the MLP, map_color after,
SealNeRF/renderer.py:87-423) compose new forward_fns around the same renderer.
"""

from dataclasses import dataclass
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..ops import (
    near_far_from_aabb, sph_from_ray, march_rays, composite_packed,
    composite_rays,
)
from ..ops.marching import MarchConfig


@dataclass(frozen=True)
class RenderSettings:
    """Static render options (the renderer kwargs of the reference)."""

    march: MarchConfig
    density_scale: float = 1.0
    bg_radius: float = -1.0
    t_thresh: float = 1e-4
    # uniform-path options
    num_steps: int = 128
    upsample_steps: int = 128
    # fast-path sample budget per ray (multiplied by ray count for m_budget)
    samples_per_ray: int = 48


def sample_pdf(rng, bins, weights, n_samples: int, det: bool):
    """Inverse-CDF sampling (reference nerf/renderer.py:12-46).

    bins: [B, T] z midpoints; weights: [B, T-1]; returns [B, n_samples].
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, -1, keepdims=True)
    cdf = jnp.cumsum(pdf, -1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], -1)  # [B, T]
    if det:
        u = jnp.linspace(0.5 / n_samples, 1.0 - 0.5 / n_samples, n_samples)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (n_samples,))
    else:
        u = jax.random.uniform(rng, cdf.shape[:-1] + (n_samples,))

    inds = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(cdf, u)
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, cdf.shape[-1] - 1)
    cdf_g0 = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_g1 = jnp.take_along_axis(cdf, above, axis=-1)
    bins_g0 = jnp.take_along_axis(bins, below, axis=-1)
    bins_g1 = jnp.take_along_axis(bins, above, axis=-1)
    denom = cdf_g1 - cdf_g0
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_g0) / denom
    return bins_g0 + t * (bins_g1 - bins_g0)


def _bg_color(bg_fn, params, settings, rays_o, rays_d, bg_color):
    if settings.bg_radius > 0 and bg_fn is not None:
        sph = sph_from_ray(rays_o, rays_d, settings.bg_radius)
        return bg_fn(params, sph, rays_d)
    if bg_color is None:
        return jnp.ones((3,), dtype=jnp.float32)
    return bg_color


@partial(jax.jit, static_argnames=("forward_fn", "bg_fn", "settings",
                                   "perturb", "m_budget"))
def render_occ(params, occ, rays_o, rays_d, settings: RenderSettings,
               forward_fn: Callable, bg_fn: Optional[Callable] = None,
               bg_color=None, rng: Optional[jax.Array] = None,
               perturb: bool = False, m_budget: Optional[int] = None,
               aabb=None, extra=()):
    """Occupancy-grid fast path over a flat ray batch.

    Args:
      params: field parameter pytree.
      occ: bool [CAS, H, H, H] occupancy grid (dynamic renderers pass the
        time-slice occ[t_idx], dnerf/renderer.py:285).
      rays_o, rays_d: [N, 3].
      forward_fn(params, x, d, *extra) -> (sigma [M], rgb [M, 3], ...).
      bg_fn(params, sph, d) -> rgb, used when settings.bg_radius > 0.
      bg_color: [3] or [N, 3] or None (-> white, reference run_cuda:276).
      rng: PRNG key for the start-offset perturb.
      m_budget: packed sample budget; default N * samples_per_ray.
      extra: traced extras threaded to forward_fn (e.g. the scalar time).

    Returns dict(image [N,3], depth [N], weights_sum [N]).
    """
    n = rays_o.shape[0]
    mc = settings.march
    if m_budget is None:
        m_budget = n * settings.samples_per_ray
    if aabb is None:
        aabb = jnp.array([-mc.bound] * 3 + [mc.bound] * 3, dtype=jnp.float32)

    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, mc.min_near)
    noise = None
    if perturb and rng is not None:
        noise = jax.random.uniform(rng, (n,))

    pk = march_rays(rays_o, rays_d, nears, fars, occ, mc, m_budget,
                    noise=noise)
    out_fwd = forward_fn(params, pk["xyzs"], pk["dirs"], *extra)
    sigma, rgb = out_fwd[0], out_fwd[1]
    sigma = sigma * settings.density_scale
    out = composite_packed(sigma, rgb, pk["dts"], pk["ts"], pk["ray_id"],
                           pk["valid"], n_rays=n, t_thresh=settings.t_thresh)

    bg = _bg_color(bg_fn, params, settings, rays_o, rays_d, bg_color)
    image = out["image"] + (1.0 - out["weights_sum"])[:, None] * bg
    return {
        "image": image,
        "depth": out["depth"],
        "weights_sum": out["weights_sum"],
        "n_samples": pk["total"],
    }


@partial(jax.jit, static_argnames=("density_fn", "color_fn", "bg_fn",
                                   "settings", "perturb"))
def render_uniform(params, rays_o, rays_d, settings: RenderSettings,
                   density_fn: Callable, color_fn: Callable,
                   bg_fn: Optional[Callable] = None, bg_color=None,
                   rng: Optional[jax.Array] = None, perturb: bool = False,
                   aabb=None, extra=()):
    """Uniform + PDF-upsampled sampling path (reference nerf/renderer.py:125-253).

    density_fn(params, x, *extra) -> (sigma, geo_feat);
    color_fn(params, d, geo_feat) -> rgb. Depth is normalized to [0, 1] within
    [near, far] exactly like the reference (:225-226).
    """
    n = rays_o.shape[0]
    mc = settings.march
    num_steps = settings.num_steps
    if aabb is None:
        aabb = jnp.array([-mc.bound] * 3 + [mc.bound] * 3, dtype=jnp.float32)
    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, mc.min_near)
    nears, fars = nears[:, None], fars[:, None]

    z = jnp.linspace(0.0, 1.0, num_steps)[None, :]
    z_vals = nears + (fars - nears) * z  # [N, T]
    sample_dist = (fars - nears) / num_steps
    if perturb and rng is not None:
        rng, k = jax.random.split(rng)
        z_vals = z_vals + (jax.random.uniform(k, z_vals.shape) - 0.5) * sample_dist

    def pts(zv):
        p = rays_o[:, None, :] + rays_d[:, None, :] * zv[..., None]
        return jnp.clip(p, aabb[:3], aabb[3:])

    xyzs = pts(z_vals)
    sigma, geo = density_fn(params, xyzs.reshape(-1, 3), *extra)[:2]
    sigma = sigma.reshape(n, num_steps)
    geo = geo.reshape(n, num_steps, -1)

    if settings.upsample_steps > 0:
        # importance-sample new z from the coarse weights (no gradient).
        deltas = z_vals[..., 1:] - z_vals[..., :-1]
        deltas = jnp.concatenate(
            [deltas, sample_dist * jnp.ones_like(deltas[..., :1])], -1)
        coarse = composite_rays(
            jax.lax.stop_gradient(sigma) * settings.density_scale,
            jnp.zeros(sigma.shape + (3,)), deltas)
        weights = coarse["weights"]
        z_mid = z_vals[..., :-1] + 0.5 * deltas[..., :-1]
        det = not perturb
        if rng is not None:
            rng, k = jax.random.split(rng)
        else:
            k = jax.random.PRNGKey(0)
        new_z = sample_pdf(k, z_mid, weights[:, 1:-1],
                           settings.upsample_steps, det=det)
        new_z = jax.lax.stop_gradient(new_z)
        new_xyzs = pts(new_z)
        new_sigma, new_geo = density_fn(params, new_xyzs.reshape(-1, 3), *extra)[:2]
        new_sigma = new_sigma.reshape(n, settings.upsample_steps)
        new_geo = new_geo.reshape(n, settings.upsample_steps, -1)

        z_vals = jnp.concatenate([z_vals, new_z], axis=1)
        order = jnp.argsort(z_vals, axis=1)
        z_vals = jnp.take_along_axis(z_vals, order, axis=1)
        xyzs = jnp.take_along_axis(
            jnp.concatenate([xyzs, new_xyzs], axis=1), order[..., None], axis=1)
        sigma = jnp.take_along_axis(
            jnp.concatenate([sigma, new_sigma], axis=1), order, axis=1)
        geo = jnp.take_along_axis(
            jnp.concatenate([geo, new_geo], axis=1), order[..., None], axis=1)

    t_total = z_vals.shape[1]
    deltas = z_vals[..., 1:] - z_vals[..., :-1]
    deltas = jnp.concatenate(
        [deltas, sample_dist * jnp.ones_like(deltas[..., :1])], -1)

    dirs = jnp.broadcast_to(rays_d[:, None, :], (n, t_total, 3))
    rgbs = color_fn(params, dirs.reshape(-1, 3), geo.reshape(-1, geo.shape[-1]))
    rgbs = rgbs.reshape(n, t_total, 3)

    out = composite_rays(sigma * settings.density_scale, rgbs, deltas)
    weights, weights_sum = out["weights"], out["weights_sum"]
    ori_z = jnp.clip((z_vals - nears) / (fars - nears), 0.0, 1.0)
    depth = jnp.sum(weights * ori_z, axis=-1)
    image = jnp.sum(weights[..., None] * rgbs, axis=-2)

    bg = _bg_color(bg_fn, params, settings, rays_o, rays_d, bg_color)
    image = image + (1.0 - weights_sum)[:, None] * bg
    return {"image": image, "depth": depth, "weights_sum": weights_sum}
