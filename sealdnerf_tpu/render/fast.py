"""Dense fast-path rendering (march_dense -> field -> dense composite).

The fast analog of render_occ (render/renderer.py) built on the dense
[N, S] sample layout of ops/marching_dense.py. Everything is fixed-shape
and gather-free except the single [N, K_c] coarse occupancy lookup.

forward_fn contract matches render_occ: (params, x, d, *extra) ->
(sigma, rgb, ...). Seal teacher wrappers compose unchanged.
"""

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ..ops import near_far_from_aabb, composite_rays
from ..ops.marching_dense import DenseMarchConfig, march_dense


@partial(jax.jit, static_argnames=("cfg", "forward_fn", "perturb",
                                   "density_scale", "t_thresh"))
def render_dense(params, occ_m, rays_o, rays_d, cfg: DenseMarchConfig,
                 forward_fn: Callable, bg_color=None,
                 rng: Optional[jax.Array] = None, perturb: bool = False,
                 extra=(), density_scale: float = 1.0,
                 t_thresh: float = 1e-4):
    """Render a flat ray batch.

    Args:
      params: field params pytree.
      occ_m: bool [M, M, M] occupancy at march resolution.
      rays_o, rays_d: [N, 3].
      bg_color: [3] or [N, 3] or None (-> white, nerf/renderer.py:276).

    Returns dict(image [N,3], depth [N], weights_sum [N], n_samples).
    """
    n = rays_o.shape[0]
    b = cfg.bound
    aabb = jnp.array([-b] * 3 + [b] * 3, dtype=jnp.float32)
    nears, fars = near_far_from_aabb(rays_o, rays_d, aabb, cfg.min_near)

    noise = None
    if perturb and rng is not None:
        noise = jax.random.uniform(rng, (n,))
    mr = march_dense(rays_o, rays_d, nears, fars, occ_m, cfg, noise=noise)
    ts, dts, valid = mr["ts"], mr["dts"], mr["valid"]
    s = ts.shape[1]

    pos = rays_o[:, None, :] + ts[..., None] * rays_d[:, None, :]
    pos = jnp.clip(pos, -b, b)
    dirs = jnp.broadcast_to(rays_d[:, None, :], (n, s, 3))
    out = forward_fn(params, pos.reshape(-1, 3), dirs.reshape(-1, 3), *extra)
    sigma, rgb = out[0].reshape(n, s), out[1].reshape(n, s, 3)
    sigma = jnp.where(valid, sigma * density_scale, 0.0)

    comp = composite_rays(sigma, rgb, dts, ts=ts, t_thresh=t_thresh)
    if bg_color is None:
        bg = jnp.ones((3,), dtype=jnp.float32)
    else:
        bg = bg_color
    image = comp["image"] + (1.0 - comp["weights_sum"])[:, None] * bg
    return {
        "image": image,
        "depth": comp["depth"],
        "weights_sum": comp["weights_sum"],
        "n_samples": jnp.sum(mr["counts"]),
    }
