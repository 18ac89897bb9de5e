"""Teacher-side machinery: forward_fn wrapping + occupancy force-fill.

Parity with reference SealNeRF/renderer.py:
- The teacher renderer injects seal_mapper.map_to_origin on the marched
  sample points/dirs before the field and map_color after it
  (:259-423 CUDA path). Here that is a wrapper producing a new forward_fn for
  the SAME renderer -- no renderer subclassing needed.
- Secondary-teacher override (:311-314): mapped points are answered by a
  different field (across-model editing).
- hack_bitfield (:61-79): cells inside force_fill_bound are forced occupied so
  rays always sample the (possibly newly-filled) edit region. Functional: a
  precomputed bool mask OR'd onto the occupancy grid; "restore" is simply
  using the original grid again.
"""

from typing import Optional

import numpy as np
import jax.numpy as jnp

from ..models.api import Field
from .seal_utils import SealMapper


def make_teacher_field(base: Field, mapper: SealMapper,
                       secondary: Optional[Field] = None,
                       time_conditioned: bool = False) -> Field:
    """Wrap `base` so queries inside the edit region are warped back to the
    original scene and recolored. For dynamic fields (time_conditioned) the
    mapper is applied to the spatial coords only, before the deformation
    tower, exactly like SealDNeRF/renderer.py:156-168."""

    def forward(params, x, d, *extra):
        xm, dm, mask = mapper.map_to_origin(x, d)
        dm = dm if dm is not None else d
        out = base.forward(params, xm, dm, *extra)
        sigma, rgb = out[0], out[1]
        if secondary is not None:
            out2 = secondary.forward(secondary.params, xm, dm, *extra)
            sigma = jnp.where(mask, out2[0], sigma)
            rgb = jnp.where(mask[:, None], out2[1], rgb)
        rgb = jnp.where(mask[:, None], mapper.map_color(xm, dm, rgb), rgb)
        if len(out) > 2:
            return (sigma, rgb) + tuple(out[2:])
        return sigma, rgb

    def density(params, x, *extra):
        xm, _, mask = mapper.map_to_origin(x, None)
        out = base.density(params, xm, *extra)
        if secondary is not None:
            out2 = secondary.density(secondary.params, xm, *extra)
            return (jnp.where(mask, out2[0], out[0]),) + tuple(out[1:])
        return out

    return Field(base.params, forward, density, base.color, base.background,
                 base.cfg)


def force_fill_mask(mapper: SealMapper, grid_size: int, cascades: int,
                    bound: float, time_size: int = 0):
    """Bool mask of grid cells inside the mapper's force_fill_bound
    (functional replacement for SealNeRF/renderer.py:21-79's Morton-index
    bookkeeping; raster order, broadcast over cascades/time).

    Returns [CAS, H, H, H] (or [T, CAS, H, H, H] when time_size > 0).
    """
    h = grid_size
    bounds = np.asarray(mapper.map_data["force_fill_bound"])
    if bounds.ndim == 2:
        bounds = bounds[None]
    axes = [np.arange(h)] * 3
    mask = np.zeros((h, h, h), dtype=bool)
    for b in bounds:
        bmin = np.clip(b[0], -bound, bound)
        bmax = np.clip(b[1], -bound, bound)
        # cell index range: reference floors ((b + bound) / bound / 2) * H
        cmin = np.floor((bmin + bound) / (2 * bound) * h).astype(int)
        cmax = np.floor((bmax + bound) / (2 * bound) * h).astype(int)
        cmin = np.clip(cmin, 0, h - 1)
        cmax = np.clip(cmax, 0, h)
        mask[cmin[0]:cmax[0] + 1, cmin[1]:cmax[1] + 1,
             cmin[2]:cmax[2] + 1] = True
    out = np.broadcast_to(mask, (cascades, h, h, h))
    if time_size > 0:
        out = np.broadcast_to(out, (time_size, cascades, h, h, h))
    return jnp.asarray(out.copy())


def hack_occ(occ, fill_mask):
    """Force edit-region cells occupied (hack_bitfield); restore = use the
    original occ array (it is never mutated)."""
    return occ | fill_mask
