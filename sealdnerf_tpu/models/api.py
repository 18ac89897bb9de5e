"""Model API: a `Field` bundles parameters with the pure functions the
renderer and trainer need. This replaces the reference's NeRFNetwork(nn.Module)
inheritance tower (network subclasses renderer subclasses nn.Module) with
composition: the renderer takes functions, the trainer takes a Field.

Seal teachers wrap another Field's functions (map points before, map colors
after) without touching the renderer -- see editing/.
"""

from typing import Callable, Optional

import jax

from .ngp import (
    NGPConfig, init_ngp, ngp_density, ngp_color, ngp_forward, ngp_background,
)


class Field:
    """A radiance field: params + pure fns.

    forward(params, x, d) -> (sigma, rgb)
    density(params, x) -> (sigma, geo_feat)
    color(params, d, geo_feat) -> rgb
    background(params, sph, d) -> rgb  (optional)
    """

    def __init__(self, params, forward: Callable, density: Callable,
                 color: Callable, background: Optional[Callable] = None,
                 cfg=None):
        self.params = params
        self.forward = forward
        self.density = density
        self.color = color
        self.background = background
        self.cfg = cfg


def make_ngp_field(rng: jax.Array, cfg: NGPConfig) -> Field:
    """Instant-NGP field (reference nerf/network.py). The --ff / --tcnn
    backbones alias to this (FFMLP is a CUDA scheduling trick; XLA fuses)."""
    params = init_ngp(rng, cfg)

    def forward(params, x, d):
        return ngp_forward(params, cfg, x, d)

    def density(params, x):
        return ngp_density(params, cfg, x)

    def color(params, d, geo_feat):
        return ngp_color(params, cfg, d, geo_feat)

    background = None
    if cfg.bg_radius > 0:
        def background(params, sph, d):  # noqa: F811
            return ngp_background(params, cfg, sph, d)

    f = Field(params, forward, density, color, background, cfg)

    def tv_loss(params, x01):
        """TV energy on the hash table at sampled points (--tv_weight;
        gridencoder.cu:507-640)."""
        from ..ops.grid_encode import grid_tv_loss
        return grid_tv_loss(params["grid"], cfg.grid_cfg, x01)

    f.tv_loss = tv_loss
    return f


def make_dnerf_field(rng: jax.Array, cfg) -> Field:
    """Dynamic D-NeRF field (reference dnerf/network{,_basis,_hyper}.py).
    forward/density take a trailing scalar time argument."""
    from .dnerf import (
        DNeRFConfig, init_dnerf, dnerf_forward, dnerf_density,
        dnerf_background,
    )
    assert isinstance(cfg, DNeRFConfig)
    params = init_dnerf(rng, cfg)

    def forward(params, x, d, t):
        return dnerf_forward(params, cfg, x, d, t)

    def density(params, x, t):
        return dnerf_density(params, cfg, x, t)

    def color(params, d, geo_feat):
        from .dnerf import _color_tower
        return _color_tower(params, cfg, d, geo_feat)

    background = None
    if cfg.bg_radius > 0:
        def background(params, sph, d):  # noqa: F811
            return dnerf_background(params, cfg, sph, d)

    return Field(params, forward, density, color, background, cfg)
