"""Instant-NGP static network.

Parity with reference nerf/network.py:10-209:
- sigma tower: hashgrid(16 levels x 2ch, desired_res = 2048*bound) ->
  2-layer/64 bias-free MLP -> trunc_exp(sigma) + 15-dim geo_feat.
- color tower: SH(degree 4) of direction ++ geo_feat -> 3-layer/64 MLP ->
  sigmoid.
- optional background net when bg_radius > 0: 2D hashgrid (4 levels,
  desired_res 2048) on sphere coords ++ SH dir -> 2-layer/64 MLP -> sigmoid
  (nerf/network.py:72-93, 146-161).

Network params are a dict pytree {"grid", "sigma_mlp", "color_mlp",
["bg_grid", "bg_mlp"]}; all apply functions are pure.
"""

import math
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops import (
    GridEncodeConfig, init_grid_table, grid_encode, sh_encode, sh_output_dim,
    trunc_exp,
)
from .mlp import init_mlp, apply_mlp


@dataclass(frozen=True)
class NGPConfig:
    bound: float = 1.0
    num_levels: int = 16
    level_dim: int = 2
    base_resolution: int = 16
    log2_hashmap_size: int = 19
    num_layers: int = 2
    hidden_dim: int = 64
    geo_feat_dim: int = 15
    num_layers_color: int = 3
    hidden_dim_color: int = 64
    sh_degree: int = 4
    bg_radius: float = -1.0
    num_layers_bg: int = 2
    hidden_dim_bg: int = 64
    gridtype: str = "hash"  # "tiled" for the D-NeRF canonical encoder
    # derived
    grid_cfg: GridEncodeConfig = field(init=False)
    bg_grid_cfg: Optional[GridEncodeConfig] = field(init=False)

    def __post_init__(self):
        object.__setattr__(self, "grid_cfg", GridEncodeConfig(
            input_dim=3,
            num_levels=self.num_levels,
            level_dim=self.level_dim,
            base_resolution=self.base_resolution,
            log2_hashmap_size=self.log2_hashmap_size,
            desired_resolution=int(2048 * self.bound),
            gridtype=self.gridtype,
        ))
        bg = None
        if self.bg_radius > 0:
            # nerf/network.py:75: much smaller 2D hashgrid for the background.
            bg = GridEncodeConfig(
                input_dim=2, num_levels=4, level_dim=2, base_resolution=16,
                log2_hashmap_size=19, desired_resolution=2048, gridtype="hash",
            )
        object.__setattr__(self, "bg_grid_cfg", bg)

    @property
    def dir_dim(self) -> int:
        return sh_output_dim(self.sh_degree)


def init_ngp(rng, cfg: NGPConfig):
    k_grid, k_sigma, k_color, k_bg_grid, k_bg = jax.random.split(rng, 5)
    in_dim = cfg.grid_cfg.output_dim
    sigma_dims = [in_dim] + [cfg.hidden_dim] * (cfg.num_layers - 1) + [1 + cfg.geo_feat_dim]
    color_dims = (
        [cfg.dir_dim + cfg.geo_feat_dim]
        + [cfg.hidden_dim_color] * (cfg.num_layers_color - 1)
        + [3]
    )
    params = {
        "grid": init_grid_table(k_grid, cfg.grid_cfg),
        "sigma_mlp": init_mlp(k_sigma, sigma_dims),
        "color_mlp": init_mlp(k_color, color_dims),
    }
    if cfg.bg_radius > 0:
        bg_dims = (
            [cfg.bg_grid_cfg.output_dim + cfg.dir_dim]
            + [cfg.hidden_dim_bg] * (cfg.num_layers_bg - 1)
            + [3]
        )
        params["bg_grid"] = init_grid_table(k_bg_grid, cfg.bg_grid_cfg)
        params["bg_mlp"] = init_mlp(k_bg, bg_dims)
    return params


def ngp_density(params, cfg: NGPConfig, x):
    """x: [..., 3] in [-bound, bound] -> (sigma [...], geo_feat [..., G])."""
    x01 = (x + cfg.bound) / (2.0 * cfg.bound)
    feat = grid_encode(x01, params["grid"], cfg.grid_cfg)
    h = apply_mlp(params["sigma_mlp"], feat)
    sigma = trunc_exp(h[..., 0])
    geo_feat = h[..., 1:]
    return sigma, geo_feat


def ngp_color(params, cfg: NGPConfig, d, geo_feat):
    """d: [..., 3] unit dirs, geo_feat: [..., G] -> rgb [..., 3] in [0,1]."""
    de = sh_encode(d, degree=cfg.sh_degree)
    h = jnp.concatenate([de, geo_feat], axis=-1)
    return apply_mlp(params["color_mlp"], h, final_activation=jax.nn.sigmoid)


def ngp_forward(params, cfg: NGPConfig, x, d):
    sigma, geo_feat = ngp_density(params, cfg, x)
    rgb = ngp_color(params, cfg, d, geo_feat)
    return sigma, rgb


def ngp_background(params, cfg: NGPConfig, sph, d):
    """sph: [..., 2] in [-1,1] sphere coords, d: [..., 3] dirs -> rgb."""
    feat = grid_encode((sph + 1.0) / 2.0, params["bg_grid"], cfg.bg_grid_cfg)
    de = sh_encode(d, degree=cfg.sh_degree)
    h = jnp.concatenate([de, feat], axis=-1)
    return apply_mlp(params["bg_mlp"], h, final_activation=jax.nn.sigmoid)
