"""D-NeRF dynamic networks.

Three variants, parity with the reference:
- deform (dnerf/network.py:10-275): freq-enc(x, multires 10) ++ freq-enc(t,
  multires 6) -> 8x128 bias-free MLP -> delta-x; warped x + delta-x goes into
  a *tiledgrid* canonical encoder (not hash, dnerf/network.py:12) and then the
  static NGP sigma/color towers. t == 0 forces deform = 0 (canonical frame,
  dnerf/network.py:139-141) -- here a jnp.where on the traced scalar instead
  of a python branch.
- basis (dnerf/network_basis.py): a time MLP emits sigma/color basis
  coefficients (Fourier-PlenOctree style) combined with per-point spatial
  bases; no deformation.
- hyper (dnerf/network_hyper.py): a time MLP emits `ambient_dim` extra
  coordinates appended to x before a (3+A)-D grid encoding (HyperNeRF-style).

Parameter groups split encoder vs MLP learning rates exactly like
dnerf/network.py:260-275 (encoders: lr, MLPs: lr_net); see
train/trainer.py's optax.multi_transform wiring.
"""

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops import (
    GridEncodeConfig, init_grid_table, grid_encode, sh_encode, sh_output_dim,
    freq_encode, freq_output_dim, trunc_exp,
)
from .mlp import init_mlp, apply_mlp
from .ngp import NGPConfig


@dataclass(frozen=True)
class DNeRFConfig:
    bound: float = 1.0
    variant: str = "deform"  # deform | basis | hyper
    # deform tower
    num_layers_deform: int = 8
    hidden_dim_deform: int = 128
    multires_deform: int = 10
    multires_time: int = 6
    # basis variant
    sigma_basis_dim: int = 32
    color_basis_dim: int = 8
    num_layers_basis: int = 5
    hidden_dim_basis: int = 128
    # hyper variant
    ambient_dim: int = 2
    # canonical towers (shared shape with NGP)
    num_levels: int = 16
    level_dim: int = 2
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
    # derived
    grid_cfg: GridEncodeConfig = field(init=False)
    bg_grid_cfg: Optional[GridEncodeConfig] = field(init=False)

    def __post_init__(self):
        spatial_dims = 3 + (self.ambient_dim if self.variant == "hyper" else 0)
        object.__setattr__(self, "grid_cfg", GridEncodeConfig(
            input_dim=spatial_dims,
            num_levels=self.num_levels,
            level_dim=self.level_dim,
            base_resolution=16,
            log2_hashmap_size=self.log2_hashmap_size,
            desired_resolution=int(2048 * self.bound),
            gridtype="tiled" if self.variant == "deform" else "hash",
        ))
        bg = None
        if self.bg_radius > 0:
            bg = GridEncodeConfig(
                input_dim=2, num_levels=4, level_dim=2, base_resolution=16,
                log2_hashmap_size=19, desired_resolution=2048, gridtype="hash")
        object.__setattr__(self, "bg_grid_cfg", bg)

    @property
    def dir_dim(self):
        return sh_output_dim(self.sh_degree)

    @property
    def deform_in_dim(self):
        return freq_output_dim(3, self.multires_deform) + \
            freq_output_dim(1, self.multires_time)


def init_dnerf(rng, cfg: DNeRFConfig):
    keys = jax.random.split(rng, 6)
    params = {
        "grid": init_grid_table(keys[0], cfg.grid_cfg),
        "sigma_mlp": init_mlp(keys[1],
                              [cfg.grid_cfg.output_dim]
                              + [cfg.hidden_dim] * (cfg.num_layers - 1)
                              + [1 + cfg.geo_feat_dim]),
        "color_mlp": init_mlp(keys[2],
                              [cfg.dir_dim + cfg.geo_feat_dim]
                              + [cfg.hidden_dim_color] * (cfg.num_layers_color - 1)
                              + [3]),
    }
    if cfg.variant == "deform":
        dims = [cfg.deform_in_dim] + \
            [cfg.hidden_dim_deform] * (cfg.num_layers_deform - 1) + [3]
        params["deform_mlp"] = init_mlp(keys[3], dims)
    elif cfg.variant == "basis":
        # time MLP emits sigma+color basis coefficients
        tdim = freq_output_dim(1, cfg.multires_time)
        dims = [tdim] + [cfg.hidden_dim_basis] * (cfg.num_layers_basis - 1) + \
            [cfg.sigma_basis_dim + cfg.color_basis_dim]
        params["basis_mlp"] = init_mlp(keys[3], dims)
        # spatial towers emit per-basis values instead of scalars
        params["sigma_mlp"] = init_mlp(
            keys[1], [cfg.grid_cfg.output_dim]
            + [cfg.hidden_dim] * (cfg.num_layers - 1)
            + [cfg.sigma_basis_dim + cfg.geo_feat_dim])
        params["color_mlp"] = init_mlp(
            keys[2], [cfg.dir_dim + cfg.geo_feat_dim]
            + [cfg.hidden_dim_color] * (cfg.num_layers_color - 1)
            + [3 * cfg.color_basis_dim])
    elif cfg.variant == "hyper":
        tdim = freq_output_dim(1, cfg.multires_time)
        xdim = freq_output_dim(3, cfg.multires_deform)
        dims = [xdim + tdim] + \
            [cfg.hidden_dim_deform] * (cfg.num_layers_deform - 1) + \
            [cfg.ambient_dim]
        params["ambient_mlp"] = init_mlp(keys[3], dims)
    else:
        raise ValueError(f"unknown dnerf variant {cfg.variant}")

    if cfg.bg_radius > 0:
        params["bg_grid"] = init_grid_table(keys[4], cfg.bg_grid_cfg)
        params["bg_mlp"] = init_mlp(
            keys[5], [cfg.bg_grid_cfg.output_dim + cfg.dir_dim]
            + [cfg.hidden_dim_bg] * (cfg.num_layers_bg - 1) + [3])
    return params


def _time_feat(cfg, t, n):
    """Broadcast the scalar time's freq encoding to [n, C']."""
    enc_t = freq_encode(jnp.reshape(t, (1, 1)), degree=cfg.multires_time)
    return jnp.broadcast_to(enc_t, (n, enc_t.shape[-1]))


def dnerf_deform(params, cfg: DNeRFConfig, x, t):
    """delta-x tower. Returns [N, 3]; exactly zero at t == 0."""
    n = x.shape[0]
    enc_x = freq_encode(x, degree=cfg.multires_deform)
    h = jnp.concatenate([enc_x, _time_feat(cfg, t, n)], axis=-1)
    deform = apply_mlp(params["deform_mlp"], h)
    return jnp.where(jnp.reshape(t, ()) == 0.0, 0.0, deform)


def _canonical_density(params, cfg, x_warp):
    x01 = (x_warp + cfg.bound) / (2.0 * cfg.bound)
    feat = grid_encode(x01, params["grid"], cfg.grid_cfg)
    h = apply_mlp(params["sigma_mlp"], feat)
    return h


def _color_tower(params, cfg, d, geo_feat):
    de = sh_encode(d, degree=cfg.sh_degree)
    h = jnp.concatenate([de, geo_feat], axis=-1)
    return apply_mlp(params["color_mlp"], h, final_activation=jax.nn.sigmoid)


def dnerf_density(params, cfg: DNeRFConfig, x, t):
    """(sigma [N], geo_feat [N, G]) at time t (scalar in [0, 1])."""
    if cfg.variant == "deform":
        deform = dnerf_deform(params, cfg, x, t)
        h = _canonical_density(params, cfg, x + deform)
        return trunc_exp(h[..., 0]), h[..., 1:]
    if cfg.variant == "hyper":
        amb = _ambient(params, cfg, x, t)
        h = _hyper_density(params, cfg, x, amb)
        return trunc_exp(h[..., 0]), h[..., 1:]
    # basis
    n = x.shape[0]
    h = _canonical_density(params, cfg, x)
    sigma_b = h[..., :cfg.sigma_basis_dim]
    geo_feat = h[..., cfg.sigma_basis_dim:]
    tb = _basis_coeffs(params, cfg, t)
    sigma = trunc_exp(jnp.sum(sigma_b * tb[:cfg.sigma_basis_dim][None], -1))
    return sigma, geo_feat


def _basis_coeffs(params, cfg, t):
    enc_t = freq_encode(jnp.reshape(t, (1, 1)), degree=cfg.multires_time)
    return apply_mlp(params["basis_mlp"], enc_t)[0]  # [SB + CB]


def _ambient(params, cfg, x, t):
    n = x.shape[0]
    enc_x = freq_encode(x, degree=cfg.multires_deform)
    h = jnp.concatenate([enc_x, _time_feat(cfg, t, n)], axis=-1)
    return jnp.tanh(apply_mlp(params["ambient_mlp"], h))  # [N, A] in [-1,1]


def _hyper_density(params, cfg, x, amb):
    x01 = (x + cfg.bound) / (2.0 * cfg.bound)
    a01 = (amb + 1.0) / 2.0
    feat = grid_encode(jnp.concatenate([x01, a01], axis=-1), params["grid"],
                       cfg.grid_cfg)
    return apply_mlp(params["sigma_mlp"], feat)


def dnerf_forward(params, cfg: DNeRFConfig, x, d, t):
    """(sigma [N], rgb [N,3], deform [N,3]) -- matches dnerf/network.py:123-169."""
    if cfg.variant == "deform":
        deform = dnerf_deform(params, cfg, x, t)
        h = _canonical_density(params, cfg, x + deform)
        sigma = trunc_exp(h[..., 0])
        rgb = _color_tower(params, cfg, d, h[..., 1:])
        return sigma, rgb, deform
    if cfg.variant == "hyper":
        amb = _ambient(params, cfg, x, t)
        h = _hyper_density(params, cfg, x, amb)
        sigma = trunc_exp(h[..., 0])
        rgb = _color_tower(params, cfg, d, h[..., 1:])
        return sigma, rgb, jnp.zeros_like(x)
    # basis
    n = x.shape[0]
    h = _canonical_density(params, cfg, x)
    sigma_b = h[..., :cfg.sigma_basis_dim]
    geo_feat = h[..., cfg.sigma_basis_dim:]
    tb = _basis_coeffs(params, cfg, t)
    sigma = trunc_exp(jnp.sum(sigma_b * tb[:cfg.sigma_basis_dim][None], -1))
    de = sh_encode(d, degree=cfg.sh_degree)
    hc = jnp.concatenate([de, geo_feat], axis=-1)
    rgb_b = apply_mlp(params["color_mlp"], hc).reshape(
        n, 3, cfg.color_basis_dim)
    rgb = jax.nn.sigmoid(
        jnp.sum(rgb_b * tb[cfg.sigma_basis_dim:][None, None], -1))
    return sigma, rgb, jnp.zeros_like(x)


def dnerf_background(params, cfg: DNeRFConfig, sph, d):
    feat = grid_encode((sph + 1.0) / 2.0, params["bg_grid"], cfg.bg_grid_cfg)
    de = sh_encode(d, degree=cfg.sh_degree)
    h = jnp.concatenate([de, feat], axis=-1)
    return apply_mlp(params["bg_mlp"], h, final_activation=jax.nn.sigmoid)
