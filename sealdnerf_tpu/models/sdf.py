"""SDF-fitting network (reference sdf/netowrk.py [sic]): hashgrid encoder +
bias-free MLP with optional skips and sdf clipping. The --ff / --tcnn
variants (sdf/netowrk_ff.py, sdf/network_tcnn.py) alias here on TPU."""

from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import GridEncodeConfig, init_grid_table, grid_encode
from .mlp import init_mlp, apply_mlp


@dataclass(frozen=True)
class SDFConfig:
    num_layers: int = 3
    hidden_dim: int = 64
    skips: Tuple[int, ...] = ()
    clip_sdf: Optional[float] = None
    grid_cfg: GridEncodeConfig = field(init=False)

    def __post_init__(self):
        object.__setattr__(self, "grid_cfg", GridEncodeConfig(
            input_dim=3, num_levels=16, level_dim=2, base_resolution=16,
            log2_hashmap_size=19, desired_resolution=2048, gridtype="hash"))


def init_sdf(rng, cfg: SDFConfig):
    k1, k2 = jax.random.split(rng)
    in_dim = cfg.grid_cfg.output_dim
    ws = []
    keys = jax.random.split(k2, cfg.num_layers)
    dims_in = []
    for l in range(cfg.num_layers):
        if l == 0:
            d_in = in_dim
        elif l in cfg.skips:
            d_in = cfg.hidden_dim + in_dim
        else:
            d_in = cfg.hidden_dim
        d_out = 1 if l == cfg.num_layers - 1 else cfg.hidden_dim
        dims_in.append((d_in, d_out))
        ws.append(init_mlp(keys[l], [d_in, d_out])["w"][0])
    return {"grid": init_grid_table(k1, cfg.grid_cfg), "mlp": {"w": ws}}


def sdf_forward(params, cfg: SDFConfig, x):
    """x: [N, 3] in [-1, 1] -> sdf [N]."""
    x01 = (x + 1.0) / 2.0
    feat = grid_encode(x01, params["grid"], cfg.grid_cfg)
    h = feat.astype(jnp.bfloat16)
    for l, w in enumerate(params["mlp"]["w"]):
        if l in cfg.skips:
            h = jnp.concatenate([h, feat.astype(h.dtype)], axis=-1)
        h = jnp.dot(h, w.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        if l != cfg.num_layers - 1:
            h = jax.nn.relu(h).astype(jnp.bfloat16)
    h = h[..., 0].astype(jnp.float32)
    if cfg.clip_sdf is not None:
        h = jnp.clip(h, -cfg.clip_sdf, cfg.clip_sdf)
    return h
