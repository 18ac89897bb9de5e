"""TensoRF (CP / VM decompositions) and CCNeRF composition.

The reference snapshot's tensoRF package is missing (imported by
main_tensoRF.py:6, main_CCNeRF.py:6, SealNeRF/network.py:4 but absent);
rebuilt here from the torch-ngp API surface visible in those entry points:
CP/VM factor ranks (--cp, rank lists), `upsample_model` at
--upsample_model_steps with progressive grid resolution, the L1 regularizer
flags, and CCNeRF's rank-residual K-loss (special-cased at
nerf/utils.py:531-533 and nerf/renderer.py:298-311: a model may return
sigmas [K, M] and the trainer averages the K losses).

TPU note: TensoRF is a naturally TPU-friendly backbone -- a point costs
3 bilinear plane fetches + 3 line fetches (18 table rows) vs the hash grid's
128, and the factor contraction is dense einsum work.

Layout:
- VM: per axis a, density planes [R_s, res, res] over the two other axes +
  lines [R_s, res] over axis a; appearance likewise with R_a ranks, followed
  by a basis matmul to app_dim and the shared color MLP.
- CP: lines only (rank-R outer products).
"""

import math
from dataclasses import dataclass, field
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops import sh_encode, sh_output_dim, trunc_exp
from .mlp import init_mlp, apply_mlp

_AXES = ((0, (1, 2)), (1, (0, 2)), (2, (0, 1)))  # (line axis, plane axes)


@dataclass(frozen=True)
class TensoRFConfig:
    bound: float = 1.0
    decomposition: str = "vm"          # "vm" | "cp"
    resolution: int = 128              # current grid resolution
    sigma_rank: Tuple[int, ...] = (16, 16, 16)
    color_rank: Tuple[int, ...] = (48, 48, 48)
    color_feat_dim: int = 27
    num_layers_color: int = 3
    hidden_dim_color: int = 64
    sh_degree: int = 4
    degree: int = 0  # placeholder for CLI parity

    @property
    def dir_dim(self):
        return sh_output_dim(self.sh_degree)


def init_tensorf(rng, cfg: TensoRFConfig, scale: float = 0.1):
    keys = jax.random.split(rng, 16)
    res = cfg.resolution
    params = {}
    if cfg.decomposition == "vm":
        for i, (name, ranks) in enumerate(
                [("sigma", cfg.sigma_rank), ("app", cfg.color_rank)]):
            planes, lines = [], []
            for a, r in enumerate(ranks):
                planes.append(scale * jax.random.normal(
                    keys[4 * i + a], (r, res, res)))
                lines.append(scale * jax.random.normal(
                    keys[4 * i + a + 8], (r, res)))
            params[f"{name}_planes"] = planes
            params[f"{name}_lines"] = lines
    else:  # cp
        for i, (name, ranks) in enumerate(
                [("sigma", cfg.sigma_rank), ("app", cfg.color_rank)]):
            lines = [scale * jax.random.normal(keys[4 * i + a], (ranks[0], res))
                     for a in range(3)]
            params[f"{name}_lines"] = lines
    n_app = (sum(cfg.color_rank) if cfg.decomposition == "vm"
             else cfg.color_rank[0])
    params["basis_grid"] = init_mlp(keys[14], [n_app, cfg.color_feat_dim])
    params["color_mlp"] = init_mlp(
        keys[15], [cfg.color_feat_dim + cfg.dir_dim]
        + [cfg.hidden_dim_color] * (cfg.num_layers_color - 1) + [3])
    return params


def _lerp_1d(line, u):
    """line: [R, res]; u: [N] in [0, 1] -> [N, R]."""
    res = line.shape[1]
    x = jnp.clip(u, 0.0, 1.0) * (res - 1)
    i0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, res - 2)
    f = x - i0
    v0 = line[:, i0]  # [R, N]
    v1 = line[:, i0 + 1]
    return (v0 * (1 - f) + v1 * f).T


def _lerp_2d(plane, u, v):
    """plane: [R, res, res]; u, v: [N] in [0, 1] -> [N, R]."""
    res = plane.shape[1]
    x = jnp.clip(u, 0.0, 1.0) * (res - 1)
    y = jnp.clip(v, 0.0, 1.0) * (res - 1)
    i0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, res - 2)
    j0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, res - 2)
    fx = x - i0
    fy = y - j0
    flat = plane.reshape(plane.shape[0], -1)  # [R, res*res]
    def g(ii, jj):
        return flat[:, ii * res + jj]  # [R, N]
    v00, v01 = g(i0, j0), g(i0, j0 + 1)
    v10, v11 = g(i0 + 1, j0), g(i0 + 1, j0 + 1)
    out = (v00 * (1 - fx) * (1 - fy) + v01 * (1 - fx) * fy
           + v10 * fx * (1 - fy) + v11 * fx * fy)
    return out.T  # [N, R]


def _features(params, cfg, x01, name):
    """Rank features [N, sum(R)] for `name` in {sigma, app}."""
    feats = []
    if cfg.decomposition == "vm":
        for a, (la, (pa, pb)) in enumerate(_AXES):
            plane = params[f"{name}_planes"][a]
            line = params[f"{name}_lines"][a]
            f_plane = _lerp_2d(plane, x01[:, pa], x01[:, pb])
            f_line = _lerp_1d(line, x01[:, la])
            feats.append(f_plane * f_line)
        return jnp.concatenate(feats, axis=-1)
    # CP: product of the three line features
    f = None
    for a in range(3):
        fl = _lerp_1d(params[f"{name}_lines"][a], x01[:, a])
        f = fl if f is None else f * fl
    return f


def tensorf_density(params, cfg: TensoRFConfig, x):
    """x: [N, 3] in [-bound, bound] -> (sigma [N], app_feat [N, F])."""
    x01 = (x + cfg.bound) / (2 * cfg.bound)
    sig_feat = _features(params, cfg, x01, "sigma")
    sigma = jax.nn.relu(jnp.sum(sig_feat, axis=-1))
    app = _features(params, cfg, x01, "app")
    feat = apply_mlp(params["basis_grid"], app)
    return sigma, feat


def tensorf_color(params, cfg: TensoRFConfig, d, feat):
    de = sh_encode(d, degree=cfg.sh_degree)
    h = jnp.concatenate([feat, de], axis=-1)
    return apply_mlp(params["color_mlp"], h, final_activation=jax.nn.sigmoid)


def tensorf_forward(params, cfg: TensoRFConfig, x, d):
    sigma, feat = tensorf_density(params, cfg, x)
    return sigma, tensorf_color(params, cfg, d, feat)


def upsample_tensorf(params, cfg: TensoRFConfig, new_resolution: int):
    """Progressive grid upsampling (--upsample_model_steps): trilinear resize
    of every plane/line factor. Returns (params, new cfg)."""
    import dataclasses
    out = dict(params)
    for name in ("sigma", "app"):
        if f"{name}_planes" in params:
            out[f"{name}_planes"] = [
                jax.image.resize(p, (p.shape[0], new_resolution,
                                     new_resolution), method="linear")
                for p in params[f"{name}_planes"]]
        if f"{name}_lines" in params:
            out[f"{name}_lines"] = [
                jax.image.resize(l, (l.shape[0], new_resolution),
                                 method="linear")
                for l in params[f"{name}_lines"]]
    return out, dataclasses.replace(cfg, resolution=new_resolution)


def tensorf_l1_reg(params):
    """L1 sparsity regularizer on the factor grids (TensoRF's loss term)."""
    total = 0.0
    count = 0
    for name in ("sigma_planes", "sigma_lines"):
        for arr in params.get(name, []):
            total = total + jnp.sum(jnp.abs(arr))
            count += arr.size
    return total / max(count, 1)


def _trunc_mask(frac: float, ranks):
    """Per-factor truncation: keep the first ceil(frac * R) ranks of EACH
    axis factor (CCNeRF residual semantics, nerf/renderer.py:298-311).
    VM features concatenate per axis, so a global prefix mask would zero
    whole axes instead of truncating rank."""
    parts = []
    for r in ranks:
        keep = max(1, int(math.ceil(frac * r)))
        parts.append((jnp.arange(r) < keep).astype(jnp.float32))
    return jnp.concatenate(parts)


def _rank_layout(cfg: TensoRFConfig, name: str):
    ranks = cfg.sigma_rank if name == "sigma" else cfg.color_rank
    if cfg.decomposition == "vm":
        return tuple(ranks)       # [axis0 | axis1 | axis2] concat
    return (ranks[0],)            # CP: one product of width ranks[0]


def tensorf_forward_trunc(params, cfg: TensoRFConfig, x, d, frac: float):
    """Rank-truncated forward for CCNeRF's rank-residual hierarchy: only
    the first ceil(frac * R) components of each factor contribute.
    frac is static."""
    x01 = (x + cfg.bound) / (2 * cfg.bound)
    sig_feat = _features(params, cfg, x01, "sigma")
    sig_feat = sig_feat * _trunc_mask(frac, _rank_layout(cfg, "sigma"))
    sigma = jax.nn.relu(jnp.sum(sig_feat, axis=-1))
    app = _features(params, cfg, x01, "app")
    app = app * _trunc_mask(frac, _rank_layout(cfg, "app"))
    feat = apply_mlp(params["basis_grid"], app)
    return sigma, tensorf_color(params, cfg, d, feat)


def make_tensorf_field(rng, cfg: TensoRFConfig):
    from .api import Field
    params = init_tensorf(rng, cfg)

    def forward(params, x, d):
        return tensorf_forward(params, cfg, x, d)

    def density(params, x):
        return tensorf_density(params, cfg, x)

    def color(params, d, feat):
        return tensorf_color(params, cfg, d, feat)

    f = Field(params, forward, density, color, None, cfg)

    def forward_trunc(params, x, d, frac):
        return tensorf_forward_trunc(params, cfg, x, d, frac)

    # K-loss hook: Trainer renders each truncation level and averages the
    # losses (reference nerf/utils.py:531-533)
    f.forward_trunc = forward_trunc
    return f


# ------------------------------------------------------------------- CCNeRF
def cc_compose_forward(fields, transforms=None):
    """CCNeRF composition: render several trained TensoRF models in one
    scene (main_CCNeRF.py's compose mode). sigma adds; color is the
    sigma-weighted mix. transforms: optional per-model [4, 4] world-to-model.

    Returns forward(params_list, x, d) -> (sigma, rgb)."""
    def forward(params_list, x, d):
        sigmas, rgbs = [], []
        for i, f in enumerate(fields):
            xi, di = x, d
            if transforms is not None:
                t = transforms[i]
                xi = (jnp.concatenate([x, jnp.ones_like(x[:, :1])], 1)
                      @ t.T)[:, :3]
                di = d @ t[:3, :3].T
            s, c = f.forward(params_list[i], xi, di)
            sigmas.append(s)
            rgbs.append(c)
        sig = jnp.stack(sigmas)          # [K, N]
        rgb = jnp.stack(rgbs)            # [K, N, 3]
        total = jnp.sum(sig, axis=0)
        w = sig / jnp.maximum(total[None], 1e-8)
        return total, jnp.sum(w[..., None] * rgb, axis=0)
    return forward
