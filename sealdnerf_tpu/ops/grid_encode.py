"""Multiresolution hash / tiled grid encoding (Instant-NGP style).

Parity with reference gridencoder/src/gridencoder.cu + gridencoder/grid.py:

- Per level l: scale = 2^(l*S) * H - 1, resolution = ceil(scale) + 1
  (gridencoder.cu:138-139), with S = log2(per_level_scale) and H the base
  resolution; per_level_scale derived from desired_resolution exactly as in
  grid.py:100-102.
- Level table sizes: min(2^log2_hashmap_size, (res (+1 if not align_corners))^D)
  rounded up to a multiple of 8 (grid.py:117-127).
- Indexing: dense linear index while the stride fits the level's table
  (gridencoder.cu:67-84); spatial prime-XOR hash (gridencoder.cu:51-63) for
  hash-type levels that overflow; tiled levels keep the (wrapped) linear index.
- Interpolation: d-linear over the 2^D corners, optional smoothstep
  (gridencoder.cu:40-47, 146-197). Inputs outside [0, 1] produce zeros
  (gridencoder.cu:111-135).
- Embeddings initialized U(-1e-4, 1e-4) (grid.py:138-140).

TPU design: the level loop is a static Python loop (16 iterations) of XLA
gathers + weighted sums; the backward scatter-add comes from autodiff of the
gather (an XLA scatter). This keeps the whole encode inside the jitted render
step where XLA fuses the interpolation arithmetic into the surrounding MLP.
Layout matches the reference: output[..., level*C : (level+1)*C] is level
`level` (grid.py:57 permutes to the same).
"""

import math
from dataclasses import dataclass, field
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

_PRIMES = (1, 2654435761, 805459861, 3674653429, 2097192037, 1434869437, 2165219737)

HASH = "hash"
TILED = "tiled"


@dataclass(frozen=True)
class GridEncodeConfig:
    """Static configuration for one grid encoder (hashable; safe as a jit static)."""

    input_dim: int = 3
    num_levels: int = 16
    level_dim: int = 2
    base_resolution: int = 16
    log2_hashmap_size: int = 19
    desired_resolution: int = 2048
    gridtype: str = HASH
    align_corners: bool = False
    interpolation: str = "linear"  # or "smoothstep"
    # Derived (filled in __post_init__):
    per_level_scale: float = field(init=False)
    resolutions: Tuple[int, ...] = field(init=False)
    offsets: Tuple[int, ...] = field(init=False)

    def __post_init__(self):
        if self.num_levels > 1:
            s = math.exp2(
                math.log2(self.desired_resolution / self.base_resolution)
                / (self.num_levels - 1)
            )
        else:
            s = 1.0
        object.__setattr__(self, "per_level_scale", s)

        max_params = 2 ** self.log2_hashmap_size
        resolutions = []
        offsets = [0]
        offset = 0
        for lvl in range(self.num_levels):
            # Matches gridencoder.cu:138-139 (resolution used for indexing) and
            # grid.py:121-126 (table sizing, which uses ceil(H * s**l)).
            scale = math.exp2(lvl * math.log2(s)) * self.base_resolution - 1.0
            resolutions.append(int(math.ceil(scale)) + 1)
            size_res = int(math.ceil(self.base_resolution * s ** lvl))
            params_in_level = min(
                max_params,
                (size_res if self.align_corners else size_res + 1) ** self.input_dim,
            )
            params_in_level = int(math.ceil(params_in_level / 8) * 8)
            offset += params_in_level
            offsets.append(offset)
        object.__setattr__(self, "resolutions", tuple(resolutions))
        object.__setattr__(self, "offsets", tuple(offsets))

    @property
    def output_dim(self) -> int:
        return self.num_levels * self.level_dim

    @property
    def table_size(self) -> int:
        return self.offsets[-1]


def init_grid_table(rng, cfg: GridEncodeConfig, dtype=jnp.float32):
    """Embedding table [table_size, level_dim], U(-1e-4, 1e-4) (grid.py:138-140)."""
    return jax.random.uniform(
        rng, (cfg.table_size, cfg.level_dim), dtype=dtype, minval=-1e-4, maxval=1e-4
    )


def _fast_hash(pos_grid_u32, input_dim):
    """Prime-XOR spatial hash (gridencoder.cu:51-63). pos_grid: [..., D] uint32."""
    h = pos_grid_u32[..., 0] * jnp.uint32(_PRIMES[0])
    for d in range(1, input_dim):
        h = h ^ (pos_grid_u32[..., d] * jnp.uint32(_PRIMES[d]))
    return h


def _grid_index(pos_grid, cfg: GridEncodeConfig, level: int):
    """Index into level `level`'s table for integer corner coords [..., D].

    Mirrors gridencoder.cu:67-84: accumulate a linear index while the running
    stride still fits the table; hash-type levels that overflow use fast_hash.
    All stride decisions are static Python (resolution and table size are
    config constants), so the traced code is a single arithmetic expression.
    """
    hashmap_size = cfg.offsets[level + 1] - cfg.offsets[level]
    res_stride = cfg.resolutions[level] if cfg.align_corners else cfg.resolutions[level] + 1

    pg = pos_grid.astype(jnp.uint32)
    stride = 1
    index = jnp.zeros(pos_grid.shape[:-1], dtype=jnp.uint32)
    for d in range(cfg.input_dim):
        if stride > hashmap_size:
            break
        index = index + pg[..., d] * jnp.uint32(stride)
        stride *= res_stride
    if cfg.gridtype == HASH and stride > hashmap_size:
        index = _fast_hash(pg, cfg.input_dim)
    return (index % jnp.uint32(hashmap_size)).astype(jnp.int32)


# 2^D corner bit patterns, computed once per (static) input_dim.
def _corner_offsets(input_dim):
    n = 1 << input_dim
    return jnp.array(
        [[(i >> d) & 1 for d in range(input_dim)] for i in range(n)], dtype=jnp.int32
    )  # [2^D, D]


def _indices_and_weights(x, cfg: GridEncodeConfig):
    """Corner table indices and interp weights for all levels at once.

    x: [N, D] in [0, 1]. Returns (idx [N, L, 2^D] int32 global indices,
    w [N, L, 2^D] float32, oob [N] bool).
    """
    corners = _corner_offsets(cfg.input_dim)  # [2^D, D]
    oob = jnp.any((x < 0.0) | (x > 1.0), axis=-1)  # [N]
    idxs, ws = [], []
    for level in range(cfg.num_levels):
        scale = math.exp2(
            level * math.log2(cfg.per_level_scale)) * cfg.base_resolution - 1.0
        pos = x * scale + (0.0 if cfg.align_corners else 0.5)  # [N, D]
        pos_floor = jnp.floor(pos)
        frac = pos - pos_floor
        pos_grid = jnp.clip(
            pos_floor, 0.0, float(cfg.resolutions[level])).astype(jnp.int32)
        if cfg.interpolation == "smoothstep":
            frac = frac * frac * (3.0 - 2.0 * frac)
        cpos = pos_grid[:, None, :] + corners[None, :, :]  # [N, 2^D, D]
        w = jnp.where(corners[None, :, :] == 0,
                      1.0 - frac[:, None, :], frac[:, None, :])
        ws.append(jnp.prod(w, axis=-1))  # [N, 2^D]
        idxs.append(_grid_index(cpos, cfg, level) + cfg.offsets[level])
    return jnp.stack(idxs, axis=1), jnp.stack(ws, axis=1), oob


def _grid_index_planar(cell_ds, cfg: GridEncodeConfig, level: int):
    """_grid_index on planar per-dim coords: list of D [N] int32 arrays
    -> [N] int32 global table indices (level offset included)."""
    hashmap_size = cfg.offsets[level + 1] - cfg.offsets[level]
    res_stride = cfg.resolutions[level] if cfg.align_corners \
        else cfg.resolutions[level] + 1
    pgs = [c.astype(jnp.uint32) for c in cell_ds]
    stride = 1
    index = jnp.zeros_like(pgs[0])
    for d in range(cfg.input_dim):
        if stride > hashmap_size:
            break
        index = index + pgs[d] * jnp.uint32(stride)
        stride *= res_stride
    if cfg.gridtype == HASH and stride > hashmap_size:
        index = pgs[0] * jnp.uint32(_PRIMES[0])
        for d in range(1, cfg.input_dim):
            index = index ^ (pgs[d] * jnp.uint32(_PRIMES[d]))
    return (index % jnp.uint32(hashmap_size)).astype(jnp.int32) + \
        cfg.offsets[level]


def _encode_fwd_impl(x, table, cfg: GridEncodeConfig):
    """PLANAR forward: per-dim [N] coordinate rows, per-corner flat 1-D
    gathers, per-(level, channel) [N] accumulators.

    The earlier array-of-struct forward materialized corner indices
    [N, L, 2^D] int32 and gathered values [N, L, 2^D, C] -- on TPU the
    minormost dims (8 and C=2) lane-pad to 128, a 16-64x memory blowup
    that OOM'd whole-image renders at compile time (an 800px NGP eval is
    N=4.2M -> a 34 GB index allocation). Planar [N]-vector arithmetic +
    flat gathers have no pad axis; only the final [N, L*C] output is 2-D.
    (Same planar-layout lesson as ops/pallas_field.py / PERF_NOTES.md.)
    """
    n = x.shape[0]
    d_dim, lvls, c_dim = cfg.input_dim, cfg.num_levels, cfg.level_dim
    xT = x.T  # [D, N] planar
    oob = jnp.zeros((n,), jnp.bool_)
    for d in range(d_dim):
        oob = oob | (xT[d] < 0.0) | (xT[d] > 1.0)
    tflat = table.reshape(-1)  # row-major [T*C]
    cols = []
    for level in range(lvls):
        scale = math.exp2(
            level * math.log2(cfg.per_level_scale)) * cfg.base_resolution - 1.0
        off = 0.0 if cfg.align_corners else 0.5
        cells, fracs = [], []
        for d in range(d_dim):
            pos = xT[d] * scale + off
            pf = jnp.floor(pos)
            fr = pos - pf
            if cfg.interpolation == "smoothstep":
                fr = fr * fr * (3.0 - 2.0 * fr)
            cells.append(jnp.clip(
                pf, 0.0, float(cfg.resolutions[level])).astype(jnp.int32))
            fracs.append(fr)
        acc = [jnp.zeros((n,), jnp.float32) for _ in range(c_dim)]
        for corner in range(1 << d_dim):
            cds = [cells[d] + ((corner >> d) & 1) for d in range(d_dim)]
            w = None
            for d in range(d_dim):
                wd = fracs[d] if (corner >> d) & 1 else 1.0 - fracs[d]
                w = wd if w is None else w * wd
            base = _grid_index_planar(cds, cfg, level) * c_dim
            for ch in range(c_dim):
                acc[ch] = acc[ch] + w * jnp.take(tflat, base + ch)
        cols.extend(acc)
    out = jnp.stack(cols, axis=-1)  # [N, L*C], level-major channels
    return jnp.where(oob[:, None], 0.0, out)


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _grid_encode_flat(x, table, cfg: GridEncodeConfig):
    return _encode_fwd_impl(x, table, cfg)


def _grid_encode_flat_fwd(x, table, cfg):
    return _encode_fwd_impl(x, table, cfg), (x, table)


def _grid_encode_flat_bwd(cfg, res, g):
    """Custom backward: ONE global scatter-add across all levels for the
    table gradient (the autodiff default emits L sequential scatters, which
    serialize on TPU -- measured 16x slower), and a gather-only VJP for the
    input gradient (the dy_dx path of gridencoder.cu:199-244)."""
    x, table = res
    n = x.shape[0]
    idx, w, oob = _indices_and_weights(x, cfg)  # [N, L, 2^D]
    g = g.reshape(n, cfg.num_levels, cfg.level_dim)
    g = jnp.where(oob[:, None, None], 0.0, g)
    # d_table[idx] += w * g, via the sort-and-accumulate histogram (XLA's
    # TPU scatter runs at ~12M updates/s; this path measured 5.5x faster at
    # the 25M-update scale of a default train step).
    from .scatter_add import sorted_chunk_scatter_add
    upd = (w[..., None] * g[:, :, None, :]).reshape(-1, cfg.level_dim)
    d_table = sorted_chunk_scatter_add(
        idx.reshape(-1).astype(jnp.int32), upd.astype(jnp.float32),
        cfg.table_size).astype(table.dtype)

    # d_x via autodiff of the gather-only forward (table constant).
    _, pullback = jax.vjp(lambda xx: _encode_fwd_impl(xx, table, cfg), x)
    d_x = pullback(g.reshape(n, cfg.output_dim))[0]
    return d_x, d_table


_grid_encode_flat.defvjp(_grid_encode_flat_fwd, _grid_encode_flat_bwd)


@partial(jax.jit, static_argnames=("cfg",))
def grid_encode(x01, table, cfg: GridEncodeConfig):
    """Encode points with the multires grid.

    Args:
      x01: [..., D] float in [0, 1] (out-of-range points encode to zeros).
      table: [table_size, C] float embedding table.
      cfg: static GridEncodeConfig.

    Returns:
      [..., L*C] float, fp32, level-major channel layout.
    """
    prefix = x01.shape[:-1]
    x = x01.reshape(-1, cfg.input_dim).astype(jnp.float32)
    out = _grid_encode_flat(x, table, cfg)
    return out.reshape(*prefix, cfg.output_dim)


def grid_tv_loss(table, cfg: GridEncodeConfig, x01):
    """Sampled total-variation loss on the grid tables.

    The reference injects the TV *gradient* directly into the embedding
    grads at B sampled points (kernel_grad_tv, gridencoder/src/
    gridencoder.cu:507-640: for each level and each dim, the difference
    to the +-1 neighbor cells scaled by `weight`). The TPU-composable
    equivalent is this differentiable loss -- 0.5 * sum of squared
    forward differences at the sampled cells -- whose autodiff gradient
    reproduces those per-cell difference terms; scale it with a weight
    and add to the training loss (optax-composable).

    Args:
      table: [table_size, C] embeddings.
      cfg: the encoder config.
      x01: [N, D] sample points in [0, 1] (training ray samples or
        uniform random points).

    Returns scalar mean TV energy across levels/dims/samples.
    """
    d_dim = cfg.input_dim
    total = 0.0
    for level in range(cfg.num_levels):
        scale = math.exp2(
            level * math.log2(cfg.per_level_scale)) * cfg.base_resolution - 1.0
        pos = x01 * scale + (0.0 if cfg.align_corners else 0.5)
        cell = jnp.clip(jnp.floor(pos), 0.0,
                        float(cfg.resolutions[level] - 1)).astype(jnp.int32)
        idx0 = _grid_index(cell, cfg, level) + cfg.offsets[level]
        v0 = jnp.take(table, idx0, axis=0)                    # [N, C]
        for d in range(d_dim):
            nb = cell.at[..., d].add(1)
            nb = jnp.clip(nb, 0, cfg.resolutions[level] - 1)
            idx1 = _grid_index(nb, cfg, level) + cfg.offsets[level]
            v1 = jnp.take(table, idx1, axis=0)
            total = total + 0.5 * jnp.mean(jnp.sum((v0 - v1) ** 2, -1))
    return total / cfg.num_levels
