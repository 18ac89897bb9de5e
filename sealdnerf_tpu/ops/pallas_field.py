"""Fused Pallas forward kernel for the CP factorized field.

The XLA path (models/cp.py) materializes the hat basis u [S, res] and the
feature matrix [S, 235] in HBM between ops; at render scale (~40M samples
per 800x800 frame) that is ~15 GB of HBM traffic per frame and dominates
the measured cost (profile_render.py: cp_features 46 ms + MLP traffic
21 ms per 4.2M samples vs a ~15 ms MXU FLOP floor). This kernel evaluates
the whole field per sample tile entirely in VMEM:

  per tile of T samples:
    x01 -> hat bases u_a [T, res_s] (built in registers)
    f_a = u_a @ line[s][a]            (MXU)
    cp_s = f_x * f_y * f_z            (VPU)
    sigma_h = sum_s cp_s @ Wsig[rows_s] + freq(x) @ Wsig[rows_freq]
    sigma = exp(h0), geo = h[1:]
    rgb = sigmoid(color_mlp(sh(d) ++ geo))

Only x, d enter and sigma/rgb leave HBM. All line tables and MLP weights
stay VMEM-resident across the grid sweep (constant index_map).

Forward only: used by the inference/render path (render/fast.py) where
no gradients are needed. Training keeps the XLA path (differentiable by
construction). Parity test: tests/test_pallas_field.py vs cp_forward.

Reference parity: this is the TPU replacement for the fused-MLP +
gridencoder hot path (ffmlp/src/ffmlp.cu:332-409 fused forward;
gridencoder/src/gridencoder.cu:88-245 kernel_grid) for the factorized
field family.
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sh_encode import sh_encode
from .activation import trunc_exp  # noqa: F401  (semantic reference)


def _freq_cols(x, degree):
    """freq_encode as a list of [T, 3] pieces (ops/freq_encode.py:18-25)."""
    outs = [x]
    for f in range(degree):
        xf = x * (2.0 ** f)
        outs.append(jnp.sin(xf))
        outs.append(jnp.cos(xf))
    return outs


def _field_kernel(x_ref, d_ref, *refs, cfg, n_scales, tile):
    """refs = [line_0x, line_0y, line_0z, line_1x, ..., wsig0, wsig1,
    wcol0, wcol1, wcol2, out_ref]."""
    tabs = refs[:3 * n_scales]
    wsig0, wsig1, wcol0, wcol1, wcol2 = refs[3 * n_scales:3 * n_scales + 5]
    out_ref = refs[-1]

    x = x_ref[:]                                   # [T, 3] f32 world coords
    x01 = jnp.clip((x + cfg.bound) / (2.0 * cfg.bound), 0.0, 1.0)

    # sigma-tower input contraction, piece by piece (avoids a lane concat):
    # h = feat @ wsig0 with feat = [cp_0 | cp_1 | ... | freq]
    h = jnp.zeros((tile, wsig0.shape[1]), dtype=jnp.float32)
    row = 0
    for s, (res, rank) in enumerate(cfg.scales):
        prod = None
        for a in range(3):
            xa = x01[:, a:a + 1] * (res - 1)              # [T, 1]
            ii = jax.lax.broadcasted_iota(jnp.int32, (tile, res),
                                          1).astype(jnp.float32)
            u = jnp.maximum(0.0, 1.0 - jnp.abs(xa - ii)).astype(jnp.bfloat16)
            f = jnp.dot(u, tabs[3 * s + a][:],
                        preferred_element_type=jnp.float32)  # [T, rank]
            prod = f if prod is None else prod * f
        h = h + jnp.dot(prod.astype(jnp.bfloat16), wsig0[row:row + rank, :],
                        preferred_element_type=jnp.float32)
        row += rank
    for piece in _freq_cols(x, cfg.freq_degree):
        h = h + jnp.dot(piece.astype(jnp.bfloat16), wsig0[row:row + 3, :],
                        preferred_element_type=jnp.float32)
        row += 3

    h = jax.nn.relu(h).astype(jnp.bfloat16)
    h = jnp.dot(h, wsig1[:], preferred_element_type=jnp.float32)  # [T, 16]
    sigma = jnp.exp(h[:, 0:1])                                    # trunc_exp
    geo = h[:, 1:]                                                # [T, 15]

    # color tower: sh(d) ++ geo -> 64 -> 64 -> 3, sigmoid
    d = d_ref[:]                                   # [T, 3]
    de = sh_encode(d[:, None, :], degree=cfg.sh_degree)[:, 0, :]  # [T, 16]
    sh_dim = de.shape[-1]
    hc = jnp.dot(de.astype(jnp.bfloat16), wcol0[:sh_dim, :],
                 preferred_element_type=jnp.float32)
    hc = hc + jnp.dot(geo.astype(jnp.bfloat16), wcol0[sh_dim:, :],
                      preferred_element_type=jnp.float32)
    hc = jax.nn.relu(hc).astype(jnp.bfloat16)
    hc = jnp.dot(hc, wcol1[:], preferred_element_type=jnp.float32)
    hc = jax.nn.relu(hc).astype(jnp.bfloat16)
    hc = jnp.dot(hc, wcol2[:], preferred_element_type=jnp.float32)  # [T, 3]
    rgb = jax.nn.sigmoid(hc)

    pad = jnp.zeros((tile, 4), dtype=jnp.float32)
    out_ref[:] = jnp.concatenate([sigma, rgb, pad], axis=-1)


@functools.partial(jax.jit, static_argnames=("cfg", "tile", "interpret"))
def cp_forward_fused(params, cfg, x, d, tile: int = 256,
                     interpret: bool = False):
    """Fused forward: x, d [S, 3] -> (sigma [S], rgb [S, 3]).

    S is padded to a tile multiple internally. Matches
    models/cp.py:cp_forward to bf16 matmul tolerance.
    """
    s_in = x.shape[0]
    n_scales = len(cfg.scales)
    pad = (-s_in) % tile
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, 3), x.dtype)], axis=0)
        dpad = jnp.tile(jnp.array([[0.0, 0.0, 1.0]], d.dtype), (pad, 1))
        d = jnp.concatenate([d, dpad], axis=0)
    s_tot = s_in + pad

    tabs = [params["lines"][s][a].astype(jnp.bfloat16)
            for s in range(n_scales) for a in range(3)]
    wsig = [w.astype(jnp.bfloat16) for w in params["sigma_mlp"]["w"]]
    wcol = [w.astype(jnp.bfloat16) for w in params["color_mlp"]["w"]]
    assert len(wsig) == 2 and len(wcol) == 3, \
        "fused kernel serves the default tower depths (2 sigma / 3 color)"

    kernel = functools.partial(_field_kernel, cfg=cfg, n_scales=n_scales,
                               tile=tile)
    const = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                        memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    in_specs += [const(*t.shape) for t in tabs]
    in_specs += [const(*w.shape) for w in wsig + wcol]

    out = pl.pallas_call(
        kernel,
        grid=(s_tot // tile,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((s_tot, 8), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, d, *tabs, *wsig, *wcol)
    return out[:s_in, 0], out[:s_in, 1:4]


def make_fused_forward(cfg, interpret: bool = False, tile: int = 512):
    """forward_fn with the render_dense contract: (params, x, d) ->
    (sigma, rgb)."""
    def forward(params, x, d):
        return cp_forward_fused(params, cfg, x, d, tile=tile,
                                interpret=interpret)
    return forward
