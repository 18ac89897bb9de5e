"""Fused Pallas forward kernel for the CP factorized field (planar layout).

The XLA path (models/cp.py) materializes the hat basis u [S, res] and the
feature matrix [S, 235] in HBM between ops; at render scale (~40M samples
per 800x800 frame) that is ~15 GB of HBM traffic per frame. Worse, any
[S, 3] / [N, S, 3] coordinate array gets its last dim lane-padded 3->128
by TPU tiling (a 42x blowup: an 800px render OOM'd on a 20 GB pad of a
491 MB logical array). This kernel therefore works PLANAR/transposed:
lanes always carry samples.

  inputs  x3, d3: [3, M] f32 (rows = x/y/z planes; 3->8 sublane pad only)
  tables  linesT[s][a]: [rank, res] bf16
  weights W^T per layer
  output  out: [8, M] f32 (rows: sigma, r, g, b, 0...)

per tile of T lanes:
  uT_a  = max(0, 1 - |x01_a*(res-1) - iota_rows|)   [res, T] (in VMEM)
  f_a   = linesT[s][a] @ uT_a                        [rank, T]  (MXU)
  cp_s  = f_x * f_y * f_z                            (VPU)
  h     = sum_s WsigT[:, rows_s] @ cp_s + freq outer-products
  sigma = exp(h1[0]); rgb = sigmoid(color tower on sh(d) ++ geo)

Only x3/d3 enter and out leaves HBM; tables and weights stay
VMEM-resident across the grid sweep (constant index_map).

Forward only: used by the inference/render path (render/fast_image.py).
Training keeps the XLA path (differentiable by construction). Parity
test: tests/test_pallas_field parity classes in tests/test_fast_path.py.

Reference parity: TPU replacement for the fused-MLP + gridencoder hot
path (ffmlp/src/ffmlp.cu:332-409 fused forward; gridencoder/src/
gridencoder.cu:88-245 kernel_grid) for the factorized field family.
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sh_encode import _K, _double_factorial


def _sh_planar(x, y, z, degree: int):
    """Real SH with planar [1, T] component rows -> [degree^2, T].

    Same recurrences as ops/sh_encode.py:47-93 (parity-tested there),
    restructured so every intermediate keeps lanes = samples.
    """
    C = [jnp.ones_like(x)]
    S = [jnp.zeros_like(x)]
    for m in range(1, degree):
        C.append(x * C[m - 1] - y * S[m - 1])
        S.append(x * S[m - 1] + y * C[m - 1])
    P = {}
    for m in range(degree):
        P[(m, m)] = jnp.full_like(
            z, ((-1.0) ** m) * _double_factorial(2 * m - 1))
        if m + 1 < degree:
            P[(m + 1, m)] = (2 * m + 1) * z * P[(m, m)]
        for l in range(m + 2, degree):
            P[(l, m)] = ((2 * l - 1) * z * P[(l - 1, m)]
                         - (l + m - 1) * P[(l - 2, m)]) / (l - m)
    out = []
    sqrt2 = math.sqrt(2.0)
    for l in range(degree):
        for m in range(-l, l + 1):
            am = abs(m)
            if m == 0:
                out.append(_K(l, 0) * P[(l, 0)])
            elif m > 0:
                out.append(sqrt2 * _K(l, am) * P[(l, am)] * C[am])
            else:
                out.append(sqrt2 * _K(l, am) * P[(l, am)] * S[am])
    return jnp.concatenate(out, axis=0)  # [deg^2, T]


def _hat_rows(x01, ax, res, tile):
    """Transposed hat basis for planar coords: x01 [3, T] -> uT [res, T]
    bf16 plus the scaled coordinate row xa [1, T] (for d(hat)/dx)."""
    xa = x01[ax:ax + 1, :] * (res - 1)
    ii = jax.lax.broadcasted_iota(jnp.int32, (res, tile),
                                  0).astype(jnp.float32)
    uT = jnp.maximum(0.0, 1.0 - jnp.abs(xa - ii)).astype(jnp.bfloat16)
    return uT, xa


# VM plane-line factor pairs (must match models/cp.py:VM_PAIRS)
_VM_PAIRS = ((0, 1, 2), (0, 2, 1), (1, 2, 0))


def _vm_forward_pair(x01, P2, vlT, pres, ch, tile, pair):
    """One VM plane-line pair on planar coords: returns (vm [ch, T] f32,
    (ua, ub, ue bf16 hat rows)). P2 is the plane packed [P, C*P] with
    column order c*P+j; vlT the line packed [C, P]."""
    a, b, e = pair
    ua, _ = _hat_rows(x01, a, pres, tile)
    ub, _ = _hat_rows(x01, b, pres, tile)
    ue, _ = _hat_rows(x01, e, pres, tile)
    q = jax.lax.dot_general(
        P2[:], ua, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                  # [C*P, T]
    f = jnp.concatenate(
        [jnp.sum(ub.astype(jnp.float32) * q[c * pres:(c + 1) * pres, :],
                 axis=0, keepdims=True) for c in range(ch)], axis=0)
    l = jnp.dot(vlT[:], ue, preferred_element_type=jnp.float32)  # [C, T]
    return f * l, (ua, ub, ue, q, f, l)


def _field_body(x, d, tabs, ptabs, wsig0, wsig1, wcol0, wcol1, wcol2, cfg,
                tile, lod_skip=()):
    """Canonical field body on [3, T] planar coords -> [8, T] rows
    (sigma, r, g, b, 0...). Shared by the static and dynamic kernels.
    ptabs = per VM plane scale, per pair: (P2 [P, C*P], vlT [C, P]).

    lod_skip: static tuple of line-scale indices whose features are
    treated as zero (hat build + matmul skipped entirely) -- the mip-LOD
    knob for motion-preview renders, where sub-pixel fine scales only
    cost time. Weight layouts are unchanged (the skipped rows of wsig0
    simply multiply nothing)."""
    x01 = jnp.clip((x + cfg.bound) / (2.0 * cfg.bound), 0.0, 1.0)

    # sigma-tower input contraction, piece by piece (avoids a concat):
    # h [H, T] = Wsig0^T @ feat, feat rows = [cp_s... | vm_s... | freq]
    hdim = wsig0.shape[0]
    h = jnp.zeros((hdim, tile), dtype=jnp.float32)
    row = 0
    for s, (res, rank) in enumerate(cfg.scales):
        if s in lod_skip:
            row += rank
            continue
        prod = None
        for a in range(3):
            uT, _ = _hat_rows(x01, a, res, tile)
            f = jnp.dot(tabs[3 * s + a][:], uT,
                        preferred_element_type=jnp.float32)   # [rank, T]
            prod = f if prod is None else prod * f
        h = h + jnp.dot(wsig0[:, row:row + rank], prod.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
        row += rank
    for s, (pres, ch) in enumerate(getattr(cfg, "planes", ()) or ()):
        for p, pair in enumerate(_VM_PAIRS):
            vm, _ = _vm_forward_pair(x01, ptabs[6 * s + 2 * p],
                                     ptabs[6 * s + 2 * p + 1],
                                     pres, ch, tile, pair)
            h = h + jnp.dot(wsig0[:, row:row + ch], vm.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
            row += ch
    # freq features: rows ordered [x0 x1 x2 | sin(2^0 x)*3 | cos(2^0 x)*3
    # | ...] matching ops/freq_encode.py:18-25. Outer-product accumulation
    # on the VPU ([H,1] * [1,T]).
    pieces = [x[a:a + 1, :] for a in range(3)]
    for fdeg in range(cfg.freq_degree):
        xf = x * (2.0 ** fdeg)
        pieces += [jnp.sin(xf[a:a + 1, :]) for a in range(3)]
        pieces += [jnp.cos(xf[a:a + 1, :]) for a in range(3)]
    for piece in pieces:
        h = h + wsig0[:, row:row + 1] * piece
        row += 1

    h = jax.nn.relu(h).astype(jnp.bfloat16)
    h = jnp.dot(wsig1[:], h, preferred_element_type=jnp.float32)  # [16, T]
    sigma = jnp.exp(h[0:1, :])                                    # trunc_exp
    geo = h[1:, :]                                                # [15, T]

    # color tower: sh(d) ++ geo -> 64 -> 64 -> 3, sigmoid
    de = _sh_planar(d[0:1, :], d[1:2, :], d[2:3, :], cfg.sh_degree)
    sh_dim = de.shape[0]
    hc = jnp.dot(wcol0[:, :sh_dim], de.astype(jnp.bfloat16),
                 preferred_element_type=jnp.float32)
    hc = hc + jnp.dot(wcol0[:, sh_dim:], geo.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
    hc = jax.nn.relu(hc).astype(jnp.bfloat16)
    hc = jnp.dot(wcol1[:], hc, preferred_element_type=jnp.float32)
    hc = jax.nn.relu(hc).astype(jnp.bfloat16)
    hc = jnp.dot(wcol2[:], hc, preferred_element_type=jnp.float32)  # [3, T]
    rgb = jax.nn.sigmoid(hc)

    pad = jnp.zeros((4, tile), dtype=jnp.float32)
    return jnp.concatenate([sigma, rgb, pad], axis=0)


def _field_kernel(x_ref, d_ref, *refs, cfg, n_scales, n_planes, tile,
                  lod_skip=()):
    """refs = linesT (3*n_scales of [rank, res]) + plane tabs (6*n_planes,
    alternating P2/vlT) + [wsig0T, wsig1T, wcol0T, wcol1T, wcol2T] +
    out_ref."""
    nt, np_ = 3 * n_scales, 6 * n_planes
    tabs = refs[:nt]
    ptabs = refs[nt:nt + np_]
    wsig0, wsig1, wcol0, wcol1, wcol2 = refs[nt + np_:nt + np_ + 5]
    out_ref = refs[-1]
    out_ref[:] = _field_body(x_ref[:], d_ref[:], tabs, ptabs, wsig0, wsig1,
                             wcol0, wcol1, wcol2, cfg, tile,
                             lod_skip=lod_skip)


def _dyn_field_kernel(x_ref, d_ref, tcond_ref, *refs, cfg, n_scales,
                      n_planes, tile, n_deform, lod_skip=()):
    """Dynamic variant: the D-NeRF deformation tower runs in-kernel
    before the canonical field. refs = deform weights (n_deform of
    W^T; layer 0 spatial columns only) + linesT tables + plane tabs +
    sigma/color weights + out_ref. tcond is the per-frame layer-0 time
    bias [H, 1] = W0^T[:, nx:] @ freq(t), precomputed f32 on the host.
    Precomputing the bias outside the kernel (a) drops the
    loop-invariant tiny matvec (XLA:CPU's interpret-mode hoisting
    fused it with bf16 converts into a DotThunk shape some hosts
    don't implement) and (b) sheds the 13 time columns from VMEM.
    The t!=0 gate is baked into wdef[-1] by the caller."""
    nt, np_ = 3 * n_scales, 6 * n_planes
    wdef = refs[:n_deform]
    tabs = refs[n_deform:n_deform + nt]
    ptabs = refs[n_deform + nt:n_deform + nt + np_]
    wsig0, wsig1, wcol0, wcol1, wcol2 = \
        refs[n_deform + nt + np_:n_deform + nt + np_ + 5]
    out_ref = refs[-1]

    x = x_ref[:]                                   # [3, T]
    tcond = tcond_ref[:]                           # [H+1, 1]
    # freq(x, multires_deform) as a [63, T] matrix -> one MXU contraction
    rows = [x]
    for fdeg in range(cfg.multires_deform):
        xf = x * (2.0 ** fdeg)
        rows.append(jnp.sin(xf))
        rows.append(jnp.cos(xf))
    ex = jnp.concatenate(rows, axis=0).astype(jnp.bfloat16)  # [63, T]
    # layer 0: spatial part via matmul; the time part is constant per
    # frame and arrives precomputed as a bias column
    h = jnp.dot(wdef[0][:], ex, preferred_element_type=jnp.float32)
    h = h + tcond                                  # [H, T] + [H, 1]
    for li in range(1, n_deform):
        h = jax.nn.relu(h).astype(jnp.bfloat16)
        h = jnp.dot(wdef[li][:], h, preferred_element_type=jnp.float32)
    # the t==0 -> canonical gate is baked into wdef[-1] by the caller
    deform = h
    out_ref[:] = _field_body(x + deform, d_ref[:], tabs, ptabs, wsig0,
                             wsig1, wcol0, wcol1, wcol2, cfg, tile,
                             lod_skip=lod_skip)


def _fence_consts(interpret, *operand_lists):
    """In interpret mode, fence the host-transposed kernel constants
    behind an optimization barrier. The interpret-mode kernel body
    inlines into an XLA while loop, and when several loop variants
    share a weight (the bucketed renderer builds one loop per bucket)
    XLA's TransposeFolding can fold our host-side `w.T` into the
    in-loop dots -- producing non-canonical bf16 x bf16 -> f32 dots
    that XLA:CPU routes to a generic DotThunk, which rejects that
    element-type combination at run time ("Unsupported element type
    for DotThunk::Execute: BF16 x BF16 = F32" on hosts without native
    bf16 dot support). The barrier keeps the transposes materialized
    so the in-loop dots stay canonical (which the thunk runtime
    executes fine). Real-TPU compiles (interpret=False) see Mosaic
    kernels as opaque and never fold, so they skip the fence."""
    if not interpret:
        return operand_lists
    return jax.lax.optimization_barrier(operand_lists)


def _pack_plane_tabs(params, cfg):
    """Flatten VM plane params for the kernel: per scale, per pair,
    P2 = plane [P, P, C] -> [P, C*P] (column order c*P+j) and
    vlT = vm_line^T [C, P]; all bf16."""
    out = []
    for s in range(len(getattr(cfg, "planes", ()) or ())):
        for p in range(3):
            pln = params["planes"][s][p]
            pres = pln.shape[0]
            out.append(pln.transpose(0, 2, 1).reshape(pres, -1)
                       .astype(jnp.bfloat16))
            out.append(params["vm_lines"][s][p].T.astype(jnp.bfloat16))
    return out


def _unpack_plane_grads(g_ptabs, cfg):
    """Inverse of _pack_plane_tabs for the gradient buffers: returns
    (g_planes, g_vm_lines) in the canonical [P, P, C] / [P, C] layouts."""
    g_planes, g_vm_lines = [], []
    for s, (pres, ch) in enumerate(cfg.planes):
        gp, gl = [], []
        for p in range(3):
            g2 = g_ptabs[6 * s + 2 * p]                    # [P, C*P]
            gp.append(g2.reshape(pres, ch, pres).transpose(0, 2, 1))
            gl.append(g_ptabs[6 * s + 2 * p + 1].T)        # [C, P] -> [P, C]
        g_planes.append(gp)
        g_vm_lines.append(gl)
    return g_planes, g_vm_lines


@functools.partial(jax.jit, static_argnames=("cfg", "tile", "interpret",
                                              "lod_skip"))
def cp_forward_fused_planar(params, cfg, x3, d3, tile: int = 1024,
                            interpret: bool = False, lod_skip=()):
    """Fused planar forward: x3, d3 [3, M] -> out [8, M] f32 with rows
    (sigma, r, g, b, 0, 0, 0, 0). M is padded internally to a tile
    multiple. Matches models/cp.py:cp_forward to bf16 matmul tolerance.
    lod_skip: static line-scale indices to zero out (mip-LOD for
    motion previews, see _field_body)."""
    m_in = x3.shape[1]
    n_scales = len(cfg.scales)
    pad = (-m_in) % tile
    if pad:
        x3 = jnp.concatenate([x3, jnp.zeros((3, pad), x3.dtype)], axis=1)
        dpad = jnp.concatenate([jnp.zeros((2, pad), d3.dtype),
                                jnp.ones((1, pad), d3.dtype)], axis=0)
        d3 = jnp.concatenate([d3, dpad], axis=1)
    m_tot = m_in + pad

    tabs = [params["lines"][s][a].T.astype(jnp.bfloat16)
            for s in range(n_scales) for a in range(3)]
    ptabs = _pack_plane_tabs(params, cfg)
    wsig = [w.T.astype(jnp.bfloat16) for w in params["sigma_mlp"]["w"]]
    wcol = [w.T.astype(jnp.bfloat16) for w in params["color_mlp"]["w"]]
    assert len(wsig) == 2 and len(wcol) == 3, \
        "fused kernel serves the default tower depths (2 sigma / 3 color)"
    tabs, ptabs, wsig, wcol = _fence_consts(interpret, tabs, ptabs, wsig,
                                            wcol)

    kernel = functools.partial(_field_kernel, cfg=cfg, n_scales=n_scales,
                               n_planes=len(cfg.planes), tile=tile,
                               lod_skip=lod_skip)
    const = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                        memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((3, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
    ]
    in_specs += [const(*t.shape) for t in tabs + ptabs]
    in_specs += [const(*w.shape) for w in wsig + wcol]

    out = pl.pallas_call(
        kernel,
        grid=(m_tot // tile,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((8, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, m_tot), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x3, d3, *tabs, *ptabs, *wsig, *wcol)
    return out[:, :m_in]


def cp_forward_fused(params, cfg, x, d, tile: int = 1024,
                     interpret: bool = False):
    """[S, 3]-interface wrapper: transposes at the boundary and returns
    (sigma [S], rgb [S, 3]). Prefer the planar API for large S."""
    out = cp_forward_fused_planar(params, cfg, x.T, d.T, tile=tile,
                                  interpret=interpret)
    return out[0], out[1:4].T


def make_fused_forward(cfg, interpret: bool = False, tile: int = 1024):
    """forward_fn with the render_dense contract: (params, x, d) ->
    (sigma, rgb)."""
    def forward(params, x, d):
        return cp_forward_fused(params, cfg, x, d, tile=tile,
                                interpret=interpret)
    return forward


def make_fused_forward_planar(cfg, interpret: bool = False,
                              tile: int = 1024, lod_skip=()):
    """Planar forward_fn: (params, x3 [3,M], d3 [3,M]) -> out [8, M]."""
    def forward(params, x3, d3):
        return cp_forward_fused_planar(params, cfg, x3, d3, tile=tile,
                                       interpret=interpret,
                                       lod_skip=lod_skip)
    return forward


# ------------------------------------------------------------ training kernel
def _canonical_bwd(x, d, g_out, tabs, ptabs, wsig0, wsig1, wcol0, wcol1,
                   wcol2, g_tabs, g_ptabs, g_wsig0, g_wsig1, g_wcol0,
                   g_wcol1, g_wcol2, cfg, tile, grad_x_cutoff=None):
    """Canonical-field backward body: recompute the forward at x [3, T]
    in VMEM, accumulate param grads into the g_* refs (+=). When
    grad_x_cutoff is not None, also returns g_x [3, T] -- d(loss)/dx
    routed through the CP scales with res <= cutoff plus the freq
    features (the BARF-style coarse-only warp-grad policy,
    models/cp.py:deform_grad_res_cutoff); the caller chains it into the
    deformation tower."""
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    want_gx = grad_x_cutoff is not None
    x01 = jnp.clip((x + cfg.bound) / (2.0 * cfg.bound), 0.0, 1.0)

    # ---- forward recompute (keep per-axis f and the hat inputs) ----------
    fs = []            # fs[s][a] = [rank, T] f32
    uxs = []           # uxs[s][a] = xa [1, T] (for rebuilding uT)
    h0 = jnp.zeros((wsig0.shape[0], tile), dtype=f32)
    row = 0
    rows0 = []
    for s, (res, rank) in enumerate(cfg.scales):
        fa, ua = [], []
        prod = None
        for a in range(3):
            xa = x01[a:a + 1, :] * (res - 1)
            ii = jax.lax.broadcasted_iota(jnp.int32, (res, tile),
                                          0).astype(f32)
            uT = jnp.maximum(0.0, 1.0 - jnp.abs(xa - ii)).astype(bf16)
            f = jnp.dot(tabs[3 * s + a][:], uT, preferred_element_type=f32)
            fa.append(f)
            ua.append(xa)
            prod = f if prod is None else prod * f
        fs.append(fa)
        uxs.append(ua)
        rows0.append(row)
        h0 = h0 + jnp.dot(wsig0[:, row:row + rank], prod.astype(bf16),
                          preferred_element_type=f32)
        row += rank
    vm_saved = []      # per plane scale-pair: (row0, vm, q, f, l)
    for s, (pres, ch) in enumerate(getattr(cfg, "planes", ()) or ()):
        for p, pair in enumerate(_VM_PAIRS):
            vm, (_, _, _, q, fv, lv) = _vm_forward_pair(
                x01, ptabs[6 * s + 2 * p], ptabs[6 * s + 2 * p + 1],
                pres, ch, tile, pair)
            vm_saved.append((row, vm, q, fv, lv))
            h0 = h0 + jnp.dot(wsig0[:, row:row + ch], vm.astype(bf16),
                              preferred_element_type=f32)
            row += ch
    pieces = [x[a:a + 1, :] for a in range(3)]
    for fdeg in range(cfg.freq_degree):
        xf = x * (2.0 ** fdeg)
        pieces += [jnp.sin(xf[a:a + 1, :]) for a in range(3)]
        pieces += [jnp.cos(xf[a:a + 1, :]) for a in range(3)]
    freq_row0 = row
    for piece in pieces:
        h0 = h0 + wsig0[:, row:row + 1] * piece
        row += 1

    r0 = jax.nn.relu(h0)
    h1 = jnp.dot(wsig1[:], r0.astype(bf16), preferred_element_type=f32)
    geo = h1[1:, :]
    de = _sh_planar(d[0:1, :], d[1:2, :], d[2:3, :], cfg.sh_degree)
    sh_dim = de.shape[0]
    hc0 = jnp.dot(wcol0[:, :sh_dim], de.astype(bf16),
                  preferred_element_type=f32) + \
        jnp.dot(wcol0[:, sh_dim:], geo.astype(bf16),
                preferred_element_type=f32)
    rc0 = jax.nn.relu(hc0)
    hc1 = jnp.dot(wcol1[:], rc0.astype(bf16), preferred_element_type=f32)
    rc1 = jax.nn.relu(hc1)
    hc2 = jnp.dot(wcol2[:], rc1.astype(bf16), preferred_element_type=f32)
    rgb = jax.nn.sigmoid(hc2)

    def tdot(a, b):
        """a [c, f], b [c, T] -> a^T @ b = [f, T] (contract dim 0)."""
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32)

    def outer(g, act):
        """g [o, T], act [i, T] -> g @ act^T [o, i]."""
        return jax.lax.dot_general(
            g.astype(bf16), act.astype(bf16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32)

    # ---- backward chain ---------------------------------------------------
    g_sigma = g_out[0:1, :]
    g_rgb = g_out[1:4, :]

    g_hc2 = g_rgb * rgb * (1.0 - rgb)
    g_wcol2[:] += outer(g_hc2, rc1)
    g_rc1 = tdot(wcol2[:].astype(bf16), g_hc2.astype(bf16))
    g_hc1 = g_rc1 * (hc1 > 0)
    g_wcol1[:] += outer(g_hc1, rc0)
    g_rc0 = tdot(wcol1[:].astype(bf16), g_hc1.astype(bf16))
    g_hc0 = g_rc0 * (hc0 > 0)
    g_wcol0[:, :sh_dim] += outer(g_hc0, de)
    g_wcol0[:, sh_dim:] += outer(g_hc0, geo)
    g_geo = tdot(wcol0[:, sh_dim:].astype(bf16), g_hc0.astype(bf16))

    # trunc_exp backward: clamp the pre-activation (ops/activation.py)
    g_h1_0 = g_sigma * jnp.exp(jnp.clip(h1[0:1, :], -15.0, 15.0))
    g_h1 = jnp.concatenate([g_h1_0, g_geo], axis=0)
    g_wsig1[:] += outer(g_h1, r0)
    g_r0 = tdot(wsig1[:].astype(bf16), g_h1.astype(bf16))
    g_h0 = g_r0 * (h0 > 0)

    gx = [jnp.zeros((1, tile), f32) for _ in range(3)] if want_gx else None
    if want_gx:
        # clip(x01) derivative support: out-of-bound coords do not move
        inb = (jnp.abs(x) < cfg.bound).astype(f32)          # [3, T]

    for s, (res, rank) in enumerate(cfg.scales):
        g_prod = tdot(wsig0[:, rows0[s]:rows0[s] + rank].astype(bf16),
                      g_h0.astype(bf16))
        prod_s = fs[s][0] * fs[s][1] * fs[s][2]
        g_wsig0[:, rows0[s]:rows0[s] + rank] += outer(g_h0, prod_s)
        gx_scale = want_gx and res <= grad_x_cutoff
        for a in range(3):
            others = fs[s][(a + 1) % 3] * fs[s][(a + 2) % 3]
            g_f = g_prod * others
            ii = jax.lax.broadcasted_iota(jnp.int32, (res, tile),
                                          0).astype(f32)
            diff = uxs[s][a] - ii                           # [res, T]
            uT = jnp.maximum(0.0, 1.0 - jnp.abs(diff))
            g_tabs[3 * s + a][:] += jax.lax.dot_general(
                g_f.astype(bf16), uT.astype(bf16),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=f32)
            if gx_scale:
                # d(hat)/dx: -sign(diff) on the 2-cell support, times the
                # coordinate scale (res-1)/(2*bound)
                duT = jnp.where(jnp.abs(diff) < 1.0, -jnp.sign(diff), 0.0)
                dfa = jnp.dot(tabs[3 * s + a][:], duT.astype(bf16),
                              preferred_element_type=f32)   # [rank, T]
                gx[a] = gx[a] + jnp.sum(g_f * dfa, axis=0, keepdims=True) \
                    * ((res - 1.0) / (2.0 * cfg.bound)) * inb[a:a + 1, :]
    kvm = 0
    for s, (pres, ch) in enumerate(getattr(cfg, "planes", ()) or ()):
        gx_scale = want_gx and pres <= grad_x_cutoff
        for p, (pa, pb, pe) in enumerate(_VM_PAIRS):
            prow, vm, q, fv, lv = vm_saved[kvm]
            kvm += 1
            P2 = ptabs[6 * s + 2 * p]
            vlT = ptabs[6 * s + 2 * p + 1]
            g_vm = tdot(wsig0[:, prow:prow + ch].astype(bf16),
                        g_h0.astype(bf16))                   # [ch, T]
            g_wsig0[:, prow:prow + ch] += outer(g_h0, vm)
            g_f = g_vm * lv
            g_l = g_vm * fv
            ua, xra = _hat_rows(x01, pa, pres, tile)
            ub, xrb = _hat_rows(x01, pb, pres, tile)
            ue, xre = _hat_rows(x01, pe, pres, tile)
            g_ptabs[6 * s + 2 * p + 1][:] += outer(g_l, ue)  # [ch, P]
            ubf = ub.astype(f32)
            g_q = jnp.concatenate(
                [g_f[c:c + 1, :] * ubf for c in range(ch)], axis=0)
            g_ptabs[6 * s + 2 * p][:] += outer(ua.astype(f32), g_q)
            if gx_scale:
                g_ua = jnp.dot(P2[:], g_q.astype(bf16),
                               preferred_element_type=f32)   # [P, T]
                g_ub = sum(g_f[c:c + 1, :] * q[c * pres:(c + 1) * pres, :]
                           for c in range(ch))               # [P, T]
                g_ue = tdot(vlT[:].astype(bf16), g_l.astype(bf16))
                ii = jax.lax.broadcasted_iota(jnp.int32, (pres, tile),
                                              0).astype(f32)
                for axis, gvec, xr in ((pa, g_ua, xra), (pb, g_ub, xrb),
                                       (pe, g_ue, xre)):
                    diff = xr - ii
                    duT = jnp.where(jnp.abs(diff) < 1.0, -jnp.sign(diff),
                                    0.0)
                    gx[axis] = gx[axis] + \
                        jnp.sum(gvec * duT, axis=0, keepdims=True) \
                        * ((pres - 1.0) / (2.0 * cfg.bound)) \
                        * inb[axis:axis + 1, :]
    for i, piece in enumerate(pieces):
        g_wsig0[:, freq_row0 + i:freq_row0 + i + 1] += \
            jnp.sum(g_h0 * piece, axis=1, keepdims=True)
    if want_gx:
        # freq-feature path: one MXU contraction gives every piece's grad
        n_pieces = len(pieces)
        gp = tdot(wsig0[:, freq_row0:freq_row0 + n_pieces].astype(bf16),
                  g_h0.astype(bf16))                        # [n_pieces, T]
        for a in range(3):
            gx[a] = gx[a] + gp[a:a + 1, :]                  # d(x_a)/dx_a = 1
        for fdeg in range(cfg.freq_degree):
            r_sin, r_cos = 3 + 6 * fdeg, 3 + 6 * fdeg + 3
            for a in range(3):
                # d sin(2^f x)/dx = 2^f cos; d cos(2^f x)/dx = -2^f sin
                gx[a] = gx[a] + (2.0 ** fdeg) * (
                    gp[r_sin + a:r_sin + a + 1, :] * pieces[r_cos + a]
                    - gp[r_cos + a:r_cos + a + 1, :] * pieces[r_sin + a])
        return jnp.concatenate(gx, axis=0)                  # [3, T]
    return None


def _field_bwd_kernel(x_ref, g_ref, d_ref, *refs, cfg, n_scales, n_planes,
                      tile):
    """Static-field backward: refs = linesT tables + plane tabs +
    [wsig0T, wsig1T, wcol0T, wcol1T, wcol2T] + output grad refs (same
    order/shape as the params, transposed) -- accumulated across the
    grid sweep (constant out index_map; zeroed at program 0)."""
    n_tabs, n_pt = 3 * n_scales, 6 * n_planes
    tabs = refs[:n_tabs]
    ptabs = refs[n_tabs:n_tabs + n_pt]
    wsig0, wsig1, wcol0, wcol1, wcol2 = refs[n_tabs + n_pt:n_tabs + n_pt + 5]
    gouts = refs[n_tabs + n_pt + 5:]
    g_tabs = gouts[:n_tabs]
    g_ptabs = gouts[n_tabs:n_tabs + n_pt]
    g_wsig0, g_wsig1, g_wcol0, g_wcol1, g_wcol2 = gouts[n_tabs + n_pt:]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in gouts:
            r[:] = jnp.zeros_like(r)

    _canonical_bwd(x_ref[:], d_ref[:], g_ref[:], tabs, ptabs, wsig0, wsig1,
                   wcol0, wcol1, wcol2, g_tabs, g_ptabs, g_wsig0, g_wsig1,
                   g_wcol0, g_wcol1, g_wcol2, cfg, tile)


def _bwd_pallas_call(params, cfg, x3, d3, g_out, tile, interpret):
    m_in = x3.shape[1]
    n_scales = len(cfg.scales)
    pad = (-m_in) % tile
    if pad:
        x3 = jnp.concatenate([x3, jnp.zeros((3, pad), x3.dtype)], axis=1)
        dpad = jnp.concatenate([jnp.zeros((2, pad), d3.dtype),
                                jnp.ones((1, pad), d3.dtype)], axis=0)
        d3 = jnp.concatenate([d3, dpad], axis=1)
        g_out = jnp.concatenate(
            [g_out, jnp.zeros((8, pad), g_out.dtype)], axis=1)
    m_tot = m_in + pad

    tabs = [params["lines"][s][a].T.astype(jnp.bfloat16)
            for s in range(n_scales) for a in range(3)]
    ptabs = _pack_plane_tabs(params, cfg)
    wsig = [w.T.astype(jnp.bfloat16) for w in params["sigma_mlp"]["w"]]
    wcol = [w.T.astype(jnp.bfloat16) for w in params["color_mlp"]["w"]]
    tabs, ptabs, wsig, wcol = _fence_consts(interpret, tabs, ptabs, wsig,
                                            wcol)

    kernel = functools.partial(_field_bwd_kernel, cfg=cfg,
                               n_scales=n_scales, n_planes=len(cfg.planes),
                               tile=tile)
    const = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                        memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((3, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((8, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
    ]
    in_specs += [const(*t.shape) for t in tabs + ptabs]
    in_specs += [const(*w.shape) for w in wsig + wcol]

    out_shapes = [jax.ShapeDtypeStruct(t.shape, jnp.float32)
                  for t in tabs + ptabs]
    out_shapes += [jax.ShapeDtypeStruct(w.shape, jnp.float32)
                   for w in wsig + wcol]
    out_specs = [const(*o.shape) for o in out_shapes]

    outs = pl.pallas_call(
        kernel,
        grid=(m_tot // tile,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(x3, g_out, d3, *tabs, *ptabs, *wsig, *wcol)

    n_pt = 6 * len(cfg.planes)
    g_tabs = outs[:3 * n_scales]
    g_ptabs = outs[3 * n_scales:3 * n_scales + n_pt]
    g_ws = outs[3 * n_scales + n_pt:]
    g_params = {
        "lines": [[g_tabs[3 * s + a].T for a in range(3)]
                  for s in range(n_scales)],
        "sigma_mlp": {"w": [g_ws[0].T, g_ws[1].T]},
        "color_mlp": {"w": [g_ws[2].T, g_ws[3].T, g_ws[4].T]},
    }
    if n_pt:
        g_params["planes"], g_params["vm_lines"] = \
            _unpack_plane_grads(g_ptabs, cfg)
    return g_params


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def cp_train_fused(cfg, tile, interpret, params, x3, d3):
    """Differentiable fused planar field op: forward + Pallas backward
    (grads for all params; x3/d3 are treated as constants -- STATIC
    scenes only; the D-NeRF deform path needs dx and uses the XLA
    field)."""
    return cp_forward_fused_planar(params, cfg, x3, d3, tile=tile,
                                   interpret=interpret)


def _cp_train_fwd(cfg, tile, interpret, params, x3, d3):
    out = cp_forward_fused_planar(params, cfg, x3, d3, tile=tile,
                                  interpret=interpret)
    return out, (params, x3, d3)


def _cp_train_bwd(cfg, tile, interpret, res, g):
    params, x3, d3 = res
    gp = _bwd_pallas_call(params, cfg, x3, d3, g, tile, interpret)
    return (gp, jnp.zeros_like(x3), jnp.zeros_like(d3))


cp_train_fused.defvjp(_cp_train_fwd, _cp_train_bwd)


def make_fused_train_forward(cfg, interpret: bool = False,
                             tile: int = 1024):
    """forward_fn for render_dense with a fused Pallas fwd+bwd
    (static CP fields): (params, x [S,3], d [S,3]) -> (sigma, rgb)."""
    def forward(params, x, d):
        out = cp_train_fused(cfg, tile, interpret, params, x.T, d.T)
        return out[0], out[1:4].T
    return forward


def _time_vec(t, cfg):
    """Pack the per-frame time conditioning as [16, 1]: rows =
    [freq(t) (1 + 2*multires_time = 13) | t!=0 flag | pad]."""
    t = jnp.reshape(jnp.asarray(t, jnp.float32), ())
    trows = [t[None]]
    for fdeg in range(cfg.multires_time):
        trows.append(jnp.sin(t * (2.0 ** fdeg))[None])
        trows.append(jnp.cos(t * (2.0 ** fdeg))[None])
    return jnp.concatenate(
        trows + [(t != 0.0).astype(jnp.float32)[None],
                 jnp.zeros(2, jnp.float32)], axis=0).reshape(16, 1)


def _time_cond(params, cfg, tvec):
    """Per-frame layer-0 time bias [H, 1] f32: W0^T[:, nx:] @ freq(t),
    computed f32 on the host (one [H, 13] x [13, 1] matvec per frame)
    so the kernels never contain a loop-invariant time matvec (see
    _dyn_field_kernel). The t!=0 canonical gate is baked into the last
    deform layer's weights host-side (see the pallas callers): Mosaic
    TC supports neither the dynamic_slice a scalar read lowers to nor
    a two-axis [1,1]->[H,T] broadcast, so no in-kernel flag exists."""
    w0 = params["deform_mlp"]["w"][0]              # [nx + tdim, H] f32
    from .freq_encode import freq_output_dim
    nx = freq_output_dim(3, cfg.multires_deform)
    tdim = w0.shape[0] - nx
    return jnp.dot(w0[nx:, :].T.astype(jnp.float32),
                   tvec[:tdim, :])                 # [H, 1] f32


@functools.partial(jax.jit, static_argnames=("cfg", "tile", "interpret",
                                              "lod_skip"))
def cp_dnerf_forward_fused_planar(params, cfg, x3, d3, t, tile: int = 1024,
                                  interpret: bool = False, lod_skip=()):
    """Fused planar dynamic forward (deform tower + canonical field):
    x3, d3 [3, M], scalar time t -> out [8, M]. Render path only (no
    grads). Matches models/cp.py:cp_dnerf_forward to bf16 tolerance."""
    m_in = x3.shape[1]
    n_scales = len(cfg.scales)
    pad = (-m_in) % tile
    if pad:
        x3 = jnp.concatenate([x3, jnp.zeros((3, pad), x3.dtype)], axis=1)
        dpad = jnp.concatenate([jnp.zeros((2, pad), d3.dtype),
                                jnp.ones((1, pad), d3.dtype)], axis=0)
        d3 = jnp.concatenate([d3, dpad], axis=1)
    m_tot = m_in + pad

    tvec = _time_vec(t, cfg)
    tcond = _time_cond(params, cfg, tvec)
    from .freq_encode import freq_output_dim
    nx = freq_output_dim(3, cfg.multires_deform)
    wdef = [w.T.astype(jnp.bfloat16) for w in params["deform_mlp"]["w"]]
    wdef[0] = wdef[0][:, :nx]     # time columns ride tcond's bias row
    # bake the t==0 -> canonical gate into the last layer (in-kernel
    # scalar reads / two-axis broadcasts are unimplemented on Mosaic TC)
    flag = tvec[13, 0]
    wdef[-1] = (params["deform_mlp"]["w"][-1].T * flag).astype(jnp.bfloat16)
    tabs = [params["lines"][s][a].T.astype(jnp.bfloat16)
            for s in range(n_scales) for a in range(3)]
    ptabs = _pack_plane_tabs(params, cfg)
    wsig = [w.T.astype(jnp.bfloat16) for w in params["sigma_mlp"]["w"]]
    wcol = [w.T.astype(jnp.bfloat16) for w in params["color_mlp"]["w"]]
    wdef, tabs, ptabs, wsig, wcol = _fence_consts(interpret, wdef, tabs,
                                                  ptabs, wsig, wcol)

    kernel = functools.partial(_dyn_field_kernel, cfg=cfg,
                               n_scales=n_scales, n_planes=len(cfg.planes),
                               tile=tile, n_deform=len(wdef),
                               lod_skip=lod_skip)
    const = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                        memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((3, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        const(*tcond.shape),
    ]
    in_specs += [const(*w.shape) for w in wdef]
    in_specs += [const(*tb.shape) for tb in tabs + ptabs]
    in_specs += [const(*w.shape) for w in wsig + wcol]

    out = pl.pallas_call(
        kernel,
        grid=(m_tot // tile,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((8, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, m_tot), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x3, d3, tcond, *wdef, *tabs, *ptabs, *wsig, *wcol)
    return out[:, :m_in]


def make_fused_dyn_forward_planar(cfg, interpret: bool = False,
                                  tile: int = 1024, lod_skip=()):
    """Planar dynamic forward_fn: (params, x3, d3, t) -> out [8, M]."""
    def forward(params, x3, d3, t):
        return cp_dnerf_forward_fused_planar(params, cfg, x3, d3, t,
                                             tile=tile, interpret=interpret,
                                             lod_skip=lod_skip)
    return forward


# ------------------------------------------------- dynamic training kernel
def _dyn_field_bwd_kernel(x_ref, g_ref, d_ref, tvec_ref, tcond_ref, *refs,
                          cfg,
                          n_scales, n_planes, tile, n_deform):
    """Dynamic backward: recompute deform tower + canonical field in
    VMEM, chain grads into every parameter INCLUDING the deformation
    tower -- d(field)/d(warp) flows through the coarse CP scales/VM
    planes and the freq features only (models/cp.py:_warped_density
    semantics). This is the TPU replacement for the reference's D-NeRF
    forward running inside the fused CUDA train loop
    (dnerf/network.py:123-143 + raymarching/src/raymarching.cu:312-490)."""
    n_tabs, n_pt = 3 * n_scales, 6 * n_planes
    wdef = refs[:n_deform]
    tabs = refs[n_deform:n_deform + n_tabs]
    ptabs = refs[n_deform + n_tabs:n_deform + n_tabs + n_pt]
    wsig0, wsig1, wcol0, wcol1, wcol2 = \
        refs[n_deform + n_tabs + n_pt:n_deform + n_tabs + n_pt + 5]
    gouts = refs[n_deform + n_tabs + n_pt + 5:]
    g_wdef = gouts[:n_deform]
    g_tabs = gouts[n_deform:n_deform + n_tabs]
    g_ptabs = gouts[n_deform + n_tabs:n_deform + n_tabs + n_pt]
    g_wsig0, g_wsig1, g_wcol0, g_wcol1, g_wcol2 = \
        gouts[n_deform + n_tabs + n_pt:]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for r in gouts:
            r[:] = jnp.zeros_like(r)

    f32, bf16 = jnp.float32, jnp.bfloat16
    x = x_ref[:]
    tvec = tvec_ref[:]
    tcond = tcond_ref[:]          # [H, 1] layer-0 time bias

    # ---- deform tower forward (keep pre-activations for the backward) ----
    rows = [x]
    for fdeg in range(cfg.multires_deform):
        xf = x * (2.0 ** fdeg)
        rows.append(jnp.sin(xf))
        rows.append(jnp.cos(xf))
    ex = jnp.concatenate(rows, axis=0)                      # [nx, T] f32
    nx = ex.shape[0]
    tdim = wdef[0].shape[1] - nx
    # layer 0: spatial matmul + the precomputed time bias column (the
    # in-kernel time matvec is loop-invariant and trips interpret-mode
    # hoisting into an unsupported DotThunk shape; see _dyn_field_kernel)
    h = jnp.dot(wdef[0][:, :nx], ex.astype(bf16),
                preferred_element_type=f32)
    h = h + tcond                                           # [H,T] + [H,1]
    hs, rs = [h], []
    for li in range(1, n_deform):
        r = jax.nn.relu(h)
        rs.append(r)
        h = jnp.dot(wdef[li][:], r.astype(bf16), preferred_element_type=f32)
        hs.append(h)
    # the t==0 gate rides wdef[-1] (scaled by the caller), so h IS the
    # gated deform; the caller re-applies the flag to g_wdef[-1]
    deform = h
    xw = x + deform

    # ---- canonical field fwd+bwd at the warped point (+ warp grad) ----
    g_x = _canonical_bwd(xw, d_ref[:], g_ref[:], tabs, ptabs, wsig0, wsig1,
                         wcol0, wcol1, wcol2, g_tabs, g_ptabs, g_wsig0,
                         g_wsig1, g_wcol0, g_wcol1, g_wcol2, cfg, tile,
                         grad_x_cutoff=cfg.deform_grad_res_cutoff)

    # ---- deform tower backward ----
    def outer(g, act):
        return jax.lax.dot_general(
            g.astype(bf16), act.astype(bf16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=f32)

    def tdot(a, b):
        return jax.lax.dot_general(
            a.astype(bf16), b.astype(bf16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=f32)

    g_h = g_x                                               # [3, T]
    for li in range(n_deform - 1, 0, -1):
        g_wdef[li][:] += outer(g_h, rs[li - 1])
        g_h = tdot(wdef[li][:], g_h) * (hs[li - 1] > 0)
    g_wdef[0][:, :nx] += outer(g_h, ex)
    # time columns: the input column tvec is constant per frame, so the
    # grad is rowsum(g_h) (x) tvec
    g_wdef[0][:, nx:] += outer(jnp.sum(g_h, axis=1, keepdims=True),
                               tvec[:tdim, :])


def _dyn_bwd_pallas_call(params, cfg, x3, d3, tvec, g_out, tile, interpret):
    m_in = x3.shape[1]
    n_scales = len(cfg.scales)
    pad = (-m_in) % tile
    if pad:
        x3 = jnp.concatenate([x3, jnp.zeros((3, pad), x3.dtype)], axis=1)
        dpad = jnp.concatenate([jnp.zeros((2, pad), d3.dtype),
                                jnp.ones((1, pad), d3.dtype)], axis=0)
        d3 = jnp.concatenate([d3, dpad], axis=1)
        g_out = jnp.concatenate(
            [g_out, jnp.zeros((8, pad), g_out.dtype)], axis=1)
    m_tot = m_in + pad

    tcond = _time_cond(params, cfg, tvec)
    wdef = [w.T.astype(jnp.bfloat16) for w in params["deform_mlp"]["w"]]
    # bake the t==0 -> canonical gate into the last layer; the kernel's
    # g_wdef[-1] is then the grad w.r.t. the SCALED weight, so the true
    # grad re-applies the flag below (earlier layers and the time
    # columns pick it up naturally through the scaled weight)
    flag = tvec[13, 0]
    wdef[-1] = (params["deform_mlp"]["w"][-1].T * flag).astype(jnp.bfloat16)
    tabs = [params["lines"][s][a].T.astype(jnp.bfloat16)
            for s in range(n_scales) for a in range(3)]
    ptabs = _pack_plane_tabs(params, cfg)
    wsig = [w.T.astype(jnp.bfloat16) for w in params["sigma_mlp"]["w"]]
    wcol = [w.T.astype(jnp.bfloat16) for w in params["color_mlp"]["w"]]
    wdef, tabs, ptabs, wsig, wcol = _fence_consts(interpret, wdef, tabs,
                                                  ptabs, wsig, wcol)

    kernel = functools.partial(_dyn_field_bwd_kernel, cfg=cfg,
                               n_scales=n_scales, n_planes=len(cfg.planes),
                               tile=tile, n_deform=len(wdef))
    const = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                        memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((3, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((8, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        const(16, 1),
        const(*tcond.shape),
    ]
    in_specs += [const(*w.shape) for w in wdef]
    in_specs += [const(*t.shape) for t in tabs + ptabs]
    in_specs += [const(*w.shape) for w in wsig + wcol]

    out_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in wdef]
    out_shapes += [jax.ShapeDtypeStruct(t.shape, jnp.float32)
                   for t in tabs + ptabs]
    out_shapes += [jax.ShapeDtypeStruct(w.shape, jnp.float32)
                   for w in wsig + wcol]
    out_specs = [const(*o.shape) for o in out_shapes]

    outs = pl.pallas_call(
        kernel,
        grid=(m_tot // tile,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
    )(x3, g_out, d3, tvec, tcond, *wdef, *tabs, *ptabs, *wsig, *wcol)

    nd, n_pt = len(wdef), 6 * len(cfg.planes)
    g_wdef = list(outs[:nd])
    g_wdef[-1] = g_wdef[-1] * flag        # grad w.r.t. the UNscaled weight
    g_tabs = outs[nd:nd + 3 * n_scales]
    g_ptabs = outs[nd + 3 * n_scales:nd + 3 * n_scales + n_pt]
    g_ws = outs[nd + 3 * n_scales + n_pt:]
    g_params = {
        "deform_mlp": {"w": [g.T for g in g_wdef]},
        "lines": [[g_tabs[3 * s + a].T for a in range(3)]
                  for s in range(n_scales)],
        "sigma_mlp": {"w": [g_ws[0].T, g_ws[1].T]},
        "color_mlp": {"w": [g_ws[2].T, g_ws[3].T, g_ws[4].T]},
    }
    if n_pt:
        g_params["planes"], g_params["vm_lines"] = \
            _unpack_plane_grads(g_ptabs, cfg)
    return g_params


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def cp_dnerf_train_fused(cfg, tile, interpret, params, x3, d3, t):
    """Differentiable fused planar dynamic field op: Pallas forward +
    Pallas backward through ALL towers (deform included; x3/d3/t are
    constants -- sampled ray positions do not depend on params)."""
    return cp_dnerf_forward_fused_planar(params, cfg, x3, d3, t, tile=tile,
                                         interpret=interpret)


def _cp_dnerf_train_fwd(cfg, tile, interpret, params, x3, d3, t):
    out = cp_dnerf_forward_fused_planar(params, cfg, x3, d3, t, tile=tile,
                                        interpret=interpret)
    return out, (params, x3, d3, t)


def _cp_dnerf_train_bwd(cfg, tile, interpret, res, g):
    params, x3, d3, t = res
    tvec = _time_vec(t, cfg)
    gp = _dyn_bwd_pallas_call(params, cfg, x3, d3, tvec, g, tile, interpret)
    return (gp, jnp.zeros_like(x3), jnp.zeros_like(d3),
            jnp.zeros_like(jnp.asarray(t, jnp.float32)))


cp_dnerf_train_fused.defvjp(_cp_dnerf_train_fwd, _cp_dnerf_train_bwd)


def make_fused_dyn_train_forward(cfg, interpret: bool = False,
                                 tile: int = 1024):
    """forward_fn for render_dense with a fused Pallas fwd+bwd for the
    CP-D-NeRF field: (params, x [S,3], d [S,3], t) -> (sigma, rgb)."""
    def forward(params, x, d, t):
        out = cp_dnerf_train_fused(cfg, tile, interpret, params, x.T, d.T, t)
        return out[0], out[1:4].T
    return forward
