"""TPU-native factorized radiance field (multiscale CP decomposition).

This is the flagship *fast-path* field. The reference offers two backbone
families: Instant-NGP hash grids (nerf/network.py) and TensoRF factor
grids (main_tensoRF.py, BackBoneTypes.TensoRF in SealNeRF/network.py).
On TPU the hash grid's 25M random gathers/step run at 0.14 G/s (XLA
gather, PERF_NOTES.md) while matmuls run at 227 TFLOP/s, so the
TPU-native flagship is the factorized family, evaluated entirely on the
MXU via hat-basis matmuls (ops/hat.py):

  per scale s:  f_axis = hat(x_axis) @ line_axis[s]      [S, R_s]
                feat_s = f_x * f_y * f_z                 (CP product)
  per VM scale: plane(x_a, x_b) * line(x_e) per axis pair (TensoRF-VM;
                plane interp = two chained hat matmuls)  [S, 3*C]
  feat = concat_s(feat_s) ++ concat_vm ++ freq(xyz)      [S, F]
  sigma tower: feat -> 64 -> 1 + geo_feat(15), trunc_exp (as NGP)
  color tower: SH(d) ++ geo_feat -> 64 -> 64 -> 3, sigmoid (as NGP)

The multiscale line pyramid (default res 32/128/512/1408) mirrors the
NGP level pyramid (16 levels, res 16..2048, nerf/network.py:29-43) in
spirit: coarse scales learn layout, fine scales learn detail. Capacity
is rank x resolution per axis (TensoRF-CP semantics; the CP rank plays
the hash-table-size role). All gradients (lines, MLPs, and d_x for the
D-NeRF deformation tower) flow through matmuls -- no scatter anywhere.

Parity notes:
- trunc_exp / SH degree 4 / tower shapes match nerf/network.py:10-125.
- get_params lr split ("encoder" = lines at lr, MLPs at lr_net) matches
  dnerf/network.py:260-275 semantics via the trainer's label_tree.
"""

import math
from dataclasses import dataclass, field
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops import sh_encode, sh_output_dim, trunc_exp
from ..ops.freq_encode import freq_encode, freq_output_dim
from ..ops.hat import hat_basis
from .mlp import init_mlp, apply_mlp


@dataclass(frozen=True)
class CPConfig:
    bound: float = 1.0
    # (resolution, rank) per scale; resolutions follow 2*bound scaling in
    # world units like NGP's desired_resolution = 2048 * bound. The hat
    # build costs ~4 VPU ops x sum(res) per sample, so the pyramid is
    # capped at 1024: measured equal PSNR to a 1408 cap on the hard
    # anchor scene with ~2x faster rendering (probe_scales.py).
    scales: Tuple[Tuple[int, int], ...] = (
        (32, 32), (128, 48), (512, 64), (1024, 64))
    # (plane_res, channels) per VM scale: TensoRF-VM plane-line factor
    # pairs (XY*Z | XZ*Y | YZ*X), 3*channels features each. Pure CP is
    # rank-starved on non-axis-aligned content (the rank sweep saturates
    # at ~24-25 PSNR on the hard checkerboard scene where the NGP oracle
    # hits 27.7, profiling/probe_cp_capacity.py); one (128, 8) VM scale
    # lifts the same recipe to 29.6 PSNR @ 2048 steps at ~28% train-rate
    # cost (293k vs 409k rays/s) -- the default flagship config. Plane
    # interp costs 2*res^2*C matmul FLOPs/sample/pair.
    planes: Tuple[Tuple[int, int], ...] = ((128, 8),)
    freq_degree: int = 4           # raw-xyz frequency features (MXU-free)
    num_layers: int = 2
    hidden_dim: int = 64
    geo_feat_dim: int = 15
    num_layers_color: int = 3
    hidden_dim_color: int = 64
    sh_degree: int = 4
    bg_radius: float = -1.0
    init_scale: float = 0.2        # TensoRF CP factor init: 0.2 * randn

    @property
    def feat_dim(self) -> int:
        return sum(r for _, r in self.scales) + \
            sum(3 * c for _, c in self.planes) + \
            freq_output_dim(3, self.freq_degree)

    @property
    def dir_dim(self) -> int:
        return sh_output_dim(self.sh_degree)


def default_planes(bound: float) -> Tuple[Tuple[int, int], ...]:
    """Recipe-resolved VM-plane default (VERDICT r4 next #8).

    bound <= 1 (object-centric synthetic captures): one (128, 8) VM
    scale -- measured +~2.8 dB over pure CP on the hard checkerboard
    anchor (29.6 vs ~24.5 @ 2048, profiling/probe_cp_capacity.py) for a
    ~28% rate cost. bound > 1 (colmap-style real captures, cascade
    march): planes OFF -- on the bound-2 anchor they cost ~32% of the
    train rate (167.6k vs 246.7k rays/s) and buy only ~0.2 dB
    (BENCH_r04 aux / PERF_NOTES round-3 table), which keeps the
    shipping bound>1 recipe above 0.9x the reference-class baseline.
    Override per-run with --planes on any CLI."""
    return ((128, 8),) if bound <= 1.0 else ()


def parse_planes(spec: str, bound: float):
    """--planes flag: 'auto' | 'off' | 'res,ch[;res,ch...]'."""
    s = (spec or "auto").strip().lower()
    if s == "auto":
        return default_planes(bound)
    if s in ("off", "none", ""):
        return ()
    return tuple(tuple(int(v) for v in part.split(","))
                 for part in s.split(";"))


# VM plane-line factor pairs: (plane axis a, plane axis b, line axis e)
VM_PAIRS = ((0, 1, 2), (0, 2, 1), (1, 2, 0))


def init_cp(rng, cfg: CPConfig):
    n_scales = len(cfg.scales)
    n_planes = len(cfg.planes)
    keys = jax.random.split(rng, 3 * n_scales + 6 * n_planes + 2)
    lines = []
    for s, (res, rank) in enumerate(cfg.scales):
        axes = []
        for a in range(3):
            k = keys[3 * s + a]
            axes.append(cfg.init_scale *
                        jax.random.normal(k, (res, rank), dtype=jnp.float32))
        lines.append(axes)
    sigma_dims = [cfg.feat_dim] + [cfg.hidden_dim] * (cfg.num_layers - 1) \
        + [1 + cfg.geo_feat_dim]
    color_dims = [cfg.dir_dim + cfg.geo_feat_dim] \
        + [cfg.hidden_dim_color] * (cfg.num_layers_color - 1) + [3]
    params = {
        # pytree: lines[scale][axis] -> [res, rank]
        "lines": lines,
        "sigma_mlp": init_mlp(keys[-2], sigma_dims),
        "color_mlp": init_mlp(keys[-1], color_dims),
    }
    if n_planes:
        base = 3 * n_scales
        planes, vm_lines = [], []
        for s, (pres, ch) in enumerate(cfg.planes):
            ps, ls = [], []
            for p in range(3):
                kp = keys[base + 6 * s + 2 * p]
                kl = keys[base + 6 * s + 2 * p + 1]
                ps.append(cfg.init_scale * jax.random.normal(
                    kp, (pres, pres, ch), dtype=jnp.float32))
                ls.append(cfg.init_scale * jax.random.normal(
                    kl, (pres, ch), dtype=jnp.float32))
            planes.append(ps)
            vm_lines.append(ls)
        # planes[scale][pair] -> [P, P, C]; vm_lines[scale][pair] -> [P, C]
        params["planes"] = planes
        params["vm_lines"] = vm_lines
    return params


def _vm_features(params, cfg: CPConfig, x01g, x01s=None, cutoff=None):
    """VM plane-line features, [S, 3*C] per plane scale. When x01s is
    given, scales with res > cutoff evaluate at the stop-gradient coords
    (the coarse-only warp-grad policy, see deform_grad_res_cutoff)."""
    feats = []
    for s, (pres, ch) in enumerate(cfg.planes):
        x01 = x01g if (x01s is None or pres <= cutoff) else x01s
        for p, (a, b, e) in enumerate(VM_PAIRS):
            ua = hat_basis(x01[..., a], pres)                  # [S, P] bf16
            ub = hat_basis(x01[..., b], pres)
            ue = hat_basis(x01[..., e], pres)
            plane = params["planes"][s][p].astype(jnp.bfloat16)
            q = jnp.einsum("sp,pjc->sjc", ua, plane,
                           preferred_element_type=jnp.float32)
            f = jnp.einsum("sj,sjc->sc", ub.astype(jnp.float32), q)
            l = jnp.dot(ue, params["vm_lines"][s][p].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)    # [S, C]
            feats.append(f * l)
    return feats


def cp_features(params, cfg: CPConfig, x):
    """x: [S, 3] in [-bound, bound] -> features [S, feat_dim] f32."""
    x01 = (x + cfg.bound) / (2.0 * cfg.bound)
    feats = []
    for s, (res, rank) in enumerate(cfg.scales):
        prod = None
        for a in range(3):
            u = hat_basis(x01[..., a], res)                 # [S, res] bf16
            f = jnp.dot(u, params["lines"][s][a].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)  # [S, rank]
            prod = f if prod is None else prod * f
        feats.append(prod)
    if cfg.planes:
        feats += _vm_features(params, cfg, x01)
    feats.append(freq_encode(x, degree=cfg.freq_degree))
    return jnp.concatenate(feats, axis=-1)


def cp_density(params, cfg: CPConfig, x):
    feat = cp_features(params, cfg, x)
    h = apply_mlp(params["sigma_mlp"], feat)
    sigma = trunc_exp(h[..., 0])
    return sigma, h[..., 1:]


def cp_color(params, cfg: CPConfig, d, geo_feat):
    de = sh_encode(d, degree=cfg.sh_degree)
    h = jnp.concatenate([de, geo_feat], axis=-1)
    return apply_mlp(params["color_mlp"], h, final_activation=jax.nn.sigmoid)


def cp_forward(params, cfg: CPConfig, x, d):
    sigma, geo_feat = cp_density(params, cfg, x)
    rgb = cp_color(params, cfg, d, geo_feat)
    return sigma, rgb


def make_cp_field(rng, cfg: CPConfig):
    from .api import Field
    params = init_cp(rng, cfg)

    def forward(params, x, d):
        return cp_forward(params, cfg, x, d)

    def density(params, x):
        return cp_density(params, cfg, x)

    def color(params, d, geo_feat):
        return cp_color(params, cfg, d, geo_feat)

    return Field(params, forward, density, color, None, cfg)


# ----------------------------------------------------------- dynamic variant
@dataclass(frozen=True)
class CPDNeRFConfig(CPConfig):
    """Time-conditioned CP field: D-NeRF deformation tower in front of a
    canonical CP field (reference dnerf/network.py:31-52,123-143 with the
    tiledgrid encoder swapped for the MXU-native CP pyramid)."""

    num_layers_deform: int = 8
    hidden_dim_deform: int = 128
    multires_deform: int = 10
    multires_time: int = 6
    # Deformation gradients flow only through scales with res <= this
    # cutoff (BARF/Nerfies coarse-to-fine insight: the fine tables'
    # piecewise-linear d(feat)/dx is huge and sign-flipping -- res~1400
    # with O(0.1) entries gives O(100) derivatives -- and drowns the
    # warp in noise; the reference escapes this only because its hash
    # tables init at 1e-4. Fine scales still evaluate at the warped
    # point, they just do not back-drive the warp.)
    deform_grad_res_cutoff: int = 256

    @property
    def deform_in_dim(self) -> int:
        return freq_output_dim(3, self.multires_deform) + \
            freq_output_dim(1, self.multires_time)


def flops_per_sample(cfg: CPConfig) -> int:
    """Closed-form MXU-matmul FLOPs (2 x MACs) of ONE forward field
    evaluation per sample -- the FLOP model behind the bench's MFU
    numbers (VERDICT r4 next #6; derivation table in PERF_NOTES.md).

    Counts the matmul work only: the hat-basis build, SH/freq encodes,
    trunc_exp, and elementwise CP products are VPU ops (a few percent of
    the total) and are excluded, which makes the reported MFU slightly
    CONSERVATIVE. Backward cost is 2x forward (dX + dW of every matmul);
    callers price a train step at 3x this value."""
    macs = 0
    # multiscale CP lines: hat[S,res] @ line[res,rank], 3 axes
    for res, rank in cfg.scales:
        macs += 3 * res * rank
    # VM plane-line triplets: chained hat contraction + factor line
    for pres, ch in cfg.planes:
        macs += 3 * (pres * pres * ch + pres * ch + pres * ch)
    # sigma tower
    dims = [cfg.feat_dim] + [cfg.hidden_dim] * (cfg.num_layers - 1) \
        + [1 + cfg.geo_feat_dim]
    macs += sum(a * b for a, b in zip(dims[:-1], dims[1:]))
    # color tower
    cdims = [cfg.dir_dim + cfg.geo_feat_dim] \
        + [cfg.hidden_dim_color] * (cfg.num_layers_color - 1) + [3]
    macs += sum(a * b for a, b in zip(cdims[:-1], cdims[1:]))
    if isinstance(cfg, CPDNeRFConfig):
        ddims = [cfg.deform_in_dim] \
            + [cfg.hidden_dim_deform] * (cfg.num_layers_deform - 1) + [3]
        macs += sum(a * b for a, b in zip(ddims[:-1], ddims[1:]))
    return 2 * macs


def init_cp_dnerf(rng, cfg: CPDNeRFConfig):
    k1, k2 = jax.random.split(rng)
    params = init_cp(k1, cfg)
    dims = [cfg.deform_in_dim] + \
        [cfg.hidden_dim_deform] * (cfg.num_layers_deform - 1) + [3]
    params["deform_mlp"] = init_mlp(k2, dims)
    # near-zero initial deformation (Nerfies-style): the default init
    # yields O(0.3)-unit random warps that pollute the canonical field
    # for thousands of steps (deviation from dnerf/network.py's default
    # Linear init; measured +PSNR on the dynamic benchmark).
    params["deform_mlp"]["w"][-1] = params["deform_mlp"]["w"][-1] * 1e-3
    return params


def cp_dnerf_deform_raw(params, cfg: CPDNeRFConfig, x, t):
    """Raw deformation MLP output (no t==0 gating); the trainer
    regularizes |raw(x, 0)|^2 so the canonical frame stays anchored at
    the t=0 configuration (the reference's hard t==0 zero makes the warp
    DIScontinuous at t=0; with a fast-learning field the canonical
    drifts to the trajectory average and t~0 views degrade -- measured
    on the dynamic benchmark)."""
    t = jnp.reshape(jnp.asarray(t, jnp.float32), ())
    ex = freq_encode(x, degree=cfg.multires_deform)
    et = freq_encode(jnp.full(x.shape[:-1] + (1,), t),
                     degree=cfg.multires_time)
    return apply_mlp(params["deform_mlp"], jnp.concatenate([ex, et], -1))


def cp_dnerf_deform(params, cfg: CPDNeRFConfig, x, t):
    """Deformation MLP; t == 0 forces deform = 0 (canonical frame,
    dnerf/network.py:139-141 as a jnp.where on the traced scalar)."""
    t = jnp.reshape(jnp.asarray(t, jnp.float32), ())
    h = cp_dnerf_deform_raw(params, cfg, x, t)
    return jnp.where(t == 0.0, 0.0, h)


def _warped_density(params, cfg: CPDNeRFConfig, x, deform):
    """Canonical density at x + deform with the warp gradient routed
    through the coarse scales only (see deform_grad_res_cutoff)."""
    xw_grad = x + deform
    xw_stop = x + jax.lax.stop_gradient(deform)
    cut = cfg.deform_grad_res_cutoff
    x01g = (xw_grad + cfg.bound) / (2.0 * cfg.bound)
    x01s = (xw_stop + cfg.bound) / (2.0 * cfg.bound)
    feats = []
    for s, (res, rank) in enumerate(cfg.scales):
        x01 = x01g if res <= cut else x01s
        prod = None
        for a in range(3):
            u = hat_basis(x01[..., a], res)
            f = jnp.dot(u, params["lines"][s][a].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
            prod = f if prod is None else prod * f
        feats.append(prod)
    if cfg.planes:
        feats += _vm_features(params, cfg, x01g, x01s, cut)
    feats.append(freq_encode(xw_grad, degree=cfg.freq_degree))
    feat = jnp.concatenate(feats, axis=-1)
    h = apply_mlp(params["sigma_mlp"], feat)
    return trunc_exp(h[..., 0]), h[..., 1:]


def cp_dnerf_forward(params, cfg: CPDNeRFConfig, x, d, t):
    deform = cp_dnerf_deform(params, cfg, x, t)
    sigma, geo = _warped_density(params, cfg, x, deform)
    rgb = cp_color(params, cfg, d, geo)
    return sigma, rgb, deform


def cp_dnerf_density(params, cfg: CPDNeRFConfig, x, t):
    deform = cp_dnerf_deform(params, cfg, x, t)
    return _warped_density(params, cfg, x, deform)


def make_cp_dnerf_field(rng, cfg: CPDNeRFConfig):
    from .api import Field
    params = init_cp_dnerf(rng, cfg)

    def forward(params, x, d, t):
        return cp_dnerf_forward(params, cfg, x, d, t)

    def density(params, x, t):
        return cp_dnerf_density(params, cfg, x, t)

    def color(params, d, geo_feat):
        return cp_color(params, cfg, d, geo_feat)

    f = Field(params, forward, density, color, None, cfg)

    def deform_raw(params, x, t):
        return cp_dnerf_deform_raw(params, cfg, x, t)

    f.deform_raw = deform_raw
    return f
