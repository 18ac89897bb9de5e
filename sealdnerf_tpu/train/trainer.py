"""The Trainer: thin host loop around jitted pure steps.

Parity surface with reference nerf/utils.py:316-1155 --
train / evaluate / test / train_gui / test_gui / save_checkpoint /
load_checkpoint / save_mesh, with the same recipes:
- Adam(beta=0.9/0.99, eps=1e-15), LR schedule 0.1 ** (step/iters)
  (main_nerf.py:116-120), EMA decay 0.95.
- pixelwise-random background composition for RGBA data during training
  (nerf/utils.py:499-510).
- density-grid refresh every update_extra_interval steps (:872-874), full
  sweeps for the first 16 updates.
- error-map EMA update (:536-557) when enabled.
- checkpoint window + best-metric checkpoint (:1033-1093).

TPU re-design:
- No dataloader: the whole dataset lives in device HBM and each train step
  samples pixels on device (data/rays.py).
- No GradScaler: bf16 matmul compute with fp32 params/accumulation.
- Data parallelism is built in: the train step is a shard_map over a 1-D
  device mesh; every device samples its own ray batch (its own PRNG fold) and
  gradients are pmean'd over ICI. One code path for 1..N chips, replacing the
  reference's dead DDP plumbing (nerf/utils.py:366-368).
"""

import glob
import json
import os
import time
from dataclasses import dataclass, field as dfield
from functools import partial
from typing import Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from ..models.api import Field
from ..ops.marching import MarchConfig
from ..parallel.mesh import make_mesh
from ..render import (
    GridConfig, init_grid_state, mark_untrained_grid, update_density_grid,
    RenderSettings, render_occ, render_uniform,
)
from ..render.dynamic_grid import (
    DynGridConfig, init_dyn_grid_state, mark_untrained_dyn_grid,
    update_dyn_density_grid, time_slice_index,
)
from .checkpoint import (
    save_checkpoint, load_checkpoint, resolve_checkpoint, prune_checkpoints,
    to_device,
)
from .metrics import PSNRMeter


@dataclass
class TrainOptions:
    """Mirrors the argparse namespace of the reference mains."""

    workspace: str = "workspace"
    name: str = "ngp"
    iters: int = 30000
    lr: float = 1e-2
    num_rays: int = 4096
    bound: float = 1.0
    dt_gamma: float = 1.0 / 128
    max_steps: int = 1024
    min_near: float = 0.2
    density_thresh: float = 10.0
    density_scale: float = 1.0
    bg_radius: float = -1.0
    cuda_ray: bool = True            # occupancy-grid fast path (the -O mode)
    fp16: bool = True                # bf16 compute on TPU
    update_extra_interval: int = 16
    samples_per_ray: int = 48        # packed budget per ray, training
    eval_samples_per_ray: int = 64   # packed budget per ray, inference
    max_ray_batch: int = 4096       # staged inference chunk
    ema_decay: float = 0.95
    max_keep_ckpt: int = 2
    eval_interval: int = 50
    error_map: bool = False
    patch_size: int = 1
    clip_text: str = ""              # GT-free CLIP guidance prompt
    rand_pose: int = -1              # <0 off; 0 all-random; k: every k+1th
    clip_res: int = 128              # semantic-step render resolution
    # CCNeRF rank-residual K-loss: extra truncation fractions trained
    # jointly with the full-rank model (empty = off)
    k_rank_fracs: Tuple[float, ...] = ()
    tv_weight: float = 0.0           # grid-table TV regularizer weight
    # D-NeRF time curriculum (the D-NeRF paper trains on a progressively
    # growing time window over time-sorted frames; prevents the canonical
    # field from ghosting the whole trajectory before the deformation
    # tower can act). 0 = off; else the step count to reach full range.
    time_curriculum_steps: int = 0
    # --- dynamic coarse-to-fine (BARF-style feature annealing) ---
    # Scales/planes with res > dyn_anneal_res ramp their sigma-tower
    # contribution 0 -> 1 linearly over dyn_anneal_steps (0 = off).
    # Without it the dynamic deform/canonical split is a knife-edge:
    # the fast canonical field bakes motion ghosts before the warp locks
    # on, and the SAME 3-view recipe lands at 22.1 or 17.9 PSNR under a
    # 2% LR-schedule change (profiling/probe_dyn_curr.py reproduces the
    # flatline deterministically). Annealing is a pure parameter
    # transform (column scaling of the first sigma-tower matrix), so the
    # fused Pallas kernels are untouched.
    dyn_anneal_steps: int = 1024
    dyn_anneal_res: int = 256
    # weight on |deform_raw(x, t=0)|^2: keeps the warp continuous at the
    # canonical frame (see models/cp.py:cp_dnerf_deform_raw). MUST stay
    # tiny: at 0.1 the reg's gradient through the shared hidden
    # activations exceeds the ~5e-3 photometric warp gradient and PINS
    # the (near-zero-init) deform output layer at zero -- the round-3
    # dynamic runs trained with a DEAD deformation tower and scored
    # their PSNR purely on canonical ghosting (probe_dyn_diag.py: |deform|
    # = 0.0000 at every t; probe_dyn_curr.py zr1e3: deform comes alive
    # and the spread-time val rises 17.4 -> 22.6). The hard t==0 gate in
    # cp_dnerf_deform already anchors the canonical frame exactly. (The
    # round-2 "+2dB at 0.1" sweep compared dead-deform runs against each
    # other.)
    deform_zero_reg: float = 1e-3
    num_steps: int = 128             # uniform path
    upsample_steps: int = 128
    t_thresh: float = 1e-4
    seed: int = 0
    lr_net: Optional[float] = None   # separate MLP lr (D-NeRF)
    grid_size: int = 128             # occupancy grid resolution (tests: 32/64)
    # --- fast path (train/fast.py, PERF_NOTES.md) ---
    fast: bool = True                # dense fast path when config permits
    # preload=False keeps images host-resident; the fast trainer ships
    # sampled pixels per segment (reference nerf/provider.py:246-256)
    preload: bool = True
    march_res: int = 64              # coarse march grid resolution
    n_intervals: int = 16            # kept occupied voxel-steps per ray
    steps_per_interval: int = 4      # fine samples per interval
    segment_steps: int = 128         # train steps per dispatch
    # --- tile-band image rendering (render/fast_image.py) ---
    render_tile_px: int = 8          # pixels per march tile (1 = per-ray)
    render_dilate: int = 1           # occupancy dilation radius (voxels)
    render_march_res: int = 0        # 0 = use march_res
    # 0 = 2x the training n_intervals: eval renders need truncation
    # headroom the training march does not -- ni=16 rendered a trained
    # hard-scene field at 25.3 PSNR that ni=32 renders at 29.6
    # (profiling/probe_eval_renderer.py); training quality itself was
    # unaffected (the field learned the 29.6-grade function under the
    # 16-interval march).
    render_n_intervals: int = 0
    render_steps_per_interval: int = 0
    # bucketed tile rendering: (tile_fraction, budget_divisor) cumulative;
    # tiles sorted by occupied-interval count, emptiest first. Divisors
    # are relative to the RENDER n_intervals (2x train by default), so
    # every bucket's absolute budget doubled with the eval fix -- and
    # that is the point: the ladder's low buckets were the main
    # truncation source (budgets 1,2,4,8,16 rendered a trained field at
    # 25.3 PSNR that 2,4,8,16,32 renders at 29.6, with 64-budget parity
    # showing 29.6 is the un-truncated value;
    # profiling/probe_ladder.py). The q99=0.004 claim from the round-3
    # ladder tuning was measured against an ni=16 reference that was
    # itself truncated. Pareto sweep (probe_ladder_sweep.py): budgets
    # (2,4,8,16,16) hit 29.55 at 129.6 ms/800px vs (2,4,8,16,32)'s
    # 29.61 at 154.9 ms; every cheaper ladder collapses (mid-bucket 16->8
    # alone costs 4.7 dB) -- the top divisor 2 below is measured, not a
    # typo.
    # With the termination trim on (below), the ladder is re-balanced
    # around the POST-trim interval counts (round-5 sweep,
    # profiling/probe_fps_term.py on the trained hard scene): the eval
    # ladder gives the top 60% of tiles the FULL 32-interval budget --
    # trimming pays for exactness at the top -- and measured 29.98 dB
    # gt256 vs the round-4 ladder's 29.86 at equal speed. The preview
    # (GUI/FPS) wire ships a slightly harsher ladder: 15.8 FPS at
    # 800x800 vs this ladder's 10.8, at 29.59 gt256 (-0.27 dB on a wire
    # that is already chroma-subsampled + mip-LOD).
    render_splits: Tuple[Tuple[float, int], ...] = (
        (0.60, 32), (0.15, 16), (0.15, 4), (0.07, 2), (1.0, 2))
    render_splits_preview: Tuple[Tuple[float, int], ...] = (
        (0.60, 32), (0.18, 16), (0.12, 8), (0.07, 4), (1.0, 2))
    # eval-side early termination (render/fast_image.py:
    # _termination_trim): number of leading intervals probed per tile
    # for the transmittance bound (0 = off) and the optical-depth
    # cutoff at interval entry. tau=7 bounds the dropped contribution
    # at exp(-7)~1e-3 per corner probe, measured >=41 dB vs the exact
    # render (profiling/probe_term_trim.py) -- well under the ladder's
    # own truncation error.
    render_term_intervals: int = 16
    render_term_tau: float = 7.0
    # tap every stride-th probed interval (skipped intervals' density is
    # not counted, so the trim only gets LATER -- strictly conservative)
    render_term_stride: int = 2
    # mip-LOD for motion previews (the pack="preview" wire): CP line
    # scales with res >= this are skipped in the preview field kernel
    # (sub-pixel detail at preview scale; ops/pallas_field.py lod_skip).
    # 0 disables.
    preview_lod_min_res: int = 1024


def _is_oom_error(e: Exception) -> bool:
    """Detect a device out-of-memory error (any JAX backend).

    The runtime raises XlaRuntimeError with RESOURCE_EXHAUSTED status for
    HBM OOM; string fallbacks cover older/other backends. Narrower than a
    bare substring match on 'memory' (round-1 weak spot: a non-OOM error
    mentioning memory retried forever)."""
    name = type(e).__name__
    msg = str(e)
    if name in ("XlaRuntimeError", "JaxRuntimeError"):
        return ("RESOURCE_EXHAUSTED" in msg
                or "Out of memory" in msg or "out of memory" in msg
                or "Ran out of memory" in msg)
    return False


def _cascade(bound: float) -> int:
    import math
    return 1 + max(0, math.ceil(math.log2(max(bound, 1.0))))


class Trainer:
    """Host loop. `field` provides params + pure fns; all heavy work is jitted."""

    def __init__(self, name: str, opt: TrainOptions, field: Field,
                 criterion: str = "mse", metrics: Optional[Sequence] = None,
                 workspace: Optional[str] = None, use_checkpoint: str = "latest",
                 mesh=None, time_conditioned: bool = False):
        self.name = name
        self.opt = opt
        self.field = field
        self.criterion = criterion
        self.metrics = list(metrics) if metrics is not None else [PSNRMeter()]
        self.workspace = workspace or opt.workspace
        self.time_conditioned = time_conditioned

        self.mesh = mesh if mesh is not None else make_mesh()
        self.ndev = self.mesh.devices.size

        march = MarchConfig(
            bound=opt.bound, cascades=_cascade(opt.bound),
            grid_size=opt.grid_size, dt_gamma=opt.dt_gamma,
            max_steps=opt.max_steps, min_near=opt.min_near)
        self.grid_cfg = GridConfig(
            march=march, density_thresh=opt.density_thresh,
            density_scale=opt.density_scale)
        self.settings = RenderSettings(
            march=march, density_scale=opt.density_scale,
            bg_radius=opt.bg_radius, t_thresh=opt.t_thresh,
            num_steps=opt.num_steps, upsample_steps=opt.upsample_steps,
            samples_per_ray=opt.samples_per_ray)

        if time_conditioned:
            self.dyn_grid_cfg = DynGridConfig(
                march=march, density_thresh=opt.density_thresh,
                density_scale=opt.density_scale)
        else:
            self.dyn_grid_cfg = None

        # optimizer: Adam(0.9, 0.99, 1e-15) + 0.1**(t/iters) schedule; when
        # lr_net is set, encoders use lr and MLPs use lr_net
        # (dnerf/network.py:260-275).
        def _sched(base):
            return lambda step: base * (0.1 ** jnp.minimum(step / opt.iters,
                                                           1.0))

        if opt.lr_net is not None:
            def label_tree(params):
                # encoders (grid tables / tensor factors) vs MLP towers
                return {
                    k: jax.tree_util.tree_map(
                        lambda _: "net" if ("mlp" in k or "basis" in k)
                        else "enc", v)
                    for k, v in params.items()
                }
            self.tx = optax.multi_transform(
                {"enc": optax.adam(_sched(opt.lr), b1=0.9, b2=0.99, eps=1e-15),
                 "net": optax.adam(_sched(opt.lr_net), b1=0.9, b2=0.99,
                                   eps=1e-15)},
                label_tree)
        else:
            self.tx = optax.adam(learning_rate=_sched(opt.lr), b1=0.9,
                                 b2=0.99, eps=1e-15)
        self.params = field.params
        self.opt_state = self.tx.init(self.params)
        self.ema_params = jax.tree_util.tree_map(jnp.copy, self.params)
        self.grid_state = (init_dyn_grid_state(self.dyn_grid_cfg)
                           if time_conditioned
                           else init_grid_state(self.grid_cfg))

        self.epoch = 0
        self.global_step = 0
        self.local_step = 0
        # adaptive packed-sample budget (the reference's mean_count buffer
        # sizing, raymarching/raymarching.py:198-203): measured mean
        # samples/ray, bucketed to bound retraces
        self.mean_count = 0.0
        self._budget_buckets = sorted({8, 12, 16, 24, 32,
                                       opt.samples_per_ray})
        self._cur_budget = opt.samples_per_ray
        self.stats = {"loss": [], "valid_loss": [], "results": [],
                      "best_result": None}
        self.rng = jax.random.PRNGKey(opt.seed)
        self._train_step = None       # built lazily per (H, W, C) signature
        self._train_sig = None
        self.error_map = None

        # GT-free semantic guidance (--clip_text + --rand_pose; reference
        # nerf/clip_utils.py:11-64 + the rand_pose branch of train_step).
        # semantic_loss_fn: jittable image [H,W,3] -> scalar; tests may
        # inject a custom one. Gated degrade: CLIP weights unavailable
        # offline -> branch disabled with a warning.
        self.semantic_loss_fn = None
        self._semantic_step = None
        if opt.rand_pose >= 0 and opt.clip_text:
            from .clip_guidance import FlaxCLIPGuidance
            g = FlaxCLIPGuidance(opt.clip_text)
            if g.available:
                self.semantic_loss_fn = g.loss_fn
            else:
                self.log("[WARN] --clip_text set but CLIP weights are "
                         "unavailable offline; GT-free semantic steps "
                         "disabled (gated degrade)")

        os.makedirs(self.workspace, exist_ok=True)
        self.log_path = os.path.join(self.workspace, f"log_{name}.txt")
        # tensorboard scalars (reference nerf/utils.py:899-901, 920-921)
        self.writer = None
        try:
            import tensorboardX
            self.writer = tensorboardX.SummaryWriter(
                os.path.join(self.workspace, "run", name))
        except Exception:
            pass
        if use_checkpoint != "scratch":
            path = resolve_checkpoint(self.workspace, name, use_checkpoint)
            if path is not None:
                self.load_checkpoint(path,
                                     model_only=use_checkpoint == "latest_model")
            else:
                self.log(f"[INFO] no checkpoint found for '{use_checkpoint}',"
                         " training from scratch")

    # ------------------------------------------------------------------ util
    def log(self, *msg):
        text = " ".join(str(m) for m in msg)
        print(text, flush=True)
        try:
            with open(self.log_path, "a") as f:
                f.write(text + "\n")
        except OSError:
            pass

    def _next_rng(self):
        self.rng, k = jax.random.split(self.rng)
        return k

    # ------------------------------------------------------- step compilation
    def _update_budget(self):
        """Shrink the packed budget toward the measured mean samples/ray
        (1.5x headroom), like the reference's mean_count (nerf/renderer.py:
        532-536). Only shrinks; growth back is capped at the CLI value."""
        if self.mean_count <= 0:
            return
        want = 1.5 * self.mean_count
        bucket = self.opt.samples_per_ray
        for b in self._budget_buckets:
            if b >= want:
                bucket = b
                break
        if bucket != self._cur_budget:
            self.log(f"[INFO] packed sample budget {self._cur_budget} -> "
                     f"{bucket} (mean {self.mean_count:.1f} samples/ray)")
            self._cur_budget = bucket
            self._train_sig = None  # rebuild the step

    def _build_train_step(self, h, w, c, n_images):
        """Build the sharded train step for a dataset signature."""
        opt = self.opt
        settings = RenderSettings(
            march=self.settings.march,
            density_scale=self.settings.density_scale,
            bg_radius=self.settings.bg_radius,
            t_thresh=self.settings.t_thresh,
            num_steps=self.settings.num_steps,
            upsample_steps=self.settings.upsample_steps,
            samples_per_ray=self._cur_budget)
        field = self.field
        ndev = self.ndev
        n_local = max(opt.num_rays // ndev, 1)
        use_emap = opt.error_map
        time_conditioned = self.time_conditioned
        dyn_cfg = self.dyn_grid_cfg
        from ..data.rays import get_rays

        def sample_and_loss(params, data, occ, rng, step):
            k_img, k_pix, k_bg, k_perturb = jax.random.split(rng, 4)
            img_idx = jax.random.randint(k_img, (), 0, n_images)
            pose = jax.lax.dynamic_slice_in_dim(data["poses"], img_idx, 1, 0)
            emap = None
            if use_emap:
                emap = jax.lax.dynamic_slice_in_dim(
                    data["error_map"], img_idx, 1, 0)
            rays = get_rays(k_pix, pose, data["intrinsics"], h, w, n_local,
                            error_map=emap, patch_size=opt.patch_size)
            rays_o = rays["rays_o"][0]
            rays_d = rays["rays_d"][0]
            inds = rays["inds"][0]
            pix = jax.lax.dynamic_slice_in_dim(
                data["images"], img_idx, 1, 0)[0].reshape(h * w, c)[inds]
            pix = pix.astype(jnp.float32)
            if c == 4:
                bg = jax.random.uniform(k_bg, (n_local, 3))
                gt = pix[:, :3] * pix[:, 3:] + bg * (1.0 - pix[:, 3:])
            else:
                bg = jnp.ones((n_local, 3))
                gt = pix

            if time_conditioned:
                t = data["times"][img_idx]
                t_idx = time_slice_index(t, dyn_cfg)
                occ_t = jax.lax.dynamic_index_in_dim(occ, t_idx, 0,
                                                     keepdims=False)
                extra = (t,)
            else:
                occ_t, extra = occ, ()

            res = render_occ(params, occ_t, rays_o, rays_d, settings,
                             field.forward, field.background, bg_color=bg,
                             rng=k_perturb, perturb=True, extra=extra)
            loss_per_ray = jnp.mean((res["image"] - gt) ** 2, axis=-1)
            loss = jnp.mean(loss_per_ray)
            if opt.k_rank_fracs and hasattr(field, "forward_trunc"):
                # CCNeRF rank-residual K-loss: every truncation level must
                # render the scene (nerf/utils.py:531-533; full-rank level
                # is the `res` above). Static python loop -> K extra
                # renders in the same graph.
                for frac in opt.k_rank_fracs:
                    fwd_k = partial(field.forward_trunc, frac=frac)
                    res_k = render_occ(params, occ_t, rays_o, rays_d,
                                       settings, fwd_k, field.background,
                                       bg_color=bg, rng=k_perturb,
                                       perturb=True, extra=extra)
                    loss = loss + jnp.mean((res_k["image"] - gt) ** 2)
                loss = loss / (1 + len(opt.k_rank_fracs))
            if opt.tv_weight > 0 and hasattr(field, "tv_loss"):
                # TV regularizer at random grid points (gridencoder.cu:
                # 507-640 injects the equivalent gradient directly)
                k_tv = jax.random.fold_in(k_perturb, 0x54)
                x_tv = jax.random.uniform(k_tv, (n_local, 3))
                loss = loss + opt.tv_weight * field.tv_loss(params, x_tv)
            if opt.patch_size > 1:
                # patch structural term (LPIPS stand-in; train/patch_loss.py,
                # reference nerf/utils.py:524-533)
                from .patch_loss import patch_criterion
                loss = loss + patch_criterion(res["image"], gt,
                                              opt.patch_size)
            aux = {"n_samples": res["n_samples"], "img_idx": img_idx,
                   "loss_per_ray": loss_per_ray,
                   "inds_coarse": rays.get("inds_coarse")}
            return loss, aux

        def device_step(params, opt_state, ema, data, occ, rngs, step):
            rng = rngs.reshape(-1)[:2]  # this device's key (shard of [ndev,2])
            (loss, aux), grads = jax.value_and_grad(
                sample_and_loss, has_aux=True)(params, data, occ, rng, step)
            grads = jax.lax.pmean(grads, "data")
            loss = jax.lax.pmean(loss, "data")
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            d = opt.ema_decay
            ema = jax.tree_util.tree_map(
                lambda e, p: d * e + (1.0 - d) * p, ema, params)

            new_emap = None
            if use_emap:
                # EMA update of the sampled image's error rows, combined
                # across devices via psum of deltas (nerf/utils.py:536-557).
                emap = data["error_map"]
                err = aux["loss_per_ray"]
                row = emap[aux["img_idx"]]
                # EMA direction per nerf/utils.py:553: 0.1*old + 0.9*new
                # (round-1 had the factors swapped -- ADVICE.md)
                upd = row.at[aux["inds_coarse"][0]].set(
                    0.1 * row[aux["inds_coarse"][0]] + 0.9 * err)
                delta = jnp.zeros_like(emap).at[aux["img_idx"]].set(upd - row)
                new_emap = emap + jax.lax.psum(delta, "data")
            return params, opt_state, ema, loss, aux["n_samples"], new_emap

        in_specs = (P(), P(), P(), P(), P(), P("data"), P())
        out_specs = (P(), P(), P(), P(), P(), P())
        step_fn = shard_map(device_step, mesh=self.mesh, in_specs=in_specs,
                            out_specs=out_specs, check_vma=False)
        return jax.jit(step_fn, donate_argnums=(0, 1, 2))

    # ---------------------------------------------------------------- training
    def train_step(self, data_dev, h, w, c, n_images):
        sig = (h, w, c, n_images)
        if self._train_sig != sig:
            self._train_step = self._build_train_step(h, w, c, n_images)
            self._train_sig = sig
        rngs = jax.random.split(self._next_rng(), self.ndev)
        if self.opt.error_map and self.error_map is not None:
            data_dev = {**data_dev, "error_map": self.error_map}
        out = self._train_step(self.params, self.opt_state, self.ema_params,
                               data_dev, self._train_occ(), rngs,
                               jnp.asarray(self.global_step))
        self.params, self.opt_state, self.ema_params, loss, nsamp, emap = out
        # keep the field's reference alive: the previous buffers were donated
        self.field.params = self.params
        if emap is not None:
            self.error_map = emap
        self.global_step += 1
        self.local_step += 1
        # EMA of measured samples/ray for the adaptive budget (host-side;
        # nsamp is fetched lazily with the loss)
        if self.local_step % 16 == 0:
            per_ray = float(nsamp) / max(self.opt.num_rays // self.ndev, 1)
            self.mean_count = per_ray if self.mean_count == 0 else \
                0.8 * self.mean_count + 0.2 * per_ray
        return loss, nsamp

    def _train_occ(self):
        """Occupancy used by training steps; StudentTrainer overrides to
        force-fill the edit region (hack_bitfield on the student,
        SealNeRF/trainer.py pretrain_one_epoch)."""
        return self.grid_state["occ"]

    # -------------------------------------------------- GT-free semantic step
    def _build_semantic_step(self):
        """One GT-free step: render a random orbit pose at clip_res and
        minimize semantic_loss_fn(image) through the render (the rand_pose
        branch of the reference train_step + CLIPLoss). Single-device (the
        semantic term is a low-res regularizer, not the throughput path)."""
        opt = self.opt
        res = opt.clip_res
        settings = self.settings
        field = self.field
        loss_img = self.semantic_loss_fn
        from ..data.rays import rand_poses, get_rays

        def step(params, opt_state, ema, occ, rng, intr, step_i):
            k1, k2, k3 = jax.random.split(rng, 3)
            radius = jax.random.uniform(k2, (), minval=1.0, maxval=1.5)
            pose = rand_poses(k1, 1, radius=radius)[0]
            rays = get_rays(k3, pose[None], intr, res, res, -1)
            ro, rd = rays["rays_o"][0], rays["rays_d"][0]

            def loss_fn(params):
                out = render_occ(params, occ, ro, rd, settings,
                                 field.forward, field.background,
                                 bg_color=jnp.ones(3))
                return loss_img(out["image"].reshape(res, res, 3))

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            d = opt.ema_decay
            ema = jax.tree_util.tree_map(
                lambda e, p: d * e + (1.0 - d) * p, ema, params)
            return params, opt_state, ema, loss

        return jax.jit(step)

    def train_step_semantic(self, intrinsics_full, h):
        """Run one GT-free semantic step (requires semantic_loss_fn)."""
        assert self.semantic_loss_fn is not None
        if self._semantic_step is None:
            self._semantic_step = self._build_semantic_step()
        intr = jnp.asarray(intrinsics_full, jnp.float32) * \
            (self.opt.clip_res / float(h))
        intr = intr.at[2].set(self.opt.clip_res / 2.0)
        intr = intr.at[3].set(self.opt.clip_res / 2.0)
        occ = self._train_occ()
        if self.time_conditioned:  # use the t=0 slice (static-only feature)
            occ = occ[0]
        out = self._semantic_step(self.params, self.opt_state,
                                  self.ema_params, occ, self._next_rng(),
                                  intr, jnp.asarray(self.global_step))
        self.params, self.opt_state, self.ema_params, loss = out
        self.field.params = self.params
        self.global_step += 1
        self.local_step += 1
        return float(loss)

    def _update_interval(self):
        """Steps between grid refreshes. Dynamic grids refresh bins_per_call
        of time_size bins per call, so the interval shrinks proportionally to
        keep reference-equivalent coverage per step."""
        if self.time_conditioned:
            frac = self.dyn_grid_cfg.bins_per_call / self.dyn_grid_cfg.time_size
            return max(1, int(self.opt.update_extra_interval * frac))
        return self.opt.update_extra_interval

    def update_extra_state(self):
        """Density grid refresh (nerf/renderer.py:445-538; for the dynamic
        grid: dnerf/renderer.py:453-555 incl. freezing after update #100)."""
        it = int(self.grid_state["iter_density"])
        if it >= 16:  # past warmup: allow budget shrink (one retrace max/bucket)
            self._update_budget()
        if self.time_conditioned:
            if it >= self.dyn_grid_cfg.freeze_calls:
                return
            self.grid_state = update_dyn_density_grid(
                self.grid_state, self.params, self.field.density,
                self._next_rng(), self.dyn_grid_cfg, full=it < 16)
        else:
            self.grid_state = update_density_grid(
                self.grid_state, self.params, self.field.density,
                self._next_rng(), self.grid_cfg, full=it < 16)

    def rebuild_grid(self):
        """Full-sweep occupancy rebuild from the current params (used after
        loading a checkpoint that lacks the density grid)."""
        if self.time_conditioned:
            self.grid_state = update_dyn_density_grid(
                self.grid_state, self._infer_params(), self.field.density,
                self._next_rng(), self.dyn_grid_cfg, full=True)
        else:
            self.grid_state = update_density_grid(
                self.grid_state, self._infer_params(), self.field.density,
                self._next_rng(), self.grid_cfg, full=True)

    def mark_untrained_grid(self, poses, intrinsics):
        if self.time_conditioned:
            self.grid_state = mark_untrained_dyn_grid(
                self.grid_state, jnp.asarray(poses), jnp.asarray(intrinsics),
                self.dyn_grid_cfg)
        else:
            self.grid_state = mark_untrained_grid(
                self.grid_state, jnp.asarray(poses), jnp.asarray(intrinsics),
                self.grid_cfg)

    def train(self, train_dataset, valid_dataset=None, max_epochs: int = 1):
        """Reference Trainer.train (nerf/utils.py:636-665)."""
        self.mark_untrained_grid(train_dataset.poses, train_dataset.intrinsics)
        if not self.opt.preload:
            # host-resident batches are a fast-path (multi-step segment)
            # feature; the reference-shaped single-step path would pay a
            # tunnel round-trip per step for them. Degrade honestly.
            self.log("[warn] preload=False is only supported on the fast "
                     "path (FastTrainer); preloading to device")
        data_dev = train_dataset.device()
        if self.opt.error_map and train_dataset.error_map is not None \
                and self.error_map is None:
            self.error_map = jnp.asarray(train_dataset.error_map)
        h, w = train_dataset.h, train_dataset.w
        c = train_dataset.images.shape[-1]
        n_images = len(train_dataset)
        steps_per_epoch = n_images  # one step per image, like the DataLoader

        for _ in range(max_epochs):
            if self.global_step >= self.opt.iters:
                break
            self.epoch += 1
            t0 = time.time()
            losses = []
            for _ in range(steps_per_epoch):
                if self.global_step % self._update_interval() == 0:
                    self.update_extra_state()
                rp = self.opt.rand_pose
                if self.semantic_loss_fn is not None and rp >= 0 and \
                        (rp == 0 or self.global_step % (rp + 1) == rp):
                    # GT-free step at a random orbit pose (reference
                    # provider rand_pose + CLIP branch of train_step)
                    losses.append(self.train_step_semantic(
                        train_dataset.intrinsics, h))
                    continue
                loss, nsamp = self.train_step(data_dev, h, w, c, n_images)
                losses.append(loss)
            mean_loss = float(np.mean([jax.device_get(l) for l in losses]))
            self.stats["loss"].append(mean_loss)
            if self.writer is not None:
                self.writer.add_scalar("train/loss", mean_loss,
                                       self.global_step)
                self.writer.add_scalar(
                    "train/lr",
                    self.opt.lr * 0.1 ** min(self.global_step / self.opt.iters,
                                             1.0), self.global_step)
            dt = time.time() - t0
            rays_s = steps_per_epoch * self.opt.num_rays / dt
            self.log(f"[epoch {self.epoch}] loss={mean_loss:.6f} "
                     f"{dt:.2f}s ({rays_s:,.0f} rays/s) "
                     f"step={self.global_step}")

            if valid_dataset is not None and \
                    self.epoch % self.opt.eval_interval == 0:
                self.evaluate_one_epoch(valid_dataset)
                self.save_checkpoint(full=False, best=True)
            self.save_checkpoint(full=True, best=False)

    # --------------------------------------------------------------- inference
    def _infer_params(self):
        return self.ema_params if self.ema_params is not None else self.params

    def render_image(self, pose, intrinsics, h, w, bg_color=None,
                     downscale: int = 1, time=None, params=None,
                     staged: bool = True):
        """Full-image render, staged over fixed-size ray chunks."""
        from ..data.rays import get_rays
        rh, rw = int(h // downscale), int(w // downscale)
        intr = jnp.asarray(intrinsics) / downscale
        rays = get_rays(jax.random.PRNGKey(0), jnp.asarray(pose)[None], intr,
                        rh, rw, -1)
        rays_o = rays["rays_o"][0]
        rays_d = rays["rays_d"][0]
        params = params if params is not None else self._infer_params()
        # start at 4x the CLI chunk: fewer dispatch/fixed costs per frame;
        # the OOM retry below halves it if the graph exceeds HBM, and the
        # working size is cached so later frames never re-attempt an OOM
        # compile (those cost ~20s each)
        if not hasattr(self, "_eval_chunk"):
            self._eval_chunk = self.opt.max_ray_batch * 4
        chunk = self._eval_chunk
        n = rays_o.shape[0]
        settings = self.settings
        eval_settings = RenderSettings(
            march=settings.march, density_scale=settings.density_scale,
            bg_radius=settings.bg_radius, t_thresh=settings.t_thresh,
            num_steps=settings.num_steps,
            upsample_steps=settings.upsample_steps,
            samples_per_ray=self.opt.eval_samples_per_ray)

        occ = self.grid_state["occ"]
        extra = ()
        if self.time_conditioned:
            t = jnp.asarray(time if time is not None else 0.0,
                            dtype=jnp.float32)
            t_idx = time_slice_index(t, self.dyn_grid_cfg)
            occ = jax.lax.dynamic_index_in_dim(occ, t_idx, 0, keepdims=False)
            extra = (t,)

        def run_chunked(chunk):
            images, depths = [], []
            pad = (-n) % chunk
            ro = jnp.concatenate([rays_o, jnp.zeros((pad, 3))]) if pad \
                else rays_o
            rd = jnp.concatenate([rays_d, jnp.ones((pad, 3))]) if pad \
                else rays_d
            for i in range(0, n + pad, chunk):
                res = render_occ(params, occ, ro[i:i + chunk],
                                 rd[i:i + chunk], eval_settings,
                                 self.field.forward, self.field.background,
                                 bg_color=bg_color, extra=extra)
                images.append(res["image"])
                depths.append(res["depth"])
            return images, depths

        while True:
            try:
                images, depths = run_chunked(chunk)
                self._eval_chunk = chunk
                break
            except Exception as e:  # HBM OOM on big eval graphs: halve chunk
                if chunk <= 512 or not _is_oom_error(e):
                    raise
                self.log(f"[WARN] eval render chunk {chunk} OOM; retrying "
                         f"with {chunk // 2}")
                chunk //= 2
                self._eval_chunk = chunk
        image = jnp.concatenate(images)[:n].reshape(rh, rw, 3)
        depth = jnp.concatenate(depths)[:n].reshape(rh, rw)
        return np.asarray(jnp.clip(image, 0, 1)), np.asarray(depth)

    def evaluate_one_epoch(self, dataset, name: Optional[str] = None):
        self.log(f"++> Evaluate at epoch {self.epoch}")
        import imageio
        for m in self.metrics:
            m.clear()
        losses = []
        val_dir = os.path.join(self.workspace, "validation")
        os.makedirs(val_dir, exist_ok=True)
        name = name or f"{self.name}_ep{self.epoch:04d}"
        for i in range(len(dataset)):
            t = dataset.times[i] if (self.time_conditioned and
                                     dataset.times is not None) else None
            img, depth = self.render_image(dataset.poses[i],
                                           dataset.intrinsics, dataset.h,
                                           dataset.w, time=t)
            gt = dataset.images[i]
            if gt.shape[-1] == 4:
                gt = gt[..., :3] * gt[..., 3:] + 1.0 * (1 - gt[..., 3:])
            losses.append(float(np.mean((img - gt) ** 2)))
            for m in self.metrics:
                m.update(img, gt)
            # per-view validation dumps (nerf/utils.py:988-1005)
            imageio.imwrite(
                os.path.join(val_dir, f"{name}_{i:04d}_rgb.png"),
                (np.clip(img, 0, 1) * 255).astype(np.uint8))
            dmax = float(depth.max())
            imageio.imwrite(
                os.path.join(val_dir, f"{name}_{i:04d}_depth.png"),
                (np.clip(depth / dmax if dmax > 0 else depth, 0, 1)
                 * 255).astype(np.uint8))
        result = self.metrics[0].measure()
        self.stats["results"].append(result)
        self.stats["valid_loss"].append(float(np.mean(losses)))
        if self.writer is not None:
            for m in self.metrics:
                m.write(self.writer, self.global_step, prefix="evaluate")
        self.log("++> " + " | ".join(m.report() for m in self.metrics))
        return result

    def evaluate(self, dataset, name=None):
        return self.evaluate_one_epoch(dataset, name)

    def test(self, dataset, save_path=None, name=None, write_video=True):
        """Render test poses, save pngs (+ mp4 like nerf/utils.py:667-717)."""
        import imageio
        save_path = save_path or os.path.join(self.workspace, "results")
        name = name or f"{self.name}_ep{self.epoch:04d}"
        os.makedirs(save_path, exist_ok=True)
        frames = []
        for i in range(len(dataset)):
            t = dataset.times[i] if (self.time_conditioned and
                                     dataset.times is not None) else None
            img, depth = self.render_image(dataset.poses[i],
                                           dataset.intrinsics, dataset.h,
                                           dataset.w, time=t)
            u8 = (img * 255).astype(np.uint8)
            imageio.imwrite(os.path.join(save_path, f"{name}_{i:04d}_rgb.png"),
                            u8)
            frames.append(u8)
        if write_video and frames:
            try:
                imageio.mimwrite(os.path.join(save_path, f"{name}_rgb.mp4"),
                                 np.stack(frames), fps=25,
                                 quality=8, macro_block_size=1)
            except Exception as e:  # no ffmpeg backend in this image
                self.log(f"[WARN] mp4 export unavailable ({e}); frames saved "
                         "as pngs")
        self.log(f"==> Saved test results to {save_path}")

    # -------------------------------------------------------------------- GUI
    def current_lr(self) -> float:
        """LR the optax schedule actually applies this step, evaluated at
        the optimizer's own update count (which can differ from
        global_step after a latest_model resume, where opt_state resets).
        Mirrors the reference GUI's param_groups[0]['lr'] readout
        (nerf/utils.py:775)."""
        count = self.global_step
        for leaf in jax.tree_util.tree_leaves(self.opt_state):
            if getattr(leaf, "ndim", None) == 0 and \
                    getattr(leaf, "dtype", None) == jnp.int32:
                count = int(leaf)   # optax ScaleByAdamState.count
                break
        return float(self.opt.lr
                     * 0.1 ** min(count / self.opt.iters, 1.0))

    def train_gui(self, train_dataset_dev, step: int = 16, h=None, w=None,
                  c=4, n_images=None):
        """Run `step` train steps; returns (loss, lr) for the GUI overlay
        (reference nerf/utils.py:720-778)."""
        t0 = time.time()
        losses = []
        for _ in range(step):
            if self.global_step % self._update_interval() == 0:
                self.update_extra_state()
            loss, _ = self.train_step(train_dataset_dev, h, w, c, n_images)
            losses.append(loss)
        loss = float(np.mean([jax.device_get(l) for l in losses]))
        return {"loss": loss, "lr": self.current_lr(),
                "time": time.time() - t0}

    def test_gui(self, pose, intrinsics, w, h, bg_color=None, spp=1,
                 downscale=1, time=None, need_depth=True):
        """Single-frame render for the GUI (reference nerf/utils.py:783-847,
        dnerf/utils.py test_gui(pose, ..., time)). Downscale is bucketed to
        powers of two to avoid retraces. need_depth is advisory (the fast
        path drops the depth plane from the wire when False); this
        reference-shaped path always returns depth."""
        buckets = [1, 2, 4, 8]
        downscale = min(buckets, key=lambda b: abs(b - downscale))
        if bg_color is not None:
            bg_color = jnp.asarray(bg_color, dtype=jnp.float32)
        img, depth = self.render_image(pose, intrinsics, h, w,
                                       bg_color=bg_color, downscale=downscale,
                                       time=time)
        return {"image": img, "depth": depth}

    # ------------------------------------------------------------- checkpoints
    def save_checkpoint(self, full: bool = False, best: bool = False,
                        remove_old: bool = True):
        state = {
            "model": {"params": self.params, "ema": self.ema_params},
            "grid": self.grid_state,
        }
        if full:
            state["optimizer"] = self.opt_state
        meta = {"epoch": self.epoch, "global_step": self.global_step,
                "stats": {k: v for k, v in self.stats.items()
                          if k != "best_result"}}
        ckpt_dir = os.path.join(self.workspace, "checkpoints")
        if best:
            if self.stats["results"]:
                result = self.stats["results"][-1]
                prev = self.stats["best_result"]
                if prev is None or result > prev:  # PSNR: bigger is better
                    self.stats["best_result"] = result
                    slim = dict(state)
                    # strip the density grid like nerf/utils.py:1084-1086
                    slim["grid"] = {k: v for k, v in self.grid_state.items()
                                    if k not in ("density_grid", "occ")}
                    save_checkpoint(os.path.join(ckpt_dir, f"{self.name}.npz"),
                                    slim, meta)
        else:
            path = os.path.join(ckpt_dir,
                                f"{self.name}_ep{self.epoch:04d}.npz")
            save_checkpoint(path, state, meta)
            if remove_old:
                prune_checkpoints(self.workspace, self.name,
                                  self.opt.max_keep_ckpt)

    def load_checkpoint(self, path: str, model_only: bool = False):
        state, meta = load_checkpoint(path)
        self.params = to_device(state["model"]["params"])
        self.field.params = self.params
        if "ema" in state["model"] and state["model"]["ema"] is not None:
            self.ema_params = to_device(state["model"]["ema"])
        if "grid" in state:
            g = init_grid_state(self.grid_cfg)
            g.update({k: jnp.asarray(v) for k, v in state["grid"].items()})
            if "density_grid" in state["grid"]:
                thresh = jnp.minimum(g["mean_density"],
                                     self.grid_cfg.density_thresh)
                g["occ"] = (g["density_grid"] > thresh).reshape(g["occ"].shape)
            self.grid_state = g
            if "density_grid" not in state["grid"]:
                # slim/best checkpoints strip the grid (nerf/utils.py:
                # 1084-1086); the reference keeps its bitfield buffer so
                # best ckpts still render -- rebuild ours with a full
                # density sweep from the loaded params (ADVICE.md r1).
                self.rebuild_grid()
        if not model_only:
            self.epoch = meta.get("epoch", 0)
            self.global_step = meta.get("global_step", 0)
            if "stats" in meta:
                self.stats.update(meta["stats"])
                self.stats.setdefault("best_result", None)
            if "optimizer" in state:
                try:
                    ref = jax.tree_util.tree_structure(self.opt_state)
                    flat = jax.tree_util.tree_leaves(state["optimizer"])
                    self.opt_state = jax.tree_util.tree_unflatten(
                        ref, [jnp.asarray(x) for x in flat])
                except Exception as e:  # tolerate optimizer mismatch
                    self.log(f"[WARN] failed to load optimizer state: {e}")
        self.log(f"[INFO] loaded checkpoint {path} "
                 f"(epoch {self.epoch}, step {self.global_step})")

    # ------------------------------------------------------------------- mesh
    def save_mesh(self, save_path=None, resolution: int = 256,
                  threshold: float = 10.0):
        """Density field -> marching cubes -> PLY
        (reference nerf/utils.py:612-632)."""
        from ..utils.meshing import extract_geometry, save_ply
        save_path = save_path or os.path.join(
            self.workspace, "meshes", f"{self.name}_{self.epoch}.ply")
        os.makedirs(os.path.dirname(save_path), exist_ok=True)
        b = self.opt.bound

        def query(pts):
            sigma, _ = self.field.density(self._infer_params(),
                                          jnp.asarray(pts))
            return np.asarray(sigma)

        verts, tris = extract_geometry(
            np.array([-b, -b, -b]), np.array([b, b, b]), resolution,
            threshold, query)
        save_ply(save_path, verts, tris)
        self.log(f"==> Saved mesh to {save_path} "
                 f"({len(verts)} verts, {len(tris)} tris)")
