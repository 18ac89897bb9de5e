"""Shared CLI machinery for the main_* entry points.

Flag set matches the reference mains (main_nerf.py:15-75 etc.). Flags that are
CUDA-specific keep their names for drop-in compatibility but map to TPU
equivalents:
- -O / --fp16: bf16 compute (no GradScaler needed).
- --cuda_ray: the occupancy-grid fast path (pure-XLA uniform path otherwise).
- --preload: accepted; preloading to device HBM is already the default
  (the TPU-native design). --no_preload keeps images host-resident and
  ships only the sampled pixels per training segment (the reference's
  no-preload collate semantics, nerf/provider.py:246-256) -- use it for
  datasets larger than HBM.
- --ff / --tcnn: accepted no-op aliases of the default backbone (FFMLP /
  tiny-cuda-nn are CUDA scheduling tricks; XLA fuses the tiny MLPs already).
"""

import argparse

from .train.trainer import TrainOptions


def base_parser(default_bound=2.0, default_lr=1e-2, default_iters=30000,
                default_dt_gamma=1 / 128):
    parser = argparse.ArgumentParser()
    parser.add_argument("path", type=str)
    parser.add_argument("-O", action="store_true",
                        help="equals --fp16 --cuda_ray --preload")
    parser.add_argument("--test", action="store_true")
    parser.add_argument("--workspace", type=str, default="workspace")
    parser.add_argument("--seed", type=int, default=0)
    # training
    parser.add_argument("--iters", type=int, default=default_iters)
    parser.add_argument("--lr", type=float, default=default_lr)
    parser.add_argument("--ckpt", type=str, default="latest")
    parser.add_argument("--num_rays", type=int, default=4096)
    parser.add_argument("--cuda_ray", action="store_true",
                        help="occupancy-grid fast path (TPU equivalent)")
    parser.add_argument("--max_steps", type=int, default=1024)
    parser.add_argument("--num_steps", type=int, default=512)
    parser.add_argument("--upsample_steps", type=int, default=0)
    parser.add_argument("--update_extra_interval", type=int, default=16)
    parser.add_argument("--max_ray_batch", type=int, default=4096)
    parser.add_argument("--patch_size", type=int, default=1)
    parser.add_argument("--samples_per_ray", type=int, default=48,
                        help="packed sample budget per ray (training)")
    parser.add_argument("--eval_samples_per_ray", type=int, default=64)
    # backbone
    parser.add_argument("--backbone", type=str, default="auto",
                        choices=["auto", "cp", "ngp"],
                        help="auto: CP-factorized fast path when the recipe "
                             "allows (bound<=1, dt_gamma=0, no bg sphere), "
                             "else NGP; cp/ngp force it")
    parser.add_argument("--planes", type=str, default="auto",
                        help="CP-backbone VM planes: 'auto' ((128,8) when "
                             "bound<=1, off for bound>1 -- the measured "
                             "quality-per-rate defaults, see "
                             "models/cp.py:default_planes), 'off', or "
                             "'res,ch[;res,ch...]'")
    parser.add_argument("--fp16", action="store_true",
                        help="bf16 compute on TPU")
    parser.add_argument("--ff", action="store_true", help="no-op alias (TPU)")
    parser.add_argument("--tcnn", action="store_true", help="no-op alias (TPU)")
    # dataset
    parser.add_argument("--color_space", type=str, default="srgb")
    parser.add_argument("--preload", action="store_true")
    parser.add_argument("--no_preload", action="store_true",
                        help="keep images in host RAM; ship only sampled "
                             "pixels per segment (datasets > HBM)")
    parser.add_argument("--bound", type=float, default=default_bound)
    parser.add_argument("--scale", type=float, default=0.33)
    parser.add_argument("--offset", type=float, nargs="*", default=[0, 0, 0])
    parser.add_argument("--dt_gamma", type=float, default=default_dt_gamma)
    parser.add_argument("--min_near", type=float, default=0.2)
    parser.add_argument("--density_thresh", type=float, default=10)
    parser.add_argument("--bg_radius", type=float, default=-1)
    parser.add_argument("--downscale", type=int, default=1)
    # GUI
    parser.add_argument("--gui", action="store_true")
    parser.add_argument("--W", type=int, default=1920)
    parser.add_argument("--H", type=int, default=1080)
    parser.add_argument("--radius", type=float, default=5)
    parser.add_argument("--fovy", type=float, default=50)
    parser.add_argument("--max_spp", type=int, default=64)
    # experimental
    parser.add_argument("--error_map", action="store_true")
    parser.add_argument("--clip_text", type=str, default="")
    parser.add_argument("--rand_pose", type=int, default=-1)
    parser.add_argument("--tv_weight", type=float, default=0.0,
                        help="grid-table total-variation regularizer "
                             "(gridencoder grad_total_variation)")
    # observability (SURVEY.md §5: tracing/debugging aux subsystems)
    parser.add_argument("--profile", action="store_true",
                        help="write a jax.profiler trace to workspace/trace")
    parser.add_argument("--debug_nan", action="store_true",
                        help="enable jax_debug_nans (the analog of "
                             "torch.autograd.set_detect_anomaly)")
    # synthetic data escape hatch: path == "synthetic" builds the procedural
    # scene (this image ships no datasets)
    parser.add_argument("--synthetic_res", type=int, default=128)
    return parser


def postprocess(opt):
    if opt.O:
        opt.fp16 = True
        opt.cuda_ray = True
        opt.preload = True
    if opt.patch_size > 1:
        opt.error_map = False
        assert opt.num_rays % (opt.patch_size ** 2) == 0
    if getattr(opt, "debug_nan", False):
        from .utils.profiling import enable_nan_debugging
        enable_nan_debugging()
    return opt


def to_train_options(opt, name="ngp", **overrides) -> TrainOptions:
    kw = dict(
        workspace=opt.workspace, name=name, iters=opt.iters, lr=opt.lr,
        num_rays=opt.num_rays, bound=opt.bound, dt_gamma=opt.dt_gamma,
        max_steps=opt.max_steps, min_near=opt.min_near,
        density_thresh=opt.density_thresh, bg_radius=opt.bg_radius,
        cuda_ray=opt.cuda_ray, fp16=opt.fp16,
        update_extra_interval=opt.update_extra_interval,
        samples_per_ray=opt.samples_per_ray,
        eval_samples_per_ray=opt.eval_samples_per_ray,
        max_ray_batch=opt.max_ray_batch, error_map=opt.error_map,
        patch_size=opt.patch_size, num_steps=opt.num_steps,
        upsample_steps=opt.upsample_steps, seed=opt.seed,
        clip_text=getattr(opt, "clip_text", ""),
        rand_pose=getattr(opt, "rand_pose", -1),
        tv_weight=getattr(opt, "tv_weight", 0.0),
        preload=not getattr(opt, "no_preload", False),
        time_curriculum_steps=getattr(opt, "time_curriculum_steps", 0),
    )
    kw.update(overrides)
    return TrainOptions(**kw)


def load_datasets(opt, with_time=False):
    """Returns (train, val, test) NeRFDatasets; `synthetic` path is procedural."""
    from .data.provider import NeRFDataset
    from .data.synthetic import make_synthetic_scene
    if opt.path.startswith("synthetic"):
        dynamic = with_time
        _, train, val = make_synthetic_scene(
            n_train=48, n_val=6, res=opt.synthetic_res, dynamic=dynamic)
        return train, val, val
    train = NeRFDataset.load(opt.path, "train", downscale=opt.downscale,
                             scale=opt.scale, offset=tuple(opt.offset),
                             error_map=opt.error_map, with_time=with_time)
    val = NeRFDataset.load(opt.path, "val", downscale=opt.downscale,
                           scale=opt.scale, offset=tuple(opt.offset),
                           with_time=with_time)
    try:
        test = NeRFDataset.load(opt.path, "test", downscale=opt.downscale,
                                scale=opt.scale, offset=tuple(opt.offset),
                                with_time=with_time)
    except FileNotFoundError:
        test = val
    return train, val, test


def build_trainer(opt, name="ngp", dynamic=False, metrics=None,
                  use_checkpoint=None, **topt_overrides):
    """Pick the backbone + trainer for the main CLIs.

    --backbone cp (default when the recipe allows: bound <= 1,
    dt_gamma == 0, no background sphere) trains the TPU-native
    CP-factorized field with the multi-step fast trainer; --backbone ngp
    forces the reference-parity Instant-NGP field on the packed-march
    trainer (the reference's run_cuda semantics).
    """
    import jax
    from .train.trainer import Trainer
    from .train.fast import FastTrainer
    backbone = getattr(opt, "backbone", "auto")
    # static recipes ride the fast path at any bound/dt_gamma (the
    # cascade dense march, ops/marching_dense.py); dynamic fast needs
    # bound <= 1 (the reference's D-NeRF recipes, scripts/test.sh:11)
    eligible = (opt.bg_radius <= 0
                and not (dynamic and opt.bound > 1.0)
                and not (dynamic and (getattr(opt, "basis", False)
                                      or getattr(opt, "hyper", False))))
    use_cp = backbone == "cp" or (backbone == "auto" and eligible)
    if use_cp and not eligible:
        raise SystemExit("--backbone cp needs no --bg_radius (and "
                         "--bound <= 1 for dynamic scenes)")
    key = jax.random.PRNGKey(opt.seed)
    topt = to_train_options(opt, name=name, **topt_overrides)
    kw = dict(metrics=metrics, workspace=opt.workspace,
              use_checkpoint=use_checkpoint or opt.ckpt)
    if use_cp:
        from .models.cp import (CPConfig, CPDNeRFConfig, make_cp_field,
                                make_cp_dnerf_field, parse_planes)
        planes = parse_planes(getattr(opt, "planes", "auto"), opt.bound)
        if dynamic:
            field = make_cp_dnerf_field(key, CPDNeRFConfig(
                bound=opt.bound, planes=planes))
            return FastTrainer(name, topt, field, time_conditioned=True,
                               **kw), field
        field = make_cp_field(key, CPConfig(bound=opt.bound, planes=planes))
        return FastTrainer(name, topt, field, **kw), field
    if dynamic:
        from .models.api import make_dnerf_field
        from .models.dnerf import DNeRFConfig
        variant = ("basis" if getattr(opt, "basis", False) else
                   "hyper" if getattr(opt, "hyper", False) else "deform")
        cfg = DNeRFConfig(bound=opt.bound, variant=variant)
        field = make_dnerf_field(key, cfg)
        return Trainer(name, topt, field, time_conditioned=True, **kw), field
    from .models.api import make_ngp_field
    from .models.ngp import NGPConfig
    cfg = NGPConfig(bound=opt.bound, bg_radius=opt.bg_radius)
    field = make_ngp_field(key, cfg)
    return Trainer(name, topt, field, **kw), field
