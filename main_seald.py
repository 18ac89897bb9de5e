"""SealD-NeRF: dynamic-scene editing CLI (the headline workload).

Drop-in equivalent of reference main_seald.py: two D-NeRF networks
(teacher + student), the teacher trained on the dynamic scene, the student
distilled against the edit-aware teacher at a pinned --time_frame; GUI-first
in the reference (main_seald.py:183-186) with a headless path (:188-202).
"""

import numpy as np

from sealdnerf_tpu.utils.jaxsetup import setup_jax
setup_jax()
import jax

from sealdnerf_tpu.cli import base_parser, postprocess, to_train_options, \
    load_datasets
from sealdnerf_tpu.editing.seal_utils import get_seal_mapper
from sealdnerf_tpu.editing.student import StudentTrainer, FastStudentTrainer
from sealdnerf_tpu.models.api import make_dnerf_field
from sealdnerf_tpu.models.dnerf import DNeRFConfig
from sealdnerf_tpu.train.metrics import PSNRMeter
from sealdnerf_tpu.train.trainer import Trainer


def build_parser():
    parser = base_parser(default_bound=2.0, default_lr=5e-4)
    parser.add_argument("--lr_net", type=float, default=5e-5)
    parser.add_argument("--basis", action="store_true")
    parser.add_argument("--hyper", action="store_true")
    parser.add_argument("--seal_config", type=str, default="")
    parser.add_argument("--time_frame", type=float, default=0.0,
                        help="time in [0,1] the edit is pinned to")
    parser.add_argument("--extra_epochs", type=int, default=None)
    parser.add_argument("--pretraining_epochs", type=int, default=100)
    parser.add_argument("--pretraining_batch_size", type=int, default=8192)
    parser.add_argument("--pretraining_lr", type=float, default=0.07)
    parser.add_argument("--pretraining_local_point_step", type=float,
                        default=0.001)
    parser.add_argument("--pretraining_surrounding_point_step", type=float,
                        default=0.01)
    parser.add_argument("--pretraining_global_point_step", type=float,
                        default=-1)
    parser.add_argument("--teacher_workspace", type=str, default="")
    parser.add_argument("--teacher_ckpt", type=str, default="latest")
    parser.add_argument("--eval_interval", type=int, default=50)
    # reference uses 100 (main_dnerf.py:30) for its 1-in-S resample
    # refresh; our round-robin bin refresh needs the denser default 16
    # cadence or the time-sliced occupancy goes stale (14.9 vs 21.1
    # PSNR @ step 1024, profiling/probe_dyn_interval.py)
    parser.set_defaults(update_extra_interval=16)
    return parser


def main():
    opt = postprocess(build_parser().parse_args())
    if not opt.teacher_workspace:
        opt.teacher_workspace = opt.workspace
    print(opt)

    variant = "basis" if opt.basis else ("hyper" if opt.hyper else "deform")
    key = jax.random.PRNGKey(opt.seed)
    k1, k2 = jax.random.split(key)

    # TPU-native fast path when the recipe allows (see cli.build_trainer)
    eligible = (opt.bound <= 1.0 and opt.dt_gamma == 0.0
                and opt.bg_radius <= 0 and variant == "deform")
    use_cp = opt.backbone == "cp" or (opt.backbone == "auto" and eligible)
    if use_cp:
        from sealdnerf_tpu.models.cp import (CPDNeRFConfig,
                                             make_cp_dnerf_field)
        from sealdnerf_tpu.train.fast import FastTrainer
        ccfg = CPDNeRFConfig(bound=opt.bound)
        field_fn = lambda k: make_cp_dnerf_field(k, ccfg)
        TrainerCls, StudentCls = FastTrainer, FastStudentTrainer
    else:
        cfg = DNeRFConfig(bound=opt.bound, variant=variant,
                          bg_radius=opt.bg_radius)
        field_fn = lambda k: make_dnerf_field(k, cfg)
        TrainerCls, StudentCls = Trainer, StudentTrainer

    teacher_field = field_fn(k1)
    teacher_trainer = TrainerCls(
        "ngp", to_train_options(opt, name="ngp",
                                workspace=opt.teacher_workspace,
                                lr_net=opt.lr_net),
        teacher_field, workspace=opt.teacher_workspace,
        use_checkpoint=opt.teacher_ckpt, time_conditioned=True)

    student_field = field_fn(k2)
    student_field.params = jax.tree_util.tree_map(
        lambda x: x.copy(), teacher_trainer.params)
    topt = to_train_options(opt, name="ngp", lr_net=opt.lr_net,
                            eval_interval=opt.eval_interval)

    mapper = None
    if opt.seal_config:
        mapper = get_seal_mapper(opt.workspace, None, opt.seal_config)

    trainer = StudentCls("ngp", topt, student_field, teacher_trainer,
                         mapper=mapper, workspace=opt.workspace,
                         use_checkpoint="scratch", time_conditioned=True,
                         metrics=[PSNRMeter()])
    trainer.params = student_field.params
    trainer.grid_state = jax.tree_util.tree_map(
        lambda x: x.copy(), teacher_trainer.grid_state)

    train, val, test = load_datasets(opt, with_time=True)

    if opt.gui:
        from sealdnerf_tpu.gui.seald_gui import SealDGUI
        SealDGUI(opt, teacher_trainer, trainer, train_dataset=train).render()
        return

    if opt.test:
        trainer.test(test, write_video=True)
        return

    if mapper is not None:
        trainer.init_pretraining(
            time_frame=opt.time_frame,
            epochs=opt.pretraining_epochs,
            batch_size=opt.pretraining_batch_size, lr=opt.pretraining_lr,
            local_point_step=opt.pretraining_local_point_step,
            surrounding_point_step=opt.pretraining_surrounding_point_step,
            global_point_step=opt.pretraining_global_point_step)

    max_epochs = opt.pretraining_epochs + (
        opt.extra_epochs if opt.extra_epochs is not None
        else int(np.ceil(opt.iters / max(len(train), 1))))
    trainer.train(train, val, max_epochs, time_frame=opt.time_frame)
    trainer.test(test, write_video=True)


if __name__ == "__main__":
    main()
