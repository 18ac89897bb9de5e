"""Static Seal-3D editing CLI (teacher -> student distillation).

Drop-in equivalent of reference main_SealNeRF.py: load a trained teacher from
--teacher_workspace/--teacher_ckpt, build the seal mapper from --seal_config
(json5), pretrain the student on cached teacher point-GT, then distill on the
teacher-proxied dataset. Optional --secondary_teacher_workspace merges a
second model into the edit region (main_SealNeRF.py:141-149, 227-243).
"""

import numpy as np

from sealdnerf_tpu.utils.jaxsetup import setup_jax
setup_jax()
import jax

from sealdnerf_tpu.cli import base_parser, postprocess, to_train_options, \
    load_datasets
from sealdnerf_tpu.editing.seal_utils import get_seal_mapper
from sealdnerf_tpu.editing.student import StudentTrainer, FastStudentTrainer
from sealdnerf_tpu.models.api import make_ngp_field
from sealdnerf_tpu.models.ngp import NGPConfig
from sealdnerf_tpu.train.metrics import PSNRMeter, LPIPSMeter
from sealdnerf_tpu.train.trainer import Trainer


def build_parser():
    parser = base_parser()
    parser.add_argument("--seal_config", type=str, default="")
    parser.add_argument("--extra_epochs", type=int, default=None)
    parser.add_argument("--log2_hashmap_size", type=int, default=19)
    parser.add_argument("--dt_gamma_proxy", type=float, default=1 / 128)
    parser.add_argument("--pretraining_epochs", type=int, default=100)
    parser.add_argument("--pretraining_local_point_step", type=float,
                        default=0.001)
    parser.add_argument("--pretraining_local_angle_step", type=float,
                        default=45)
    parser.add_argument("--pretraining_surrounding_point_step", type=float,
                        default=0.01)
    parser.add_argument("--pretraining_surrounding_angle_step", type=float,
                        default=45)
    parser.add_argument("--pretraining_surrounding_bounds_extend", type=float,
                        default=0.1)
    parser.add_argument("--pretraining_global_point_step", type=float,
                        default=-1)
    parser.add_argument("--pretraining_global_angle_step", type=float,
                        default=45)
    parser.add_argument("--pretraining_batch_size", type=int, default=8192)
    parser.add_argument("--pretraining_lr", type=float, default=0.07)
    parser.add_argument("--custom_pose", action="store_true")
    parser.add_argument("--teacher_workspace", type=str, default="")
    parser.add_argument("--teacher_ckpt", type=str, default="latest")
    parser.add_argument("--secondary_teacher_workspace", type=str,
                        default=None)
    parser.add_argument("--secondary_teacher_ckpt", type=str,
                        default="latest")
    parser.add_argument("--eval_interval", type=int, default=50)
    parser.add_argument("--eval_count", type=int, default=10)
    parser.add_argument("--test_type", type=str, default="test")
    return parser


def main():
    opt = postprocess(build_parser().parse_args())
    if not opt.teacher_workspace:
        opt.teacher_workspace = opt.workspace
    print(opt)

    key = jax.random.PRNGKey(opt.seed)
    k1, k2, k3 = jax.random.split(key, 3)

    # TPU-native fast path when the recipe allows (see cli.build_trainer)
    eligible = (opt.bound <= 1.0 and opt.dt_gamma == 0.0
                and opt.bg_radius <= 0)
    use_cp = opt.backbone == "cp" or (opt.backbone == "auto" and eligible)
    if use_cp:
        from sealdnerf_tpu.models.cp import CPConfig, make_cp_field
        from sealdnerf_tpu.train.fast import FastTrainer
        ccfg = CPConfig(bound=opt.bound)
        field_fn = lambda k: make_cp_field(k, ccfg)
        TrainerCls, StudentCls = FastTrainer, FastStudentTrainer
    else:
        cfg = NGPConfig(bound=opt.bound, bg_radius=opt.bg_radius,
                        log2_hashmap_size=opt.log2_hashmap_size)
        field_fn = lambda k: make_ngp_field(k, cfg)
        TrainerCls, StudentCls = Trainer, StudentTrainer

    teacher_field = field_fn(k1)
    topt_teacher = to_train_options(opt, name="ngp",
                                    workspace=opt.teacher_workspace)
    teacher_trainer = TrainerCls("ngp", topt_teacher, teacher_field,
                                 workspace=opt.teacher_workspace,
                                 use_checkpoint=opt.teacher_ckpt)

    secondary = None
    if opt.secondary_teacher_workspace is not None:
        sec_field = field_fn(k3)
        TrainerCls("ngp", to_train_options(
            opt, name="ngp", workspace=opt.secondary_teacher_workspace),
            sec_field, workspace=opt.secondary_teacher_workspace,
            use_checkpoint=opt.secondary_teacher_ckpt)
        secondary = sec_field

    student_field = field_fn(k2)
    # student starts from the teacher weights (main_SealNeRF.py flow: student
    # loads the same checkpoint)
    student_field.params = jax.tree_util.tree_map(
        lambda x: x.copy(), teacher_trainer.params)
    topt = to_train_options(opt, name="ngp", eval_interval=opt.eval_interval)

    mapper = get_seal_mapper(opt.workspace, None, opt.seal_config) \
        if opt.seal_config else get_seal_mapper(opt.workspace)

    trainer = StudentCls("ngp", topt, student_field, teacher_trainer,
                         mapper=mapper, secondary_teacher=secondary,
                         workspace=opt.workspace, use_checkpoint="scratch",
                         metrics=[PSNRMeter(), LPIPSMeter()])
    trainer.params = student_field.params
    trainer.grid_state = jax.tree_util.tree_map(
        lambda x: x.copy(), teacher_trainer.grid_state)

    train, val, test = load_datasets(opt)
    if opt.custom_pose and mapper is not None:
        # random orbit poses around the edit region (reference
        # SealRandomDataset, SealNeRF/provider.py:145-178, enabled by
        # main_SealNeRF.py:141-149 --custom_pose): the teacher proxy
        # provides GT, so no real images are needed.
        from sealdnerf_tpu.data.provider import NeRFDataset
        md = mapper.map_data
        center = np.asarray(md.get("pose_center", np.zeros(3)), np.float32)
        radius = float(md.get("pose_radius", 1.0))
        train = NeRFDataset.random_orbit(
            n=max(len(train), 50), h=train.h, w=train.w,
            intrinsics=train.intrinsics, center=center,
            radius=min(max(radius, 0.5), 2.0 * opt.bound), seed=opt.seed)
    if opt.test:
        trainer.test(test, write_video=True)
        return

    trainer.init_pretraining(
        epochs=opt.pretraining_epochs,
        batch_size=opt.pretraining_batch_size, lr=opt.pretraining_lr,
        local_point_step=opt.pretraining_local_point_step,
        local_angle_step=opt.pretraining_local_angle_step,
        surrounding_point_step=opt.pretraining_surrounding_point_step,
        surrounding_angle_step=opt.pretraining_surrounding_angle_step,
        surrounding_bounds_extend=opt.pretraining_surrounding_bounds_extend,
        global_point_step=opt.pretraining_global_point_step,
        global_angle_step=opt.pretraining_global_angle_step)

    max_epochs = opt.pretraining_epochs + (
        opt.extra_epochs if opt.extra_epochs is not None
        else int(np.ceil(opt.iters / max(len(train), 1))))
    trainer.train(train, val, max_epochs)
    trainer.test(test, write_video=True)


if __name__ == "__main__":
    main()
