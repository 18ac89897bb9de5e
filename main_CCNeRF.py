"""CCNeRF CLI (reference main_CCNeRF.py; backing package missing from the
snapshot -- rebuilt from its API surface): train per-object TensoRF-CP models
with rank-residual losses, or --compose several trained models into one scene
with per-object scale/rotation/translation and render the composition."""

import argparse
import os

import numpy as np

from sealdnerf_tpu.utils.jaxsetup import setup_jax
setup_jax()
import jax
import jax.numpy as jnp

from sealdnerf_tpu.cli import base_parser, postprocess, to_train_options, \
    load_datasets
from sealdnerf_tpu.models.tensorf import TensoRFConfig, make_tensorf_field, \
    cc_compose_forward
from sealdnerf_tpu.train.metrics import PSNRMeter
from sealdnerf_tpu.train.trainer import Trainer


def build_parser():
    parser = base_parser(default_bound=1.0, default_lr=2e-2)
    parser.add_argument("--compose", action="store_true")
    parser.add_argument("--lr0", type=float, default=2e-2)
    parser.add_argument("--lr1", type=float, default=1e-3)
    parser.add_argument("--rank", type=int, default=64,
                        help="CP rank (rank-residual training truncates it)")
    parser.add_argument("--compose_models", type=str, nargs="*", default=[],
                        help="workspaces of trained models to compose")
    parser.add_argument("--rank_fracs", type=float, nargs="*",
                        default=[0.25, 0.5],
                        help="rank-residual K-loss truncation fractions "
                             "(trained jointly with the full rank; "
                             "nerf/utils.py:531-533)")
    return parser


def _transform(s, t, R=None):
    m = np.eye(4, dtype=np.float32)
    rot = np.eye(3) if R is None else np.asarray(R)
    m[:3, :3] = rot.T / s
    m[:3, 3] = -(rot.T @ np.asarray(t, dtype=np.float32)) / s
    return jnp.asarray(m)  # world -> model


def main():
    opt = postprocess(build_parser().parse_args())
    opt.lr = opt.lr0
    print(opt)

    cfg = TensoRFConfig(bound=opt.bound, decomposition="cp",
                        resolution=128, sigma_rank=(opt.rank,),
                        color_rank=(opt.rank,))

    if opt.compose:
        # load each model, compose with per-object transforms
        from sealdnerf_tpu.models.api import Field
        fields, params_list, transforms = [], [], []
        for i, ws in enumerate(opt.compose_models or [opt.workspace]):
            f = make_tensorf_field(jax.random.PRNGKey(i), cfg)
            tr = Trainer("ccnerf", to_train_options(opt, name="ccnerf",
                                                    workspace=ws),
                         f, workspace=ws, use_checkpoint=opt.ckpt)
            fields.append(f)
            params_list.append(tr.params)
            # default arrangement like main_CCNeRF.py:127-136
            angle = 2 * np.pi * i / max(len(opt.compose_models), 1)
            transforms.append(_transform(
                0.6, [0.5 * np.cos(angle), 0, 0.5 * np.sin(angle)]))

        composed_fwd = cc_compose_forward(fields, transforms)
        viewer = Trainer("ccnerf", to_train_options(opt, name="ccnerf"),
                         fields[0], workspace=opt.workspace,
                         use_checkpoint="scratch")
        viewer.params = params_list
        viewer.field = Field(params_list, composed_fwd, None, None, None, cfg)
        viewer.update_extra_state = lambda: None
        # occupancy: union via a fresh full sweep over the composition
        from sealdnerf_tpu.render.grid import update_density_grid

        def density(params_list, x):
            s, c = composed_fwd(params_list, x,
                                jnp.tile(jnp.array([[0., 0., 1.]]),
                                         (x.shape[0], 1)))
            return s, c
        viewer.grid_state = update_density_grid(
            viewer.grid_state, params_list, density, jax.random.PRNGKey(0),
            viewer.grid_cfg, full=True)
        _, _, test = load_datasets(opt)
        viewer.test(test, save_path=os.path.join(opt.workspace, "compose"),
                    write_video=True)
        return

    field = make_tensorf_field(jax.random.PRNGKey(opt.seed), cfg)
    topt = to_train_options(opt, name="ccnerf", lr=opt.lr0, lr_net=opt.lr1,
                            k_rank_fracs=tuple(opt.rank_fracs or ()))
    trainer = Trainer("ccnerf", topt, field, metrics=[PSNRMeter()],
                      workspace=opt.workspace, use_checkpoint=opt.ckpt)
    train, val, test = load_datasets(opt)
    if opt.test:
        trainer.test(test, write_video=True)
    else:
        max_epoch = int(np.ceil(opt.iters / len(train)))
        trainer.train(train, val, max_epoch)
        trainer.test(test, write_video=True)


if __name__ == "__main__":
    main()
