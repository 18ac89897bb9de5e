"""TensoRF training CLI (reference main_tensoRF.py; the backing tensoRF
package is missing from the reference snapshot -- rebuilt from its API
surface): CP/VM decompositions, separate embedding/network LRs (--lr0/--lr1),
L1 factor regularization, progressive grid upsampling at
--upsample_model_steps (resolution0 -> resolution1 on a log schedule)."""

import numpy as np

from sealdnerf_tpu.utils.jaxsetup import setup_jax
setup_jax()
import jax

from sealdnerf_tpu.cli import base_parser, postprocess, to_train_options, \
    load_datasets
from sealdnerf_tpu.models.tensorf import TensoRFConfig, make_tensorf_field, \
    upsample_tensorf, tensorf_l1_reg
from sealdnerf_tpu.train.metrics import PSNRMeter
from sealdnerf_tpu.train.trainer import Trainer


def build_parser():
    parser = base_parser(default_bound=2.0, default_lr=2e-2)
    parser.add_argument("--lr0", type=float, default=2e-2,
                        help="embedding lr")
    parser.add_argument("--lr1", type=float, default=1e-3, help="network lr")
    parser.add_argument("--l1_reg_weight", type=float, default=1e-4)
    parser.add_argument("--cp", action="store_true", help="use TensorCP")
    parser.add_argument("--resolution0", type=int, default=128)
    parser.add_argument("--resolution1", type=int, default=300)
    parser.add_argument("--upsample_model_steps", type=int, action="append",
                        default=[2000, 3000, 4000, 5500, 7000])
    return parser


class TensoRFTrainer(Trainer):
    """Adds progressive upsampling + rebuilds the jitted step on resize."""

    def __init__(self, *a, upsample_steps=(), resolution1=300, **kw):
        super().__init__(*a, **kw)
        self.upsample_model_steps = sorted(set(upsample_steps))
        self.resolution1 = resolution1
        if self.upsample_model_steps:
            r0 = self.field.cfg.resolution
            n = len(self.upsample_model_steps)
            self.upsample_resolutions = [
                int(round(np.exp(np.log(r0) + (np.log(resolution1)
                                               - np.log(r0)) * (i + 1) / n)))
                for i in range(n)]
        else:
            self.upsample_resolutions = []

    def train_step(self, *a, **kw):
        if self.upsample_model_steps and \
                self.global_step == self.upsample_model_steps[0]:
            self.upsample_model_steps.pop(0)
            new_res = self.upsample_resolutions.pop(0)
            self.log(f"[INFO] upsample TensoRF grids -> {new_res}^3 at step "
                     f"{self.global_step}")
            new_params, new_cfg = upsample_tensorf(self.params,
                                                   self.field.cfg, new_res)
            from sealdnerf_tpu.models.tensorf import make_tensorf_field
            field = make_tensorf_field(jax.random.PRNGKey(0), new_cfg)
            field.params = new_params
            self.field = field
            self.params = new_params
            self.ema_params = jax.tree_util.tree_map(lambda x: x.copy(),
                                                     new_params)
            self.opt_state = self.tx.init(self.params)
            self._train_sig = None  # force step rebuild
        return super().train_step(*a, **kw)


def main():
    opt = postprocess(build_parser().parse_args())
    opt.lr = opt.lr0
    print(opt)

    cfg = TensoRFConfig(bound=opt.bound,
                        decomposition="cp" if opt.cp else "vm",
                        resolution=opt.resolution0,
                        sigma_rank=(32,) if opt.cp else (16, 16, 16),
                        color_rank=(32,) if opt.cp else (48, 48, 48))
    field = make_tensorf_field(jax.random.PRNGKey(opt.seed), cfg)
    topt = to_train_options(opt, name="tensorf", lr=opt.lr0, lr_net=opt.lr1)
    trainer = TensoRFTrainer("tensorf", topt, field,
                             metrics=[PSNRMeter()], workspace=opt.workspace,
                             use_checkpoint=opt.ckpt,
                             upsample_steps=opt.upsample_model_steps,
                             resolution1=opt.resolution1)
    train, val, test = load_datasets(opt)
    if opt.test:
        if test.images is not None:
            trainer.evaluate(test)
        trainer.test(test, write_video=True)
    else:
        max_epoch = int(np.ceil(opt.iters / len(train)))
        trainer.train(train, val, max_epoch)
        if test.images is not None:
            trainer.evaluate(test)
        trainer.test(test, write_video=True)


if __name__ == "__main__":
    main()
