"""Dynamic D-NeRF training CLI.

Drop-in equivalent of reference main_dnerf.py: adds --lr_net (separate MLP
learning rate), --basis / --hyper network variants, defaults iters=300000,
lr=5e-4 (main_dnerf.py:23-41); update_extra_interval defaults to 16
here (not the reference's 100) -- see the in-file note.
"""

import numpy as np

from sealdnerf_tpu.utils.jaxsetup import setup_jax
setup_jax()
import jax

from sealdnerf_tpu.cli import base_parser, postprocess, load_datasets, \
    build_trainer
from sealdnerf_tpu.train.metrics import PSNRMeter


def build_parser():
    # lr defaults are backbone-aware (resolved in main): the reference's
    # 5e-4/5e-4 serves the hash backbone (--backbone ngp); the flagship
    # CP/VM field trains at 1e-2 tables / 1e-3 MLPs (the hat-matmul
    # tables play the hash-table role and want the reference's
    # table-lr-class value; measured on the dynamic bench).
    parser = base_parser(default_bound=2.0, default_lr=None,
                         default_iters=300000)
    parser.add_argument("--lr_net", type=float, default=None)
    parser.add_argument("--basis", action="store_true",
                        help="temporal-basis dynamic model")
    parser.add_argument("--hyper", action="store_true",
                        help="hyper-nerf ambient-dim dynamic model")
    # reference uses 100 (main_dnerf.py:30) for its 1-in-S resample
    # refresh; our round-robin bin refresh needs the denser default 16
    # cadence or the time-sliced occupancy goes stale (14.9 vs 21.1
    # PSNR @ step 1024, profiling/probe_dyn_interval.py)
    parser.set_defaults(update_extra_interval=16)
    # progressive time window (D-NeRF paper schedule). -1 = auto,
    # resolved from the data shape (FastTrainer.resolve_time_curriculum):
    # 512 on monocular data (one camera per timestamp, the reference
    # D-NeRF datasets' actual shape) where it is load-bearing -- without
    # it training peaks ~17.5 PSNR then decays; with a 512-step window
    # it reaches 21.6 (bench-validated). OFF on multi-view-per-time data
    # where the same window is high-variance without reliable gain
    # (bench.py dyn3view note). 0 disables; >0 forces a window length.
    parser.add_argument("--time_curriculum_steps", type=int, default=-1,
                        help="-1 auto (512 if monocular, else off); "
                             "0 off; >0 window length in steps")
    return parser


def main():
    opt = postprocess(build_parser().parse_args())
    cp_route = (opt.backbone == "cp"
                or (opt.backbone == "auto" and opt.bg_radius <= 0
                    and opt.bound <= 1.0 and not (opt.basis or opt.hyper)))
    if opt.lr is None:
        opt.lr = 1e-2 if cp_route else 5e-4
    if opt.lr_net is None:
        opt.lr_net = 1e-3 if cp_route else 5e-4
    print(opt)
    trainer, field = build_trainer(opt, name="ngp", dynamic=True,
                                   metrics=[PSNRMeter()],
                                   lr_net=opt.lr_net)
    if opt.test:
        if opt.gui:
            from sealdnerf_tpu.gui.dnerf_gui import DNeRFGUI
            DNeRFGUI(opt, trainer).render()
        else:
            _, _, test = load_datasets(opt, with_time=True)
            if test.images is not None:
                trainer.evaluate(test)
            trainer.test(test, write_video=True)
    else:
        train, val, test = load_datasets(opt, with_time=True)
        if opt.gui:
            from sealdnerf_tpu.gui.dnerf_gui import DNeRFGUI
            DNeRFGUI(opt, trainer, train_dataset=train).render()
        else:
            max_epoch = int(np.ceil(opt.iters / len(train)))
            trainer.train(train, val, max_epoch)
            if test.images is not None:
                trainer.evaluate(test)
            trainer.test(test, write_video=True)


if __name__ == "__main__":
    main()
