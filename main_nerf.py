"""Static Instant-NGP training CLI.

Drop-in equivalent of reference main_nerf.py (flags at main_nerf.py:15-75,
flow at :89-160): build the NGP field, train with MSE + Adam + 0.1**(t/iters)
schedule, eval PSNR, render a test video, export a mesh.

Use `python main_nerf.py synthetic -O ...` to train against the procedural
scene when no dataset is on disk.
"""

import numpy as np

from sealdnerf_tpu.utils.jaxsetup import setup_jax
setup_jax()
import jax

from sealdnerf_tpu.cli import base_parser, postprocess, load_datasets, \
    build_trainer
from sealdnerf_tpu.train.metrics import PSNRMeter, LPIPSMeter


def main():
    opt = postprocess(base_parser().parse_args())
    print(opt)
    metrics = [PSNRMeter(), LPIPSMeter()]

    if opt.test:
        trainer, _ = build_trainer(opt, name="ngp", metrics=metrics)
        if opt.gui:
            from sealdnerf_tpu.gui.nerf_gui import NeRFGUI
            NeRFGUI(opt, trainer).render()
        else:
            _, _, test = load_datasets(opt)
            if test.images is not None:
                trainer.evaluate(test)
            trainer.test(test, write_video=True)
            trainer.save_mesh(resolution=256, threshold=10)
    else:
        trainer, _ = build_trainer(opt, name="ngp", metrics=metrics)
        train, val, test = load_datasets(opt)
        if opt.gui:
            from sealdnerf_tpu.gui.nerf_gui import NeRFGUI
            NeRFGUI(opt, trainer, train_dataset=train).render()
        else:
            max_epoch = int(np.ceil(opt.iters / len(train)))
            trainer.train(train, val, max_epoch)
            if test.images is not None:
                trainer.evaluate(test)
            trainer.test(test, write_video=True)
            trainer.save_mesh(resolution=256, threshold=10)


if __name__ == "__main__":
    main()
