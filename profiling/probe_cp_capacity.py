"""Probe: CP field capacity vs quality on the hard anchor scene.

BENCH_r03-era numbers: CP 21.25 PSNR @ 800 steps vs the NGP oracle's
27.73 on the same scene/recipe -- a 6.5 dB representation gap. The CP
rank plays the hash-table-size role, and the fused Pallas kernels are
generic over cfg.scales, so this probe sweeps (res, rank) pyramids
through the real FastTrainer fast path and reports PSNR @ 800 / 2000
steps plus steady-state throughput, to find the best quality-per-cost
upgrade before touching the architecture.

Run: python profiling/probe_cp_capacity.py [variant ...]
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import numpy as np

from sealdnerf_tpu.utils.jaxsetup import setup_jax
setup_jax()

import jax  # noqa: E402

from sealdnerf_tpu.data.synthetic import make_synthetic_scene  # noqa: E402
from sealdnerf_tpu.models.cp import CPConfig, make_cp_field  # noqa: E402
from sealdnerf_tpu.train.trainer import TrainOptions  # noqa: E402
from sealdnerf_tpu.train.fast import FastTrainer  # noqa: E402


BASE = ((32, 32), (128, 48), (512, 64), (1024, 64))
R128 = ((32, 32), (128, 64), (512, 128), (1024, 128))

# name -> (scales, planes)
VARIANTS = {
    "base": (BASE, ()),
    "r96": (((32, 32), (128, 64), (512, 96), (1024, 96)), ()),
    "r128": (R128, ()),
    "s2048": (BASE + ((2048, 48),), ()),
    "r128s2048": (R128 + ((2048, 64),), ()),
    "r192": (((32, 32), (128, 96), (512, 192), (1024, 192)), ()),
    # VM plane-line variants (TensoRF-VM style; the CP rank sweep
    # saturates at ~24-25 PSNR while the NGP oracle hits 27.7 -- the
    # axis-aligned degeneracy, see models/cp.py)
    "vm128": (BASE, ((128, 8),)),
    "vm128x2": (BASE, ((64, 16), (128, 8))),
    "vm256": (BASE, ((128, 8), (256, 4))),
    "vm256r128": (R128, ((128, 8), (256, 4))),
}


def _psnr(img, gtimg):
    gt = gtimg[..., :3] * gtimg[..., 3:] + (1 - gtimg[..., 3:])
    return -10 * np.log10(max(np.mean((np.clip(img, 0, 1) - gt) ** 2),
                              1e-10))


def run(name, spec):
    scales, planes = spec
    _, train, val = make_synthetic_scene(n_train=24, n_val=2, res=256,
                                         hard=True)
    opt = TrainOptions(iters=4000, num_rays=4096, bound=1.0, dt_gamma=0.0,
                       grid_size=128, march_res=64, n_intervals=16,
                       steps_per_interval=4, segment_steps=128,
                       workspace=f"/tmp/probe_cap_{name}")
    field = make_cp_field(jax.random.PRNGKey(0),
                          CPConfig(bound=1.0, scales=scales, planes=planes))
    tr = FastTrainer(name, opt, field, workspace=opt.workspace,
                     use_checkpoint="scratch")
    tr.mark_untrained_grid(train.poses, train.intrinsics)
    data = train.device()
    h, w, c, n = train.h, train.w, train.images.shape[-1], len(train)
    tr.train_segment(data, h, w, c, n, 256)        # warmup + compile
    m = tr.train_segment(data, h, w, c, n, 128)
    _ = float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(2):
        m = tr.train_segment(data, h, w, c, n, 128)
    _ = float(m["loss"])
    rate = 256 * opt.num_rays / (time.perf_counter() - t0)

    def val_psnr():
        img, _ = tr.render_image(val.poses[0], val.intrinsics, val.h, val.w)
        return _psnr(img, val.images[0])

    while tr.global_step < 768:
        tr.train_segment(data, h, w, c, n, 128)
    tr.train_segment(data, h, w, c, n, 128)        # -> 896 >= 800
    p800 = val_psnr()
    while tr.global_step < 2048:
        tr.train_segment(data, h, w, c, n, 128)
    p2000 = val_psnr()
    print(f"[cap] {name:10s} scales={scales} planes={planes} "
          f"rate={rate:9.0f} rays/s "
          f"PSNR@800={p800:5.2f} PSNR@2048={p2000:5.2f}",
          file=sys.stderr, flush=True)
    return dict(name=name, rate=rate, p800=p800, p2000=p2000)


if __name__ == "__main__":
    names = sys.argv[1:] or list(VARIANTS)
    out = [run(nm, VARIANTS[nm]) for nm in names]
    for r in out:
        print(r)
