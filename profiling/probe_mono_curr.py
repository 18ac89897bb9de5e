"""Probe: monocular dynamic recipe tuning on the real TPU.

Round-3 driver log: mono (no curriculum) peaked 17.54 @ 768 then decayed
to ~14.5-15. With time_curriculum_steps=1536 the run is stable and
monotone but plateaus ~18.3 (BENCH r4 in-session run). Sweep curriculum
length x freeze-horizon shift to find the config that clears 20 PSNR by
step 4096 (VERDICT r4 task 3 target).
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
from sealdnerf_tpu.models.cp import CPDNeRFConfig, make_cp_dnerf_field  # noqa: E402
from sealdnerf_tpu.train.trainer import TrainOptions  # noqa: E402
from sealdnerf_tpu.train.fast import FastTrainer  # noqa: E402


def _psnr(img, gtimg):
    gt = gtimg[..., :3] * gtimg[..., 3:] + (1 - gtimg[..., 3:])
    return -10 * np.log10(max(np.mean((np.clip(img, 0, 1) - gt) ** 2),
                              1e-10))


def run(curr, label, max_steps=4096, anneal=None, views=1):
    _, train, val = make_synthetic_scene(n_train=36, n_val=4, res=256,
                                         dynamic=True, views_per_time=views)
    kw = dict(iters=max_steps + 1000, num_rays=4096, bound=1.0,
              dt_gamma=0.0, grid_size=128, march_res=64, n_intervals=16,
              steps_per_interval=4, segment_steps=128,
              update_extra_interval=16, lr=1e-2, lr_net=1e-3,
              time_curriculum_steps=curr,
              workspace=f"/tmp/probe_mono_{label}")
    if anneal is not None:
        kw["dyn_anneal_steps"] = anneal
    opt = TrainOptions(**kw)
    field = make_cp_dnerf_field(jax.random.PRNGKey(0),
                                CPDNeRFConfig(bound=1.0))
    tr = FastTrainer(f"mono_{label}", opt, field, workspace=opt.workspace,
                     use_checkpoint="scratch", time_conditioned=True)
    if curr > 0:
        train = tr.enable_time_curriculum(train)
    tr.mark_untrained_grid(train.poses, train.intrinsics)
    data = train.device()
    h, w, c, n = train.h, train.w, train.images.shape[-1], len(train)
    tr.train_segment(data, h, w, c, n, 128)

    def val_psnr():
        return float(np.mean([
            _psnr(tr.render_image(val.poses[i], val.intrinsics, val.h,
                                  val.w, time=val.times[i])[0],
                  val.images[i]) for i in range(len(val))]))

    val_psnr()  # warm eval renderers
    best = 0.0
    t0 = time.perf_counter()
    while tr.global_step < max_steps:
        for _ in range(4):
            tr.train_segment(data, h, w, c, n, 128)
        p = val_psnr()
        best = max(best, p)
        print(f"[{label}] step {tr.global_step}: {p:.2f} (best {best:.2f},"
              f" {time.perf_counter()-t0:.0f}s)", file=sys.stderr,
              flush=True)
    return best


if __name__ == "__main__":
    import json
    # argv: [curr[:anneal[:views]], ...]; default = the round-4 set
    specs = sys.argv[1:] or ["768", "2048", "1536:2048"]
    results = {}
    for spec in specs:
        parts = spec.split(":")
        curr = int(parts[0])
        anneal = int(parts[1]) if len(parts) > 1 and parts[1] else None
        views = int(parts[2]) if len(parts) > 2 else 1
        label = f"c{curr}" + (f"a{anneal}" if anneal else "") + \
            (f"v{views}" if views != 1 else "")
        results[label] = run(curr, label, anneal=anneal, views=views)
        print(json.dumps(results), flush=True)
