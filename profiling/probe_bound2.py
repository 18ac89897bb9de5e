"""bound>1 cascade fast-path convergence probe (VERDICT r2 missing #2).

Trains the CP field at --bound 2 --dt_gamma 1/128 on the synthetic scene
through FastTrainer's cascade dense march and reports loss, per-cascade
occupancy, and val PSNR.

Usage: python profiling/probe_bound2.py [n_intervals_base] [n_segments]

Measured on the axon TPU (2026-08-17), 40-step segments, 512 rays,
march_res=32, steps_per_interval=3 (n_intervals below is the EFFECTIVE
slot count; FastTrainer now scales the base by `cascades`):
  ni=16, 1600 steps: 11.93 PSNR  (slot starvation: the coarse ladder
                                  exhausts its 16 slots in near-camera
                                  fog before reaching geometry)
  ni=32,  400 steps: 18.33 PSNR
  ni=32, 1600 steps: 25.56 PSNR, occ [2.8%, 0.4%] per cascade
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import numpy as np

from sealdnerf_tpu.data.synthetic import make_synthetic_scene
from sealdnerf_tpu.models.cp import CPConfig, make_cp_field
from sealdnerf_tpu.train.trainer import TrainOptions
from sealdnerf_tpu.train.fast import FastTrainer

ni = int(_sys.argv[1]) if len(_sys.argv) > 1 else 16
nseg = int(_sys.argv[2]) if len(_sys.argv) > 2 else 40
_, train, val = make_synthetic_scene(n_train=6, n_val=1, res=64)
opt = TrainOptions(iters=40 * nseg, num_rays=512, bound=2.0,
                   dt_gamma=1 / 128, grid_size=64, march_res=32,
                   n_intervals=ni, steps_per_interval=3, segment_steps=40,
                   update_extra_interval=4, workspace="/tmp/b2p",
                   min_near=0.05)
field = make_cp_field(jax.random.PRNGKey(0), CPConfig(bound=2.0))
tr = FastTrainer("b2", opt, field, workspace="/tmp/b2p",
                 use_checkpoint="scratch")
tr.mark_untrained_grid(train.poses, train.intrinsics)
data = train.device()
h, w, c, n = train.h, train.w, train.images.shape[-1], len(train)
for i in range(nseg):
    m = tr.train_segment(data, h, w, c, n, 40)
occ = np.asarray(tr.grid_state["occ"])
print("ni_eff", tr.march_cfg.n_intervals, "nseg", nseg,
      "loss", round(float(m["loss"]), 5),
      "occ", [round(float(occ[cas].mean()), 4) for cas in range(occ.shape[0])])
img, _ = tr.render_image(val.poses[0], val.intrinsics, val.h, val.w)
g = val.images[0]
gt = g[..., :3] * g[..., 3:] + (1 - g[..., 3:])
psnr = -10 * np.log10(max(np.mean((np.clip(img, 0, 1) - gt) ** 2), 1e-10))
print("PSNR:", round(psnr, 2))
