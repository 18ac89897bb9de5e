"""Check the bench's center-band crop render (bench.py:_band_view)
against the same rows of a full-frame render. They must match almost
exactly for the CP-vs-NGP-oracle band comparison to be meaningful;
the r4 capture showed psnr_cp_800_band=15.58 vs full-image 28.89,
which smells like a broken crop rather than genuinely-harder rows."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import numpy as np
import jax

from sealdnerf_tpu.utils.jaxsetup import setup_jax
setup_jax()
from sealdnerf_tpu.data.synthetic import make_synthetic_scene
from sealdnerf_tpu.models.cp import CPConfig, make_cp_field
from sealdnerf_tpu.train.trainer import TrainOptions
from sealdnerf_tpu.train.fast import FastTrainer

_, train, val = make_synthetic_scene(n_train=4, n_val=1, res=128)
opt = TrainOptions(iters=200, num_rays=1024, bound=1.0, dt_gamma=0.0,
                   grid_size=64, march_res=32, n_intervals=8,
                   steps_per_interval=4, segment_steps=32,
                   workspace="/tmp/band_ws")
field = make_cp_field(jax.random.PRNGKey(0), CPConfig(bound=1.0))
tr = FastTrainer("band", opt, field, workspace="/tmp/band_ws",
                 use_checkpoint="scratch")
tr.mark_untrained_grid(train.poses, train.intrinsics)
data = train.device()
tr.train_segment(data, train.h, train.w, train.images.shape[-1],
                 len(train), 32)

full, _ = tr.render_image(val.poses[0], val.intrinsics, val.h, val.w)

r0, r1 = 48, 80
intr = np.asarray(val.intrinsics, np.float32).copy()
intr[3] -= r0
band, _ = tr.render_image(val.poses[0], intr, r1 - r0, val.w)

ref = full[r0:r1]
print("full rows stats:", ref.mean(), ref.std())
print("band stats:     ", band.mean(), band.std())
print("max abs diff:   ", np.abs(ref - band).max())
print("mean abs diff:  ", np.abs(ref - band).mean())
# where is the mismatch?
rowdiff = np.abs(ref - band).mean(axis=(1, 2))
print("per-row diff:", np.round(rowdiff, 4))
