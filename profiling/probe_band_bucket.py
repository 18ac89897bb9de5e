"""Band-crop parity for BOTH renderer variants (bucketed and plain).

probe_band_crop.py showed the plain tile renderer's band crop is exact;
the bench's psnr_cp_800_band=15.58 vs full 28.89 is mathematically
impossible for a correct crop (the band is 1/4 of the rows, so full
PSNR <= band + 6 dB). Mid-training the bench flips to the bucketed
variant (_use_buckets()) -- test that one on the band shape too.
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import numpy as np
import jax
import jax.numpy as jnp

from sealdnerf_tpu.utils.jaxsetup import setup_jax
setup_jax()
from sealdnerf_tpu.data.synthetic import make_synthetic_scene
from sealdnerf_tpu.models.cp import CPConfig, make_cp_field
from sealdnerf_tpu.train.trainer import TrainOptions
from sealdnerf_tpu.train.fast import FastTrainer

_, train, val = make_synthetic_scene(n_train=4, n_val=1, res=128)
opt = TrainOptions(iters=400, num_rays=1024, bound=1.0, dt_gamma=0.0,
                   grid_size=64, march_res=32, n_intervals=8,
                   steps_per_interval=4, segment_steps=32,
                   workspace="/tmp/bandb_ws")
field = make_cp_field(jax.random.PRNGKey(0), CPConfig(bound=1.0))
tr = FastTrainer("bandb", opt, field, workspace="/tmp/bandb_ws",
                 use_checkpoint="scratch")
tr.mark_untrained_grid(train.poses, train.intrinsics)
data = train.device()
for _ in range(6):
    tr.train_segment(data, train.h, train.w, train.images.shape[-1],
                     len(train), 32)
occ_frac = float(jnp.mean(tr.grid_state["occ"].astype(jnp.float32)))
print("occ fraction:", occ_frac, "use_buckets:", tr._use_buckets())

r0, r1 = 48, 80
intr_b = np.asarray(val.intrinsics, np.float32).copy()
intr_b[3] -= r0

params = tr._infer_params()
tp = opt.render_tile_px


def render(rh, rw, intr, buckets):
    key = (rh, rw, tp, buckets, "rgb8")
    if key not in tr._renderers:
        tr._renderers[key] = tr._build_renderer(rh, rw, tp, buckets=buckets)
    cam = np.empty(24, np.float32)
    cam[:16] = np.asarray(val.poses[0], np.float32).reshape(-1)[:16]
    cam[16:20] = intr
    cam[20:23] = 1.0
    cam[23] = 0.0
    out = tr._renderers[key](params, tr.grid_state["occ"], jnp.asarray(cam))
    return tr._unpack_frame(np.asarray(out))[0]


for buckets in (False, True):
    full = render(val.h, val.w, np.asarray(val.intrinsics, np.float32),
                  buckets)
    band = render(r1 - r0, val.w, intr_b, buckets)
    ref = full[r0:r1]
    d = np.abs(ref - band)
    print(f"buckets={buckets}: max {d.max():.5f} mean {d.mean():.6f}")
    if d.max() > 0.02:
        rowdiff = d.mean(axis=(1, 2))
        print("  per-row diff:", np.round(rowdiff, 4))
