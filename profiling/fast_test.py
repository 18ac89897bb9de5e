import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np, time

from sealdnerf_tpu.data.synthetic import make_synthetic_scene
from sealdnerf_tpu.models.cp import CPConfig, make_cp_field
from sealdnerf_tpu.train.trainer import TrainOptions
from sealdnerf_tpu.train.fast import FastTrainer

_, train, val = make_synthetic_scene(n_train=8, n_val=1, res=64)
opt = TrainOptions(iters=400, num_rays=512, bound=1.0, dt_gamma=0.0,
                   grid_size=64, march_res=32, n_intervals=8,
                   steps_per_interval=4, segment_steps=64,
                   workspace="/tmp/fast_ws", update_extra_interval=16)
cfg = CPConfig(bound=1.0, scales=((16, 16), (64, 32), (256, 32)))
field = make_cp_field(jax.random.PRNGKey(0), cfg)
tr = FastTrainer("fast", opt, field, workspace="/tmp/fast_ws",
                 use_checkpoint="scratch")
tr.mark_untrained_grid(train.poses, train.intrinsics)
data = train.device()
h, w, c, n = train.h, train.w, train.images.shape[-1], len(train)

t0 = time.time()
m = tr.train_segment(data, h, w, c, n, 64)
print("seg1 (warmup) loss:", float(m["loss"]), "nsamp:", int(m["n_samples"]),
      f"{time.time()-t0:.1f}s")
for i in range(4):
    m = tr.train_segment(data, h, w, c, n, 64)
    print(f"seg{i+2} loss:", float(m["loss"]), "iter_density:",
          int(tr.grid_state["iter_density"]))
img, depth = tr.render_image(val.poses[0], val.intrinsics, val.h, val.w)
gt = val.images[0][..., :3] * val.images[0][..., 3:] + (1 - val.images[0][..., 3:])
mse = float(np.mean((img - gt) ** 2))
print("eval PSNR:", -10 * np.log10(mse))
