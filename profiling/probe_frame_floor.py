"""Per-frame render timing variance + pure dispatch/fetch floor."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time
import numpy as np
from sealdnerf_tpu.utils.jaxsetup import setup_jax
setup_jax()
import jax, jax.numpy as jnp
from sealdnerf_tpu.data.synthetic import make_synthetic_scene
from sealdnerf_tpu.models.cp import CPConfig, make_cp_field
from sealdnerf_tpu.train.trainer import TrainOptions
from sealdnerf_tpu.train.fast import FastTrainer

_, train, val = make_synthetic_scene(n_train=24, n_val=6, res=256)
opt = TrainOptions(iters=1300, num_rays=4096, bound=1.0, dt_gamma=0.0,
                   grid_size=128, march_res=64, n_intervals=16,
                   steps_per_interval=4, segment_steps=128,
                   workspace="/tmp/ff", update_extra_interval=16)
field = make_cp_field(jax.random.PRNGKey(0), CPConfig(bound=1.0))
tr = FastTrainer("ff", opt, field, workspace="/tmp/ff",
                 use_checkpoint="scratch")
tr.mark_untrained_grid(train.poses, train.intrinsics)
data = train.device()
h, w, c, n = train.h, train.w, train.images.shape[-1], len(train)
tr.train_segment(data, h, w, c, n, 256)
tr.train_segment(data, h, w, c, n, 128)
print("trained", flush=True)

# dispatch+fetch floor: trivial kernel producing [800,800,4]
@jax.jit
def dummy(cam):
    return jnp.zeros((800, 800, 4), jnp.float32) + cam[0]

dummy(jnp.zeros(24)); 
ts = []
for i in range(10):
    t0 = time.perf_counter()
    np.asarray(dummy(jnp.full(24, float(i))))
    ts.append((time.perf_counter()-t0)*1e3)
print("dummy 800x800x4 unique-arg:", [f"{t:.0f}" for t in ts], flush=True)

intr8 = np.asarray(val.intrinsics) * (800 / val.h)
tr.render_image(val.poses[0], intr8, 800, 800)  # compile
for tag, posesel in (("unique", lambda i: val.poses[i % 6]),
                     ("same", lambda i: val.poses[0])):
    ts = []
    for i in range(12):
        t0 = time.perf_counter()
        tr.render_image(posesel(i), intr8, 800, 800)
        ts.append((time.perf_counter()-t0)*1e3)
    print(f"render800 {tag}: {[f'{t:.0f}' for t in ts]}", flush=True)
