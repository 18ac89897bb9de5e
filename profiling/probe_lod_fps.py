import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# Preview-tier 800px FPS with and without the mip-LOD kernel, after a
# short training run to get a realistic sparse occupancy.
import time, numpy as np, jax, jax.numpy as jnp
from concurrent.futures import ThreadPoolExecutor
from sealdnerf_tpu.data.synthetic import make_synthetic_scene
from sealdnerf_tpu.models.cp import CPConfig, make_cp_field
from sealdnerf_tpu.train.trainer import TrainOptions
from sealdnerf_tpu.train.fast import FastTrainer

_, train, val = make_synthetic_scene(n_train=24, n_val=2, res=256, hard=True)
opt = TrainOptions(iters=4000, num_rays=4096, bound=1.0, dt_gamma=0.0,
                   grid_size=128, march_res=64, n_intervals=16,
                   steps_per_interval=4, segment_steps=128,
                   workspace="/tmp/lod_ws")
field = make_cp_field(jax.random.PRNGKey(0), CPConfig(bound=1.0))
tr = FastTrainer("lod", opt, field, workspace="/tmp/lod_ws",
                 use_checkpoint="scratch")
tr.mark_untrained_grid(train.poses, train.intrinsics)
data = train.device()
h, w, c, n = train.h, train.w, train.images.shape[-1], len(train)
print("[lod] training 1024 steps...", file=sys.stderr, flush=True)
while tr.global_step < 1024:
    m = tr.train_segment(data, h, w, c, n, 128)
_ = float(m["loss"])

pool = ThreadPoolExecutor(8)
def fps(pack, rh=800, n_frames=16):
    intr = val.intrinsics * (rh / val.h)
    tr.render_image_async(val.poses[0], intr, rh, rh, pack=pack).get()
    def one(i):
        return tr.render_image_async(val.poses[i % len(val)],
                                     intr * (1 + 1e-4 * i), rh, rh,
                                     pack=pack).get()
    rates = []
    for b in range(8):
        t0 = time.perf_counter()
        list(pool.map(one, range(300 + n_frames * b, 300 + n_frames * (b + 1))))
        if b >= 3:
            rates.append(n_frames / (time.perf_counter() - t0))
    return sorted(rates)[-2]

# preview pack now rides the LOD kernel; yuv420 is the full-fidelity tier
print(f"preview(LOD) 800px: {fps('preview'):.2f} FPS")
tr.opt = opt.__class__(**{**opt.__dict__, "preview_lod_min_res": 0})
tr._fwd_render = None; tr._renderers = {}
print(f"preview(full) 800px: {fps('preview'):.2f} FPS")
tr.opt = opt.__class__(**{**opt.__dict__, "preview_lod_min_res": 512})
tr._fwd_render = None; tr._renderers = {}
print(f"preview(LOD>=512) 800px: {fps('preview'):.2f} FPS")
# quality check: LOD render vs full render PSNR on a val pose
tr.opt = opt.__class__(**{**opt.__dict__, "preview_lod_min_res": 1024})
tr._fwd_render = None; tr._renderers = {}
img_l, _ = tr.render_image_async(val.poses[0], val.intrinsics * (800/val.h), 800, 800, pack="preview").get()
tr.opt = opt.__class__(**{**opt.__dict__, "preview_lod_min_res": 0})
tr._fwd_render = None; tr._renderers = {}
img_f, _ = tr.render_image_async(val.poses[0], val.intrinsics * (800/val.h), 800, 800, pack="preview").get()
mse = float(np.mean((img_l - img_f) ** 2))
print(f"LOD(1024) vs full preview: psnr {-10*np.log10(max(mse,1e-10)):.2f} dB")
