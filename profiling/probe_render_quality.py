"""Train briefly, then sweep render configs: PSNR + ms/frame at 256px and
800px for n_intervals in {8, 16, 24}, march_res {64, 128}, vs the per-ray
oracle (render_dense)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time
import numpy as np
from sealdnerf_tpu.utils.jaxsetup import setup_jax
setup_jax()
import jax
import jax.numpy as jnp

from sealdnerf_tpu.data.synthetic import make_synthetic_scene
from sealdnerf_tpu.models.cp import CPConfig, make_cp_field
from sealdnerf_tpu.train.trainer import TrainOptions
from sealdnerf_tpu.train.fast import FastTrainer
from sealdnerf_tpu.ops.marching_dense import (DenseMarchConfig,
                                              downsample_occ)
from sealdnerf_tpu.render.fast_image import render_image_tiled
from sealdnerf_tpu.render.fast import render_dense
from sealdnerf_tpu.ops.pallas_field import make_fused_forward_planar
from sealdnerf_tpu.data.rays import get_rays

_, train, val = make_synthetic_scene(n_train=24, n_val=2, res=256)
opt = TrainOptions(iters=1200, num_rays=4096, bound=1.0, dt_gamma=0.0,
                   grid_size=128, march_res=64, n_intervals=16,
                   steps_per_interval=4, segment_steps=128,
                   workspace="/tmp/prq", update_extra_interval=16)
cfg = CPConfig(bound=1.0)
field = make_cp_field(jax.random.PRNGKey(0), cfg)
tr = FastTrainer("q", opt, field, workspace="/tmp/prq",
                 use_checkpoint="scratch")
tr.mark_untrained_grid(train.poses, train.intrinsics)
data = train.device()
h, w, c, n = train.h, train.w, train.images.shape[-1], len(train)
t0 = time.time()
tr.train_segment(data, h, w, c, n, 256)
for _ in range(7):
    tr.train_segment(data, h, w, c, n, 128)
print(f"trained 1152 steps in {time.time()-t0:.1f}s", flush=True)

params = tr._infer_params()
gt = val.images[0][..., :3] * val.images[0][..., 3:] + \
    (1 - val.images[0][..., 3:])
pose = jnp.asarray(val.poses[0], jnp.float32)
fwd_planar = make_fused_forward_planar(cfg)


def psnr(img):
    return -10 * np.log10(np.mean((np.asarray(img) - gt) ** 2))


def bench_render(rcfg, tp, dil, rh, label, n_rep=3):
    occ_m = downsample_occ(tr.grid_state["occ"][0], rcfg.march_res)
    intr = jnp.asarray(val.intrinsics, jnp.float32) * (rh / val.h)

    @jax.jit
    def f(params, occ_m, pose, intr):
        return render_image_tiled(params, occ_m, pose, intr, rh, rh, rcfg,
                                  fwd_planar, jnp.ones(3), tile_px=tp,
                                  dilate=dil, planar=True)

    img, dep = f(params, occ_m, pose, intr)
    jax.block_until_ready(img)
    t0 = time.perf_counter()
    for _ in range(n_rep):
        img, dep = f(params, occ_m, pose, intr)
    jax.block_until_ready(img)
    ms = (time.perf_counter() - t0) / n_rep * 1e3
    p = psnr(np.clip(np.asarray(img), 0, 1)) if rh == 256 else float("nan")
    print(f"{label:46s} {ms:8.1f} ms  PSNR(256)={p:.2f}", flush=True)


# per-ray oracle at 256
mc = tr.march_cfg
occ_m = downsample_occ(tr.grid_state["occ"][0], mc.march_res)
rays = get_rays(jax.random.PRNGKey(0), pose[None],
                jnp.asarray(val.intrinsics), 256, 256, -1)


@jax.jit
def oracle(params, occ_m):
    res = render_dense(params, occ_m, rays["rays_o"][0], rays["rays_d"][0],
                       mc, field.forward, bg_color=jnp.ones(3))
    return jnp.clip(res["image"], 0, 1)


img_o = oracle(params, occ_m)
print(f"oracle per-ray 256px: PSNR={psnr(img_o.reshape(256,256,3)):.2f}",
      flush=True)

for ni in (16, 24):
    rcfg = DenseMarchConfig(bound=1.0, march_res=64, n_intervals=ni,
                            steps_per_interval=4)
    bench_render(rcfg, 8, 1, 256, f"tiled 256 m64 iv{ni} F4 d1")
rcfg = DenseMarchConfig(bound=1.0, march_res=128, n_intervals=12,
                        steps_per_interval=2)
bench_render(rcfg, 8, 1, 256, "tiled 256 m128 iv12 F2 d1")

for ni in (8, 16):
    rcfg = DenseMarchConfig(bound=1.0, march_res=64, n_intervals=ni,
                            steps_per_interval=4)
    bench_render(rcfg, 8, 1, 800, f"tiled 800 m64 iv{ni} F4 d1")
rcfg = DenseMarchConfig(bound=1.0, march_res=128, n_intervals=12,
                        steps_per_interval=2)
bench_render(rcfg, 8, 1, 800, "tiled 800 m128 iv12 F2 d1")
