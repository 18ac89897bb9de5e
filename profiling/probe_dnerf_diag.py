"""Train 4k dyn steps; inspect learned deform vs analytic; oracle render."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time
import numpy as np
from sealdnerf_tpu.utils.jaxsetup import setup_jax
setup_jax()
import jax, jax.numpy as jnp
from sealdnerf_tpu.data.synthetic import make_synthetic_scene
from sealdnerf_tpu.models.cp import (CPDNeRFConfig, make_cp_dnerf_field,
                                     cp_dnerf_deform)
from sealdnerf_tpu.train.trainer import TrainOptions
from sealdnerf_tpu.train.fast import FastTrainer

_, train, val = make_synthetic_scene(n_train=36, n_val=4, res=256,
                                     dynamic=True, views_per_time=3)
opt = TrainOptions(iters=4200, num_rays=4096, bound=1.0, dt_gamma=0.0,
                   grid_size=128, march_res=64, n_intervals=16,
                   steps_per_interval=4, segment_steps=128,
                   update_extra_interval=16, workspace="/tmp/dyndiag",
                   lr=1e-2, lr_net=1e-3)
cfg = CPDNeRFConfig(bound=1.0)
field = make_cp_dnerf_field(jax.random.PRNGKey(0), cfg)
tr = FastTrainer("dyn", opt, field, workspace="/tmp/dyndiag",
                 use_checkpoint="scratch", time_conditioned=True)
tr.mark_untrained_grid(train.poses, train.intrinsics)
data = train.device()
h, w, c, n = train.h, train.w, train.images.shape[-1], len(train)
while tr.global_step < 4096:
    m = tr.train_segment(data, h, w, c, n, 128)
print("trained, loss", float(m["loss"]), flush=True)
params = tr._infer_params()

# learned deform at sphere-0 center for several times vs analytic
amp = 0.25
for t in (0.25, 0.5, 0.75):
    ct = np.array([0 + amp * 0.5 * np.cos(2 * np.pi * t),
                   0.1 + amp * np.sin(2 * np.pi * t), 0.0])
    c0 = np.array([amp * 0.5, 0.1, 0.0])
    want = c0 - ct
    got = np.asarray(cp_dnerf_deform(params, cfg,
                                     jnp.asarray(ct[None], jnp.float32),
                                     float(t)))[0]
    print(f"t={t}: want dx={want.round(3)} got={got.round(3)}", flush=True)

# oracle render (uniform sampling, no occupancy) at val view 1
from sealdnerf_tpu.render.renderer import RenderSettings, render_uniform
from sealdnerf_tpu.data.rays import get_rays
i = 1
settings = tr.settings
rays = get_rays(jax.random.PRNGKey(0),
                jnp.asarray(val.poses[i])[None],
                jnp.asarray(val.intrinsics), val.h, val.w, -1)
t_i = float(val.times[i])


@jax.jit
def oracle(params):
    def go(chunk):
        o, d = chunk
        out = render_uniform(params, o, d, settings, field.density,
                             field.color, bg_color=jnp.ones(3),
                             extra=(jnp.asarray(t_i),))
        return out["image"]
    ro = rays["rays_o"][0].reshape(-1, 4096, 3)
    rd = rays["rays_d"][0].reshape(-1, 4096, 3)
    img = jax.lax.map(go, (ro, rd))
    return img.reshape(val.h, val.w, 3)


img_o = np.asarray(oracle(params))
g = val.images[i]
gt = g[..., :3] * g[..., 3:] + (1 - g[..., 3:])
p_o = -10 * np.log10(np.mean((np.clip(img_o, 0, 1) - gt) ** 2))
img_f, _ = tr.render_image(val.poses[i], val.intrinsics, val.h, val.w,
                           time=t_i)
p_f = -10 * np.log10(np.mean((np.clip(img_f, 0, 1) - gt) ** 2))
print(f"view {i} t={t_i}: oracle(uniform)={p_o:.2f} fast={p_f:.2f}",
      flush=True)
