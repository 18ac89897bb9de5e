"""Component-level timing of the train step on the real TPU.

Times (steady-state, warm jit):
  - march_rays alone          (the [N,1024] candidate lattice)
  - grid_encode fwd           (hash gathers)
  - grid_encode fwd+bwd       (scatter-add)
  - full field forward        (encode + MLPs)
  - composite_packed
  - full train fwd+bwd (value_and_grad through render_occ)
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time
import numpy as np
from sealdnerf_tpu.utils.jaxsetup import setup_jax
setup_jax()

import jax
import jax.numpy as jnp

from sealdnerf_tpu.ops.marching import MarchConfig, march_rays
from sealdnerf_tpu.ops import near_far_from_aabb, composite_packed, grid_encode
from sealdnerf_tpu.models.ngp import NGPConfig
from sealdnerf_tpu.models.api import make_ngp_field

N = 4096
SPR = 48
M = N * SPR

def timeit(name, fn, *args, n=20, **kw):
    out = fn(*args, **kw)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0])  # sync
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / n
    print(f"{name:36s} {dt*1e3:9.2f} ms   ({N/dt:,.0f} rays/s)")
    return dt


def main():
    print("device:", jax.devices()[0])
    rng = jax.random.PRNGKey(0)
    cfg = NGPConfig(bound=1.0)
    field = make_ngp_field(rng, cfg)
    mc = MarchConfig(bound=1.0, cascades=1, grid_size=128, dt_gamma=0.0,
                     max_steps=1024)

    # rays through a sphere-ish scene
    k1, k2 = jax.random.split(rng)
    o = jnp.array([0.0, 0.0, -1.5]) + 0.01 * jax.random.normal(k1, (N, 3))
    d = jax.random.normal(k2, (N, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    d = d * jnp.sign(d[:, 2:3] + 1e-9)  # point forward-ish
    aabb = jnp.array([-1., -1., -1., 1., 1., 1.])
    nears, fars = near_far_from_aabb(o, d, aabb, 0.2)

    # occupancy: central ball of radius .5 occupied (~6.5% cells)
    g = jnp.linspace(-1, 1, 128)
    X, Y, Z = jnp.meshgrid(g, g, g, indexing="ij")
    occ = ((X**2 + Y**2 + Z**2) < 0.25)[None]  # [1,128,128,128]
    print("occ frac:", float(occ.mean()))

    f_march = jax.jit(lambda: march_rays(o, d, nears, fars, occ, mc, M))
    t_march = timeit("march_rays (N=4096,K=1024)", f_march)

    pk = f_march()
    xyzs, dirs = pk["xyzs"], pk["dirs"]
    print("packed valid frac:", float(pk["valid"].mean()),
          "total:", int(pk["total"]))

    params = field.params
    f_enc = jax.jit(lambda p: grid_encode(
        (xyzs + 1) / 2, p["grid"], cfg.grid_cfg))
    timeit(f"grid_encode fwd (M={M})", f_enc, params)

    def enc_loss(p):
        return jnp.sum(grid_encode((xyzs + 1) / 2, p["grid"], cfg.grid_cfg))
    f_encg = jax.jit(jax.grad(enc_loss))
    timeit("grid_encode fwd+bwd", f_encg, params)

    f_fwd = jax.jit(lambda p: field.forward(p, xyzs, dirs))
    timeit("field forward (enc+MLPs)", f_fwd, params)

    def fwd_loss(p):
        s, rgb = field.forward(p, xyzs, dirs)[:2]
        return jnp.sum(s) + jnp.sum(rgb)
    f_fwdg = jax.jit(jax.grad(fwd_loss))
    timeit("field fwd+bwd", f_fwdg, params)

    sigma, rgb = jax.jit(lambda: field.forward(params, xyzs, dirs))()
    f_comp = jax.jit(lambda: composite_packed(
        sigma, rgb, pk["dts"], pk["ts"], pk["ray_id"], pk["valid"], n_rays=N))
    timeit("composite_packed", f_comp)

    # full render fwd+bwd
    from sealdnerf_tpu.render.renderer import RenderSettings, render_occ
    st = RenderSettings(march=mc, samples_per_ray=SPR)

    def loss_fn(p):
        res = render_occ(p, occ, o, d, st, field.forward, None,
                         bg_color=jnp.ones((3,)))
        return jnp.mean(res["image"] ** 2)
    f_full = jax.jit(jax.value_and_grad(loss_fn))
    timeit("render_occ fwd+bwd", f_full, params)


if __name__ == "__main__":
    main()
