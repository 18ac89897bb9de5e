"""Decompose the tiled 800px render on TPU: march vs build vs kernel vs
composite."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time
import numpy as np
from sealdnerf_tpu.utils.jaxsetup import setup_jax
setup_jax()
import jax
import jax.numpy as jnp

from sealdnerf_tpu.models.cp import CPConfig, init_cp
from sealdnerf_tpu.ops.marching_dense import (DenseMarchConfig, dilate_occ,
                                              march_intervals,
                                              expand_intervals)
from sealdnerf_tpu.ops import near_far_from_aabb
from sealdnerf_tpu.ops.pallas_field import cp_forward_fused_planar
from sealdnerf_tpu.data.rays import get_rays


def bench(name, f, *a, n=5):
    o = f(*a); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(n):
        o = f(*a)
    jax.block_until_ready(o)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:56s} {dt*1e3:9.2f} ms", flush=True)
    return dt


RH = RW = 800
TP = 8
cfg = DenseMarchConfig(bound=1.0, march_res=64, n_intervals=16,
                       steps_per_interval=4)
fieldcfg = CPConfig(bound=1.0)
params = jax.device_put(init_cp(jax.random.PRNGKey(0), fieldcfg))
occ = jax.device_put(np.random.rand(64, 64, 64) < 0.05)
pose = jax.device_put(np.array(
    [[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, -2.2], [0, 0, 0, 1]], np.float32))
intr = jax.device_put(np.array([800.0, 800.0, 400.0, 400.0], np.float32))
aabb = jnp.array([-1.0, -1, -1, 1, 1, 1])

th, tw = RH // TP, RW // TP
s = cfg.samples_per_ray
n = RH * RW
M = n * s


@jax.jit
def j_march(pose, intr, occ):
    occ_d = dilate_occ(occ, 1)
    tr = get_rays(jax.random.PRNGKey(0), pose[None], intr / TP, th, tw, -1)
    to, td = tr["rays_o"][0], tr["rays_d"][0]
    tnear, tfar = near_far_from_aabb(to, td, aabb, cfg.min_near)
    te, iv = march_intervals(to, td, tnear, tfar + 0.07, occ_d, cfg)
    return te.sum() + iv.sum()


@jax.jit
def j_build(pose, intr, occ):
    occ_d = dilate_occ(occ, 1)
    tr = get_rays(jax.random.PRNGKey(0), pose[None], intr / TP, th, tw, -1)
    to, td = tr["rays_o"][0], tr["rays_d"][0]
    tnear, tfar = near_far_from_aabb(to, td, aabb, cfg.min_near)
    te, iv = march_intervals(to, td, tnear, tfar + 0.07, occ_d, cfg)
    sc = cfg.n_intervals
    pe = jnp.broadcast_to(te.reshape(th, 1, tw, 1, sc),
                          (th, TP, tw, TP, sc)).reshape(n, sc)
    pv = jnp.broadcast_to(iv.reshape(th, 1, tw, 1, sc),
                          (th, TP, tw, TP, sc)).reshape(n, sc)
    pfar = jnp.broadcast_to((tfar + 0.07).reshape(th, 1, tw, 1),
                            (th, TP, tw, TP)).reshape(n)
    pr = get_rays(jax.random.PRNGKey(0), pose[None], intr, RH, RW, -1)
    ro, rd = pr["rays_o"][0], pr["rays_d"][0]
    mr = expand_intervals(pe, pv, pfar, cfg)
    ts = mr["ts"]
    planes = []
    for a in range(3):
        da = rd[:, a]
        pa = jnp.clip(ro[:, a][:, None] + ts * da[:, None], -1, 1)
        planes.append(pa.reshape(1, n * s))
    x3 = jnp.concatenate(planes, 0)
    return x3.sum() + mr["valid"].sum()


x3c = jax.device_put(np.random.rand(3, M).astype(np.float32) * 2 - 1)
d3c = jax.device_put(np.tile(np.array([[0.0], [0.0], [1.0]], np.float32),
                             (1, M)))


@jax.jit
def j_kernel(params, x3, d3):
    out = cp_forward_fused_planar(params, fieldcfg, x3, d3)
    return out.sum()


sig = jax.device_put(np.random.rand(n, s).astype(np.float32))
rr = jax.device_put(np.random.rand(n, s).astype(np.float32))
gg = jax.device_put(np.random.rand(n, s).astype(np.float32))
bb = jax.device_put(np.random.rand(n, s).astype(np.float32))
tsc = jax.device_put(np.cumsum(np.full((n, s), 0.01, np.float32), -1))


@jax.jit
def j_comp(sig, rr, gg, bb, tsc):
    alphas = 1.0 - jnp.exp(-sig * 0.0078)
    trans = jnp.cumprod(1.0 - alphas + 1e-15, axis=-1)
    trans = jnp.concatenate([jnp.ones_like(trans[..., :1]),
                             trans[..., :-1]], -1)
    w = alphas * trans
    ws = w.sum(-1)
    dep = (w * tsc).sum(-1)
    chans = [jnp.sum(w * c, -1) + (1 - ws) for c in (rr, gg, bb)]
    return sum(c.sum() for c in chans) + dep.sum()


from sealdnerf_tpu.render.fast_image import render_image_tiled
from sealdnerf_tpu.ops.pallas_field import make_fused_forward_planar
fwd = make_fused_forward_planar(fieldcfg)


@jax.jit
def j_full(params, occ, pose, intr):
    img, dep = render_image_tiled(params, occ, pose, intr, RH, RW, cfg,
                                  fwd, jnp.ones(3), tile_px=TP, dilate=1,
                                  planar=True)
    return img.sum() + dep.sum()


print(f"800x800, S={s}, M={M/1e6:.1f}M samples")
bench("tile march (10k tiles)", j_march, pose, intr, occ)
bench("march + interval bcast + planar pos build", j_build, pose, intr, occ)
bench(f"pallas field kernel [{M/1e6:.1f}M]", j_kernel, params, x3c, d3c)
bench("planar composite", j_comp, sig, rr, gg, bb, tsc)
bench("full tiled render", j_full, params, occ, pose, intr)
