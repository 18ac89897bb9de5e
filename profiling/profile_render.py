"""Decompose 800x800 render cost on the TPU: march vs field vs composite."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time
import numpy as np
from sealdnerf_tpu.utils.jaxsetup import setup_jax
setup_jax()
import jax
import jax.numpy as jnp

from sealdnerf_tpu.models.cp import CPConfig, make_cp_field, cp_features
from sealdnerf_tpu.ops.marching_dense import DenseMarchConfig, march_dense
from sealdnerf_tpu.ops import near_far_from_aabb, composite_rays
from sealdnerf_tpu.render.fast import render_dense


def bench(name, f, *a, n=5):
    out = f(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*a)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:52s} {dt*1e3:9.2f} ms", flush=True)
    return dt


N = 1 << 16      # rays per chunk
cfg = DenseMarchConfig(bound=1.0, march_res=64, n_intervals=16,
                       steps_per_interval=4)
fieldcfg = CPConfig(bound=1.0)
field = make_cp_field(jax.random.PRNGKey(0), fieldcfg)
params = jax.device_put(field.params)

key = jax.random.PRNGKey(1)
ro = jax.device_put(np.random.randn(N, 3).astype(np.float32) * 0.1 +
                    np.array([0, 0, -2.5], np.float32))
rd = np.random.randn(N, 3).astype(np.float32)
rd = jax.device_put(rd / np.linalg.norm(rd, axis=-1, keepdims=True))
occ = jax.device_put((np.random.rand(64, 64, 64) < 0.08))

aabb = jnp.array([-1., -1., -1., 1., 1., 1.])


@jax.jit
def j_nearfar(ro, rd):
    nf = near_far_from_aabb(ro, rd, aabb, 0.05)
    return nf[0].sum() + nf[1].sum()


@jax.jit
def j_march(ro, rd, occ):
    nears, fars = near_far_from_aabb(ro, rd, aabb, 0.05)
    mr = march_dense(ro, rd, nears, fars, occ, cfg)
    return mr["ts"].sum() + mr["valid"].sum()


S = cfg.samples_per_ray
x = jax.device_put(np.random.rand(N * S, 3).astype(np.float32) * 2 - 1)
d = jax.device_put(np.tile(np.asarray(rd), (S, 1)))


@jax.jit
def j_field(params, x, d):
    sig, rgb = field.forward(params, x, d)
    return sig.sum() + rgb.sum()


@jax.jit
def j_feat(params, x):
    return cp_features(params, fieldcfg, x).sum()


@jax.jit
def j_sigma(params, x):
    sig, gf = field.density(params, x)
    return sig.sum() + gf.sum()


sig = jax.device_put(np.random.rand(N, S).astype(np.float32))
rgb = jax.device_put(np.random.rand(N, S, 3).astype(np.float32))
dts = jax.device_put(np.full((N, S), 0.01, np.float32))
ts = jax.device_put(np.cumsum(np.full((N, S), 0.01, np.float32), -1))


@jax.jit
def j_comp(sig, rgb, dts, ts):
    c = composite_rays(sig, rgb, dts, ts=ts)
    return c["image"].sum() + c["depth"].sum()


@jax.jit
def j_full(params, occ, ro, rd):
    res = render_dense(params, occ, ro, rd, cfg, field.forward)
    return res["image"].sum() + res["depth"].sum()


print(f"chunk N={N} rays, S={S} samples/ray -> {N*S/1e6:.1f}M samples")
bench("near_far", j_nearfar, ro, rd)
t_march = bench("march_dense (coarse gather+compact+expand)", j_march,
                ro, rd, occ)
t_feat = bench(f"cp_features [{N*S/1e6:.1f}M]", j_feat, params, x)
t_sig = bench("density (feat+sigma MLP)", j_sigma, params, x)
t_field = bench("full field fwd (sigma+color)", j_field, params, x, d)
bench("composite", j_comp, sig, rgb, dts, ts)
t_full = bench("render_dense full chunk", j_full, params, occ, ro, rd)
n800 = 800 * 800
print(f"\nprojected 800x800 ({n800/N:.1f} chunks): "
      f"{t_full * n800 / N * 1e3:.0f} ms/frame "
      f"= {1.0 / (t_full * n800 / N):.2f} FPS")

# march sub-costs: occupancy gather alone
@jax.jit
def j_gather(ro, rd, occ):
    nears, fars = near_far_from_aabb(ro, rd, aabb, 0.05)
    kc = cfg.k_coarse
    vox = cfg.voxel
    ks = (jnp.arange(kc, dtype=jnp.float32) + 0.5) * vox
    t_mid = nears[:, None] + ks[None, :]
    pos = ro[:, None, :] + t_mid[..., None] * rd[:, None, :]
    ijk = jnp.clip(((pos / cfg.bound) * 0.5 + 0.5) * cfg.march_res, 0.0,
                   cfg.march_res - 1).astype(jnp.int32)
    m = cfg.march_res
    flat = (ijk[..., 0] * m + ijk[..., 1]) * m + ijk[..., 2]
    hit = jnp.take(occ.reshape(-1), flat.reshape(-1)).reshape(N, kc)
    return hit.sum()


bench(f"occ gather alone [{N}x{cfg.k_coarse}]", j_gather, ro, rd, occ)
