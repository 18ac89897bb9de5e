"""Static train-step decomposition at train scale (4096 rays, S=64)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time
import numpy as np
from sealdnerf_tpu.utils.jaxsetup import setup_jax
setup_jax()
import jax, jax.numpy as jnp, optax

from sealdnerf_tpu.models.cp import CPConfig, init_cp, make_cp_field
from sealdnerf_tpu.ops.marching_dense import DenseMarchConfig, march_dense
from sealdnerf_tpu.ops import near_far_from_aabb
from sealdnerf_tpu.render.fast import render_dense
from sealdnerf_tpu.data.rays import get_rays


def bench(name, f, *a, n=20):
    o = f(*a); jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(n):
        o = f(*a)
    jax.block_until_ready(o)
    print(f"{name:52s} {(time.perf_counter()-t0)/n*1e3:8.2f} ms", flush=True)


N = 4096
cfg = DenseMarchConfig(bound=1.0, march_res=64, n_intervals=16,
                       steps_per_interval=4)
fcfg = CPConfig(bound=1.0)
field = make_cp_field(jax.random.PRNGKey(0), fcfg)
params = jax.device_put(field.params)
tx = optax.adam(1e-2, b1=0.9, b2=0.99, eps=1e-15)
opt_state = jax.device_put(tx.init(params))
occ = jax.device_put((np.random.rand(64, 64, 64) < 0.08))
rng = np.random.RandomState(0)
ro = jax.device_put((rng.randn(N, 3) * 0.1 + [0, 0, -2.3]).astype(np.float32))
rd = rng.randn(N, 3).astype(np.float32)
rd = jax.device_put(rd / np.linalg.norm(rd, axis=-1, keepdims=True))
gt = jax.device_put(rng.rand(N, 3).astype(np.float32))
aabb = jnp.array([-1., -1, -1, 1, 1, 1])

S = cfg.samples_per_ray
x = jax.device_put((rng.rand(N * S, 3) * 2 - 1).astype(np.float32))
d = jax.device_put(np.tile(np.asarray(rd), (S, 1)))


@jax.jit
def fwd_only(params, x, d):
    s, r = field.forward(params, x, d)
    return s.sum() + r.sum()


@jax.jit
def fwd_bwd(params, x, d):
    def loss(p):
        s, r = field.forward(p, x, d)
        return jnp.mean(s) + jnp.mean(r)
    l, g = jax.value_and_grad(loss)(params)
    return l, jax.tree_util.tree_map(lambda a: a.sum(), g)


@jax.jit
def march_only(ro, rd, occ):
    nears, fars = near_far_from_aabb(ro, rd, aabb, 0.05)
    mr = march_dense(ro, rd, nears, fars, occ, cfg)
    return mr["ts"].sum() + mr["valid"].sum()


@jax.jit
def full_step(params, opt_state, occ, ro, rd, gt):
    def loss(p):
        res = render_dense(p, occ, ro, rd, cfg, field.forward,
                           bg_color=jnp.ones(3))
        return jnp.mean((res["image"] - gt) ** 2)
    l, g = jax.value_and_grad(loss)(params)
    upd, opt_state2 = tx.update(g, opt_state, params)
    p2 = optax.apply_updates(params, upd)
    return l, jax.tree_util.tree_map(lambda a: a.sum(), p2)


@jax.jit
def render_grad_only(params, occ, ro, rd, gt):
    def loss(p):
        res = render_dense(p, occ, ro, rd, cfg, field.forward,
                           bg_color=jnp.ones(3))
        return jnp.mean((res["image"] - gt) ** 2)
    l, g = jax.value_and_grad(loss)(params)
    return l, jax.tree_util.tree_map(lambda a: a.sum(), g)


print(f"N={N} rays S={S} -> {N*S/1e3:.0f}k samples")
bench("field fwd only [262k]", fwd_only, params, x, d)
bench("field fwd+bwd [262k]", fwd_bwd, params, x, d)
bench("march_dense (gather+compact)", march_only, ro, rd, occ)
bench("render+grad (march+field+composite bwd)", render_grad_only,
      params, occ, ro, rd, gt)
bench("full step (+adam)", full_step, params, opt_state, occ, ro, rd, gt)
