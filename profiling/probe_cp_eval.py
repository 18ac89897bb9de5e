"""CP line-eval formulations on TPU: dense hat vs factored (block one-hot x
intra-block hat) einsum. S=1M samples, scale res=1408 R=64."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time
import numpy as np
from sealdnerf_tpu.utils.jaxsetup import setup_jax
setup_jax()
import jax
import jax.numpy as jnp


def bench(name, f, *a, n=20):
    out = f(*a); _ = float(np.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*a)
    _ = float(np.asarray(out).ravel()[0])
    dt = (time.perf_counter() - t0) / n - 0.002
    print(f"{name:48s} {dt*1e3:8.2f} ms", flush=True)
    return dt


S = 1 << 20
R = 64
R_HI, R_LO = 44, 32
RES_PTS = R_HI * R_LO + 1   # 1409

key = jax.random.PRNGKey(0)
x = jax.device_put(np.random.rand(S).astype(np.float32))
tab = jax.device_put(np.random.randn(RES_PTS, R).astype(np.float32))


def dense_hat(x, tab):
    p = jnp.arange(RES_PTS, dtype=jnp.float32)
    u = jnp.maximum(0., 1. - jnp.abs(x[:, None] * (RES_PTS - 1) - p))
    f = u.astype(jnp.bfloat16) @ tab.astype(jnp.bfloat16)
    return jnp.sum(f)


def factored(x, tab):
    # factored view [r_hi, r_lo+1, R] from overlapping slices (static)
    tf = jnp.stack([jax.lax.dynamic_slice_in_dim(tab, a * R_LO, R_LO + 1)
                    for a in range(R_HI)])              # [44, 33, R]
    p = jnp.clip(x, 0., 1.) * (RES_PTS - 1)
    a = jnp.floor(p / R_LO)
    beta = p - a * R_LO
    uhi = (a[:, None] == jnp.arange(R_HI)[None, :])     # [S, 44] one-hot
    j = jnp.arange(R_LO + 1, dtype=jnp.float32)
    ulo = jnp.maximum(0., 1. - jnp.abs(beta[:, None] - j))  # [S, 33]
    m1 = jnp.einsum("sa,ajr->sjr", uhi.astype(jnp.bfloat16),
                    tf.astype(jnp.bfloat16))            # [S, 33, R]
    f = jnp.einsum("sjr,sj->sr", m1, ulo.astype(jnp.bfloat16))
    return jnp.sum(f)


def factored_b(x, tab):
    # alternate contraction order: ulo into tf first per block
    tf = jnp.stack([jax.lax.dynamic_slice_in_dim(tab, a * R_LO, R_LO + 1)
                    for a in range(R_HI)])              # [44, 33, R]
    p = jnp.clip(x, 0., 1.) * (RES_PTS - 1)
    a = jnp.floor(p / R_LO)
    beta = p - a * R_LO
    uhi = (a[:, None] == jnp.arange(R_HI)[None, :])
    j = jnp.arange(R_LO + 1, dtype=jnp.float32)
    ulo = jnp.maximum(0., 1. - jnp.abs(beta[:, None] - j))
    u = (uhi[:, :, None] * ulo[:, None, :]).reshape(S, -1)  # [S, 44*33]
    f = u.astype(jnp.bfloat16) @ tf.reshape(-1, R).astype(jnp.bfloat16)
    return jnp.sum(f)


f1 = jax.jit(dense_hat)
f2 = jax.jit(factored)
f3 = jax.jit(factored_b)
bench("dense hat [1M,1409] @ [1409,64]", f1, x, tab)
bench("factored einsum (onehot then ulo)", f2, x, tab)
bench("factored outer-u matmul", f3, x, tab)

# correctness cross-check (f32 path, small S)
xs = x[:1024]
a1 = jax.jit(lambda x, t: jnp.maximum(
    0., 1. - jnp.abs(x[:, None] * (RES_PTS - 1) -
                     jnp.arange(RES_PTS, dtype=jnp.float32))) @ t)(xs, tab)
def fac_f32(x, tab):
    tf = jnp.stack([jax.lax.dynamic_slice_in_dim(tab, a * R_LO, R_LO + 1)
                    for a in range(R_HI)])
    p = jnp.clip(x, 0., 1.) * (RES_PTS - 1)
    a = jnp.floor(p / R_LO)
    beta = p - a * R_LO
    uhi = (a[:, None] == jnp.arange(R_HI)[None, :]).astype(jnp.float32)
    j = jnp.arange(R_LO + 1, dtype=jnp.float32)
    ulo = jnp.maximum(0., 1. - jnp.abs(beta[:, None] - j))
    return jnp.einsum("sa,ajr,sj->sr", uhi, tf, ulo)
a2 = jax.jit(fac_f32)(xs, tab)
print("factored exactness max err:", float(jnp.abs(a1 - a2).max()))

# gradient cost
g1 = jax.jit(jax.grad(dense_hat, argnums=(0, 1)))
g3 = jax.jit(jax.grad(factored_b, argnums=(0, 1)))
bench("dense hat grad", g1, x, tab)
bench("factored outer-u grad", g3, x, tab)
