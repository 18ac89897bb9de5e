import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# Drive the dynamic fused TRAIN kernel on the real TPU: grad parity vs
# jax.grad of the XLA reference path.
import numpy as np, jax, jax.numpy as jnp
from sealdnerf_tpu.models.cp import CPDNeRFConfig, cp_dnerf_forward, init_cp_dnerf
from sealdnerf_tpu.ops.pallas_field import cp_dnerf_train_fused

cfg = CPDNeRFConfig()
params = init_cp_dnerf(jax.random.PRNGKey(0), cfg)
M = 2048
x = jax.random.uniform(jax.random.PRNGKey(1), (M, 3), minval=-1, maxval=1)
d = jax.random.normal(jax.random.PRNGKey(2), (M, 3))
d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
t = jnp.float32(0.61)

def loss_fused(p):
    out = cp_dnerf_train_fused(cfg, 1024, False, p, x.T, d.T, t)
    return jnp.mean(out[0] ** 2) + jnp.mean(out[1:4] ** 2)

def loss_ref(p):
    sig, col, _ = cp_dnerf_forward(p, cfg, x, d, t)
    return jnp.mean(sig ** 2) + jnp.mean(col ** 2)

gf = jax.jit(jax.grad(loss_fused))(params)
gr = jax.jit(jax.grad(loss_ref))(params)

import jax.tree_util as jtu
bad = []
for (kp, a), (_, b) in zip(jtu.tree_flatten_with_path(gf)[0],
                           jtu.tree_flatten_with_path(gr)[0]):
    a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
    scale = max(np.abs(b).max(), 1e-3)
    rel = np.abs(a - b).max() / scale
    name = jtu.keystr(kp)
    print(f"{name:50s} relerr {rel:.4f}")
    if rel > 0.08:
        bad.append((name, rel))
assert not bad, f"grad mismatch: {bad}"
print("DYN_BWD_PARITY_OK")
