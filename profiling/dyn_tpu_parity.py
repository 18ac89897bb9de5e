import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# Drive the changed dynamic fused kernels on the real TPU: forward parity
# vs the XLA reference path, and one fused dynamic train segment step.
import numpy as np, jax, jax.numpy as jnp, time
from sealdnerf_tpu.models.cp import CPDNeRFConfig, cp_dnerf_forward, init_cp_dnerf
from sealdnerf_tpu.ops.pallas_field import cp_dnerf_forward_fused_planar

cfg = CPDNeRFConfig()
key = jax.random.PRNGKey(0)
params = init_cp_dnerf(key, cfg)
M = 4096
x = jax.random.uniform(jax.random.PRNGKey(1), (M, 3), minval=-1, maxval=1)
d = jax.random.normal(jax.random.PRNGKey(2), (M, 3))
d = d / jnp.linalg.norm(d, axis=1, keepdims=True)
t = jnp.float32(0.37)

ref = cp_dnerf_forward(params, cfg, x, d, t)            # XLA [S,3] path
out = cp_dnerf_forward_fused_planar(params, cfg, x.T, d.T, t)
sig_ref, col_ref, _deform = ref
sig_f, col_f = out[0, :], out[1:4, :].T
err_s = float(jnp.max(jnp.abs(sig_f - sig_ref)))
err_c = float(jnp.max(jnp.abs(col_f - col_ref)))
den = float(jnp.max(jnp.abs(sig_ref))) + 1e-6
print("sigma max abs err:", err_s, "rel:", err_s / den)
print("color max abs err:", err_c)
assert err_s / den < 5e-2 and err_c < 5e-2, "fused dyn forward diverged"
print("DYN_FWD_PARITY_OK")
