import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# Rate of the fused static forward kernel (samples/s) on the real TPU,
# isolating the VM-plane cost: planes=() vs ((128,8),).
import time, numpy as np, jax, jax.numpy as jnp
from sealdnerf_tpu.models.cp import CPConfig, init_cp
from sealdnerf_tpu.ops.pallas_field import cp_forward_fused_planar

M = 1 << 20
x = jax.random.uniform(jax.random.PRNGKey(1), (3, M), minval=-1, maxval=1)
d = jax.random.normal(jax.random.PRNGKey(2), (3, M))
d = d / jnp.linalg.norm(d, axis=0, keepdims=True)

for planes in [(), ((128, 8),)]:
    cfg = CPConfig(planes=planes)
    params = init_cp(jax.random.PRNGKey(0), cfg)
    f = jax.jit(lambda p, xx, dd: cp_forward_fused_planar(p, cfg, xx, dd))
    o = f(params, x, d); _ = float(jnp.sum(o))  # compile+warm
    rates = []
    for it in range(6):
        xx = x * (1 + 1e-5 * it)   # tunnel dedupes identical dispatches
        t0 = time.perf_counter()
        o = f(params, xx, d); _ = float(jnp.sum(o))
        rates.append(M / (time.perf_counter() - t0))
    r = sorted(rates)[-2]
    print(f"planes={planes}: {r/1e6:.1f} M samples/s "
          f"({1e9/r:.1f} ns/sample)")
