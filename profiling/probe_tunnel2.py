import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time, sys, numpy as np
from sealdnerf_tpu.utils.jaxsetup import setup_jax
setup_jax()
import jax, jax.numpy as jnp

def bench(name, f, *a, n=20):
    out = f(*a)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(n): out = f(*a)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
    dt = (time.perf_counter()-t0)/n
    print(f"{name:52s} {dt*1e3:8.2f} ms", flush=True)
    return dt

add = jax.jit(lambda a, b: a + b)
x = jax.device_put(np.ones(2*1024*1024, np.float32))  # 8MB, explicit device_put
bench("add, 8MB explicit device_put inputs", add, x, x)

# captured closure constant (baked into executable)
cap = jnp.ones((2*1024*1024,), jnp.float32)
addc = jax.jit(lambda b: cap + b[0])
small = jnp.ones((128,), jnp.float32)
bench("add, 8MB captured const + tiny input", addc, small)

# big output, tiny input
gen = jax.jit(lambda s: jnp.full((2*1024*1024,), s))
bench("generate 8MB output from scalar", gen, 1.0)

# small output, big input
red = jax.jit(lambda a: jnp.sum(a))
bench("reduce 8MB -> scalar", red, x)

# in-graph loop: 64 sgd-ish steps on 8MB params in ONE call
def steps64(p, d):
    def body(i, p):
        g = p * 1e-6 + d[0]
        return p - 0.001 * g
    return jax.lax.fori_loop(0, 64, body, p)
f64 = jax.jit(steps64)
bench("64 in-graph param steps, 8MB params", f64, x, small)
