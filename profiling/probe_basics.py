import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time, sys, numpy as np
from sealdnerf_tpu.utils.jaxsetup import setup_jax
setup_jax()
import jax, jax.numpy as jnp

key = jax.random.PRNGKey(0)

def bench(name, f, *a, n=10, flops=None, bytes_=None):
    print("compiling", name, file=sys.stderr, flush=True)
    out = f(*a); _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(n): out = f(*a)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
    dt = (time.perf_counter()-t0)/n - 0.0008
    extra = ""
    if flops: extra += f"  {flops/dt/1e12:.2f} TFLOP/s"
    if bytes_: extra += f"  {bytes_/dt/1e9:.0f} GB/s"
    print(f"{name:40s} {dt*1e3:8.2f} ms{extra}", flush=True)

x = jnp.ones((8*1024*1024,), jnp.float32)
f = jax.jit(lambda a, b: a + b)
bench("stream add 8M f32", f, x, x, bytes_=3*32*1024*1024)

a = jnp.ones((4096, 4096), jnp.bfloat16)
f = jax.jit(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32))
bench("matmul 4096^3 bf16", f, a, a, flops=2*4096**3)

m1 = jnp.ones((131072, 64), jnp.bfloat16)
m2 = jnp.ones((64, 64), jnp.bfloat16)
f = jax.jit(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32))
bench("matmul [131k,64]@[64,64] bf16", f, m1, m2, flops=2*131072*64*64)

e = jnp.ones((131072, 128), jnp.float32)
f = jax.jit(lambda a: jnp.maximum(0., 1. - jnp.abs(a * 1.7 - 0.3)))
bench("elementwise hat [131k,128]", f, e, bytes_=2*131072*128*4)

f = jax.jit(lambda a: jnp.exp(a))
bench("exp [131k,128]", f, e, bytes_=2*131072*128*4)

c = jnp.ones((4096, 1024), jnp.float32)
f = jax.jit(lambda a: jnp.cumsum(a, axis=-1))
bench("cumsum [4096,1024] axis1", f, c)

print(jax.devices()[0], jax.devices()[0].device_kind)
