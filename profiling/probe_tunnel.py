import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time, sys, numpy as np
from sealdnerf_tpu.utils.jaxsetup import setup_jax
setup_jax()
import jax, jax.numpy as jnp

def bench(name, f, *a, n=20):
    out = f(*a); jax.block_until_ready(out)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(n): out = f(*a)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
    dt = (time.perf_counter()-t0)/n
    print(f"{name:46s} {dt*1e3:8.2f} ms", flush=True)
    return dt

add = jax.jit(lambda a, b: a + b)
for sz in (1024, 1024*1024, 8*1024*1024, 32*1024*1024):
    x = jnp.ones((sz // 4,), jnp.float32)
    bench(f"add, input {sz//1024}KB x2", add, x, x)

def chain(a):
    for _ in range(100): a = a * 1.0001 + 0.0001
    return a
chainf = jax.jit(chain)
x8 = jnp.ones((8*1024*1024 // 4,), jnp.float32)
bench("chain x100 ops, input 8MB", chainf, x8)

# donated input: output aliases input
don = jax.jit(lambda a: a + 1.0, donate_argnums=(0,))
x = jnp.ones((8*1024*1024 // 4,), jnp.float32)
t0 = time.perf_counter()
for i in range(20):
    x = don(x)
_ = np.asarray(x).ravel()[0]
print(f"{'donated add, 8MB carried':46s} {(time.perf_counter()-t0)/20*1e3:8.2f} ms")

# carried loop: output feeds next input (no donation)
y = jnp.ones((8*1024*1024 // 4,), jnp.float32)
t0 = time.perf_counter()
for i in range(20):
    y = add(y, y)
    y = y * 0  + 1 if False else y
_ = np.asarray(y).ravel()[0]
print(f"{'carried add, 8MB output->input':46s} {(time.perf_counter()-t0)/20*1e3:8.2f} ms")
