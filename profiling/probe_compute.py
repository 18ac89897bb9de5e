"""Real compute rates: device-resident inputs, scalar outputs."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time, sys, numpy as np
from sealdnerf_tpu.utils.jaxsetup import setup_jax
setup_jax()
import jax, jax.numpy as jnp

def bench(name, f, *a, n=20, flops=None, bytes_=None, items=None):
    out = f(*a)
    _ = float(out)
    t0 = time.perf_counter()
    for _ in range(n): out = f(*a)
    _ = float(out)
    dt = (time.perf_counter()-t0)/n - 0.002
    extra = ""
    if flops: extra += f"  {flops/dt/1e12:.2f} TFLOP/s"
    if bytes_: extra += f"  {bytes_/dt/1e9:.0f} GB/s"
    if items: extra += f"  {items/dt/1e9:.3f} G/s"
    print(f"{name:44s} {dt*1e3:8.2f} ms{extra}", flush=True)

dp = lambda x: jax.device_put(x)
key = jax.random.PRNGKey(0)

a = dp(np.ones((4096, 4096), np.float32).astype(np.float16).astype(np.float32))
ab = dp(jnp.ones((4096, 4096), jnp.bfloat16))
f = jax.jit(lambda a: jnp.sum(jnp.dot(a, a, preferred_element_type=jnp.float32)))
bench("matmul 4096^3 bf16 (sum out)", f, ab, flops=2*4096**3)
f = jax.jit(lambda a: jnp.sum(jnp.dot(a, a)))
bench("matmul 4096^3 f32 (sum out)", f, a, flops=2*4096**3)

x = dp(np.ones(16*1024*1024, np.float32))
f = jax.jit(lambda a: jnp.sum(a * 1.5 + 2.0))
bench("stream mul-add 16M f32", f, x, bytes_=64*1024*1024)

# gather rate, resident table + idx, scalar out
T = 1 << 19
tab = dp(np.random.randn(T).astype(np.float32))
idx = dp(np.random.randint(0, T, (1 << 22,)).astype(np.int32))
f = jax.jit(lambda t, i: jnp.sum(jnp.take(t, i)))
bench("gather 4M scalar from 512K", f, tab, idx, items=1 << 22)

idx2 = dp(np.random.randint(0, 1 << 13, (1 << 22,)).astype(np.int32))
tab2 = dp(np.random.randn(1 << 13).astype(np.float32))
f = jax.jit(lambda t, i: jnp.sum(jnp.take(t, i)))
bench("gather 4M scalar from 8K", f, tab2, idx2, items=1 << 22)

# scatter-add rate
upd = dp(np.random.randn(1 << 22).astype(np.float32))
f = jax.jit(lambda u, i: jnp.sum(jnp.zeros((T,), jnp.float32).at[i].add(u)))
bench("scatter-add 4M into 512K", f, upd, idx, items=1 << 22)

# hat matmul CP eval (bf16) with scalar out
S = 131072
xs = dp(np.random.rand(S).astype(np.float32))
line = dp(np.random.randn(128, 64).astype(np.float32))
def cp(x, line):
    p = jnp.arange(128, dtype=jnp.float32)
    u = jnp.maximum(0.0, 1.0 - jnp.abs(x[:, None] * 127 - p[None, :]))
    return jnp.sum(u.astype(jnp.bfloat16) @ line.astype(jnp.bfloat16))
bench("hat-matmul [131k,128]@[128,64]", jax.jit(cp), xs, line,
      flops=2*S*128*64)

# MLP-ish matmul
m = dp(np.random.randn(131072, 64).astype(np.float32)).astype(jnp.bfloat16)
w = dp(np.random.randn(64, 64).astype(np.float32)).astype(jnp.bfloat16)
f = jax.jit(lambda a, b: jnp.sum(jnp.dot(a, b, preferred_element_type=jnp.float32)))
bench("matmul [131k,64]@[64,64] bf16", f, m, w, flops=2*131072*64*64)

# exp/transcendental
f = jax.jit(lambda a: jnp.sum(jnp.exp(-jnp.abs(a))))
bench("exp 16M", f, x, items=16*1024*1024)

# cumsum big
c = dp(np.random.randn(4096, 1024).astype(np.float32))
f = jax.jit(lambda a: jnp.sum(jnp.cumsum(a, axis=-1)))
bench("cumsum [4096,1024]", f, c)
