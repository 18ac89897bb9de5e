"""Pallas chunked-gather rates with tiny outputs (no download pollution)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time, functools, numpy as np
from sealdnerf_tpu.utils.jaxsetup import setup_jax
setup_jax()
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def bench(name, f, *a, n=20, items=None):
    out = f(*a); _ = float(np.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n): out = f(*a)
    _ = float(np.asarray(out).ravel()[0])
    dt = (time.perf_counter()-t0)/n - 0.002
    extra = f"  ({items/dt/1e9:.2f} G lookups/s)" if items else ""
    print(f"{name:52s} {dt*1e3:8.2f} ms{extra}", flush=True)

key = jax.random.PRNGKey(0)
R = 1024   # rows per rep

def make_chunked(nchunk, reps):
    T = nchunk * 128
    def kern(s_ref, i_ref, o_ref):
        acc = jnp.zeros((R, 128), jnp.float32)
        for rep in range(reps):
            i = i_ref[pl.ds(rep * R, R), :]
            lo = i & 127
            hi = i >> 7
            g_acc = jnp.zeros((R, 128), jnp.float32)
            for c in range(nchunk):
                row = s_ref[pl.ds(c, 1), :]
                srcb = jnp.broadcast_to(row, (R, 128))
                g = jnp.take_along_axis(srcb, lo, axis=1)
                g_acc = jnp.where(hi == c, g, g_acc)
            acc = acc + g_acc
        o_ref[:] = jnp.sum(acc, axis=0, keepdims=True)

    @jax.jit
    def f(s, i):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100*1024*1024),
        )(s, i)
    return f, T

for nchunk, reps in [(8, 32), (32, 32), (64, 16), (128, 16)]:
    f, T = make_chunked(nchunk, reps)
    tab = jax.device_put(np.random.randn(nchunk, 128).astype(np.float32))
    idx = jax.device_put(
        np.random.randint(0, T, (reps * R, 128)).astype(np.int32))
    bench(f"chunked gather T={T} ({reps*R*128/1e6:.1f}M lookups)",
          f, tab, idx, items=reps * R * 128)

# raw take_along_axis chain (128-entry table, no select): intrinsic gather op
def make_raw(reps):
    def kern(s_ref, i_ref, o_ref):
        s = s_ref[:]
        acc = jnp.zeros((R, 128), jnp.float32)
        for rep in range(reps):
            i = i_ref[pl.ds(rep * R, R), :]
            acc = acc + jnp.take_along_axis(s, i, axis=1)
        o_ref[:] = jnp.sum(acc, axis=0, keepdims=True)
    @jax.jit
    def f(s, i):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100*1024*1024),
        )(s, i)
    return f

f = make_raw(64)
src = jax.device_put(np.random.randn(R, 128).astype(np.float32))
idx = jax.device_put(np.random.randint(0, 128, (64 * R, 128)).astype(np.int32))
bench("raw lane-gather x64 (128-entry rows)", f, src, idx, items=64 * R * 128)
