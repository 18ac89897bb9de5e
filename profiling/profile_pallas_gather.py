"""Measure the chunked lane-gather scheme for hash-table lookups.

Scheme: table of T entries (uint32-packed 2xbf16) lives in VMEM as
[T/128, 128]. For lookups h in [0,T): loop chunks k: src = broadcast row k,
g = take_along_axis(src, h & 127, axis=1), acc = where(h >> 7 == k, g, acc).
Cost model: 3-4 VPU ops per (row, chunk); measure reality.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time
import functools
import numpy as np
from sealdnerf_tpu.utils.jaxsetup import setup_jax
setup_jax()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T = 8192          # table entries per level
NCHUNK = T // 128  # 64
R = 1024          # lookup rows per block (x128 lanes each)
G = 8             # grid blocks


def lookup_kernel(tab_ref, h_ref, o_ref):
    h = h_ref[:]
    lo = h & 127
    hi = h >> 7
    acc = jnp.zeros((R, 128), jnp.float32)

    def body(k, acc):
        row = tab_ref[pl.ds(k, 1), :]                      # [1, 128]
        src = jnp.broadcast_to(row, (R, 128))
        g = jnp.take_along_axis(src, lo, axis=1)
        return jnp.where(hi == k, g, acc)

    acc = jax.lax.fori_loop(0, NCHUNK, body, acc)
    o_ref[:] = acc


@jax.jit
def lookup(tab, h):
    return pl.pallas_call(
        lookup_kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((NCHUNK, 128), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 128), lambda g: (g, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, 128), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G * R, 128), jnp.float32),
    )(tab, h)


def timeit(name, fn, *args, n=30, lookups=None):
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
    dt = (time.perf_counter() - t0) / n
    r = f"{name:44s} {dt*1e3:9.3f} ms"
    if lookups:
        r += f"  ({lookups/dt/1e9:.2f} G lookups/s)"
    print(r)
    return dt


def main():
    print("device:", jax.devices()[0])
    key = jax.random.PRNGKey(0)
    tab = jax.random.normal(key, (NCHUNK, 128), dtype=jnp.float32)
    h = jax.random.randint(key, (G * R, 128), 0, T, dtype=jnp.int32)
    out = lookup(tab, h)
    # correctness
    ref = tab.reshape(-1)[np.asarray(h)]
    err = np.abs(np.asarray(out) - np.asarray(ref)).max()
    print("max err:", err)
    nlook = G * R * 128
    timeit(f"chunked lane-gather T={T} ({nlook/1e6:.1f}M lookups)",
           lookup, tab, h, lookups=nlook)

    # int ops sanity: uint32 bit tricks for bf16 unpack
    def unpack_kernel(w_ref, o_ref):
        w = w_ref[:]
        ch0 = pltpu.bitcast(w << 16, jnp.float32)
        ch1 = pltpu.bitcast(w & jnp.uint32(0xFFFF0000), jnp.float32)
        o_ref[:] = ch0 + ch1

    @jax.jit
    def unpack(w):
        return pl.pallas_call(
            unpack_kernel,
            out_shape=jax.ShapeDtypeStruct(w.shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(w)

    vals = jax.random.normal(key, (256, 128, 2), dtype=jnp.float32)
    vb = vals.astype(jnp.bfloat16).view(jnp.uint16).astype(jnp.uint32)
    packed = vb[..., 0, :] if False else (vb[..., 0] | (vb[..., 1] << 16))
    got = unpack(packed)
    want = (vals.astype(jnp.bfloat16).astype(jnp.float32)).sum(-1)
    print("unpack max err:", float(jnp.abs(got - want).max()))


if __name__ == "__main__":
    main()
