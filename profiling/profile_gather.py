"""Microbenchmark: hash-table gather formulations on the real TPU.

The hash encode needs ~25M (sample,level,corner) lookups of 2-channel rows
per forward. Which formulation is fastest?
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time
import numpy as np
from sealdnerf_tpu.utils.jaxsetup import setup_jax
setup_jax()

import jax
import jax.numpy as jnp

M = 1_572_864  # per-level lookups for one level-sized experiment
T = 1 << 19


def timeit(name, fn, *args, n=10):
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
    dt = (time.perf_counter() - t0) / n
    print(f"{name:44s} {dt*1e3:9.2f} ms  ({M/dt/1e9:.3f} G lookups/s)")
    return dt


def main():
    print("device:", jax.devices()[0], " M =", M, " T =", T)
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (M,), 0, T, dtype=jnp.int32)
    idx_small = idx % (1 << 14)
    table = jax.random.normal(key, (T, 2), dtype=jnp.float32)
    table_bf = table.astype(jnp.bfloat16)
    # pack 2 bf16 channels into one uint32 word
    tb = table_bf.view(jnp.uint16).astype(jnp.uint32)
    table_packed = tb[:, 0] | (tb[:, 1] << 16)  # [T] uint32
    table_flat = table.reshape(-1)  # [2T]
    table_t = table.T.copy()        # [2, T]

    timeit("take rows [M] from [T,2] f32 (current)",
           jax.jit(lambda i: jnp.take(table, i, axis=0)), idx)
    timeit("take rows, bf16 table",
           jax.jit(lambda i: jnp.take(table_bf, i, axis=0)), idx)
    timeit("flat scalar take x2 from [2T]",
           jax.jit(lambda i: jnp.take(table_flat, i * 2)
                   + jnp.take(table_flat, i * 2 + 1)), idx)
    timeit("packed uint32 scalar take [M]",
           jax.jit(lambda i: jnp.take(table_packed, i)), idx)
    timeit("packed take + unpack to 2 bf16",
           jax.jit(lambda i: (lambda w: (w & 0xFFFF).astype(jnp.uint16).view(
               jnp.bfloat16).astype(jnp.float32) + (w >> 16).astype(
               jnp.uint16).view(jnp.bfloat16).astype(jnp.float32))(
               jnp.take(table_packed, i))), idx)
    timeit("take axis=1 from [2,T]",
           jax.jit(lambda i: jnp.take(table_t, i, axis=1)), idx)
    timeit("take rows, small table 2^14",
           jax.jit(lambda i: jnp.take(table[:1 << 14], i, axis=0)), idx_small)
    timeit("take rows, idx 2D [M/128,128]",
           jax.jit(lambda i: jnp.take(table_packed, i.reshape(-1, 128))), idx)
    # sorted indices: does locality help?
    idx_sorted = jnp.sort(idx)
    timeit("take rows sorted idx (no unsort)",
           jax.jit(lambda i: jnp.take(table_packed, i)), idx_sorted)
    # gather with explicit dimension numbers + unique/sorted hints
    def g_sorted(i):
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(), collapsed_slice_dims=(0,), start_index_map=(0,))
        return jax.lax.gather(table_packed, i[:, None], dn, (1,),
                              indices_are_sorted=True, mode="clip")
    timeit("lax.gather sorted-hint packed", jax.jit(g_sorted), idx_sorted)


if __name__ == "__main__":
    main()
