"""Isolate per-op costs: raw lane-gather, select, broadcast, loop overhead."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time
import numpy as np
from sealdnerf_tpu.utils.jaxsetup import setup_jax
setup_jax()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 512
REP = 64


def timeit(name, fn, *args, n=50):
    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
    dt = (time.perf_counter() - t0) / n
    vregs = R // 8 * REP
    print(f"{name:48s} {dt*1e3:8.3f} ms  "
          f"({dt*0.94e9/vregs:.1f} cyc/vreg-op)")
    return dt


def make(kernel, nargs):
    @jax.jit
    def f(*a):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * nargs,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(*a)
    return f


def k_gather(s_ref, i_ref, o_ref):
    s = s_ref[:]
    i = i_ref[:]
    acc = jnp.zeros((R, 128), jnp.float32)
    for r in range(REP):
        acc = acc + jnp.take_along_axis(s, (i + r) & 127, axis=1)
    o_ref[:] = acc


def k_sel(s_ref, i_ref, o_ref):
    s = s_ref[:]
    i = i_ref[:]
    acc = jnp.zeros((R, 128), jnp.float32)
    for r in range(REP):
        acc = jnp.where(i == r, s, acc)
    o_ref[:] = acc


def k_bcast(s_ref, i_ref, o_ref):
    i = i_ref[:]
    acc = jnp.zeros((R, 128), jnp.float32)
    for r in range(REP):
        row = s_ref[pl.ds(r % 64, 1), :]
        srcb = jnp.broadcast_to(row, (R, 128))
        acc = acc + jnp.take_along_axis(srcb, i, axis=1)
    o_ref[:] = acc


def k_fori(s_ref, i_ref, o_ref):
    s = s_ref[:]
    i = i_ref[:]
    def body(r, acc):
        return acc + jnp.take_along_axis(s, (i + r) & 127, axis=1)
    o_ref[:] = jax.lax.fori_loop(0, REP, body,
                                 jnp.zeros((R, 128), jnp.float32))


def k_add(s_ref, i_ref, o_ref):
    s = s_ref[:]
    acc = jnp.zeros((R, 128), jnp.float32)
    for r in range(REP):
        acc = acc + s * float(r + 1)
    o_ref[:] = acc


def k_chunk(s_ref, i_ref, o_ref):
    """Realistic chunk lookup: bcast row, gather by lo, select by hi."""
    i = i_ref[:]
    lo = i & 127
    hi = i >> 7
    acc = jnp.zeros((R, 128), jnp.float32)
    for r in range(REP):
        row = s_ref[pl.ds(r % 64, 1), :]
        srcb = jnp.broadcast_to(row, (R, 128))
        g = jnp.take_along_axis(srcb, lo, axis=1)
        acc = jnp.where(hi == r, g, acc)
    o_ref[:] = acc


def main():
    print("device:", jax.devices()[0], f" R={R} REP={REP}")
    key = jax.random.PRNGKey(0)
    src = jax.random.normal(key, (R, 128), jnp.float32)
    idx = jax.random.randint(key, (R, 128), 0, 128, jnp.int32)
    idx_t = jax.random.randint(key, (R, 128), 0, REP * 128, jnp.int32)

    fns = {}
    for name, k, ix in [
        ("raw lane-gather x64 (unrolled)", k_gather, idx),
        ("compare+select x64", k_sel, idx),
        ("bcast-row + gather x64", k_bcast, idx),
        ("raw lane-gather x64 (fori)", k_fori, idx),
        ("mul+add x64", k_add, idx),
        ("full chunk lookup x64", k_chunk, idx_t),
    ]:
        f = make(k, 2)
        timeit(name, f, src, ix)


if __name__ == "__main__":
    main()
