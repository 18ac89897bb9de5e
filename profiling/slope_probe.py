import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time, numpy as np
from sealdnerf_tpu.utils.jaxsetup import setup_jax
setup_jax()
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REP = 64  # table chunks

def make(R, G):
    def k_chunk(s_ref, i_ref, o_ref):
        i = i_ref[:]
        lo = i & 127
        hi = i >> 7
        acc = jnp.zeros((R, 128), jnp.float32)
        for r in range(REP):
            row = s_ref[pl.ds(r, 1), :]
            srcb = jnp.broadcast_to(row, (R, 128))
            g = jnp.take_along_axis(srcb, lo, axis=1)
            acc = jnp.where(hi == r, g, acc)
        o_ref[:] = acc
    @jax.jit
    def f(s, i):
        return pl.pallas_call(
            k_chunk,
            grid=(G,),
            in_specs=[
                pl.BlockSpec((REP, 128), lambda g: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((R, 128), lambda g: (g, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((R, 128), lambda g: (g, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((G * R, 128), jnp.float32),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024),
        )(s, i)
    return f

key = jax.random.PRNGKey(0)
src = jax.random.normal(key, (REP, 128), jnp.float32)

def bench(R, G, n=30):
    f = make(R, G)
    idx = jax.random.randint(key, (G * R, 128), 0, REP * 128, jnp.int32)
    out = f(src, idx); _ = np.asarray(out).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(src, idx)
    _ = np.asarray(out).ravel()[0]
    dt = (time.perf_counter() - t0) / n
    print(f"R={R} G={G}: {dt*1e3:.3f} ms  ({G*R*128/1e6:.2f}M lookups)")
    return dt, G * R * 128

d1, w1 = bench(512, 1)
d2, w2 = bench(2048, 16)
slope = (d2 - d1) / (w2 - w1)
print(f"marginal: {1/slope/1e9:.2f} G lookups/s  (chunks={REP}; per-chunk-visit "
      f"{1/slope/1e9*REP:.1f} G/s)")
