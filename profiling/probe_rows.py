"""Wide-row gather/scatter rates + unrolled vs fori chunk loop."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time, numpy as np
from sealdnerf_tpu.utils.jaxsetup import setup_jax
setup_jax()
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

key = jax.random.PRNGKey(0)
S = 131072  # samples

def bench(name, f, *a, n=20, rows=None):
    out = f(*a); _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(n): out = f(*a)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0]
    dt = (time.perf_counter()-t0)/n - 0.0008  # dispatch overhead
    extra = f"  ({rows/dt/1e6:.1f} M rows/s)" if rows else ""
    print(f"{name:44s} {dt*1e3:8.2f} ms{extra}")
    return dt

for W in (8, 32, 128, 256, 512):
    T = 131072
    tab = jax.random.normal(key, (T, W), jnp.float32)
    idx = jax.random.randint(key, (S,), 0, T, jnp.int32)
    f = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    bench(f"row-gather [{S}] from [{T},{W}]", f, tab, idx, rows=S)

# row scatter-add
for W in (32, 256):
    T = 131072
    upd = jax.random.normal(key, (S, W), jnp.float32)
    idx = jax.random.randint(key, (S,), 0, T, jnp.int32)
    f = jax.jit(lambda u, i: jnp.zeros((T, W), jnp.float32).at[i].add(u))
    bench(f"row-scatter-add [{S}] into [{T},{W}]", f, upd, idx, rows=S)

# segment-sum rows (sorted ids)
idx_s = jnp.sort(jax.random.randint(key, (S,), 0, 131072, jnp.int32))
upd = jax.random.normal(key, (S, 256), jnp.float32)
f = jax.jit(lambda u, i: jax.ops.segment_sum(u, i, num_segments=131072,
                                             indices_are_sorted=True))
bench("segment_sum rows sorted [S,256]", f, upd, idx_s, rows=S)

# hat-function one-hot matmul (CP line eval): [S,128]@[128,R]
for R in (16, 64):
    line = jax.random.normal(key, (128, R), jnp.float32)
    x = jax.random.uniform(key, (S,))
    def cp(x, line):
        p = jnp.arange(128, dtype=jnp.float32)
        u = jnp.maximum(0.0, 1.0 - jnp.abs(x[:, None] * 127 - p[None, :]))
        return u.astype(jnp.bfloat16) @ line.astype(jnp.bfloat16)
    f = jax.jit(cp)
    bench(f"hat-matmul CP eval [S,128]@[128,{R}]", f, x, line)

# unrolled chunk loop in pallas: T=1024 (8 chunks), REP reps
RP, REPS = 2048, 16
def k_chunk(s_ref, i_ref, o_ref):
    acc = jnp.zeros((RP, 128), jnp.float32)
    for rep in range(REPS):
        i = i_ref[pl.ds(rep*RP, RP), :]
        lo = i & 127
        hi = i >> 7
        for c in range(8):
            row = s_ref[pl.ds(c, 1), :]
            srcb = jnp.broadcast_to(row, (RP, 128))
            g = jnp.take_along_axis(srcb, lo, axis=1)
            acc = jnp.where(hi == c, g, acc)
    o_ref[:] = acc

@jax.jit
def chunk8(s, i):
    return pl.pallas_call(
        k_chunk,
        out_shape=jax.ShapeDtypeStruct((RP, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024),
    )(s, i)

tab8 = jax.random.normal(key, (8, 128), jnp.float32)
idx8 = jax.random.randint(key, (REPS*RP, 128), 0, 1024, jnp.int32)
d = bench(f"pallas unrolled chunk8 x{REPS} [{RP},128]", chunk8, tab8, idx8)
vops = REPS * (RP//8) * 8 * 4
print(f"  -> {d*0.94e9/vops:.1f} cyc/vreg-op, {REPS*RP*128/d/1e9:.2f} G lookups/s")
