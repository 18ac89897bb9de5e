import sys, os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# Can Mosaic's dynamic_gather replace the dense hat-matmul line eval?
# Correctness + rate of gather-based lerp vs dense [rank,res]@[res,T].
import time, functools, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RES, RANK, TILE, M = 1024, 64, 1024, 1 << 20

def kern_gather(x_ref, tab_ref, o_ref):
    x = x_ref[:]                                  # [8, T] f32 rows: x01
    xa = x[0:1, :] * (RES - 1)                    # [1, T]
    p0 = jnp.clip(jnp.floor(xa), 0, RES - 1)
    w = xa - p0                                   # frac
    p0i = p0.astype(jnp.int32)
    p1i = jnp.minimum(p0i + 1, RES - 1)
    idx0 = jnp.broadcast_to(p0i, (RANK, TILE))
    idx1 = jnp.broadcast_to(p1i, (RANK, TILE))
    tab = tab_ref[:]                              # [RANK, RES]
    g0 = jnp.take_along_axis(tab, idx0, axis=1, mode="promise_in_bounds")
    g1 = jnp.take_along_axis(tab, idx1, axis=1, mode="promise_in_bounds")
    o_ref[:] = g0 * (1.0 - w) + g1 * w

def kern_dense(x_ref, tab_ref, o_ref):
    x = x_ref[:]
    xa = x[0:1, :] * (RES - 1)
    ii = jax.lax.broadcasted_iota(jnp.int32, (RES, TILE), 0).astype(jnp.float32)
    uT = jnp.maximum(0.0, 1.0 - jnp.abs(xa - ii)).astype(jnp.bfloat16)
    o_ref[:] = jnp.dot(tab_ref[:].astype(jnp.bfloat16), uT,
                       preferred_element_type=jnp.float32)

x = jax.random.uniform(jax.random.PRNGKey(1), (8, M))
tab = jax.random.normal(jax.random.PRNGKey(0), (RANK, RES), jnp.float32)

outs = {}
for name, kern in [("gather", kern_gather), ("dense", kern_dense)]:
    f = pl.pallas_call(
        kern, grid=(M // TILE,),
        in_specs=[pl.BlockSpec((8, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
                  pl.BlockSpec((RANK, RES), lambda i: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((RANK, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((RANK, M), jnp.float32))
    fj = jax.jit(f)
    try:
        o = fj(x, tab); outs[name] = np.asarray(o[:, :8])
        _ = float(jnp.sum(o))
        rates = []
        for it in range(6):
            xx = x * (1 - 1e-5 * it)
            t0 = time.perf_counter()
            _ = float(jnp.sum(fj(xx, tab)))
            rates.append(M / (time.perf_counter() - t0))
        print(f"{name}: {sorted(rates)[-2]/1e6:.1f} M samples/s")
    except Exception as e:
        print(f"{name} FAILED: {type(e).__name__}: {str(e)[:3000]}")
if len(outs) == 2:
    err = np.abs(outs["gather"] - outs["dense"]).max()
    print("max abs diff (bf16 dense vs f32 gather):", err)
