import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time, numpy as np
from sealdnerf_tpu.utils.jaxsetup import setup_jax
setup_jax()
import jax, jax.numpy as jnp
x = jnp.ones((8, 128))
f = jax.jit(lambda x: x + 1)
_ = np.asarray(f(x))
t0 = time.perf_counter()
for _ in range(100):
    out = f(x)
_ = np.asarray(out)
print("tiny jit dispatch:", (time.perf_counter()-t0)/100*1e3, "ms")
t0 = time.perf_counter()
for _ in range(100):
    out = np.asarray(f(x))
print("tiny jit + fetch:", (time.perf_counter()-t0)/100*1e3, "ms")
