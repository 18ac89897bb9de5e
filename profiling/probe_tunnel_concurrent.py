"""Does the axon tunnel overlap concurrent output fetches?

The downlink cost model is ~38 ms fixed + ~30 ms/MB per fetch
(probe_tunnel.py). If the 38 ms is per-request latency rather than
serialized channel occupancy, fetching frame i on one thread while
frame i+1 dispatches/fetches on another hides the fixed cost and the
pipelined-FPS floor drops from (38 + 30*MB) to ~max(30*MB, device).

Measures: serial fetch of 8 x 1 MB fresh u8 arrays vs 2-thread and
4-thread interleaved fetches of the same arrays.
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from sealdnerf_tpu.utils.jaxsetup import setup_jax
setup_jax()

import jax
import jax.numpy as jnp


def main():
    n = 1_000_000
    f = jax.jit(lambda k: jax.random.randint(k, (n,), 0, 255, jnp.uint8))
    outs = [f(jax.random.PRNGKey(i)) for i in range(8)]
    for o in outs:
        o.block_until_ready()
    _ = np.asarray(outs[0][:1])

    t0 = time.perf_counter()
    for o in outs:
        _ = np.asarray(o)
    serial = time.perf_counter() - t0
    print(f"serial   8x1MB: {serial*1e3:7.1f} ms ({serial/8*1e3:.1f}/fetch)",
          flush=True)

    for nthreads in (2, 4):
        outs2 = [f(jax.random.PRNGKey(100 * nthreads + i)) for i in range(8)]
        for o in outs2:
            o.block_until_ready()
        with ThreadPoolExecutor(nthreads) as ex:
            t0 = time.perf_counter()
            list(ex.map(lambda o: np.asarray(o), outs2))
            par = time.perf_counter() - t0
        print(f"threads={nthreads} 8x1MB: {par*1e3:7.1f} ms "
              f"({par/8*1e3:.1f}/fetch)", flush=True)


if __name__ == "__main__":
    main()
