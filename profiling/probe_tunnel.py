"""Tunnel downlink cost model: fixed overhead vs bandwidth.

Downloads fresh u8 arrays of increasing size (values vary per fetch to
defeat the tunnel's dispatch dedupe) and fits ms = a + b * MB. The 800px
render FPS floor is set by this, not by device compute
(probe_fps800.py: fetch 266-409 ms for the 3.2 MB packed frame).
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time

import numpy as np

from sealdnerf_tpu.utils.jaxsetup import setup_jax
setup_jax()

import jax
import jax.numpy as jnp


def main():
    pts = []
    for mb in [0.05, 0.2, 0.8, 1.92, 3.2, 6.4]:
        n = int(mb * 1e6)
        f = jax.jit(lambda k, n=n: jax.random.randint(k, (n,), 0, 255,
                                                      jnp.uint8))
        outs = [f(jax.random.PRNGKey(i)) for i in range(4)]
        _ = np.asarray(outs[0][:1])
        for o in outs:
            o.block_until_ready()
        t0 = time.perf_counter()
        for o in outs[1:]:
            _ = np.asarray(o)
        dt = (time.perf_counter() - t0) / 3
        pts.append((mb, dt * 1e3))
        print(f"{mb:5.2f} MB: {dt*1e3:7.1f} ms  ({mb/dt:6.1f} MB/s)",
              flush=True)
    a = np.array(pts)
    A = np.stack([np.ones(len(a)), a[:, 0]], axis=1)
    coef, *_ = np.linalg.lstsq(A, a[:, 1], rcond=None)
    print(f"fit: ms = {coef[0]:.1f} + {coef[1]:.1f} * MB "
          f"(bandwidth {1000/coef[1]:.1f} MB/s)", flush=True)


if __name__ == "__main__":
    main()
