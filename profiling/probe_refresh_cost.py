"""Probe: dynamic grid-refresh density throughput vs chunk size.

The refresh inside the dynamic segment evaluates 8 bins x h3/2 (= 8.4M)
fused-planar density queries per call via lax.map over 2^16-point chunks,
and the timeline probe puts the whole call at ~167 ms (~50M q/s). Measure
the fused dyn density alone at several chunk sizes to find how much is
chunking overhead vs kernel floor.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import numpy as np

from sealdnerf_tpu.utils.jaxsetup import setup_jax
setup_jax()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sealdnerf_tpu.models.cp import CPDNeRFConfig, make_cp_dnerf_field  # noqa: E402
from sealdnerf_tpu.ops.pallas_field import make_fused_dyn_forward_planar  # noqa: E402


def main():
    cfg = CPDNeRFConfig(bound=1.0)
    field = make_cp_dnerf_field(jax.random.PRNGKey(0), cfg)
    params = field.params
    fwd = make_fused_dyn_forward_planar(cfg)

    n_total = 1 << 20   # h3/2 for 128^3

    def unit_d3(m):
        return jnp.concatenate([jnp.zeros((2, m), jnp.float32),
                                jnp.ones((1, m), jnp.float32)], axis=0)

    for log2_chunk in (16, 17, 18, 19, 20):
        chunk = 1 << log2_chunk

        @jax.jit
        def sweep(params, pts, t):
            # pts: [n_total, 3] -> density sum, chunked like the segment
            d3 = unit_d3(chunk)

            def one(cc):
                return fwd(params, cc.T, d3, t)[0].sum()

            return jax.lax.map(one, pts.reshape(-1, chunk, 3)).sum()

        k = jax.random.PRNGKey(1)
        pts = jax.random.uniform(k, (n_total, 3), minval=-1, maxval=1)
        _ = float(sweep(params, pts, 0.3))  # compile
        t0 = time.perf_counter()
        reps = 8
        acc = 0.0
        for i in range(reps):
            # vary t so the tunnel cannot dedupe dispatches
            acc += float(sweep(params, pts, 0.1 + 0.01 * i))
        dt = (time.perf_counter() - t0) / reps
        print(f"[rc] chunk=2^{log2_chunk} ({chunk:>8d}): {dt*1e3:7.1f} ms "
              f"for {n_total} pts = {n_total/dt/1e6:6.1f} Mq/s",
              file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
