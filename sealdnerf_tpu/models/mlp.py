"""Plain functional MLPs.

The reference builds its towers from bias-free nn.Linear stacks with ReLU
(nerf/network.py:34-69). Here an MLP is a list-of-weight-matrices pytree and a
pure apply function. Matmuls run in bf16 (TPU MXU native) with fp32 params and
fp32 accumulation -- the bf16 analog of the reference's fp16 autocast, without
needing a GradScaler.
"""

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp


def init_mlp(rng, dims: Sequence[int], bias: bool = False, dtype=jnp.float32):
    """Init weights for dims[0] -> dims[1] -> ... -> dims[-1].

    Matches torch.nn.Linear default init (kaiming_uniform(a=sqrt(5)) ==
    U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for the weight).
    """
    params = {"w": [], "b": [] if bias else None}
    keys = jax.random.split(rng, len(dims) - 1)
    for i, key in enumerate(keys):
        fan_in = dims[i]
        bound = 1.0 / jnp.sqrt(fan_in)
        w = jax.random.uniform(key, (dims[i], dims[i + 1]), dtype=dtype,
                               minval=-bound, maxval=bound)
        params["w"].append(w)
        if bias:
            params["b"].append(jnp.zeros((dims[i + 1],), dtype=dtype))
    if not bias:
        del params["b"]
    return params


def apply_mlp(params, x, activation=jax.nn.relu, final_activation=None,
              compute_dtype=jnp.bfloat16):
    """Apply the MLP. Hidden activations in compute_dtype, output in fp32."""
    ws: List = params["w"]
    bs: Optional[List] = params.get("b")
    h = x.astype(compute_dtype)
    n = len(ws)
    for i, w in enumerate(ws):
        h = jnp.dot(h, w.astype(compute_dtype),
                    preferred_element_type=jnp.float32)
        if bs is not None:
            h = h + bs[i]
        if i != n - 1:
            h = activation(h).astype(compute_dtype)
    h = h.astype(jnp.float32)
    if final_activation is not None:
        h = final_activation(h)
    return h
