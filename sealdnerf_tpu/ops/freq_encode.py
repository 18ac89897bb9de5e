"""Frequency (sin/cos positional) encoding.

Parity with reference freqencoder/src/freqencoder.cu:30-59: for degree F the
output is [x, sin(2^0 x), cos(2^0 x), ..., sin(2^{F-1} x), cos(2^{F-1} x)],
laid out as the raw D inputs followed by, for each frequency, sin over all D
dims then cos over all D dims. Output dim = D + D * F * 2.

The backward pass (freqencoder.cu:63-95) is plain autodiff here.
"""

import jax.numpy as jnp


def freq_output_dim(input_dim: int, degree: int) -> int:
    return input_dim + input_dim * degree * 2


def freq_encode(x, degree: int = 6):
    """x: [..., D] float -> [..., D + D*degree*2] float."""
    outs = [x]
    for f in range(degree):
        xf = x * (2.0 ** f)
        outs.append(jnp.sin(xf))
        outs.append(jnp.cos(xf))
    return jnp.concatenate(outs, axis=-1)
