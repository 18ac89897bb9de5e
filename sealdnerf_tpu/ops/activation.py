"""Truncated exponential activation.

Parity with reference activation.py:5-18: forward is exp(x); the backward
gradient is g * exp(clamp(x, -15, 15)), which keeps mixed-precision training
stable (an un-clamped exp gradient overflows fp16/bf16 for large sigma
pre-activations).
"""

import jax
import jax.numpy as jnp


@jax.custom_vjp
def trunc_exp(x):
    return jnp.exp(x)


def _trunc_exp_fwd(x):
    return jnp.exp(x), x


def _trunc_exp_bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, -15.0, 15.0)),)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)
