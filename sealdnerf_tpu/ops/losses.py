"""Training losses. Parity with reference loss.py:7-76.

eff_distloss is the O(N) distortion loss (mip-NeRF 360) from
torch_efficient_distloss; here the forward alone is written with cumsums and
the gradient comes from autodiff, which reproduces the reference's hand-written
backward (loss.py:60-74) analytically.
"""

import jax.numpy as jnp


def mape_loss(pred, target, reduction: str = "mean"):
    """Mean absolute percentage error (loss.py:7-16)."""
    loss = jnp.abs(pred - target) / (jnp.abs(target) + 1e-2)
    return loss.mean() if reduction == "mean" else loss


def huber_loss(pred, target, delta: float = 0.1, reduction: str = "mean"):
    """Huber loss (loss.py:18-26)."""
    rel = jnp.abs(pred - target)
    sqr = 0.5 / delta * rel * rel
    loss = jnp.where(rel > delta, rel - 0.5 * delta, sqr)
    return loss.mean() if reduction == "mean" else loss


def eff_distloss(w, m, interval):
    """Efficient O(N) distortion loss (loss.py:30-76).

    Args:
      w: [B, N] volume-rendering weights.
      m: [B, N] sample midpoint distances.
      interval: scalar or [B, N] per-sample interval.
    """
    n_rays = 1
    for s in w.shape[:-1]:
        n_rays *= s
    wm = w * m
    w_cumsum = jnp.cumsum(w, axis=-1)
    wm_cumsum = jnp.cumsum(wm, axis=-1)
    w_prefix = jnp.concatenate(
        [jnp.zeros_like(w_cumsum[..., :1]), w_cumsum[..., :-1]], axis=-1
    )
    wm_prefix = jnp.concatenate(
        [jnp.zeros_like(wm_cumsum[..., :1]), wm_cumsum[..., :-1]], axis=-1
    )
    loss_uni = (1.0 / 3.0) * interval * w ** 2
    loss_bi = 2.0 * w * (m * w_prefix - wm_prefix)
    return (loss_bi.sum() + loss_uni.sum()) / n_rays
