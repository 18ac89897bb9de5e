"""Patch-based structural criterion for --patch_size training.

The reference adds 1e-3 * LPIPS(alex) on sampled pixel patches when
patch_size > 1 (nerf/utils.py:524-533). LPIPS needs pretrained AlexNet
weights which require network access; on this image (and in any hermetic
TPU deployment) they are unavailable, so the TPU-native stand-in is a
differentiable SSIM-based structural loss computed in-graph on the same
patches (documented deviation: both are perceptual/structural criteria;
SSIM is weight-free). The 1e-3 weight matches the reference term.

When the torch `lpips` package IS importable with weights, evaluation
still reports true LPIPS through train/metrics.py; this module only
covers the differentiable training term.
"""

import jax.numpy as jnp


def patch_ssim_loss(pred, gt, patch_size: int, c1: float = 0.01 ** 2,
                    c2: float = 0.03 ** 2):
    """1 - SSIM over [N, 3] ray batches laid out as p x p patches.

    Args:
      pred, gt: [N, 3] float in [0, 1], N a multiple of patch_size**2,
        rays ordered patch-major (data/rays.py:48-58 patch sampling).
      patch_size: p.

    Returns scalar mean(1 - SSIM(patch)) using per-patch global statistics
    (uniform window over the whole p x p patch).
    """
    p2 = patch_size * patch_size
    n = pred.shape[0]
    pr = pred.reshape(n // p2, p2, 3)
    gt_ = gt.reshape(n // p2, p2, 3)
    mu_p = jnp.mean(pr, axis=1)
    mu_g = jnp.mean(gt_, axis=1)
    var_p = jnp.var(pr, axis=1)
    var_g = jnp.var(gt_, axis=1)
    cov = jnp.mean((pr - mu_p[:, None]) * (gt_ - mu_g[:, None]), axis=1)
    ssim = ((2 * mu_p * mu_g + c1) * (2 * cov + c2)) / \
        ((mu_p ** 2 + mu_g ** 2 + c1) * (var_p + var_g + c2))
    return jnp.mean(1.0 - ssim)


def patch_criterion(pred, gt, patch_size: int, weight: float = 1e-3):
    """The additive patch term of the reference train_step: 0 when
    patch_size <= 1."""
    if patch_size <= 1:
        return 0.0
    return weight * patch_ssim_loss(pred, gt, patch_size)
