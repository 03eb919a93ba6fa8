"""Differentiable SSIM (11x11 Gaussian window) for the splatfacto RGB loss.

splatfacto's training loss is (1-λ)·L1 + λ·(1-SSIM) (SURVEY.md §2.9); the
eval metric `ssim` is the same statistic (`experiment_utils/get_results.py:38`).
Implemented as two separable depthwise convolutions — XLA maps these onto the
MXU/VPU efficiently.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size) - size // 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    return (g / g.sum()).astype(np.float32)


_KERNEL = _gaussian_kernel()


def _blur(img: jnp.ndarray, size: int = 11) -> jnp.ndarray:
    """Separable Gaussian blur over (H, W, C) with same padding per channel."""
    k = jnp.asarray(_KERNEL)
    c = img.shape[-1]
    x = img[None]  # (1, H, W, C)
    kh = jnp.tile(k.reshape(size, 1, 1, 1), (1, 1, 1, c))
    kw = jnp.tile(k.reshape(1, size, 1, 1), (1, 1, 1, c))
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape, ("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), [(size // 2, size // 2), (0, 0)], dimension_numbers=dn,
        feature_group_count=c)
    x = jax.lax.conv_general_dilated(
        x, kw, (1, 1), [(0, 0), (size // 2, size // 2)], dimension_numbers=dn,
        feature_group_count=c)
    return x[0]


def ssim(
    img0: jnp.ndarray,  # (H, W, C) in [0, 1]
    img1: jnp.ndarray,
    c1: float = 0.01**2,
    c2: float = 0.03**2,
) -> jnp.ndarray:
    """Mean SSIM over the image (scalar)."""
    mu0 = _blur(img0)
    mu1 = _blur(img1)
    mu00, mu11, mu01 = mu0 * mu0, mu1 * mu1, mu0 * mu1
    s00 = _blur(img0 * img0) - mu00
    s11 = _blur(img1 * img1) - mu11
    s01 = _blur(img0 * img1) - mu01
    ssim_map = ((2 * mu01 + c1) * (2 * s01 + c2)) / (
        (mu00 + mu11 + c1) * (s00 + s11 + c2)
    )
    return jnp.mean(ssim_map)
