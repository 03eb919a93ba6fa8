"""Differentiable SSIM (11x11 Gaussian window) for the splatfacto RGB loss.

splatfacto's training loss is (1-λ)·L1 + λ·(1-SSIM) (SURVEY.md §2.9); the
eval metric `ssim` is the same statistic (`experiment_utils/get_results.py:38`).

Implemented as two BANDED MATMULS, computed channel-major: a separable blur
along an axis is exactly `x @ Bᵀ` with B the (n, n) banded Toeplitz matrix of
the window (zero rows beyond the border = the same zero-padding semantics as
a pad+shift sum).  On TPU this puts the whole blur on the MXU: the shift-add
formulation moves ~40 shifted copies of a 37 MB stack through HBM (measured
4.2 ms for SSIM fwd+grad at 800²), while the two matmuls are 15 GMAC of
systolic work (~0.5 ms fwd+grad at HIGHEST f32 precision) and autodiff stays
matmul-shaped.  `ssim` keeps the (H, W, C) interface; `ssim_cm` is the
channel-major core for callers (the training loss) that already hold
transposed images.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size) - size // 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    return (g / g.sum()).astype(np.float32)


_KERNEL = _gaussian_kernel()


@functools.lru_cache(maxsize=8)
def _band_matrix(n: int, size: int = 11) -> np.ndarray:
    """(n, n) banded blur matrix: row i holds the window centered at i,
    truncated (not renormalized) at the borders — identical to a zero-pad
    shifted-add blur."""
    half = size // 2
    b = np.zeros((n, n), np.float32)
    for tap in range(size):
        off = tap - half
        idx = np.arange(max(0, -off), min(n, n - off))
        b[idx, idx + off] = _KERNEL[tap]
    return b


def _blur_cm(img: jnp.ndarray, size: int = 11) -> jnp.ndarray:
    """Separable Gaussian blur over (C, H, W) with same (zero) padding,
    as two HIGHEST-precision banded matmuls (exact f32)."""
    C, H, W = img.shape
    bh = jnp.asarray(_band_matrix(H, size))
    bw = jnp.asarray(_band_matrix(W, size))
    # blur H: y[c, i, w] = Σ_h B[i, h] x[c, h, w]
    y = jax.lax.dot_general(
        bh, img, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)        # (H, C, W)
    # blur W: z[h, c, j] = Σ_w y[h, c, w] B[j, w]
    z = jax.lax.dot_general(
        y, bw, (((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)        # (H, C, W)
    return jnp.transpose(z, (1, 0, 2))


def ssim_cm(
    img0: jnp.ndarray,  # (C, H, W) in [0, 1]
    img1: jnp.ndarray,
    c1: float = 0.01**2,
    c2: float = 0.03**2,
) -> jnp.ndarray:
    """Mean SSIM over a channel-major image pair (scalar)."""
    c = img0.shape[0]
    # one batched blur over 5·C channels instead of five C-channel blurs
    stacked = jnp.concatenate(
        [img0, img1, img0 * img0, img1 * img1, img0 * img1], axis=0)
    blurred = _blur_cm(stacked)
    mu0 = blurred[0:c]
    mu1 = blurred[c:2 * c]
    mu00, mu11, mu01 = mu0 * mu0, mu1 * mu1, mu0 * mu1
    s00 = blurred[2 * c:3 * c] - mu00
    s11 = blurred[3 * c:4 * c] - mu11
    s01 = blurred[4 * c:5 * c] - mu01
    ssim_map = ((2 * mu01 + c1) * (2 * s01 + c2)) / (
        (mu00 + mu11 + c1) * (s00 + s11 + c2)
    )
    return jnp.mean(ssim_map)


def ssim(
    img0: jnp.ndarray,  # (H, W, C) in [0, 1]
    img1: jnp.ndarray,
    c1: float = 0.01**2,
    c2: float = 0.03**2,
) -> jnp.ndarray:
    """Mean SSIM over the image (scalar)."""
    return ssim_cm(jnp.transpose(img0, (2, 0, 1)),
                   jnp.transpose(img1, (2, 0, 1)), c1, c2)
