"""Differentiable SSIM (11x11 Gaussian window) for the splatfacto RGB loss.

splatfacto's training loss is (1-λ)·L1 + λ·(1-SSIM) (SURVEY.md §2.9); the
eval metric `ssim` is the same statistic (`experiment_utils/get_results.py:38`).

Implemented as two BLOCK-BANDED MATMULS, computed channel-major: a separable
blur along an axis is exactly `x @ Bᵀ` with B the (n, n) banded Toeplitz
matrix of the window (zero rows beyond the border = the same zero-padding
semantics as a pad+shift sum).  On TPU this puts the whole blur on the MXU:
the shift-add formulation moves ~40 shifted copies of a 37 MB stack through
HBM (measured 4.2 ms for SSIM fwd+grad at 800²).  A DENSE band matmul wastes
98.6% of its MACs on the zeros outside the 11-wide band (measured 3.8 ms
fwd+grad at 800² under HIGHEST); blocking the axis into 118-row tiles with a
5-row halo (K = 128, one exact MXU tile) contracts only the band
neighborhood — ~6x fewer MACs, same truncated-window semantics, exact f32.
`ssim` keeps the (H, W, C) interface; `ssim_cm` is the channel-major core
for callers (the training loss) that already hold transposed images.
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

_HIGHEST = jax.lax.Precision.HIGHEST


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


# block rows sized so K = _BLK + 2·(size//2) = 128 exactly (one MXU tile)
_BLK = 118


@functools.lru_cache(maxsize=8)
def _block_band(n: int, size: int = 11) -> tuple[np.ndarray, np.ndarray]:
    """Block decomposition of the banded blur matrix.

    Returns (Bblk, idx): Bblk (nb, _BLK, _BLK+2h) with
    Bblk[k, i, j] = B[k·_BLK + i, k·_BLK − h + j] (zeros out of range), and
    idx (nb, _BLK+2h) the source rows (into the h-zero-padded axis) each
    block contracts against.  y_block k depends only on x rows
    [k·_BLK − h, (k+1)·_BLK + h) — the band never reaches further."""
    half = size // 2
    nb = -(-n // _BLK)
    B = _band_matrix(n, size)
    k_in = _BLK + 2 * half
    Bp = np.zeros((nb * _BLK, nb * _BLK + 2 * half), np.float32)
    Bp[:n, half:half + n] = B
    blk = np.stack([Bp[k * _BLK:(k + 1) * _BLK, k * _BLK:k * _BLK + k_in]
                    for k in range(nb)])
    idx = np.stack([k * _BLK + np.arange(k_in) for k in range(nb)])
    # clamp (instead of clip-pad) is safe: those columns of Bblk are zero
    idx = np.minimum(idx, n + 2 * half - 1)
    return blk, idx


def _blur_cm(img: jnp.ndarray, size: int = 11) -> jnp.ndarray:
    """Separable Gaussian blur over (C, H, W) with same (zero) padding, as
    two HIGHEST-precision block-banded matmuls (exact f32, K = 128)."""
    C, H, W = img.shape
    half = size // 2
    bh, idx_h = _block_band(H, size)
    bw, idx_w = _block_band(W, size)
    bh, idx_h = jnp.asarray(bh), jnp.asarray(idx_h)
    bw, idx_w = jnp.asarray(bw), jnp.asarray(idx_w)

    # blur H: y[c, k·B+i, w] = Σ_j Bblk[k, i, j] x[c, idx_h[k, j], w]
    xp = jnp.pad(img, ((0, 0), (half, half), (0, 0)))
    xb = xp[:, idx_h, :]                              # (C, nb, K, W)
    y = jnp.einsum("kij,ckjw->ckiw", bh, xb,
                   preferred_element_type=jnp.float32,
                   precision=_HIGHEST)
    y = y.reshape(C, -1, W)[:, :H, :]

    # blur W on the last axis: z[c, h, k·B+i] = Σ_j Bblk[k, i, j] y[c, h, idx_w[k, j]]
    yp = jnp.pad(y, ((0, 0), (0, 0), (half, half)))
    yb = yp[:, :, idx_w]                              # (C, H, nb, K)
    z = jnp.einsum("kij,chkj->chki", bw, yb,
                   preferred_element_type=jnp.float32,
                   precision=_HIGHEST)
    return z.reshape(C, H, -1)[:, :, :W]


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
