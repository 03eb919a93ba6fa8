"""DenseTact sensor-net TRAINING losses, in JAX.

The reference trains its tactile image→depth and image→force nets with a
small family of losses (all torch):

- scale-invariant log loss ``silog_loss`` and variants
  (`/root/reference/data_collection/ros1/dtv2_tactile_camera/src/Img2Depth/utils.py:171-250`),
- force RMSE ``rmseloss`` (same file, :243-250),
- a DenseDepth-style combined depth loss — gaussian-window SSIM + image-
  gradient edge term + L1
  (`.../networks/DenseNet_loss.py:23-105`, combined in ``prev_net_loss`` at
  `utils.py:189-210`),
- the depth/force eval metric stacks ``compute_errors*`` (`utils.py:81-160`).

These are pure jnp re-derivations of those formulas (unit-tested against the
reference math in ``tests/test_sensor_losses.py``), kept quirk-faithful:

- ``silog`` multiplies by 10 (training) / 100 (eval metric) exactly as the
  reference does;
- the DenseNet SSIM uses C1=0.01², C2=0.03² UNSCALED by the dynamic range —
  the reference accepts a ``val_range`` argument and then ignores it in the
  stability constants (`DenseNet_loss.py:55-56`); we replicate that, since
  the nets were trained under it;
- the gradient term zero-pads the last row/column like torch's
  ``image_gradients`` (`DenseNet_loss.py:79-100`) so the residual shapes
  match the input.

Everything is jit/vmap/grad-friendly (masks are weights, not boolean
indexing) and runs as plain VPU map-reduce on TPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


# ---------------------------------------------------------------------------
# silog / log-RMS / RMSE training losses (utils.py:171-250)
# ---------------------------------------------------------------------------

def silog_loss(depth_est: jnp.ndarray, depth_gt: jnp.ndarray,
               mask: jnp.ndarray | None = None,
               variance_focus: float = 0.85) -> jnp.ndarray:
    """Scale-invariant log loss: ``sqrt(E[d²] − λ·E[d]²) · 10`` with
    ``d = log(pred) − log(gt)`` over masked pixels (`utils.py:171-178`).

    The mask is applied as a weight (jit-stable) — numerically identical to
    the reference's boolean indexing for any non-empty mask.
    """
    d = jnp.log(jnp.maximum(depth_est, _EPS)) - jnp.log(
        jnp.maximum(depth_gt, _EPS))
    if mask is None:
        w = jnp.ones_like(d)
    else:
        w = mask.astype(d.dtype)
    n = jnp.maximum(jnp.sum(w), 1.0)
    m2 = jnp.sum(w * d * d) / n
    m1 = jnp.sum(w * d) / n
    return jnp.sqrt(jnp.maximum(m2 - variance_focus * m1 * m1, 0.0)) * 10.0


def rmslog_loss(depth_est: jnp.ndarray, depth_gt: jnp.ndarray,
                mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Root-mean-square log loss (`utils.py:234-241`)."""
    d = jnp.log(jnp.maximum(depth_est, _EPS)) - jnp.log(
        jnp.maximum(depth_gt, _EPS))
    if mask is None:
        w = jnp.ones_like(d)
    else:
        w = mask.astype(d.dtype)
    n = jnp.maximum(jnp.sum(w), 1.0)
    return jnp.sqrt(jnp.sum(w * d * d) / n)


def rmse_loss(est: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Force-net RMSE (`utils.py:243-250` ``rmseloss``)."""
    return jnp.sqrt(jnp.mean((gt - est) ** 2))


# ---------------------------------------------------------------------------
# DenseDepth-style SSIM + gradient + L1 combined depth loss
# (DenseNet_loss.py:23-105, prev_net_loss at utils.py:189-210)
# ---------------------------------------------------------------------------

def _gaussian_window(window_size: int, sigma: float) -> jnp.ndarray:
    x = jnp.arange(window_size, dtype=jnp.float32) - window_size // 2
    g = jnp.exp(-(x ** 2) / (2.0 * sigma ** 2))
    return g / jnp.sum(g)


def _blur(img: jnp.ndarray, win: jnp.ndarray) -> jnp.ndarray:
    """Separable gaussian filter over the trailing (H, W) axes with torch
    conv2d 'same' zero padding (matches ``F.conv2d(..., padding=pad)``)."""
    k = win.shape[0]
    pad = k // 2
    lead = img.shape[:-2]
    h, w = img.shape[-2:]
    x = img.reshape((-1, h, w))
    x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad)))
    # rows then cols — a gaussian outer-product window is separable
    x = jax.vmap(
        lambda im: jnp.apply_along_axis(
            lambda r: jnp.convolve(r, win, mode="valid"), 1, im))(x)
    x = jax.vmap(
        lambda im: jnp.apply_along_axis(
            lambda c: jnp.convolve(c, win, mode="valid"), 0, im))(x)
    return x.reshape(lead + (h, w))


def densetact_ssim(img1: jnp.ndarray, img2: jnp.ndarray,
                   window_size: int = 11) -> jnp.ndarray:
    """The DenseNet_loss gaussian-window SSIM score (`DenseNet_loss.py:23-75`).

    Inputs are (..., H, W); the score is the mean over all pixels/channels.
    Quirk kept: C1/C2 are 0.01²/0.03² regardless of the dynamic range (the
    torch original takes ``val_range`` and never uses it in the constants).
    """
    win = _gaussian_window(min(window_size, *img1.shape[-2:]), 1.5)
    mu1 = _blur(img1, win)
    mu2 = _blur(img2, win)
    mu1_sq, mu2_sq, mu12 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    sigma1_sq = _blur(img1 * img1, win) - mu1_sq
    sigma2_sq = _blur(img2 * img2, win) - mu2_sq
    sigma12 = _blur(img1 * img2, win) - mu12
    c1 = 0.01 ** 2
    c2 = 0.03 ** 2
    score = ((2 * mu12 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))
    return jnp.mean(score)


def image_gradients(img: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Forward differences zero-padded back to the input shape, matching
    torch ``image_gradients`` (`DenseNet_loss.py:79-100`).  (..., H, W)."""
    dy = img[..., 1:, :] - img[..., :-1, :]
    dx = img[..., :, 1:] - img[..., :, :-1]
    pad_y = [(0, 0)] * (img.ndim - 2) + [(0, 1), (0, 0)]
    pad_x = [(0, 0)] * (img.ndim - 2) + [(0, 0), (0, 1)]
    return jnp.pad(dy, pad_y), jnp.pad(dx, pad_x)


def gradient_loss(y_true: jnp.ndarray, y_pred: jnp.ndarray) -> jnp.ndarray:
    """Edge term of the DenseDepth loss (`DenseNet_loss.py:102-105`):
    mean |∇pred − ∇true| over both axes."""
    dy_t, dx_t = image_gradients(y_true)
    dy_p, dx_p = image_gradients(y_pred)
    return jnp.mean(jnp.abs(dy_p - dy_t) + jnp.abs(dx_p - dx_t))


def densetact_depth_loss(depth_est: jnp.ndarray, depth_gt: jnp.ndarray,
                         theta: float = 0.2) -> jnp.ndarray:
    """The combined DenseTact depth-net training loss, ``prev_net_loss``
    (`utils.py:189-210`): clamp((1−SSIM)·0.5, 0, 1) + ∇-edge term + θ·L1.

    Note the reference hardcodes ``theta = 0.2`` over whatever is passed in
    (`utils.py:195-196`); we keep it as a real default instead.
    """
    l1 = jnp.mean(jnp.abs(depth_est - depth_gt))
    ssim_term = jnp.clip(
        (1.0 - densetact_ssim(depth_est, depth_gt)) * 0.5, 0.0, 1.0)
    grad_term = gradient_loss(depth_gt, depth_est)
    return ssim_term + theta * l1 + grad_term


# ---------------------------------------------------------------------------
# eval metric stacks (utils.py:81-160)
# ---------------------------------------------------------------------------

def compute_depth_errors(gt: jnp.ndarray, pred: jnp.ndarray) -> dict:
    """The depth eval metrics of ``compute_errors`` (`utils.py:81-101`):
    silog/abs_rel/log10/rms/sq_rel/log_rms/d1/d2/d3 over valid pixels."""
    gt = jnp.maximum(gt, _EPS)
    pred = jnp.maximum(pred, _EPS)
    thresh = jnp.maximum(gt / pred, pred / gt)
    err = jnp.log(pred) - jnp.log(gt)
    return {
        "silog": jnp.sqrt(jnp.maximum(
            jnp.mean(err ** 2) - jnp.mean(err) ** 2, 0.0)) * 100.0,
        "abs_rel": jnp.mean(jnp.abs(gt - pred) / gt),
        "log10": jnp.mean(jnp.abs(jnp.log10(pred) - jnp.log10(gt))),
        "rms": jnp.sqrt(jnp.mean((gt - pred) ** 2)),
        "sq_rel": jnp.mean(((gt - pred) ** 2) / gt),
        "log_rms": jnp.sqrt(jnp.mean(err ** 2)),
        "d1": jnp.mean((thresh < 1.25).astype(jnp.float32)),
        "d2": jnp.mean((thresh < 1.25 ** 2).astype(jnp.float32)),
        "d3": jnp.mean((thresh < 1.25 ** 3).astype(jnp.float32)),
    }


def compute_force_errors(gt: jnp.ndarray, pred: jnp.ndarray) -> dict:
    """Per-component force metrics of ``compute_errors_force``
    (`utils.py:127-160`): RMSE plus per-axis |err| for the 6-DoF head."""
    l1 = jnp.abs(gt - pred)
    return {
        "rms": jnp.sqrt(jnp.mean((gt - pred) ** 2)),
        "l1_per_axis": jnp.mean(l1.reshape((-1, l1.shape[-1])), axis=0),
    }
