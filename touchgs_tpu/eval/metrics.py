"""Evaluation metrics — the fork's ns-eval JSON contract.

Emits exactly the keys ``experiment_utils/get_results.py:33-52`` consumes:
``psnr``, ``ssim``, ``lpips`` always; ``depth_mse``, ``supervised_depth_mse``,
``gt_depth_mse``, ``gt_object_depth_mse`` when the corresponding maps exist
(the latter two gated by real-world ground truth, SURVEY.md §2.5).

LPIPS: the standard implementation needs pretrained AlexNet/VGG weights, which
this zero-egress environment cannot fetch.  `lpips_distance` implements the
LPIPS *computation* (normalized deep-feature L2, averaged over layers) over a
fixed randomly-initialized conv stack — random-feature perceptual distances
preserve ranking well — and loads real LPIPS-style weights from an .npz when
one is supplied via ``TOUCHGS_LPIPS_WEIGHTS``.  Scores are therefore
comparable *within* this framework; absolute values differ from torch-lpips
until real weights are dropped in.
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from touchgs_tpu.ops.ssim import ssim


def psnr(img0: jnp.ndarray, img1: jnp.ndarray) -> jnp.ndarray:
    mse = jnp.mean((img0 - img1) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-10))


# --- LPIPS-style perceptual distance ---------------------------------------

_LAYER_WIDTHS = (32, 64, 128, 256)


def _conv(x, w, stride=1):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _feature_stack_params(seed: int = 0):
    """Fixed random conv weights (He init) — deterministic across runs."""
    rng = np.random.default_rng(seed)
    params = []
    cin = 3
    for width in _LAYER_WIDTHS:
        fan_in = 3 * 3 * cin
        w = rng.normal(0, np.sqrt(2.0 / fan_in), (3, 3, cin, width))
        params.append(w.astype(np.float32))
        cin = width
    return params


@functools.lru_cache(maxsize=1)
def _lpips_vgg_params():
    """Ported real LPIPS-VGG weights (tools/port_weights.py npz), or None."""
    path = os.environ.get("TOUCHGS_LPIPS_WEIGHTS", "")
    if path and os.path.exists(path):
        from touchgs_tpu.eval.lpips_vgg import is_lpips_params, load_lpips_params

        if is_lpips_params(path):
            return load_lpips_params(path)
    return None


@functools.lru_cache(maxsize=1)
def _lpips_params():
    path = os.environ.get("TOUCHGS_LPIPS_WEIGHTS", "")
    if path and os.path.exists(path) and _lpips_vgg_params() is None:
        data = np.load(path)
        return [data[k] for k in sorted(data.files)]
    return _feature_stack_params()


def lpips_distance(img0: jnp.ndarray, img1: jnp.ndarray) -> jnp.ndarray:
    """Perceptual distance between (H, W, 3) images in [0, 1].

    With ported torch-lpips VGG weights (``TOUCHGS_LPIPS_WEIGHTS``) this is
    the architecture-exact LPIPS; otherwise the random-feature fallback."""
    vgg = _lpips_vgg_params()
    if vgg is not None:
        from touchgs_tpu.eval.lpips_vgg import lpips_vgg

        return lpips_vgg(vgg, img0, img1)
    params = [jnp.asarray(w) for w in _lpips_params()]

    def features(img):
        x = (img[None] - 0.5) * 2.0  # [-1, 1]
        feats = []
        for i, w in enumerate(params):
            x = _conv(x, w, stride=1 if i == 0 else 2)
            x = jax.nn.relu(x)
            # channel-normalize (the LPIPS unit-normalize step)
            norm = jnp.sqrt(jnp.sum(x**2, axis=-1, keepdims=True) + 1e-10)
            feats.append(x / norm)
        return feats

    f0 = features(img0)
    f1 = features(img1)
    dists = [jnp.mean(jnp.sum((a - b) ** 2, axis=-1)) for a, b in zip(f0, f1)]
    return jnp.mean(jnp.stack(dists))


def _masked_mse(a: jnp.ndarray, b: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    n = jnp.maximum(jnp.sum(mask), 1)
    return jnp.sum(jnp.where(mask, (a - b) ** 2, 0.0)) / n


def eval_metrics(
    rendered_rgb: jnp.ndarray,
    rendered_depth: jnp.ndarray,
    gt_rgb: jnp.ndarray,
    supervision_depth: Optional[jnp.ndarray] = None,  # fused depth map
    gt_depth: Optional[jnp.ndarray] = None,           # sensor/sim ground truth
    object_mask: Optional[jnp.ndarray] = None,
    is_real_world: bool = True,
) -> dict:
    """Per-view metric dict with the fork's exact key names."""
    out = {
        "psnr": float(psnr(rendered_rgb, gt_rgb)),
        "ssim": float(ssim(rendered_rgb, gt_rgb)),
        "lpips": float(lpips_distance(rendered_rgb, gt_rgb)),
    }
    if supervision_depth is not None:
        mask = supervision_depth > 0
        mse = float(_masked_mse(rendered_depth, supervision_depth, mask))
        out["depth_mse"] = mse
        out["supervised_depth_mse"] = mse
    if gt_depth is not None and is_real_world:
        mask = gt_depth > 0
        out["gt_depth_mse"] = float(_masked_mse(rendered_depth, gt_depth, mask))
        if object_mask is not None:
            out["gt_object_depth_mse"] = float(
                _masked_mse(rendered_depth, gt_depth, mask & object_mask)
            )
    return out
