"""Faithful LPIPS (VGG-16 backbone) in JAX.

The reference's eval contract includes a real LPIPS
(``experiment_utils/get_results.py:39``, computed by the fork's ns-eval with
the torch ``lpips`` package).  This is the architecture-exact computation:

- ScalingLayer: input in [-1, 1], normalized by the LPIPS shift/scale
  constants (the ImageNet statistics expressed in [-1, 1] space).
- VGG-16 features with taps after relu1_2 / relu2_2 / relu3_3 / relu4_3 /
  relu5_3 (torchvision ``features`` indices 3, 8, 15, 22, 29).
- Per-layer: channel-unit-normalize both feature maps, squared difference,
  1×1 ``lin`` conv (non-negative weights, no bias), spatial average; sum
  over the five layers.

Params are a flat torch-named dict via ``tools/port_weights.py`` — either a
full ``lpips.LPIPS(net='vgg')`` state_dict (``net.sliceK.I.weight`` +
``linK.model.1.weight``) or a torchvision VGG-16 (``features.I.weight``)
with separate lin weights; ``load_lpips_params`` normalizes the naming.
Without ported weights ``eval.metrics`` keeps its deterministic
random-feature fallback (ranking-preserving, values not torch-comparable).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

# LPIPS ScalingLayer constants (shift/scale in [-1, 1] input space)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# torchvision vgg16.features conv indices per block, and the relu tap indices
VGG16_CONVS = ((0, 2), (5, 7), (10, 12, 14), (17, 19, 21), (24, 26, 28))
VGG16_CHANNELS = (64, 128, 256, 512, 512)


def _conv(x, w, b):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b


def _maxpool2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def vgg16_taps(p, x, convs: Sequence[Sequence[int]] = VGG16_CONVS):
    """(1, H, W, 3) scaled input → the 5 tapped relu feature maps."""
    taps = []
    for bi, block in enumerate(convs):
        for ci in block:
            x = jax.nn.relu(
                _conv(x, p[f"features.{ci}.weight"], p[f"features.{ci}.bias"]))
        taps.append(x)
        if bi < len(convs) - 1:
            x = _maxpool2(x)
    return taps


def _unit_normalize(x, eps=1e-10):
    n = jnp.sqrt(jnp.sum(x ** 2, axis=-1, keepdims=True))
    return x / (n + eps)


def lpips_vgg(p, img0, img1, convs=VGG16_CONVS) -> jnp.ndarray:
    """LPIPS distance between two (H, W, 3) images in [0, 1]."""
    def scale(img):
        x = (jnp.asarray(img, jnp.float32) * 2.0 - 1.0)
        return ((x - _SHIFT) / _SCALE)[None]

    f0 = vgg16_taps(p, scale(img0), convs)
    f1 = vgg16_taps(p, scale(img1), convs)
    total = jnp.float32(0.0)
    for k, (a, b) in enumerate(zip(f0, f1)):
        d = (_unit_normalize(a) - _unit_normalize(b)) ** 2
        w = p[f"lin{k}.model.1.weight"]           # (1, 1, C, 1) after port
        val = jax.lax.conv_general_dilated(
            d, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        total = total + jnp.mean(val[..., 0])
    return total


def load_lpips_params(path) -> dict:
    """Load a ported npz, normalizing lpips-package names
    (``net.sliceK.I.*`` → ``features.I.*``)."""
    data = np.load(path)
    out = {}
    for k in data.files:
        name = k
        if name.startswith("net.slice"):
            name = "features." + name.split(".", 2)[2]
        out[name] = jnp.asarray(data[k])
    return out


def is_lpips_params(path) -> bool:
    try:
        with np.load(path) as data:
            return any(k.startswith(("lin0.model", "features.0.weight",
                                     "net.slice1")) for k in data.files)
    except Exception:
        return False
