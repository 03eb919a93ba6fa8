"""Faithful Depth-Anything (DINOv2 backbone + DPT neck/head) in JAX.

Architecture-exact rebuild of HuggingFace ``DepthAnythingForDepthEstimation``
— the third branch of the reference's monodepth model switch
(`/root/reference/vision_utils/run_zoe_depth.py:63-65` loads Depth-Anything;
`vision_utils/dpt_module.py:22-34` also supports the DINOv2-backed DPT) — so
real checkpoints (LiheYoung/depth-anything-*-hf) port 1:1 via
``tools/port_weights.py``.  Params are a flat dict keyed by torch state_dict
names with JAX layouts (conv HWIO, linear (in, out)); the forward mirrors
transformers' ``modeling_depth_anything.py`` + ``modeling_dinov2.py``:

- DINOv2 backbone: patch-14 conv embed → [CLS] + pos-embed (bicubic
  interpolation off the native grid) → pre-LN blocks with LayerScale on both
  branches; taps = selected block outputs WITH the backbone's final layernorm
  applied (``apply_layernorm=True``), sequence-shaped (CLS kept).
- Reassemble: drop CLS (no readout projection, unlike ViT-DPT) → 1×1
  projection → resize (ConvT ×4, ConvT ×2, identity, 3×3 stride-2).
- Neck: 3×3 bias-free convs to fusion_hidden_size; fusion runs deepest →
  finest with pre-activation residual units; each fusion layer upsamples to
  the NEXT tap's size (align_corners=True) and applies a 1×1 projection.
- Head: 3×3 conv → bilinear to (patch_h·14, patch_w·14) (align_corners=True)
  → 3×3 conv → ReLU → 1×1 conv → final ReLU (relative) or sigmoid·max_depth
  (metric).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from touchgs_tpu.vision.dpt import (
    _conv,
    _conv_transpose,
    _layernorm,
    _linear,
    _resize_bilinear,
)


@dataclasses.dataclass(frozen=True)
class DepthAnythingArch:
    """Mirrors transformers.DepthAnythingConfig (+ its Dinov2 backbone)."""

    hidden_size: int = 384            # dinov2-small
    num_layers: int = 12
    num_heads: int = 6
    mlp_ratio: int = 4
    patch_size: int = 14
    image_size: int = 518             # pos-embed native size
    out_indices: Sequence[int] = (9, 10, 11, 12)   # 1-based stages (0 = stem)
    reassemble_hidden_size: int = 384
    neck_hidden_sizes: Sequence[int] = (48, 96, 192, 384)
    reassemble_factors: Sequence[float] = (4, 2, 1, 0.5)
    fusion_hidden_size: int = 64
    head_hidden_size: int = 32
    depth_estimation_type: str = "relative"
    max_depth: float = 1.0
    layer_norm_eps: float = 1e-6


DEPTH_ANYTHING_SMALL = DepthAnythingArch()


def _dinov2_block(x, p, prefix, arch: DepthAnythingArch):
    n, t, d = x.shape
    heads = arch.num_heads
    hd = d // heads

    h = _layernorm(x, p, f"{prefix}.norm1", arch.layer_norm_eps)

    def split(v):
        return v.reshape(n, t, heads, hd).transpose(0, 2, 1, 3)

    q = split(_linear(h, p, f"{prefix}.attention.attention.query"))
    k = split(_linear(h, p, f"{prefix}.attention.attention.key"))
    v = split(_linear(h, p, f"{prefix}.attention.attention.value"))
    scores = jnp.einsum("nhqd,nhkd->nhqk", q, k) / jnp.sqrt(hd).astype(x.dtype)
    probs = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum("nhqk,nhkd->nhqd", probs, v)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(n, t, d)
    ctx = _linear(ctx, p, f"{prefix}.attention.output.dense")
    x = x + ctx * p[f"{prefix}.layer_scale1.lambda1"]

    h = _layernorm(x, p, f"{prefix}.norm2", arch.layer_norm_eps)
    h = _linear(h, p, f"{prefix}.mlp.fc1")
    h = jax.nn.gelu(h, approximate=False)
    h = _linear(h, p, f"{prefix}.mlp.fc2")
    return x + h * p[f"{prefix}.layer_scale2.lambda1"]


def _dinov2_pos_embed(p, ph, pw, arch: DepthAnythingArch):
    """Bicubic pos-embed interpolation (modeling_dinov2
    interpolate_pos_encoding, align_corners=False)."""
    pos = p["backbone.embeddings.position_embeddings"]  # (1, 1+g*g, D)
    g = arch.image_size // arch.patch_size
    cls_pos, grid = pos[:, :1], pos[:, 1:]
    if (ph, pw) != (g, g):
        grid = grid.reshape(g, g, -1)
        # jax.image.resize 'bicubic' matches F.interpolate(mode='bicubic',
        # align_corners=False) to ~1e-6 on interior pixels
        grid = jax.image.resize(grid, (ph, pw, grid.shape[-1]), "bicubic")
        grid = grid.reshape(1, ph * pw, -1)
    return jnp.concatenate([cls_pos, grid], axis=1)


def depth_anything_forward(params: dict, rgb: jnp.ndarray,
                           arch: DepthAnythingArch = DEPTH_ANYTHING_SMALL
                           ) -> jnp.ndarray:
    """(H, W, 3) preprocessed image → (H, W) predicted depth.

    H, W must be multiples of ``arch.patch_size``."""
    H, W, _ = rgb.shape
    P = arch.patch_size
    ph, pw = H // P, W // P
    p = params

    x = _conv(rgb[None], p, "backbone.embeddings.patch_embeddings.projection",
              stride=P, padding="VALID")
    x = x.reshape(1, ph * pw, arch.hidden_size)
    cls = jnp.broadcast_to(p["backbone.embeddings.cls_token"],
                           (1, 1, arch.hidden_size))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + _dinov2_pos_embed(p, ph, pw, arch)

    # stages are 1-based over block outputs (stage 0 = the embeddings)
    taps = []
    if 0 in arch.out_indices:
        taps.append(x)
    for i in range(arch.num_layers):
        x = _dinov2_block(x, p, f"backbone.encoder.layer.{i}", arch)
        if (i + 1) in arch.out_indices:
            taps.append(x)

    # backbone final layernorm applied to every tap (apply_layernorm=True)
    taps = [_layernorm(t, p, "backbone.layernorm", arch.layer_norm_eps)
            for t in taps]

    # reassemble (CLS dropped, no readout project) + neck convs
    feats = []
    for i, t in enumerate(taps):
        h = t[:, 1:].reshape(1, ph, pw, -1)
        h = _conv(h, p, f"neck.reassemble_stage.layers.{i}.projection")
        f = arch.reassemble_factors[i]
        if f > 1:
            h = _conv_transpose(
                h, p, f"neck.reassemble_stage.layers.{i}.resize", int(f))
        elif f < 1:
            h = _conv(h, p, f"neck.reassemble_stage.layers.{i}.resize",
                      stride=int(round(1 / f)))
        h = _conv(h, p, f"neck.convs.{i}")          # 3×3, bias-free
        feats.append(h)

    # fusion, deepest → finest; each layer upsamples to the NEXT tap's
    # spatial size (the last one uses scale_factor=2), align_corners=True
    rev = feats[::-1]
    fused = None
    for j, f in enumerate(rev):
        prefix = f"neck.fusion_stage.layers.{j}"
        if fused is None:
            fused = f
        else:
            if fused.shape[1:3] != f.shape[1:3]:
                f = _resize_bilinear(f, fused.shape[1], fused.shape[2],
                                     align_corners=False)
            fused = fused + _residual_unit_da(f, p,
                                              f"{prefix}.residual_layer1")
        fused = _residual_unit_da(fused, p, f"{prefix}.residual_layer2")
        if j + 1 < len(rev):
            oh, ow = rev[j + 1].shape[1:3]
        else:
            oh, ow = fused.shape[1] * 2, fused.shape[2] * 2
        fused = _resize_bilinear(fused, oh, ow, align_corners=True)
        fused = _conv(fused, p, f"{prefix}.projection")

    # head
    y = _conv(fused, p, "head.conv1")
    y = _resize_bilinear(y, ph * P, pw * P, align_corners=True)
    y = jax.nn.relu(_conv(y, p, "head.conv2"))
    y = _conv(y, p, "head.conv3")
    if arch.depth_estimation_type == "metric":
        y = jax.nn.sigmoid(y) * arch.max_depth
    else:
        y = jax.nn.relu(y)
    return y[0, :, :, 0]


def _residual_unit_da(x, p, prefix):
    """DepthAnythingPreActResidualLayer: ReLU→conv→ReLU→conv + input."""
    h = jax.nn.relu(x)
    h = _conv(h, p, f"{prefix}.convolution1")
    h = jax.nn.relu(h)
    h = _conv(h, p, f"{prefix}.convolution2")
    return x + h


def arch_from_params(params: dict) -> DepthAnythingArch:
    """Infer the arch from a ported param dict (any Depth-Anything size)."""
    d = params["backbone.embeddings.cls_token"].shape[-1]
    n_layers = 1 + max(
        int(k.split(".")[3]) for k in params
        if k.startswith("backbone.encoder.layer."))
    patch = params[
        "backbone.embeddings.patch_embeddings.projection.weight"].shape[0]
    n_tokens = params["backbone.embeddings.position_embeddings"].shape[1] - 1
    image_size = int(round(n_tokens ** 0.5)) * patch
    neck = tuple(
        params[f"neck.reassemble_stage.layers.{i}.projection.weight"].shape[-1]
        for i in range(4))
    fusion = params["neck.convs.0.weight"].shape[-1]
    head_hidden = params["head.conv2.weight"].shape[-1]
    mlp_ratio = (params["backbone.encoder.layer.0.mlp.fc1.weight"].shape[-1]
                 // d)
    # HF conversion taps the last four blocks for every size
    out_indices = tuple(range(n_layers - 3, n_layers + 1))
    heads = max(1, d // 64)
    return DepthAnythingArch(
        hidden_size=d, num_layers=n_layers, num_heads=heads,
        mlp_ratio=mlp_ratio, patch_size=patch, image_size=image_size,
        out_indices=out_indices, reassemble_hidden_size=d,
        neck_hidden_sizes=neck, fusion_hidden_size=fusion,
        head_hidden_size=head_hidden)


def preprocess(rgb: np.ndarray, size: int = 518) -> jnp.ndarray:
    """Depth-Anything image processor: resize (multiple of 14), 1/255,
    ImageNet mean/std normalization."""
    img = jnp.asarray(rgb, jnp.float32)
    if img.max() > 1.5:
        img = img / 255.0
    s = (size // 14) * 14
    img = _resize_bilinear(img[None], s, s, align_corners=False)[0]
    mean = jnp.asarray([0.485, 0.456, 0.406], jnp.float32)
    std = jnp.asarray([0.229, 0.224, 0.225], jnp.float32)
    return (img - mean) / std
