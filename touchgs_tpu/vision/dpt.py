"""Faithful DPT (Dense Prediction Transformer) depth model in JAX.

Architecture-exact rebuild of HuggingFace ``DPTForDepthEstimation`` (the
model the reference loads as ``Intel/dpt-large`` at
``/root/reference/vision_utils/dpt_module.py:22-34`` and which backs ZoeDepth,
``vision_utils/zoe_depth.py:3-10``) so that real torch checkpoints port onto
it 1:1 via ``tools/port_weights.py``.  Params are a flat dict keyed by the
*torch state_dict names* (layouts already converted to JAX conventions:
conv kernels HWIO, linear kernels (in, out)); the forward below reproduces
transformers' ``modeling_dpt.py`` semantics:

- ViT backbone: patch conv → [CLS] + pos-embed (bilinear-interpolated for
  non-native sizes) → pre-LN transformer blocks; taps = raw block outputs at
  ``backbone_out_indices`` (no final layernorm on taps).
- Reassemble per tap: readout-project ([tokens ‖ CLS] → Linear → GELU) →
  1×1 projection → resize (ConvT ×4, ConvT ×2, identity, 3×3 stride-2 conv).
- Neck: 3×3 no-bias convs to ``fusion_hidden_size``; feature-fusion stage runs
  deepest→finest with pre-activation residual units, ×2 bilinear upsampling
  (align_corners=True) and 1×1 projection.
- Head: 3×3 conv → ×2 upsample (align_corners=True) → 3×3 conv → ReLU →
  1×1 conv → ReLU.

Everything is shape-static and jittable; batch dim fixed at 1 per image
(the pipeline maps over files).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class DPTArch:
    """Mirrors transformers.DPTConfig (ViT variant, readout_type='project')."""

    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    patch_size: int = 16
    image_size: int = 384           # pos-embed native size
    backbone_out_indices: Sequence[int] = (5, 11, 17, 23)
    neck_hidden_sizes: Sequence[int] = (256, 512, 1024, 1024)
    reassemble_factors: Sequence[float] = (4, 2, 1, 0.5)
    fusion_hidden_size: int = 256
    layer_norm_eps: float = 1e-12


DPT_LARGE = DPTArch()


def _resize_bilinear(x, out_h, out_w, align_corners):
    """torch F.interpolate(mode='bilinear') semantics on NHWC arrays."""
    n, h, w, c = x.shape
    if h == out_h and w == out_w:
        return x

    def coords(out_n, in_n):
        if align_corners:
            if out_n == 1:
                return jnp.zeros((1,), jnp.float32)
            return jnp.arange(out_n, dtype=jnp.float32) * ((in_n - 1) / (out_n - 1))
        c = (jnp.arange(out_n, dtype=jnp.float32) + 0.5) * (in_n / out_n) - 0.5
        return jnp.clip(c, 0.0, in_n - 1)

    ys = coords(out_h, h)
    xs = coords(out_w, w)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (ys - y0.astype(jnp.float32))[None, :, None, None]
    wx = (xs - x0.astype(jnp.float32))[None, None, :, None]
    g = lambda yi, xi: x[:, yi][:, :, xi]
    top = g(y0, x0) * (1 - wx) + g(y0, x1) * wx
    bot = g(y1, x0) * (1 - wx) + g(y1, x1) * wx
    return top * (1 - wy) + bot * wy


def _conv(x, p, name, stride=1, padding="SAME"):
    w = p[f"{name}.weight"]  # HWIO
    y = jax.lax.conv_general_dilated(
        x, w, (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    b = p.get(f"{name}.bias")
    return y if b is None else y + b


def _conv_transpose(x, p, name, factor):
    """torch ConvTranspose2d(k=stride=factor, padding=0) equivalent.

    Porter stores the kernel as (kh, kw, I, O); ``transpose_kernel=True``
    gives torch's gradient-of-conv semantics (no spatial flip).
    """
    w = p[f"{name}.weight"]
    y = jax.lax.conv_transpose(
        x, w, (factor, factor), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), transpose_kernel=True)
    b = p.get(f"{name}.bias")
    return y if b is None else y + b


def _linear(x, p, name):
    return x @ p[f"{name}.weight"] + p[f"{name}.bias"]


def _layernorm(x, p, name, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    xn = (x - mu) * jax.lax.rsqrt(var + eps)
    return xn * p[f"{name}.weight"] + p[f"{name}.bias"]


def _attention(x, p, prefix, num_heads):
    n, t, d = x.shape
    hd = d // num_heads

    def split(v):
        return v.reshape(n, t, num_heads, hd).transpose(0, 2, 1, 3)

    q = split(_linear(x, p, f"{prefix}.attention.query"))
    k = split(_linear(x, p, f"{prefix}.attention.key"))
    v = split(_linear(x, p, f"{prefix}.attention.value"))
    scores = jnp.einsum("nhqd,nhkd->nhqk", q, k) / jnp.sqrt(hd).astype(x.dtype)
    probs = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum("nhqk,nhkd->nhqd", probs, v)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(n, t, d)
    return _linear(ctx, p, f"{prefix}.output.dense")


def _vit_block(x, p, prefix, arch: DPTArch):
    h = _layernorm(x, p, f"{prefix}.layernorm_before", arch.layer_norm_eps)
    x = x + _attention(h, p, f"{prefix}.attention", arch.num_heads)
    h = _layernorm(x, p, f"{prefix}.layernorm_after", arch.layer_norm_eps)
    h = _linear(h, p, f"{prefix}.intermediate.dense")
    h = jax.nn.gelu(h, approximate=False)
    h = _linear(h, p, f"{prefix}.output.dense")
    return x + h


def _pos_embed(p, ph, pw, arch: DPTArch):
    """Interpolate the native-grid position embeddings to (ph, pw)
    (modeling_dpt._resize_pos_embed: bilinear, align_corners=False)."""
    pos = p["dpt.embeddings.position_embeddings"]  # (1, 1+gh*gw, D)
    g = arch.image_size // arch.patch_size
    cls_pos, grid = pos[:, :1], pos[:, 1:]
    if (ph, pw) != (g, g):
        grid = grid.reshape(1, g, g, -1)
        grid = _resize_bilinear(grid, ph, pw, align_corners=False)
        grid = grid.reshape(1, ph * pw, -1)
    return jnp.concatenate([cls_pos, grid], axis=1)


def _residual_unit(x, p, prefix):
    """DPTPreActResidualLayer: ReLU→conv1→ReLU→conv2, plus input."""
    h = jax.nn.relu(x)
    h = _conv(h, p, f"{prefix}.convolution1")
    h = jax.nn.relu(h)
    h = _conv(h, p, f"{prefix}.convolution2")
    return x + h


def dpt_forward(params: dict, rgb: jnp.ndarray,
                arch: DPTArch = DPT_LARGE) -> jnp.ndarray:
    """(H, W, 3) preprocessed image → (H', W') predicted depth.

    H, W must be multiples of ``arch.patch_size``; the output is upsampled to
    2× the finest fusion scale (= H, W when H, W are multiples of 2·patch).
    """
    H, W, _ = rgb.shape
    P = arch.patch_size
    ph, pw = H // P, W // P
    p = params

    x = _conv(rgb[None], p, "dpt.embeddings.patch_embeddings.projection",
              stride=P, padding="VALID")           # (1, ph, pw, D)
    x = x.reshape(1, ph * pw, arch.hidden_size)
    cls = jnp.broadcast_to(p["dpt.embeddings.cls_token"],
                           (1, 1, arch.hidden_size))
    x = jnp.concatenate([cls, x], axis=1) + _pos_embed(p, ph, pw, arch)

    taps = []
    for i in range(arch.num_layers):
        x = _vit_block(x, p, f"dpt.encoder.layer.{i}", arch)
        if i in arch.backbone_out_indices:
            taps.append(x)

    # reassemble + neck convs
    feats = []
    for i, t in enumerate(taps):
        cls_tok, tokens = t[:, :1], t[:, 1:]
        readout = jnp.broadcast_to(cls_tok, tokens.shape)
        h = jnp.concatenate([tokens, readout], axis=-1)
        h = _linear(h, p, f"neck.reassemble_stage.readout_projects.{i}.0")
        h = jax.nn.gelu(h, approximate=False)
        h = h.reshape(1, ph, pw, arch.hidden_size)
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

    # feature fusion, deepest → finest (modeling_dpt DPTFeatureFusionStage)
    fused = None
    for j, f in enumerate(feats[::-1]):
        prefix = f"neck.fusion_stage.layers.{j}"
        if fused is None:
            fused = f
        else:
            if fused.shape[1:3] != f.shape[1:3]:
                f = _resize_bilinear(f, fused.shape[1], fused.shape[2],
                                     align_corners=False)
            fused = fused + _residual_unit(f, p, f"{prefix}.residual_layer1")
        fused = _residual_unit(fused, p, f"{prefix}.residual_layer2")
        fused = _resize_bilinear(fused, fused.shape[1] * 2,
                                 fused.shape[2] * 2, align_corners=True)
        fused = _conv(fused, p, f"{prefix}.projection")

    # head: conv → ×2 upsample → conv → relu → 1×1 conv → relu
    y = _conv(fused, p, "head.head.0")
    y = _resize_bilinear(y, y.shape[1] * 2, y.shape[2] * 2,
                         align_corners=True)
    y = jax.nn.relu(_conv(y, p, "head.head.2"))
    y = jax.nn.relu(_conv(y, p, "head.head.4"))
    return y[0, :, :, 0]


def preprocess(rgb: np.ndarray, size: int = 384) -> jnp.ndarray:
    """DPTImageProcessor equivalent: resize to (size, size), scale 1/255,
    normalize mean=std=0.5."""
    img = jnp.asarray(rgb, jnp.float32)
    if img.max() > 1.5:
        img = img / 255.0
    img = _resize_bilinear(img[None], size, size, align_corners=False)[0]
    return (img - 0.5) / 0.5


def load_ported_npz(path) -> dict:
    """Load a ported checkpoint (tools/port_weights.py output)."""
    data = np.load(path)
    return {k: jnp.asarray(v) for k, v in data.items()}


def arch_from_params(params: dict) -> DPTArch:
    """Infer the DPTArch from a ported param dict (so any DPT size loads)."""
    d = params["dpt.embeddings.cls_token"].shape[-1]
    n_layers = 1 + max(
        int(k.split(".")[3]) for k in params if k.startswith("dpt.encoder.layer.")
    )
    inter = params["dpt.encoder.layer.0.intermediate.dense.weight"].shape[-1]
    patch = params["dpt.embeddings.patch_embeddings.projection.weight"].shape[0]
    n_tokens = params["dpt.embeddings.position_embeddings"].shape[1] - 1
    image_size = int(round(n_tokens ** 0.5)) * patch
    neck = tuple(
        params[f"neck.reassemble_stage.layers.{i}.projection.weight"].shape[-1]
        for i in range(4)
    )
    fusion = params["neck.convs.0.weight"].shape[-1]
    # taps: evenly spaced (HF convention for the ViT backbone sizes)
    step = n_layers // 4
    taps = tuple(step * (i + 1) - 1 for i in range(4))
    if n_layers == 24:
        taps = (5, 11, 17, 23)  # dpt-large's published indices
    # heads: smallest divisor giving head_dim 64 where possible
    heads = max(1, d // 64)
    return DPTArch(hidden_size=d, num_layers=n_layers, num_heads=heads,
                   intermediate_size=inter, patch_size=patch,
                   image_size=image_size, backbone_out_indices=taps,
                   neck_hidden_sizes=neck, fusion_hidden_size=fusion)
