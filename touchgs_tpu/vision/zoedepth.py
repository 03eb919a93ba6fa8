"""Faithful ZoeDepth (BEiT backbone + metric-bins head(s)) in JAX.

Architecture-exact rebuild of HuggingFace ``ZoeDepthForDepthEstimation`` —
the model the reference loads as ``ZoeD_NK``
(`/root/reference/vision_utils/zoe_depth.py:3-10`,
`run_zoe_depth.py:63-65,102` uses ``model_type='zoe'`` in the main path) — so
real checkpoints (Intel/zoedepth-nyu, Intel/zoedepth-nyu-kitti) port 1:1 via
``tools/port_weights.py``.  Params are a flat dict keyed by torch state_dict
names with JAX layouts; the forward mirrors transformers'
``modeling_zoedepth.py`` + ``modeling_beit.py``:

- BEiT backbone: patch-16 conv embed → [CLS] (no absolute pos-embed) →
  pre-LN blocks with per-layer decomposed RELATIVE position bias (bilinearly
  table-resized off the native window, MiDaS-3.1 style), q/v-bias-only
  attention, LayerScale (λ1/λ2); taps = raw block outputs (stage 0 = stem).
- DPT neck with readout='project' reassembly; fusion ×2-upsamples with
  align_corners=True; also exposes the pre-fusion bottleneck (coarsest conv).
- Relative-depth head → (relative depth, 32-channel features).
- Metric-bins head: 1×1 bottleneck conv → seed bin regressor (softplus,
  unnormed — the released checkpoints' ``bin_centers_type``) → 4 attractor
  layers over the fused pyramid (inv_attractor with the HF-fixed α=300, γ=2)
  → conditional log-binomial softmax over bin probabilities → depth =
  Σ pᵢ·cᵢ.  The NK variant carries TWO bin configurations plus a patch
  transformer + MLP classifier that routes per image; routing is resolved
  host-side (`classify_domain`) and the routed head runs as a static branch.
"""
from __future__ import annotations

import dataclasses
import functools
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
class BinConfig:
    name: str = "nyu"
    n_bins: int = 64
    min_depth: float = 1e-3
    max_depth: float = 10.0


@dataclasses.dataclass(frozen=True)
class ZoeDepthArch:
    """Mirrors transformers.ZoeDepthConfig (+ its BEiT backbone)."""

    # backbone (BEiT)
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    patch_size: int = 16
    image_size: int = 384                 # native rel-pos window basis
    backbone_out_indices: Sequence[int] = (6, 12, 18, 24)  # 1-based stages
    layer_norm_eps: float = 1e-12
    # neck / heads
    neck_hidden_sizes: Sequence[int] = (96, 192, 384, 768)
    reassemble_factors: Sequence[float] = (4, 2, 1, 0.5)
    fusion_hidden_size: int = 256
    bottleneck_features: int = 256
    num_relative_features: int = 32
    add_projection: bool = False
    # metric bins
    bin_centers_type: str = "softplus"    # released ckpts; "normed" supported
    num_attractors: Sequence[int] = (16, 8, 4, 1)
    attractor_kind: str = "mean"
    bin_configurations: Sequence[BinConfig] = (BinConfig(),)
    min_temp: float = 0.0212
    max_temp: float = 50.0
    patch_transformer_heads: int = 4      # NK domain classifier


ZOEDEPTH_NYU = ZoeDepthArch()
ZOEDEPTH_NK = ZoeDepthArch(bin_configurations=(
    BinConfig("nyu", 64, 1e-3, 10.0), BinConfig("kitti", 64, 1e-3, 80.0)))


# ---------------------------------------------------------------- BEiT ----

@functools.lru_cache(maxsize=8)
def _rel_pos_index(wh: int, ww: int) -> np.ndarray:
    """BeitRelativePositionBias.generate_relative_position_index (numpy,
    static per window size)."""
    num_rel = (2 * wh - 1) * (2 * ww - 1) + 3
    grid = np.stack(np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij"))
    flat = grid.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]          # (2, N, N)
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    area = wh * ww
    index = np.zeros((area + 1, area + 1), np.int64)
    index[1:, 1:] = rel.sum(-1)
    index[0, :] = num_rel - 3
    index[:, 0] = num_rel - 2
    index[0, 0] = num_rel - 1
    return index


def _rel_pos_bias(p, prefix, arch: ZoeDepthArch, wh: int, ww: int):
    """(1, heads, N+1, N+1) relative position bias for window (wh, ww),
    table-resized off the native window when sizes differ."""
    table = p[f"{prefix}.relative_position_bias_table"]  # (num_rel_old, H)
    g = arch.image_size // arch.patch_size
    old_h, old_w = 2 * g - 1, 2 * g - 1
    new_h, new_w = 2 * wh - 1, 2 * ww - 1
    if (new_h, new_w) != (old_h, old_w):
        sub = table[: old_h * old_w]
        # NOTE: the HF code reshapes with (width, height) order — kept verbatim
        sub = sub.reshape(1, old_w, old_h, -1)
        sub = _resize_bilinear(sub, new_h, new_w, align_corners=False)
        sub = sub.reshape(new_h * new_w, -1)
        table = jnp.concatenate([sub, table[old_h * old_w:]], axis=0)
    index = jnp.asarray(_rel_pos_index(wh, ww))
    bias = table[index.reshape(-1)].reshape(
        wh * ww + 1, wh * ww + 1, -1)
    return jnp.transpose(bias, (2, 0, 1))[None]


def _beit_block(x, p, prefix, arch: ZoeDepthArch, rel_bias):
    n, t, d = x.shape
    heads = arch.num_heads
    hd = d // heads

    h = _layernorm(x, p, f"{prefix}.layernorm_before", arch.layer_norm_eps)

    def split(v):
        return v.reshape(n, t, heads, hd).transpose(0, 2, 1, 3)

    q = split(_linear(h, p, f"{prefix}.attention.attention.query"))
    # BEiT quirk: the key projection has no bias
    k = split(h @ p[f"{prefix}.attention.attention.key.weight"])
    v = split(_linear(h, p, f"{prefix}.attention.attention.value"))
    scores = jnp.einsum("nhqd,nhkd->nhqk", q, k) / jnp.sqrt(hd).astype(x.dtype)
    scores = scores + rel_bias
    probs = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum("nhqk,nhkd->nhqd", probs, v)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(n, t, d)
    ctx = _linear(ctx, p, f"{prefix}.attention.output.dense")
    x = x + ctx * p[f"{prefix}.lambda_1"]

    h = _layernorm(x, p, f"{prefix}.layernorm_after", arch.layer_norm_eps)
    h = _linear(h, p, f"{prefix}.intermediate.dense")
    h = jax.nn.gelu(h, approximate=False)
    h = _linear(h, p, f"{prefix}.output.dense")
    return x + h * p[f"{prefix}.lambda_2"]


def _beit_backbone(p, rgb, arch: ZoeDepthArch):
    """(1, H, W, 3) → list of 4 tap sequences (1, N+1, D)."""
    H, W = rgb.shape[1:3]
    P = arch.patch_size
    ph, pw = H // P, W // P
    x = _conv(rgb, p, "backbone.embeddings.patch_embeddings.projection",
              stride=P, padding="VALID")
    x = x.reshape(1, ph * pw, arch.hidden_size)
    cls = jnp.broadcast_to(p["backbone.embeddings.cls_token"],
                           (1, 1, arch.hidden_size))
    x = jnp.concatenate([cls, x], axis=1)

    taps = []
    if 0 in arch.backbone_out_indices:
        taps.append(x)
    for i in range(arch.num_layers):
        prefix = f"backbone.encoder.layer.{i}"
        rel = _rel_pos_bias(
            p, f"{prefix}.attention.attention.relative_position_bias",
            arch, ph, pw)
        x = _beit_block(x, p, prefix, arch, rel)
        if (i + 1) in arch.backbone_out_indices:
            taps.append(x)
    return taps, ph, pw


# ---------------------------------------------------------------- neck ----

def _neck(p, taps, ph, pw, arch: ZoeDepthArch):
    """Returns (fused list deepest→finest, bottleneck conv feature)."""
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
        h = _conv(h, p, f"neck.convs.{i}")
        feats.append(h)

    def residual_unit(x, prefix):
        h = jax.nn.relu(x)
        h = _conv(h, p, f"{prefix}.convolution1")
        h = jax.nn.relu(h)
        h = _conv(h, p, f"{prefix}.convolution2")
        return x + h

    fused_list = []
    fused = None
    for j, f in enumerate(feats[::-1]):
        prefix = f"neck.fusion_stage.layers.{j}"
        if fused is None:
            fused = f
        else:
            if fused.shape[1:3] != f.shape[1:3]:
                f = _resize_bilinear(f, fused.shape[1], fused.shape[2],
                                     align_corners=False)
            fused = fused + residual_unit(f, f"{prefix}.residual_layer1")
        fused = residual_unit(fused, f"{prefix}.residual_layer2")
        fused = _resize_bilinear(fused, fused.shape[1] * 2,
                                 fused.shape[2] * 2, align_corners=True)
        fused = _conv(fused, p, f"{prefix}.projection")
        fused_list.append(fused)
    return fused_list, feats[-1]


def _relative_head(p, fused_list, arch: ZoeDepthArch):
    x = fused_list[-1]
    if arch.add_projection:
        x = jax.nn.relu(_conv(x, p, "relative_head.projection"))
    x = _conv(x, p, "relative_head.conv1")
    x = _resize_bilinear(x, x.shape[1] * 2, x.shape[2] * 2,
                         align_corners=True)
    x = jax.nn.relu(_conv(x, p, "relative_head.conv2"))
    features = x
    x = jax.nn.relu(_conv(x, p, "relative_head.conv3"))
    return x[:, :, :, 0], features


# --------------------------------------------------------- metric bins ----

def _mlp_conv(x, p, prefix, act=jax.nn.relu):
    h = _conv(x, p, f"{prefix}.conv1")
    h = act(h)
    return _conv(h, p, f"{prefix}.conv2")


def _inv_attractor(dx, alpha: float = 300.0, gamma: int = 2):
    # HF calls inv_attractor with its DEFAULTS (α=300, γ=2) regardless of the
    # config values — kept verbatim for checkpoint compatibility
    return dx / (1 + alpha * dx ** gamma)


def _seed_bins(p, x, prefix, arch: ZoeDepthArch, bc: BinConfig):
    h = jax.nn.relu(_conv(x, p, f"{prefix}.conv1"))
    h = _conv(h, p, f"{prefix}.conv2")
    if arch.bin_centers_type == "normed":
        centers = jax.nn.relu(h) + 1e-3
        widths_n = centers / jnp.sum(centers, axis=-1, keepdims=True)
        widths = (bc.max_depth - bc.min_depth) * widths_n
        widths = jnp.pad(widths, ((0, 0), (0, 0), (0, 0), (1, 0)),
                         constant_values=bc.min_depth)
        edges = jnp.cumsum(widths, axis=-1)
        centers = 0.5 * (edges[..., :-1] + edges[..., 1:])
        return widths_n, centers
    centers = jax.nn.softplus(h)
    return centers, centers


def _attractor(p, x, prev_bin, prev_embedding, prefix, arch: ZoeDepthArch,
               bc: BinConfig):
    """One attractor layer (channel-last: bins on the last axis)."""
    if prev_embedding is not None:
        if prev_embedding.shape[1:3] != x.shape[1:3]:
            prev_embedding = _resize_bilinear(
                prev_embedding, x.shape[1], x.shape[2], align_corners=True)
        x = x + prev_embedding
    h = jax.nn.relu(_conv(x, p, f"{prefix}.conv1"))
    h = _conv(h, p, f"{prefix}.conv2")

    height, width = h.shape[1:3]
    prev_bin = _resize_bilinear(prev_bin, height, width, align_corners=True)

    if arch.bin_centers_type == "normed":
        a = jax.nn.relu(h) + 1e-3
        n_attr = a.shape[-1] // 2
        a = a.reshape(a.shape[0], height, width, n_attr, 2)
        attractors = a[..., 0]                       # the HF-preserved bug
        dx = attractors[..., :, None] - prev_bin[..., None, :]
        delta = _inv_attractor(dx)
        delta = (jnp.mean(delta, axis=-2) if arch.attractor_kind == "mean"
                 else jnp.sum(delta, axis=-2))
        new_normed = prev_bin + delta
        centers = (bc.max_depth - bc.min_depth) * new_normed + bc.min_depth
        centers = jnp.sort(centers, axis=-1)
        centers = jnp.clip(centers, bc.min_depth, bc.max_depth)
        return new_normed, centers
    attractors = jax.nn.softplus(h)
    dx = attractors[..., :, None] - prev_bin[..., None, :]
    delta = _inv_attractor(dx)
    delta = (jnp.mean(delta, axis=-2) if arch.attractor_kind == "mean"
             else jnp.sum(delta, axis=-2))
    new_centers = prev_bin + delta
    return new_centers, new_centers


def _log_binomial_softmax(probabilities, temperature, n_classes):
    """LogBinomialSoftmax.forward (channel-last over bins)."""
    eps = 1e-4
    p1 = jnp.clip(probabilities, eps, 1.0)
    p0 = jnp.clip(1.0 - probabilities, eps, 1.0)
    # the Stirling log-binomial row is a STATIC constant: compute it in
    # numpy f32 (bit-matching torch's f32 evaluation) — left as jnp ops,
    # XLA's constant folding of (n-k)·log(n-k+eps) at k = n-1 emits NaN
    k_idx_np = np.arange(n_classes, dtype=np.float32)
    n = np.float32(n_classes - 1) + np.float32(1e-7)
    k = k_idx_np + np.float32(1e-7)
    lb = (n * np.log(n) - k * np.log(k)
          - (n - k) * np.log(n - k + np.float32(1e-7)))
    k_idx = jnp.asarray(k_idx_np)
    k_m1 = jnp.float32(n_classes - 1)
    y = (jnp.asarray(lb) + k_idx * jnp.log(p1[..., None])
         + (k_m1 - k_idx) * jnp.log(p0[..., None]))
    return jax.nn.softmax(y / temperature[..., None], axis=-1)


def _conditional_log_binomial(p, main, condition, prefix,
                              arch: ZoeDepthArch, n_bins):
    x = jnp.concatenate([main, condition], axis=-1)
    h = _conv(x, p, f"{prefix}.mlp.0")
    h = jax.nn.gelu(h, approximate=False)
    h = jax.nn.softplus(_conv(h, p, f"{prefix}.mlp.2"))
    pr = h[..., :2] + 1e-4
    prob = pr[..., 0] / (pr[..., 0] + pr[..., 1])
    tm = h[..., 2:] + 1e-4
    temp = tm[..., 0] / (tm[..., 0] + tm[..., 1])
    temp = (arch.max_temp - arch.min_temp) * temp + arch.min_temp
    return _log_binomial_softmax(prob, temp, n_bins)


def _metric_bins(p, prefix, x, fused_list, rel_features, relative_depth,
                 arch: ZoeDepthArch, bc: BinConfig, multi: bool):
    """Shared seed → attractor → conditional-log-binomial chain.

    ``prefix`` addresses the per-configuration submodules for the NK head
    (e.g. ``metric_head.seed_bin_regressors.nyu``) or the flat names for the
    single head; the single head additionally conditions on the relative
    depth map (last_in = num_relative_features + 1)."""
    seed_name = (f"metric_head.seed_bin_regressors.{prefix}" if multi
                 else "metric_head.seed_bin_regressor")
    _, seed_centers = _seed_bins(p, x, seed_name, arch, bc)
    if arch.bin_centers_type == "normed":
        prev_bin = (seed_centers - bc.min_depth) / (bc.max_depth
                                                    - bc.min_depth)
    else:
        prev_bin = seed_centers
    prev_embedding = _mlp_conv(x, p, "metric_head.seed_projector")

    centers = prev_bin
    embedding = prev_embedding
    for i, feature in enumerate(fused_list):
        embedding = _mlp_conv(feature, p, f"metric_head.projectors.{i}")
        attr_name = (f"metric_head.attractors.{prefix}.{i}" if multi
                     else f"metric_head.attractors.{i}")
        prev_bin, centers = _attractor(p, embedding, prev_bin,
                                       prev_embedding, attr_name, arch, bc)
        prev_embedding = embedding

    last = rel_features
    if not multi:
        # relative_depth: (1, H, W) → conditioning channel resized to `last`
        rc = _resize_bilinear(relative_depth[..., None], last.shape[1],
                              last.shape[2], align_corners=True)
        last = jnp.concatenate([last, rc], axis=-1)

    embedding = _resize_bilinear(embedding, last.shape[1], last.shape[2],
                                 align_corners=True)
    clb_name = (f"metric_head.conditional_log_binomial.{prefix}" if multi
                else "metric_head.conditional_log_binomial")
    probs = _conditional_log_binomial(p, last, embedding, clb_name, arch,
                                      bc.n_bins)
    centers = _resize_bilinear(centers, probs.shape[1], probs.shape[2],
                               align_corners=True)
    return jnp.sum(probs * centers, axis=-1)


# ------------------------------------------------- NK domain classifier ----

def _patch_transformer(p, x, arch: ZoeDepthArch):
    """ZoeDepthPatchTransformerEncoder → (1, L+1, D) embeddings."""
    emb = _conv(x, p, "metric_head.patch_transformer.embedding_convPxP")
    n, h, w, d = emb.shape
    emb = emb.reshape(n, h * w, d)
    # extra leading zero token (F.pad(..., (1, 0)) on the sequence axis)
    emb = jnp.concatenate([jnp.zeros((n, 1, d), emb.dtype), emb], axis=1)
    L = emb.shape[1]
    pos = jnp.arange(L, dtype=jnp.float32)[:, None]
    idx = jnp.arange(0, d, 2, dtype=jnp.float32)[None, :]
    div = jnp.exp(idx * (-np.log(10000.0) / d))
    pe = pos * div
    pe = jnp.concatenate([jnp.sin(pe), jnp.cos(pe)], axis=1)[None]
    emb = emb + pe

    heads_p = "metric_head.patch_transformer.transformer_encoder"
    for i in range(4):     # HF hardcodes 4 iterations
        prefix = f"{heads_p}.{i}"
        # self-attention (separate q/k/v + out_proj)
        q = _linear(emb, p, f"{prefix}.self_attn.query")
        k = _linear(emb, p, f"{prefix}.self_attn.key")
        v = _linear(emb, p, f"{prefix}.self_attn.value")
        nh = arch.patch_transformer_heads
        hd = d // nh

        def split(t):
            return t.reshape(n, L, nh, hd).transpose(0, 2, 1, 3)

        scores = jnp.einsum("nhqd,nhkd->nhqk", split(q), split(k)) / np.sqrt(hd)
        probs = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum("nhqk,nhkd->nhqd", probs, split(v))
        ctx = ctx.transpose(0, 2, 1, 3).reshape(n, L, d)
        ctx = _linear(ctx, p, f"{prefix}.self_attn.out_proj")
        emb = _layernorm(emb + ctx, p, f"{prefix}.norm1", 1e-5)
        h2 = jax.nn.relu(_linear(emb, p, f"{prefix}.linear1"))
        h2 = _linear(h2, p, f"{prefix}.linear2")
        emb = _layernorm(emb + h2, p, f"{prefix}.norm2", 1e-5)
    return emb


def classify_domain(p, bottleneck, arch: ZoeDepthArch):
    """NK head: domain logits (batch-summed softmax vote in HF)."""
    x = _conv(bottleneck, p, "metric_head.conv2")
    emb = _patch_transformer(p, x, arch)[:, 0]
    h = jax.nn.relu(_linear(emb, p, "metric_head.mlp_classifier.linear1"))
    return _linear(h, p, "metric_head.mlp_classifier.linear2")


# ------------------------------------------------------------- forward ----

def zoedepth_forward(params: dict, rgb: jnp.ndarray,
                     arch: ZoeDepthArch = ZOEDEPTH_NYU,
                     bin_config_name: str | None = None) -> jnp.ndarray:
    """(H, W, 3) preprocessed image → (H', W') metric depth.

    For multi-configuration (NK) archs, ``bin_config_name`` selects the head
    ("nyu"/"kitti"); resolve it host-side with `classify_domain` (HF routes
    by an argmax over batch-summed softmax logits, a data-dependent branch)."""
    p = params
    taps, ph, pw = _beit_backbone(p, rgb[None], arch)
    fused_list, bottleneck = _neck(p, taps, ph, pw, arch)
    relative_depth, rel_features = _relative_head(p, fused_list, arch)

    multi = len(arch.bin_configurations) > 1
    if multi:
        names = [b.name for b in arch.bin_configurations]
        name = bin_config_name or names[0]
        bc = arch.bin_configurations[names.index(name)]
        x = _conv(bottleneck, p, "metric_head.conv2")
        depth = _metric_bins(p, name, x, fused_list, rel_features,
                             relative_depth, arch, bc, multi=True)
    else:
        bc = arch.bin_configurations[0]
        x = _conv(bottleneck, p, "metric_head.conv2")
        depth = _metric_bins(p, "", x, fused_list, rel_features,
                             relative_depth, arch, bc, multi=False)
    return depth[0]


def preprocess(rgb: np.ndarray, size: int | tuple[int, int] = (384, 512)
               ) -> jnp.ndarray:
    """ZoeDepthImageProcessor: 1/255, ImageNet-ish normalization (mean=std=
    0.5 per the HF processor), resize with ensure_multiple_of=32."""
    img = jnp.asarray(rgb, jnp.float32)
    if img.max() > 1.5:
        img = img / 255.0
    if isinstance(size, int):
        size = (size, size)
    h = (size[0] // 32) * 32
    w = (size[1] // 32) * 32
    img = _resize_bilinear(img[None], h, w, align_corners=False)[0]
    return (img - 0.5) / 0.5


def arch_from_params(params: dict) -> ZoeDepthArch:
    """Infer the backbone/head dims from a ported checkpoint."""
    d = params["backbone.embeddings.cls_token"].shape[-1]
    n_layers = 1 + max(
        int(k.split(".")[3]) for k in params
        if k.startswith("backbone.encoder.layer."))
    inter = params["backbone.encoder.layer.0.intermediate.dense.weight"
                   ].shape[-1]
    patch = params["backbone.embeddings.patch_embeddings.projection.weight"
                   ].shape[0]
    table = params["backbone.encoder.layer.0.attention.attention."
                   "relative_position_bias.relative_position_bias_table"]
    g = (int(round((table.shape[0] - 3) ** 0.5)) + 1) // 2
    heads = table.shape[-1]  # (num_relative_distance, num_heads)
    neck = tuple(
        params[f"neck.reassemble_stage.layers.{i}.projection.weight"
               ].shape[-1] for i in range(4))
    fusion = params["neck.convs.0.weight"].shape[-1]
    multi = any(k.startswith("metric_head.seed_bin_regressors.")
                for k in params)
    step = n_layers // 4
    taps = tuple(step * (i + 1) for i in range(4))
    if multi:
        # n_bins per configuration from the seed regressors' output convs;
        # min/max depth are the released NK values (nyu 10 m, kitti 80 m)
        bins = tuple(dataclasses.replace(
            bc, n_bins=params[
                f"metric_head.seed_bin_regressors.{bc.name}.conv2.weight"
            ].shape[-1])
            for bc in ZOEDEPTH_NK.bin_configurations)
    else:
        nb = params["metric_head.seed_bin_regressor.conv2.weight"].shape[-1]
        bins = (dataclasses.replace(ZOEDEPTH_NYU.bin_configurations[0],
                                    n_bins=nb),)
    return ZoeDepthArch(
        hidden_size=d, num_layers=n_layers, num_heads=heads,
        intermediate_size=inter, patch_size=patch, image_size=g * patch,
        backbone_out_indices=taps, neck_hidden_sizes=neck,
        fusion_hidden_size=fusion, bin_configurations=bins)
