"""Faithful SwinV2 force-net trunk (STForce) in JAX.

Architecture-exact rebuild of the reference's vendored SwinTransformerV2 +
force head (``Img2Depth/networks/swin_transformer_force.py``, configured at
``networks/STForce.py:40-86``: embed 192, depths [2,2,18,2], heads
[6,12,24,48], window 20, img 640; head Linear(1000→500→6)).  Params are a
flat dict keyed by torch state_dict names (layouts converted by
``tools/port_weights.py``), under the ``backbone.`` / ``force_head.``
prefixes of the STForce module.

SwinV2 specifics replicated exactly (file:line cites into the vendored
reference file):

- res-post-norm blocks: ``x + norm1(attn(x))`` then ``x + norm2(mlp(x))``
  (:299-304) — NOT the V1 pre-norm order.
- cosine attention with a per-head clamped-exp ``logit_scale`` (:154-156).
- continuous relative position bias: log-spaced coords table → 2-layer MLP
  (Linear(2,512)+ReLU+Linear(512,nH,no-bias)) → ``16·sigmoid`` (:92-111,
  158-163).
- qkv Linear without bias plus separate ``q_bias``/``v_bias`` (k bias fixed
  at zero, :127-149).
- PatchMerging: 2×2 space-to-depth → Linear(4C,2C,no-bias) → LayerNorm
  (:333-361 — norm AFTER reduction, the V2 order).
- shifted windows with the standard SW-MSA −100 additive mask (:243-266).
- trunk output: final LayerNorm → global average pool → classification head
  (:629-645); STForce feeds the 1000-d logits to the force head (:114-122).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SwinArch:
    """STForce.py:56-69 backbone_cfg (num_classes default 1000)."""

    img_size: int = 640
    patch_size: int = 4
    embed_dim: int = 192
    depths: Sequence[int] = (2, 2, 18, 2)
    num_heads: Sequence[int] = (6, 12, 24, 48)
    window_size: int = 20
    mlp_ratio: float = 4.0
    num_classes: int = 1000
    ln_eps: float = 1e-5


STFORCE_SWIN = SwinArch()


def _layernorm(x, p, name, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p[f"{name}.weight"] + p[
        f"{name}.bias"]


def _linear(x, p, name):
    y = x @ p[f"{name}.weight"]
    b = p.get(f"{name}.bias")
    return y if b is None else y + b


def _coords_table(wh, ww):
    """Log-spaced relative-coords table (swin_transformer_force.py:96-111)."""
    h = np.arange(-(wh - 1), wh, dtype=np.float32)
    w = np.arange(-(ww - 1), ww, dtype=np.float32)
    t = np.stack(np.meshgrid(h, w, indexing="ij"), axis=-1)  # (2wh-1,2ww-1,2)
    t[..., 0] /= wh - 1
    t[..., 1] /= ww - 1
    t *= 8
    t = np.sign(t) * np.log2(np.abs(t) + 1.0) / np.log2(8)
    return t.reshape(-1, 2)


def _rel_position_index(wh, ww):
    """(:114-125)"""
    ch, cw = np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij")
    c = np.stack([ch.ravel(), cw.ravel()])          # (2, wh*ww)
    rel = c[:, :, None] - c[:, None, :]             # (2, N, N)
    rel = rel.transpose(1, 2, 0)
    rel[..., 0] += wh - 1
    rel[..., 1] += ww - 1
    rel[..., 0] *= 2 * ww - 1
    return rel.sum(-1)                              # (N, N)


def _window_attention(x, p, name, num_heads, wh, ww, mask=None,
                      ln_eps=1e-5):
    """(:139-178); x: (nW*B, N, C)."""
    B_, N, C = x.shape
    hd = C // num_heads
    q_bias = p[f"{name}.q_bias"]
    v_bias = p[f"{name}.v_bias"]
    qkv_bias = jnp.concatenate([q_bias, jnp.zeros_like(v_bias), v_bias])
    qkv = x @ p[f"{name}.qkv.weight"] + qkv_bias
    qkv = qkv.reshape(B_, N, 3, num_heads, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]

    qn = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    kn = k / jnp.maximum(jnp.linalg.norm(k, axis=-1, keepdims=True), 1e-12)
    attn = jnp.einsum("bhqd,bhkd->bhqk", qn, kn)
    logit_scale = jnp.exp(
        jnp.minimum(p[f"{name}.logit_scale"], np.log(1.0 / 0.01)))
    attn = attn * logit_scale

    table = jnp.asarray(_coords_table(wh, ww))      # ((2wh-1)(2ww-1), 2)
    h1 = jax.nn.relu(_linear(table, p, f"{name}.cpb_mlp.0"))
    bias_table = h1 @ p[f"{name}.cpb_mlp.2.weight"]  # (T, nH)
    idx = jnp.asarray(_rel_position_index(wh, ww).reshape(-1))
    rpb = bias_table[idx].reshape(N, N, num_heads).transpose(2, 0, 1)
    attn = attn + 16.0 * jax.nn.sigmoid(rpb)[None]

    if mask is not None:
        nW = mask.shape[0]
        attn = attn.reshape(B_ // nW, nW, num_heads, N, N) + mask[:, None]
        attn = attn.reshape(B_, num_heads, N, N)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(B_, N, C)
    return _linear(out, p, f"{name}.proj")


def _window_partition(x, ws):
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, C)


def _window_reverse(wins, ws, H, W, C):
    B = wins.shape[0] // ((H // ws) * (W // ws))
    x = wins.reshape(B, H // ws, W // ws, ws, ws, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, C)


def _sw_mask(H, W, ws, shift):
    """SW-MSA additive mask (:243-266)."""
    img = np.zeros((1, H, W, 1), np.float32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wss in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[:, hs, wss, :] = cnt
            cnt += 1
    wins = np.asarray(_window_partition(jnp.asarray(img), ws))[..., 0]
    diff = wins[:, None, :] - wins[:, :, None]
    return jnp.asarray(np.where(diff != 0, -100.0, 0.0).astype(np.float32))


def _block(x, p, name, H, W, num_heads, ws, shift, mlp_ratio, ln_eps):
    """SwinTransformerBlock forward (:268-304) — res-post-norm."""
    B, L, C = x.shape
    if min(H, W) <= ws:      # (:226-229)
        shift, ws = 0, min(H, W)
    shortcut = x
    x = x.reshape(B, H, W, C)
    if shift > 0:
        x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
    wins = _window_partition(x, ws)
    mask = _sw_mask(H, W, ws, shift) if shift > 0 else None
    wins = _window_attention(wins, p, f"{name}.attn", num_heads, ws, ws,
                             mask, ln_eps)
    x = _window_reverse(wins, ws, H, W, C)
    if shift > 0:
        x = jnp.roll(x, (shift, shift), axis=(1, 2))
    x = x.reshape(B, L, C)
    x = shortcut + _layernorm(x, p, f"{name}.norm1", ln_eps)
    h = _linear(x, p, f"{name}.mlp.fc1")
    h = jax.nn.gelu(h, approximate=False)
    h = _linear(h, p, f"{name}.mlp.fc2")
    return x + _layernorm(h, p, f"{name}.norm2", ln_eps)


def _patch_merging(x, p, name, H, W, ln_eps):
    """(:333-361): space-to-depth → reduction → norm (V2 order)."""
    B, L, C = x.shape
    x = x.reshape(B, H, W, C)
    x = jnp.concatenate(
        [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2],
         x[:, 1::2, 1::2]], axis=-1)
    x = x.reshape(B, (H // 2) * (W // 2), 4 * C)
    x = x @ p[f"{name}.reduction.weight"]
    return _layernorm(x, p, f"{name}.norm", ln_eps)


def swin_v2_forward(p, rgb, arch: SwinArch = STFORCE_SWIN,
                    prefix="backbone") -> jnp.ndarray:
    """SwinTransformerV2.forward (:629-645): preprocessed (H, W, 3) →
    (num_classes,) logits."""
    H = W = arch.img_size
    ps, eps = arch.patch_size, arch.ln_eps
    x = rgb[None]
    w = p[f"{prefix}.patch_embed.proj.weight"]
    x = jax.lax.conv_general_dilated(
        x, w, (ps, ps), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = x + p[f"{prefix}.patch_embed.proj.bias"]
    ph, pw = H // ps, W // ps
    x = x.reshape(1, ph * pw, arch.embed_dim)
    if f"{prefix}.patch_embed.norm.weight" in p:
        x = _layernorm(x, p, f"{prefix}.patch_embed.norm", eps)

    h, wres = ph, pw
    for li, depth in enumerate(arch.depths):
        heads = arch.num_heads[li]
        for bi in range(depth):
            shift = 0 if bi % 2 == 0 else arch.window_size // 2
            x = _block(x, p, f"{prefix}.layers.{li}.blocks.{bi}", h, wres,
                       heads, arch.window_size, shift, arch.mlp_ratio, eps)
        if li < len(arch.depths) - 1:
            x = _patch_merging(x, p, f"{prefix}.layers.{li}.downsample",
                               h, wres, eps)
            h, wres = h // 2, wres // 2
    x = _layernorm(x, p, f"{prefix}.norm", eps)
    x = jnp.mean(x, axis=1)                          # avgpool over tokens
    return _linear(x, p, f"{prefix}.head")[0]


def stforce_forward(p, rgb, arch: SwinArch = STFORCE_SWIN) -> jnp.ndarray:
    """STForce.forward (:114-122): backbone logits → ForceHead fc2(fc1(x))."""
    logits = swin_v2_forward(p, rgb, arch)[None]
    h = _linear(logits, p, "force_head.fc1")
    return _linear(h, p, "force_head.fc2")[0]
