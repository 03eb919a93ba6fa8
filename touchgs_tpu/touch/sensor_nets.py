"""DenseTact sensor inference nets in flax (tactile image → depth / force).

Rebuild of the DenseTact v2 inference stack (SURVEY.md §2.11):

- ``TouchDepthNet`` — tactile RGB 640×640 → per-pixel depth image, output
  clipped to [0, 255] like ``getDepth``
  (``Img2Depth/img2depthforce.py:23-29``).  Compact random-init stand-in;
  with ported weights ``DenseTactSensor`` switches to the
  architecture-exact DenseNet-161 encoder-decoder in
  ``touch/densetact_nets.py`` (``networks/DenseNet.py:443-572``).
- ``ForceNet`` — tactile RGB → 6-DoF wrench, with the exact denormalization
  ranges of ``getForce`` (:31-39): force_range [11,11,14,.5,.5,.1], residual
  [5.5,5.5,11,.25,.25,.05].  Compact stand-in; ported weights switch to the
  faithful ``DenseNet_Force`` (densenet161 classifier + Linear 1000→500→6,
  ``networks/STForce.py:123-143`` — the net cam_ros.py:125 deploys).  The
  SwinV2 trunk variant lives in ``touch/swin_force.py``.
- Input normalization matches ``transform_image`` (:13-21): /255, ImageNet
  mean/std.

Weights: random init in this zero-egress image; port real checkpoints with
``tools/port_weights.py`` and pass ``depth_weights=``/``force_weights=``.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

# getForce denormalization constants (img2depthforce.py:35-37)
FORCE_RESIDUAL = np.array([5.5, 5.5, 11.0, 0.25, 0.25, 0.05], np.float32)
FORCE_RANGE = np.array([11.0, 11.0, 14.0, 0.5, 0.5, 0.1], np.float32)


def normalize_tactile(img: jnp.ndarray) -> jnp.ndarray:
    """transform_image contract: [0,255] or [0,1] RGB → ImageNet-normalized."""
    img = jnp.asarray(img, jnp.float32)
    img = jnp.where(jnp.max(img) > 1.5, img / 255.0, img)
    return (img - _IMAGENET_MEAN) / _IMAGENET_STD


class _DenseBlock(nn.Module):
    growth: int
    layers: int

    @nn.compact
    def __call__(self, x):
        for _ in range(self.layers):
            h = nn.relu(nn.GroupNorm(num_groups=8)(x))
            h = nn.Conv(self.growth, (3, 3))(h)
            x = jnp.concatenate([x, h], axis=-1)
        return x


class TouchDepthNet(nn.Module):
    """Tactile RGB (H, W, 3) → depth image (H, W) in [0, 255]."""

    base: int = 32

    @nn.compact
    def __call__(self, img):
        x = normalize_tactile(img)[None]
        skips = []
        widths = (self.base, self.base * 2, self.base * 4, self.base * 8)
        for w in widths:
            x = nn.Conv(w, (3, 3), strides=(2, 2))(x)
            x = _DenseBlock(growth=w // 4, layers=3)(x)
            skips.append(x)
        for w, s in zip(reversed(widths), reversed(skips)):
            x = jax.image.resize(x, s.shape[:3] + (x.shape[-1],), "bilinear")
            x = jnp.concatenate([x, s], axis=-1)
            x = nn.relu(nn.Conv(w, (3, 3))(x))
        x = jax.image.resize(
            x, (1, img.shape[0], img.shape[1], x.shape[-1]), "bilinear"
        )
        x = nn.relu(nn.Conv(self.base, (3, 3))(x))
        out = nn.Conv(1, (1, 1))(x)[0, :, :, 0]
        # DispHead-style bounded output scaled to the uint8 depth range
        return jax.nn.sigmoid(out) * 255.0


class _AttnBlock(nn.Module):
    dim: int
    heads: int = 4

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm()(x)
        h = nn.MultiHeadDotProductAttention(num_heads=self.heads)(h, h)
        x = x + h
        h = nn.LayerNorm()(x)
        x = x + nn.Dense(self.dim)(nn.gelu(nn.Dense(self.dim * 4)(h)))
        return x


class ForceNet(nn.Module):
    """Tactile RGB → normalized 6-vector in [0, 1] (denormalize via
    `denormalize_force`)."""

    dim: int = 128
    blocks: int = 4

    @nn.compact
    def __call__(self, img):
        x = normalize_tactile(img)[None]
        for _ in range(4):  # 16x downsample trunk
            x = nn.gelu(nn.Conv(self.dim, (3, 3), strides=(2, 2))(x))
        b, h, w, c = x.shape
        t = x.reshape(b, h * w, c)
        for _ in range(self.blocks):
            t = _AttnBlock(self.dim)(t)
        t = jnp.mean(t, axis=1)  # global pool
        # ForceHead (STForce.py:86): MLP → 6 outputs
        t = nn.gelu(nn.Dense(self.dim)(t))
        return jax.nn.sigmoid(nn.Dense(6)(t))[0]


def denormalize_force(pred: jnp.ndarray) -> jnp.ndarray:
    """getForce contract: normalized [0,1] → N / Nm ranges."""
    return pred * FORCE_RANGE - FORCE_RESIDUAL


@dataclasses.dataclass
class DenseTactSensor:
    """Runtime wrapper: per-sensor calibration mask + both nets.

    Mirrors `RunCamera` (cam_ros.py): `rectify` applies the per-sensor
    pixel-index remap (calib_idx contract, cam_ros.py:64-65,230-250), then
    depth/force inference.
    """

    input_size: int = 640
    seed: int = 0
    calib_index: Optional[np.ndarray] = None  # flat remap indices
    depth_weights: Optional[str] = None  # ported DenseDepth npz
    force_weights: Optional[str] = None  # ported DenseNet_Force npz

    def __post_init__(self):
        # ported torch checkpoints (tools/port_weights.py) run through the
        # architecture-exact DenseNet-161 nets; otherwise the compact
        # random-init stand-ins keep the runtime contract exercisable
        from touchgs_tpu.touch import densetact_nets as dt

        self._faithful_depth = bool(
            self.depth_weights and self._is_ported(self.depth_weights))
        self._faithful_force = bool(
            self.force_weights and self._is_ported(self.force_weights))
        key = jax.random.PRNGKey(self.seed)
        dummy = jnp.zeros((self.input_size, self.input_size, 3), jnp.float32)
        k1, k2 = jax.random.split(key)
        if self._faithful_depth:
            self.depth_params = self._load_npz(self.depth_weights)
            # cam_ros.py:113: DenseDepth(max_depth=256); input is
            # transform_image-normalized (img2depthforce.py:13-21)
            self._depth_fn = jax.jit(
                lambda p, img: dt.dense_depth_forward(
                    p, normalize_tactile(img), max_depth=256.0))
        else:
            self.depth_net = TouchDepthNet()
            self.depth_params = self.depth_net.init(k1, dummy)
            self._depth_fn = jax.jit(self.depth_net.apply)
        if self._faithful_force:
            self.force_params = self._load_npz(self.force_weights)
            self._force_fn = jax.jit(
                lambda p, img: dt.densenet_force_forward(
                    p, normalize_tactile(img)))
        else:
            self.force_net = ForceNet()
            self.force_params = self.force_net.init(k2, dummy)
            self._force_fn = jax.jit(self.force_net.apply)

    @staticmethod
    def _is_ported(path) -> bool:
        try:
            with np.load(path) as data:
                return "encoder.densenet.features.conv0.weight" in data.files
        except Exception:
            return False

    @staticmethod
    def _load_npz(path) -> dict:
        with np.load(path) as data:
            return {k: jnp.asarray(v) for k, v in data.items()}

    def rectify(self, raw: np.ndarray) -> np.ndarray:
        """Mask-index fisheye rectification + crop (rectifyimg contract)."""
        if self.calib_index is None:
            return raw
        flat = raw.reshape(-1, raw.shape[-1])
        out = flat[self.calib_index.ravel()]
        side = int(np.sqrt(self.calib_index.size))
        return out.reshape(side, side, raw.shape[-1])

    def get_depth(self, img: np.ndarray) -> np.ndarray:
        """uint8 depth image in [0, 255] (getDepth contract)."""
        d = self._depth_fn(self.depth_params, jnp.asarray(img, jnp.float32))
        return np.uint8(np.clip(np.asarray(d), 0, 255))

    def get_force(self, img: np.ndarray) -> np.ndarray:
        """6-DoF wrench [Fx, Fy, Fz, Tx, Ty, Tz] in N / Nm."""
        f = self._force_fn(self.force_params, jnp.asarray(img, jnp.float32))
        return np.asarray(denormalize_force(f))
