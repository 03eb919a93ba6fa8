"""Monocular depth estimation — flax DPT-style model + pipeline interface.

Rebuild of ``vision_utils/run_zoe_depth.py`` (SURVEY.md §2.2): the
``VisualPipeline`` keeps the reference's model switch
(``model_type ∈ {'dpt', 'zoe', 'depth_anything'}``, run_zoe_depth.py:146-159)
behind one interface and writes uint16-mm PNGs named after the RGB files
(:104-116).

The network is a ViT-backbone DPT (patch-embed → transformer blocks →
multi-scale reassembly → residual fusion decoder → depth head), written in
flax so it runs on TPU through the same jit path as everything else.  This
zero-egress image carries no pretrained weights, so out of the box the model
is randomly initialized: the *pipeline contract* (alignment to sparse metric
depth happens downstream in `touch.fusion.align_vision_depth`, which fits
scale+offset against grounded depth) is what the rest of the system depends
on.  Real weights port in through ``load_npz_weights`` (a flat npz of this
module's param pytree, produced offline from a torch DPT checkpoint).
"""
from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from touchgs_tpu.data.depth_io import write_depth_mm


class _Block(nn.Module):
    dim: int
    heads: int

    @nn.compact
    def __call__(self, x):  # (tokens, dim)
        h = nn.LayerNorm()(x)
        h = nn.MultiHeadDotProductAttention(num_heads=self.heads)(h, h)
        x = x + h
        h = nn.LayerNorm()(x)
        h = nn.Dense(self.dim * 4)(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim)(h)
        return x + h


class DPTDepthModel(nn.Module):
    """Compact DPT: ViT encoder with 4 tap points + fusion decoder."""

    patch: int = 16
    dim: int = 192
    depth_blocks: int = 8
    heads: int = 3
    features: int = 96

    @nn.compact
    def __call__(self, rgb):  # (H, W, 3) in [0, 1] → (H, W) depth ≥ 0
        H, W, _ = rgb.shape
        ph, pw = H // self.patch, W // self.patch
        x = nn.Conv(self.dim, (self.patch, self.patch),
                    strides=(self.patch, self.patch))(rgb[None])  # (1,ph,pw,D)
        x = x.reshape(1, ph * pw, self.dim)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, ph * pw, self.dim))
        x = x + pos

        taps = []
        tap_every = max(1, self.depth_blocks // 4)
        for i in range(self.depth_blocks):
            x = _Block(self.dim, self.heads)(x)
            if (i + 1) % tap_every == 0 and len(taps) < 4:
                taps.append(x)
        while len(taps) < 4:
            taps.append(x)

        # reassemble: tokens → spatial maps at 4 scales
        feats = []
        for i, t in enumerate(taps):
            f = t.reshape(1, ph, pw, self.dim)
            f = nn.Conv(self.features, (3, 3))(f)
            scale = 2 ** (3 - i)  # deepest tap at coarsest scale
            f = jax.image.resize(
                f, (1, ph * 8 // scale, pw * 8 // scale, self.features),
                "bilinear",
            )
            feats.append(f)

        # fusion decoder: coarse → fine with residual conv units
        y = feats[3]
        for i in (2, 1, 0):
            y = jax.image.resize(y, feats[i].shape, "bilinear")
            y = y + feats[i]
            h = nn.relu(nn.Conv(self.features, (3, 3))(nn.relu(y)))
            y = y + nn.Conv(self.features, (3, 3))(h)

        y = jax.image.resize(y, (1, H, W, self.features), "bilinear")
        y = nn.relu(nn.Conv(self.features // 2, (3, 3))(y))
        depth = nn.Conv(1, (1, 1))(y)
        return nn.relu(depth[0, :, :, 0])


@dataclasses.dataclass
class VisualPipeline:
    """run_zoe_depth.py `VisualPipeline` equivalent: one interface over the
    monocular-depth model zoo, batch prediction to uint16-mm PNGs."""

    model_type: str = "dpt"   # 'dpt' | 'zoe' | 'depth_anything'
    image_size: tuple[int, int] = (384, 384)  # model input (H, W)
    weights_path: Optional[str] = None
    seed: int = 0

    def __post_init__(self):
        if self.model_type not in ("dpt", "zoe", "depth_anything"):
            raise ValueError(f"unknown model_type {self.model_type!r}")
        self._faithful = False
        kind = self._detect_ported(self.weights_path) if self.weights_path \
            else None
        if kind == "dpt":
            # architecture-exact DPT: real Intel/dpt-large weights
            from touchgs_tpu.vision.dpt import (
                arch_from_params, dpt_forward, load_ported_npz, preprocess,
            )

            self.params = load_ported_npz(self.weights_path)
            arch = arch_from_params(self.params)
            self._faithful = True
            self._dpt_preprocess = preprocess
            self._apply = jax.jit(lambda p, img: dpt_forward(p, img, arch))
            return
        if kind == "zoedepth":
            # ZoeD_N / ZoeD_NK metric-bins model (zoe_depth.py:3-10); NK
            # routing is resolved host-side per image via classify_domain
            from touchgs_tpu.vision.dpt import load_ported_npz
            from touchgs_tpu.vision import zoedepth as zd

            self.params = load_ported_npz(self.weights_path)
            arch = zd.arch_from_params(self.params)
            self._faithful = True
            self._dpt_preprocess = zd.preprocess
            self._zoe_arch = arch
            if len(arch.bin_configurations) > 1:
                names = [b.name for b in arch.bin_configurations]
                fwd = {
                    n: jax.jit(lambda p, img, n=n: zd.zoedepth_forward(
                        p, img, arch, bin_config_name=n)) for n in names}

                @jax.jit
                def route(p, img):
                    taps, ph, pw = zd._beit_backbone(p, img[None], arch)
                    _, bottleneck = zd._neck(p, taps, ph, pw, arch)
                    return zd.classify_domain(p, bottleneck, arch)

                def apply(p, img):
                    logits = np.asarray(route(p, img))[0]
                    return fwd[names[int(np.argmax(logits))]](p, img)

                self._apply = apply
            else:
                self._apply = jax.jit(
                    lambda p, img: zd.zoedepth_forward(p, img, arch))
            return
        if kind == "depth_anything":
            from touchgs_tpu.vision.dpt import load_ported_npz
            from touchgs_tpu.vision import depth_anything as da

            self.params = load_ported_npz(self.weights_path)
            arch = da.arch_from_params(self.params)
            self._faithful = True
            self._dpt_preprocess = da.preprocess
            self._apply = jax.jit(
                lambda p, img: da.depth_anything_forward(p, img, arch))
            return
        # fallback: compact trunk, random or npz-pytree weights — all three
        # model_types share it when no ported checkpoint is supplied
        self.model = DPTDepthModel()
        h, w = self.image_size
        dummy = jnp.zeros((h, w, 3), jnp.float32)
        self.params = self.model.init(jax.random.PRNGKey(self.seed), dummy)
        if self.weights_path:
            self.params = load_npz_weights(self.params, self.weights_path)
        self._apply = jax.jit(self.model.apply)

    @staticmethod
    def _detect_ported(path) -> str | None:
        """Classify a ported npz by its torch state_dict keys."""
        try:
            with np.load(path) as data:
                files = set(data.files)
        except Exception:
            return None
        if "dpt.embeddings.cls_token" in files:
            return "dpt"
        if any(k.startswith("metric_head.") for k in files):
            return "zoedepth"
        if "backbone.embeddings.cls_token" in files and any(
                k.startswith("neck.reassemble_stage.") for k in files):
            return "depth_anything"
        return None

    def predict_depth(self, rgb: np.ndarray) -> np.ndarray:
        """(H, W, 3) uint8/float image → (H, W) float32 depth (model units;
        metric alignment happens in fusion)."""
        orig_h, orig_w = rgb.shape[:2]
        if self._faithful:
            img = self._dpt_preprocess(rgb, size=max(self.image_size))
        else:
            img = jnp.asarray(rgb, jnp.float32)
            if img.max() > 1.5:
                img = img / 255.0
            mh, mw = self.image_size
            img = jax.image.resize(img, (mh, mw, 3), "bilinear")
        depth = self._apply(self.params, img)
        depth = jax.image.resize(depth, (orig_h, orig_w), "bicubic")
        return np.asarray(jnp.maximum(depth, 0.0))

    def predict(self, image_dir: str | Path, output_dir: str | Path) -> None:
        """Directory batch prediction (run_zoe_depth.py:93-116 contract):
        writes `<output_dir>/<rgb_name>.png` uint16-mm depth per image."""
        from PIL import Image

        image_dir = Path(image_dir)
        output_dir = Path(output_dir)
        output_dir.mkdir(parents=True, exist_ok=True)
        for img_path in sorted(image_dir.iterdir()):
            if img_path.suffix.lower() not in (".png", ".jpg", ".jpeg"):
                continue
            rgb = np.asarray(Image.open(img_path).convert("RGB"))
            depth = self.predict_depth(rgb)
            write_depth_mm(output_dir / f"{img_path.stem}.png", depth)


def load_npz_weights(params_like, path: str | Path):
    """Load a flat npz ('/'-joined keys) into the model's param pytree."""
    data = np.load(path)
    flat = {tuple(k.split("/")): jnp.asarray(v) for k, v in data.items()}

    def restore(tree, prefix=()):
        if isinstance(tree, dict):
            return {k: restore(v, prefix + (k,)) for k, v in tree.items()}
        if prefix in flat:
            assert flat[prefix].shape == tree.shape, prefix
            return flat[prefix]
        return tree

    return jax.tree_util.tree_map_with_path(
        lambda kp, leaf: flat.get(
            tuple(k.key for k in kp), leaf
        ),
        params_like,
    )


def save_npz_weights(params, path: str | Path) -> None:
    flat = {}

    def visit(tree, prefix=()):
        if hasattr(tree, "items"):
            for k, v in tree.items():
                visit(v, prefix + (str(k),))
        else:
            flat["/".join(prefix)] = np.asarray(tree)

    visit(params)
    np.savez(path, **flat)
