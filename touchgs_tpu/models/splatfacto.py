"""The depth-supervised Gaussian-splatting model (the fork's
`depth-gaussian-splatting` method, SURVEY.md §2.9).

`render` produces RGB + expected depth + accumulation for one camera;
`compute_losses` adds the photometric loss (L1 + SSIM, splatfacto convention)
and the depth supervision term in both reference modes:

- ``SIMPLE_LOSS``: masked L1 between rendered and fused depth.
- ``DEPTH_UNCERTAINTY_WEIGHTED_LOSS``: the residual down-weighted by the
  per-pixel fused uncertainty sigma with strength ``uncertainty_weight``
  (CLI contract at ``scripts/train_bunny_real.sh:52``).  The fork's exact
  formula is not in the checkout (empty submodule), so three candidate
  forms were A/B'd on the hard mirror-style scene (r5, 6000 steps, mirror
  preset — RESULTS_r05.md): ``1/(1+uw·σ)`` 21.15 dB / 8.13 cm object MAE;
  ``1/(1+uw·σ²)`` 20.91 dB / 9.43 cm; ``exp(−uw·σ)`` 18.86 dB / 10.97 cm.
  The default is ``w = 1/(1 + uncertainty_weight · σ)``
  (``DepthLossConfig.uncertainty_form="inv"``): it wins the A/B and is the
  same inverse-σ (not σ²) convention the fusion stage itself uses
  (``utils/fuse_touch_vision.py:116-126``).  All forms reduce exactly to
  SIMPLE_LOSS as uncertainty_weight → 0.

The screen-space positional gradient needed by densification is exposed by
rendering through an explicit zero `means2d_offset`: grad w.r.t. it is the
per-Gaussian screen gradient (the stat gsplat accumulates in its backward
kernel).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from touchgs_tpu.config import DepthLossConfig, DepthLossType, ModelConfig
from touchgs_tpu.data.cameras import Camera
from touchgs_tpu.models.gaussians import GaussianParams
from touchgs_tpu.ops.projection import (
    ProjectedGaussians,
    project_gaussians,
    view_directions,
)
from touchgs_tpu.ops.rasterize_ref import RenderOutput, rasterize_dense
from touchgs_tpu.ops.rasterize_tiled import rasterize_tiled
from touchgs_tpu.ops.sh import eval_sh
from touchgs_tpu.ops.ssim import ssim, ssim_cm


def render(
    params: GaussianParams,
    camera: Camera,
    cfg: ModelConfig,
    active_sh_degree: jnp.ndarray | int | None = None,
    background: jnp.ndarray | None = None,
    means2d_offset: jnp.ndarray | None = None,
    use_dense: bool = False,
    k_tile: int | None = None,
    tile_shards: int = 0,
    tile_pspec=None,
    gaussian_pspec=None,
) -> tuple[RenderOutput, ProjectedGaussians]:
    """Render one view. Returns (outputs, projected) — `projected` feeds the
    densification statistics (radii, validity)."""
    rcfg = cfg.rasterize
    if k_tile is None:
        k_tile = rcfg.k_tile
    opacities = params.opacities()
    proj = project_gaussians(
        params.means, params.quats, params.scales(),
        camera.w2c, camera.fx, camera.fy, camera.cx, camera.cy,
        camera.width, camera.height, rcfg,
        extra_valid=params.alive,
        # culling radii only (ceil'd → zero-gradient); stop_gradient keeps the
        # binning side-path out of the autodiff graph entirely
        opacities=jax.lax.stop_gradient(opacities),
    )
    if means2d_offset is not None:
        proj = proj._replace(means2d=proj.means2d + means2d_offset)

    cam_origin = camera.c2w[:3, 3]
    dirs = view_directions(params.means, cam_origin)
    colors = jnp.clip(
        eval_sh(params.sh_coeffs(), dirs, cfg.sh_degree, active_sh_degree) + 0.5,
        0.0, None,
    )
    bg = background if background is not None else jnp.asarray(cfg.background)
    if use_dense:
        out = rasterize_dense(
            proj, colors, opacities, camera.width, camera.height, rcfg,
            background=bg,
        )
    elif rcfg.use_pallas:
        from touchgs_tpu.ops.rasterize_pallas import rasterize_pallas

        out = rasterize_pallas(
            proj, colors, opacities, camera.width, camera.height, rcfg,
            background=bg, k_tile=k_tile, k_chunk=rcfg.k_chunk,
            interpret=jax.default_backend() == "cpu",
            tile_shards=tile_shards, tile_pspec=tile_pspec,
            gaussian_pspec=gaussian_pspec,
        )
    else:
        out = rasterize_tiled(
            proj, colors, opacities, camera.width, camera.height, rcfg,
            background=bg, k_tile=k_tile,
            tile_shards=tile_shards, tile_pspec=tile_pspec,
        )
    return out, proj


# last sufficient eval k_tile per (capacity, width, height): frames after
# the first start at the proven cap instead of re-escalating (and
# re-rendering) every camera of an eval sweep / video path
_LOSSLESS_K: dict = {}


def render_lossless(
    params: GaussianParams,
    camera: Camera,
    cfg: ModelConfig,
    active_sh_degree: jnp.ndarray | int | None = None,
    background: jnp.ndarray | None = None,
    max_k_tile: int = 8192,
) -> RenderOutput:
    """Render with an escalating per-tile cap until nothing is truncated.

    Training tolerates (and monitors) k_tile truncation; EVAL must not — a
    trained model routinely concentrates more gaussians per tile than the
    training cap, and evaluating through the same cap poisons the metrics
    with tile-shaped holes (observed: 32-px black squares in eval renders,
    r4).  Doubles k_tile until the truncation telemetry reads zero (one
    cached jit per k_tile; the sufficient cap is remembered per
    capacity/resolution so subsequent frames render once).
    """
    key = (params.capacity, camera.width, camera.height)
    k = max(cfg.rasterize.k_tile, _LOSSLESS_K.get(key, 0))
    while True:
        out, _ = render(params, camera, cfg,
                        active_sh_degree=active_sh_degree,
                        background=background, k_tile=k)
        if (out.lossy_tiles is None or k >= max_k_tile
                or int(out.lossy_tiles) == 0):
            _LOSSLESS_K[key] = k
            return out
        k = min(k * 2, max_k_tile)


class LossOutput(NamedTuple):
    total: jnp.ndarray
    rgb_l1: jnp.ndarray
    ssim_loss: jnp.ndarray
    depth_loss: jnp.ndarray
    psnr: jnp.ndarray


def depth_supervision_loss(
    rendered_depth: jnp.ndarray,   # (H, W)
    target_depth: jnp.ndarray,     # (H, W), 0 = no supervision
    uncertainty: Optional[jnp.ndarray],  # (H, W) sigma, or None
    cfg: DepthLossConfig,
) -> jnp.ndarray:
    valid = target_depth > 0
    residual = jnp.abs(rendered_depth - target_depth)
    if (
        cfg.depth_loss_type is DepthLossType.DEPTH_UNCERTAINTY_WEIGHTED_LOSS
        and uncertainty is not None
    ):
        # candidate forms A/B'd on the hard scene (see DepthLossConfig and
        # RESULTS_r05.md); all reduce to SIMPLE_LOSS as uncertainty_weight→0
        if cfg.uncertainty_form == "inv":
            w = 1.0 / (1.0 + cfg.uncertainty_weight * uncertainty)
        elif cfg.uncertainty_form == "exp":
            w = jnp.exp(-cfg.uncertainty_weight * uncertainty)
        else:  # "inv_sq" (default)
            w = 1.0 / (1.0 + cfg.uncertainty_weight * uncertainty**2)
        residual = residual * w
    residual = jnp.where(valid, residual, 0.0)
    denom = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(residual) / denom


def compute_losses(
    out: RenderOutput,
    image: jnp.ndarray,                  # (H, W, 3)
    depth: Optional[jnp.ndarray],        # (H, W) or None
    uncertainty: Optional[jnp.ndarray],  # (H, W) or None
    depth_cfg: DepthLossConfig,
    ssim_lambda: float = 0.2,
) -> LossOutput:
    # channel-major loss math: (H, W, 3) keeps C=3 on the TPU lane axis (2%
    # occupancy); two cheap transposes buy full-width vector ops for the
    # L1/SSIM stack (ssim fwd+grad measured 3.9 → ~1.3 ms at 800² on v5e)
    rgb_cm = jnp.transpose(out.rgb, (2, 0, 1))
    img_cm = jnp.transpose(image, (2, 0, 1))
    l1 = jnp.mean(jnp.abs(rgb_cm - img_cm))
    s = ssim_cm(rgb_cm, img_cm)
    ssim_loss = 1.0 - s
    rgb_total = (1.0 - ssim_lambda) * l1 + ssim_lambda * ssim_loss
    if depth is not None:
        d_loss = depth_supervision_loss(out.depth, depth, uncertainty, depth_cfg)
    else:
        d_loss = jnp.float32(0.0)
    total = rgb_total + depth_cfg.depth_loss_mult * d_loss
    mse = jnp.mean((rgb_cm - img_cm) ** 2)
    psnr = -10.0 * jnp.log10(jnp.maximum(mse, 1e-10))
    return LossOutput(total=total, rgb_l1=l1, ssim_loss=ssim_loss,
                      depth_loss=d_loss, psnr=psnr)
