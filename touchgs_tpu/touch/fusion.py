"""Vision-touch depth fusion (jnp, jittable per view).

Faithful TPU re-design of the fusion stage (SURVEY.md §2.3,
``utils/fuse_touch_vision.py``):

- ``create_sparse_depth_map``  — random 1% sparsification (:19-39)
- ``compute_scale_and_offset`` — box-constrained least squares replacing
  scipy.optimize.minimize on the same objective (:41-74); the objective is
  convex quadratic so the closed form + KKT clipping reaches the same optimum
- ``align_vision_depth``       — two-stage alignment (:283-315): DS-GS
  scale+offset to the sparse grounded depth, then Touch-GS offset-only
  (scale pinned to 1) to the touch depth, applied only at touch-valid pixels
- ``fuse_depth_maps_with_uncertainty`` — product-of-Gaussians on σ (:76-202),
  replicated exactly including the inf→0 / nan→0 guards and the reference's
  use of σ (not σ²) in the weights
- ``fuse_depth_maps``          — naive overwrite baseline (:204-227)
- ``fuse_view``                — one view's full pipeline (the per-view hot
  loop of ``fuse_vision_and_touch`` :317-370) as a single jitted function
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from touchgs_tpu.touch import uncertainty as cu


def create_sparse_depth_map(
    key: jax.Array, dense_depth_map: jnp.ndarray, keep_percentage: float = 0.01
) -> jnp.ndarray:
    """Keep an exact fraction of random pixels, zero the rest (:19-39)."""
    total = dense_depth_map.size
    k = int(total * keep_percentage)
    perm = jax.random.permutation(key, total)
    mask_flat = jnp.zeros((total,), bool).at[perm[:k]].set(True)
    return jnp.where(mask_flat.reshape(dense_depth_map.shape), dense_depth_map, 0.0)


def compute_scale_and_offset(
    sparse_depth: jnp.ndarray,
    dense_depth: jnp.ndarray,
    scale_bounds: tuple[Optional[float], Optional[float]] = (0.0, None),
    offset_bounds: tuple[Optional[float], Optional[float]] = (None, None),
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """argmin_{s,b} Σ_mask (s·dense + b − sparse)², box-constrained.

    Closed-form normal equations with coordinate-wise KKT clipping (for a
    2-var convex quadratic, clipping the active bound and re-solving the free
    variable is exact).  Mask = sparse>0, as the reference (:51).
    """
    mask = sparse_depth > 0
    wsum = jnp.maximum(jnp.sum(mask), 1)
    x = jnp.where(mask, dense_depth, 0.0)
    y = jnp.where(mask, sparse_depth, 0.0)
    sx = jnp.sum(x) / wsum
    sy = jnp.sum(y) / wsum
    sxx = jnp.sum(x * x) / wsum
    sxy = jnp.sum(x * y) / wsum
    var = sxx - sx * sx
    cov = sxy - sx * sy
    scale_free = jnp.where(var > 1e-12, cov / jnp.maximum(var, 1e-12), 1.0)

    def clip_bounds(v, bounds):
        lo, hi = bounds
        if lo is not None:
            v = jnp.maximum(v, lo)
        if hi is not None:
            v = jnp.minimum(v, hi)
        return v

    # solve for scale, clip, then offset given scale, clip, then re-solve
    # scale given offset (one sweep suffices for a 2-var box QP when at most
    # one constraint is active, which covers the reference's usages)
    scale = clip_bounds(scale_free, scale_bounds)
    offset = clip_bounds(sy - scale * sx, offset_bounds)
    scale2 = jnp.where(
        sxx > 1e-12, (sxy - offset * sx) / jnp.maximum(sxx, 1e-12), scale
    )
    scale = clip_bounds(scale2, scale_bounds)
    # no-mask degenerate case: identity transform
    any_mask = jnp.sum(mask) > 0
    scale = jnp.where(any_mask, scale, 1.0)
    offset = jnp.where(any_mask, offset, 0.0)
    return scale, offset


class AlignResult(NamedTuple):
    ds_gs_visual_depth: jnp.ndarray   # stage-1 (DS-GS baseline) aligned vision
    vision_depth: jnp.ndarray         # stage-2 (Touch-GS) aligned vision
    vision_uncertainty: jnp.ndarray   # σ_vis


def align_vision_depth(
    grounded_depth: jnp.ndarray,
    touch_depth: jnp.ndarray,
    vision_depth: jnp.ndarray,
    is_real_world: bool = True,
) -> AlignResult:
    """Two-stage alignment (:283-315)."""
    # stage 1: DS-GS — fit scale≥0 + offset of vision to sparse grounded depth
    scale, offset = compute_scale_and_offset(
        grounded_depth, vision_depth, (0.0, None), (None, None)
    )
    vision = scale * vision_depth + offset
    ds_gs = vision

    # stage 2: Touch-GS — reject vision-touch diffs > 3 m, then fit offset
    # with scale pinned to (1, 1); apply only at touch-valid pixels (:293-306)
    diff = vision - touch_depth
    diff = jnp.where(diff > 3.0, 0.0, diff)
    touch_to_align = (
        jnp.where(diff > 0, touch_depth, 0.0) if is_real_world else touch_depth
    )
    mask = touch_to_align > 0
    _, offset2 = compute_scale_and_offset(
        touch_to_align, vision, (1.0, 1.0), (None, None)
    )
    vision = jnp.where(mask, vision + offset2, vision)
    vision = jnp.clip(vision, 0.0, None)

    # vision uncertainty: main-path weights (:310-313)
    vision_unc = cu.compute_uncertainty_map_with_edges(
        vision, grounded_depth,
        edge_weight=0.0, distance_uncertainty_weight=0.05,
        proximity_weight=0.0, depth_difference_weight=0.0, dilation_size=5,
    )
    vision_unc = jnp.clip(vision_unc, 0.0, 10.0) + 5.0
    return AlignResult(ds_gs, vision, vision_unc)


def fuse_depth_maps_with_uncertainty(
    touch_depth: jnp.ndarray,
    vision_depth: jnp.ndarray,
    touch_uncertainty: jnp.ndarray,
    vision_uncertainty: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Product-of-Gaussians fusion on σ, exact to the reference (:107-148).

    Note: the reference combines σ values directly (not σ²); replicated
    faithfully (SURVEY.md §2.3 note).
    """
    mask = touch_uncertainty > 0

    inv_v = 1.0 / vision_uncertainty
    inv_t = 1.0 / touch_uncertainty
    inv_t = jnp.where(jnp.isinf(inv_t), 0.0, inv_t)     # :120
    inv_v = jnp.where(jnp.isinf(inv_v), 0.0, inv_v)     # :121

    fused_unc = 1.0 / (inv_t + inv_v)                   # :124
    fused_unc = jnp.where(jnp.isinf(fused_unc), 0.0, fused_unc)  # :126
    sigma = fused_unc

    mu_t = touch_depth * mask                            # :138
    mu_v = vision_depth

    mu_t_w = mu_t / touch_uncertainty                    # :142
    mu_t_w = jnp.where(jnp.isnan(mu_t_w), 0.0, mu_t_w)   # :143
    # 0/0 → nan→0 as the reference; finite/0 → inf stays inf there too,
    # but mask guarantees mu_t==0 wherever touch_uncertainty==0
    mu_t_w = jnp.where(jnp.isinf(mu_t_w), 0.0, mu_t_w)

    mu_v_w = mu_v / vision_uncertainty                   # :145
    mu_v_w = jnp.where(jnp.isnan(mu_v_w), 0.0, mu_v_w)   # :146

    fused_depth = sigma * (mu_t_w + mu_v_w)              # :148
    return fused_depth, fused_unc


def fuse_depth_maps(
    sparse_depth: jnp.ndarray, dense_depth: jnp.ndarray
) -> jnp.ndarray:
    """Naive fusion baseline: overwrite dense with valid sparse (:204-227)."""
    return jnp.where(sparse_depth > 0, sparse_depth, dense_depth)


class FusedView(NamedTuple):
    vision_depth: jnp.ndarray       # Touch-GS-aligned vision (→ `vision/`)
    ds_gs_depth: jnp.ndarray        # DS-GS baseline (→ `vision_baseline/`)
    fused_depth: jnp.ndarray        # → `fused_output_dir/`
    fused_uncertainty: jnp.ndarray  # → `fused_output_dir_uncertainty/`


@functools.partial(jax.jit, static_argnames=("use_uncertainty", "is_real_world",
                                             "sparsify_percentage"))
def fuse_view(
    key: jax.Array,
    grounded_depth: jnp.ndarray,
    touch_depth: jnp.ndarray,
    vision_depth: jnp.ndarray,
    touch_uncertainty: jnp.ndarray,
    use_uncertainty: bool = True,
    is_real_world: bool = True,
    sparsify_percentage: float = 0.01,
) -> FusedView:
    """One view's full fusion pipeline (:341-370), jitted.

    All inputs in meters at the vision resolution (callers resize the
    grounded map first for real scenes, :277-278).
    """
    grounded = create_sparse_depth_map(key, grounded_depth, sparsify_percentage)
    aligned = align_vision_depth(grounded, touch_depth, vision_depth, is_real_world)
    if use_uncertainty:
        fused_depth, fused_unc = fuse_depth_maps_with_uncertainty(
            touch_depth, aligned.vision_depth, touch_uncertainty,
            aligned.vision_uncertainty,
        )
        fused_depth = jnp.clip(fused_depth, 0.0, None)   # :360
        fused_unc = jnp.clip(fused_unc, 0.0, 10.0)       # :361
    else:
        fused_depth = fuse_depth_maps(touch_depth, aligned.vision_depth)
        fused_depth = jnp.clip(fused_depth, 0.0, None)
        fused_unc = jnp.zeros_like(fused_depth)
    return FusedView(
        vision_depth=aligned.vision_depth,
        ds_gs_depth=aligned.ds_gs_visual_depth,
        fused_depth=fused_depth,
        fused_uncertainty=fused_unc,
    )
