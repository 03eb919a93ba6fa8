"""Single dataclass config tree + the reference's per-scene hyperparameter matrix.

The reference spreads hyperparameters over four bash scripts
(``scripts/train_{bunny_real,bunny_blender,mirror,block_data}.sh``); here they
are named presets (SURVEY.md §2.1):

scene         depth-loss-mult  loss-type  uncertainty-weight  train-split  percent-take
bunny_real    0.005            UNCERT     0.01                0.08         100
bunny_blender 0.5              SIMPLE     —                   0.13         100
mirror        0.2              UNCERT     1.0                 0.8          5
block         0.2              UNCERT     1.0                 0.8          10
"""
from __future__ import annotations

import dataclasses
import enum
from typing import Optional


class DepthLossType(enum.Enum):
    """Loss-type names are the fork's CLI contract
    (``scripts/train_bunny_real.sh:52``)."""

    SIMPLE_LOSS = "SIMPLE_LOSS"
    DEPTH_UNCERTAINTY_WEIGHTED_LOSS = "DEPTH_UNCERTAINTY_WEIGHTED_LOSS"


@dataclasses.dataclass(frozen=True)
class RasterizeConfig:
    # 32x32 keeps npix = 1024 (8 full vregs) but is square: overscan per
    # (gaussian, tile) pair is (2r+th)(2r+tw), minimized for square tiles
    # (24-29% fewer pixel-evals than 8x128 at both bench and trained-scene
    # radii), and spatially-compact tiles saturate coherently so the
    # whole-tile early exit actually fires (8x128 tiles span 128 px of
    # unrelated content and almost never saturate as a unit).
    tile_h: int = 32           # pixel-tile height  (VPU sublane-aligned)
    tile_w: int = 32           # pixel-tile width
    gaussian_chunk: int = 256  # gaussians composited per scan step (oracle path)
    k_tile: int = 512          # per-tile entry cap for the tile kernels.  The
                               # backward's gather-VJP scatter-add costs ~16 ns
                               # per (tile, slot) ROW on v5e regardless of
                               # width/dtype, so the cap directly prices the
                               # whole backward; entries past ~400 sit behind
                               # T < 1e-4 in any saturating scene (the kernels
                               # early-exit there anyway).  Truncation is
                               # front-biased (nearest-first) and reported by
                               # bench.py as the dropped-pair fraction.
    k_chunk: int = 64          # gaussians per Pallas scan step.  Finer chunks
                               # tighten the 2-chunk-stale early-exit lag and
                               # the backward's done-count quantization;
                               # coarser amortize per-chunk overhead.  Full-
                               # step sweep on v5e at 800²/100k (r5):
                               # 32→25.7, 64→25.3, 128→27.0, 256→29.4 ms —
                               # 64 wins.  Must divide 128 (the slot-list
                               # DMA lane alignment): k_tile is rounded up
                               # to a k_chunk multiple and the roll vector
                               # must stay 128-aligned (96 fails Mosaic)
    k_tile_max_train: int = 4096  # ceiling for the trainer's truncation-guard
                               # escalation — well past the old silent 2048
                               # cap (r4 verdict), so scenes legitimately
                               # needing >2048 entries/tile train lossless.
                               # 4096, not eval's 8192: the BACKWARD kernel
                               # at k_tile 8192 exceeds v5e scoped VMEM by
                               # 132 KB (measured compile failure, r5);
                               # forward-only eval still escalates to 8192
    alpha_clip: float = 0.999  # max per-gaussian alpha (gsplat convention)
    alpha_threshold: float = 1.0 / 255.0  # skip contributions below this
    sigma_cutoff: float = 3.0  # radius cutoff in standard deviations
    eps2d: float = 0.3         # 2D covariance dilation (antialiasing floor)
    near: float = 0.01         # near-plane cull
    max_tiles_per_gaussian: int = 16   # cap for intersection binning; tiles
                                       # are 8x128 px so 16 covers a ~4000 px²
                                       # footprint (sort cost scales with this)
    max_intersections: int = 2 ** 21   # global (gaussian, tile) pair budget
    use_pallas: bool = False   # Pallas tile kernel vs. jnp scan oracle


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    max_gaussians: int = 2 ** 17       # fixed capacity (jit-stable densify)
    sh_degree: int = 3
    init_opacity: float = 0.1
    init_scale_knn: int = 3            # mean distance to k nearest seeds
    background: tuple[float, float, float] = (0.0, 0.0, 0.0)
    rasterize: RasterizeConfig = dataclasses.field(default_factory=RasterizeConfig)


@dataclasses.dataclass(frozen=True)
class DepthLossConfig:
    depth_loss_mult: float = 0.2
    depth_loss_type: DepthLossType = DepthLossType.DEPTH_UNCERTAINTY_WEIGHTED_LOSS
    uncertainty_weight: float = 1.0
    # weighting form for DEPTH_UNCERTAINTY_WEIGHTED_LOSS (the fork's exact
    # formula is not in the checkout — empty submodule).  A/B'd on the hard
    # scene at the mirror preset, 6000 steps (RESULTS_r05.md):
    #   "inv":    w = 1/(1 + uw·σ)  → 21.15 dB / 8.13 cm obj MAE  ← DEFAULT
    #   "inv_sq": w = 1/(1 + uw·σ²) → 20.91 dB / 9.43 cm
    #   "exp":    w = exp(−uw·σ)    → 18.86 dB / 10.97 cm
    # "inv" both wins the A/B and matches the fusion stage's own inverse-σ
    # convention (utils/fuse_touch_vision.py:116-126 weighs by 1/σ, not
    # 1/σ²), so it is the default.
    uncertainty_form: str = "inv"


@dataclasses.dataclass(frozen=True)
class DensifyConfig:
    """splatfacto-style adaptive density control (SURVEY.md §2.9).

    Defaults follow nerfstudio splatfacto (the reference fork's base class),
    not vanilla 3DGS: cull_alpha_thresh 0.1 with opacity reset to 2x that,
    screen-size split/cull gates active until ``stop_screen_size_at``, and
    world/screen size culling enabled only after the first opacity-reset
    period (fresh gaussians must not be size-culled before they shrink).
    """

    warmup_steps: int = 500
    refine_every: int = 100
    stop_refine_at: int = 15_000
    grad_threshold: float = 0.0002       # positional-gradient densify threshold
    densify_size_threshold: float = 0.01 # split if scale above, clone if below
    prune_opacity_threshold: float = 0.1 # splatfacto cull_alpha_thresh
    prune_scale_threshold: float = 0.5   # world-size prune (scene units)
    reset_opacity_every: int = 3000
    reset_opacity_value: float = 0.2     # splatfacto: cull_alpha_thresh * 2
    split_samples: int = 2
    split_scale_shrink: float = 1.6
    # screen-space size gates (fractions of max(W, H), splatfacto units)
    split_screen_size: float = 0.05      # force-split when bigger on screen
    cull_screen_size: float = 0.15       # cull when bigger on screen
    stop_screen_size_at: int = 4000      # screen-size gates off after this step


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    """Per-group Adam LRs (splatfacto convention)."""

    means_lr_init: float = 1.6e-4
    means_lr_final: float = 1.6e-6
    means_lr_max_steps: int = 30_000
    features_dc_lr: float = 2.5e-3
    features_rest_lr: float = 2.5e-3 / 20.0
    opacities_lr: float = 5e-2
    scales_lr: float = 5e-3
    quats_lr: float = 1e-3
    eps: float = 1e-15


@dataclasses.dataclass(frozen=True)
class PoseOptConfig:
    """Camera pose optimizer (legacy/config_tactile.py:36-37: camera_optimizer
    mode="SO3xR3")."""

    mode: str = "off"            # "off" | "SO3xR3"
    lr: float = 6e-4             # nerfstudio camera_optimizer Adam default


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    max_steps: int = 30_000
    ssim_lambda: float = 0.2            # loss = (1-λ)L1 + λ(1-SSIM)
    sh_degree_interval: int = 1000      # grow active SH degree every N steps
    seed: int = 0
    checkpoint_every: int = 2000        # steps_per_save (legacy/config_tactile.py:27)
    log_every: int = 100
    # per-view batches kept device-resident (avoids re-uploading images every
    # step — dominant cost on remote-attached TPUs); cap bounds HBM use
    view_cache_bytes: int = 6 * 1024 ** 3
    # progressive capacity: start the gaussian arrays at a power of two
    # sized to the seeds and double (one recompile each time) when densify
    # fills them, instead of paying O(max_gaussians) projection/sort/optim
    # work from step 0.  False = allocate max_gaussians up front.
    grow_capacity: bool = True
    grow_trigger_fraction: float = 0.6   # grow when alive > frac * capacity
    init_capacity: int = 0               # 0 = auto (pow2 sized to seeds)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    depth: DepthLossConfig = dataclasses.field(default_factory=DepthLossConfig)
    densify: DensifyConfig = dataclasses.field(default_factory=DensifyConfig)
    optim: OptimConfig = dataclasses.field(default_factory=OptimConfig)
    pose_opt: PoseOptConfig = dataclasses.field(default_factory=PoseOptConfig)


@dataclasses.dataclass(frozen=True)
class ScenePreset:
    name: str
    train_split_fraction: float
    depth: DepthLossConfig
    percent_take: float = 100.0          # % of touch seed points kept
    is_real_world: bool = True


SCENE_PRESETS: dict[str, ScenePreset] = {
    # scripts/train_bunny_real.sh:52-55
    "bunny_real": ScenePreset(
        name="bunny_real",
        train_split_fraction=0.08,
        depth=DepthLossConfig(0.005, DepthLossType.DEPTH_UNCERTAINTY_WEIGHTED_LOSS, 0.01),
        percent_take=100.0,
        is_real_world=True,
    ),
    # scripts/train_bunny_blender.sh:50-54
    "bunny_blender": ScenePreset(
        name="bunny_blender",
        train_split_fraction=0.13,
        depth=DepthLossConfig(0.5, DepthLossType.SIMPLE_LOSS, 0.0),
        percent_take=100.0,
        is_real_world=False,
    ),
    # scripts/train_mirror.sh:46-49
    "mirror": ScenePreset(
        name="mirror",
        train_split_fraction=0.8,
        depth=DepthLossConfig(0.2, DepthLossType.DEPTH_UNCERTAINTY_WEIGHTED_LOSS, 1.0),
        percent_take=5.0,
        is_real_world=True,
    ),
    # scripts/train_block_data.sh:46-50
    "block": ScenePreset(
        name="block",
        train_split_fraction=0.8,
        depth=DepthLossConfig(0.2, DepthLossType.DEPTH_UNCERTAINTY_WEIGHTED_LOSS, 1.0),
        percent_take=10.0,
        is_real_world=True,
    ),
}


def train_config_for_preset(preset: ScenePreset, **overrides) -> TrainConfig:
    return dataclasses.replace(TrainConfig(depth=preset.depth), **overrides)
