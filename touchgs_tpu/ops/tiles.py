"""Tile×Gaussian intersection binning — jit-stable, no dynamic shapes.

TPU-native replacement for gsplat's duplicate-keys + radix-sort CUDA stage
(SURVEY.md §2.9 "project → tile-sort → per-tile compositing").  The CUDA code
builds variable-length per-tile lists; XLA needs static shapes, so we:

1. cap tiles-per-Gaussian at ``max_tiles_per_gaussian`` (enumerate a fixed k
   range, map k → (tile_x, tile_y) inside each Gaussian's bbox, mask overflow);
2. build integer sort keys ``(tile_id << depth_bits) | quantized_depth`` so
   one global sort yields tiles grouped together and depth-ascending within
   each tile — exactly gsplat's (tile | depth-bits) radix key, with the depth
   quantized to the bits left under the tile id (≥20).  Quantization ties make
   near-equal-depth entries compose in arbitrary order, which is the same
   property the CUDA kernel has;
3. recover per-tile [start, count) extents with two searchsorteds.

The depth-bits key replaces an earlier ``tile_id * G + depth_rank`` key whose
rank needed an inverse-permutation double-sort over the Gaussians (2.3 ms at
131k on v5e); the pair sort itself runs ``is_stable=False`` (5.2 → 3.7 ms at
2.1M pairs).

Truncation is front-biased: if a tile holds more than the consumer's cap, the
kept entries are the nearest ones (depth rank ordering), which dominate the
composite anyway.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from touchgs_tpu.config import RasterizeConfig
from touchgs_tpu.ops.projection import ProjectedGaussians


class TileBins(NamedTuple):
    sorted_gauss: jnp.ndarray  # (M,) gaussian index per intersection, tile-major
    tile_starts: jnp.ndarray   # (n_tiles,) offset of each tile's run in sorted_gauss
    tile_counts: jnp.ndarray   # (n_tiles,) run length
    n_tiles_x: int
    n_tiles_y: int
    # tile id at each sorted position (diagnostics / future consumers)
    tile_of_sorted: jnp.ndarray | None = None  # (M,)


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def gather_1d(src: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather from a large 1D array through a (M/128, 128) reshape.

    The direct 1D gather triggers a pathological TPU XLA compile path
    (hundreds of seconds at ~2M elements, measured on v5e); routing the same
    gather through a 2D operand compiles in seconds with identical runtime.
    """
    m = src.shape[0]
    pad = (-m) % 128
    if pad:
        src = jnp.pad(src, (0, pad))
    src2 = src.reshape(-1, 128)
    return src2[idx // 128, idx % 128]


def bin_gaussians(
    proj: ProjectedGaussians,
    width: int,
    height: int,
    cfg: RasterizeConfig = RasterizeConfig(),
) -> TileBins:
    n_tx = _cdiv(width, cfg.tile_w)
    n_ty = _cdiv(height, cfg.tile_h)
    n_tiles = n_tx * n_ty
    G = proj.means2d.shape[0]
    T_cap = cfg.max_tiles_per_gaussian

    mx, my = proj.means2d[:, 0], proj.means2d[:, 1]
    r = proj.radii if proj.cull_radii is None else proj.cull_radii
    x0 = jnp.clip(jnp.floor((mx - r) / cfg.tile_w), 0, n_tx - 1).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((mx + r) / cfg.tile_w), 0, n_tx - 1).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((my - r) / cfg.tile_h), 0, n_ty - 1).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((my + r) / cfg.tile_h), 0, n_ty - 1).astype(jnp.int32)
    bw = x1 - x0 + 1
    bh = y1 - y0 + 1
    n_cover = bw * bh  # tiles covered by each gaussian (pre-cap)

    # When the bbox exceeds the T_cap budget, enumerate a cap-sized window
    # CENTERED on the projected mean instead of the first T_cap tiles in
    # row-major order (which silently dropped the bbox's entire bottom —
    # visible tile-shaped holes under large gaussians).  The window shape
    # matches the bbox aspect (ww·wh ≤ T_cap) so what gets dropped is the
    # low-α fringe farthest from the center, mirroring the α-ordering the
    # corner cull below already enforces.
    over = n_cover > T_cap
    ratio = bw.astype(jnp.float32) / jnp.maximum(bh.astype(jnp.float32), 1.0)
    ww = jnp.clip(jnp.round(jnp.sqrt(T_cap * ratio)).astype(jnp.int32), 1, T_cap)
    ww = jnp.minimum(ww, bw)
    wh = jnp.minimum(T_cap // ww, bh)
    ww = jnp.minimum(T_cap // wh, bw)   # give leftover budget back to x
    cx_t = jnp.clip(jnp.floor(mx / cfg.tile_w), 0, n_tx - 1).astype(jnp.int32)
    cy_t = jnp.clip(jnp.floor(my / cfg.tile_h), 0, n_ty - 1).astype(jnp.int32)
    wx0 = jnp.clip(cx_t - ww // 2, x0, x1 - ww + 1)
    wy0 = jnp.clip(cy_t - wh // 2, y0, y1 - wh + 1)
    x0 = jnp.where(over, wx0, x0)
    y0 = jnp.where(over, wy0, y0)
    bw = jnp.where(over, ww, bw)
    bh = jnp.where(over, wh, bh)
    n_cover = bw * bh

    # quantized depth: scale valid camera-space depths into the integer range
    # left below the tile id bits (gsplat packs fp32 depth bits the same way)
    depth_bits = 31 - max(n_tiles, 1).bit_length()
    if depth_bits < 16:
        raise ValueError(f"too many tiles ({n_tiles}) for int32 sort keys")
    d = proj.depths
    dmin = jnp.min(jnp.where(proj.valid, d, jnp.inf))
    dmax = jnp.max(jnp.where(proj.valid, d, -jnp.inf))
    dscale = ((1 << depth_bits) - 1) / jnp.maximum(dmax - dmin, 1e-9)
    # clamp in INTEGER space: the f32 representation of 2^db − 1 rounds UP
    # for db > 24, and a float clip would let dq bleed into the tile bits
    dq = jnp.clip(((d - dmin) * dscale).astype(jnp.int32),
                  0, (1 << depth_bits) - 1)

    # (G, T_cap) enumeration of covered tiles
    k = jnp.arange(T_cap, dtype=jnp.int32)[None, :]         # (1, T_cap)
    tx = x0[:, None] + k % bw[:, None]
    ty = y0[:, None] + k // bw[:, None]
    tile_id = ty * n_tx + tx                                 # (G, T_cap)
    pair_ok = (k < jnp.minimum(n_cover, T_cap)[:, None]) & proj.valid[:, None]

    # corner cull: drop bbox tiles whose rect lies entirely beyond the cull
    # radius (α ≤ op·exp(−½d²/λ1) < threshold there — exact, see projection).
    # Clamping the mean to the tile rect gives the closest-point distance.
    tx0 = (tx * cfg.tile_w).astype(jnp.float32)
    ty0 = (ty * cfg.tile_h).astype(jnp.float32)
    dx = mx[:, None] - jnp.clip(mx[:, None], tx0, tx0 + cfg.tile_w)
    dy = my[:, None] - jnp.clip(my[:, None], ty0, ty0 + cfg.tile_h)
    pair_ok &= dx * dx + dy * dy <= (r * r)[:, None]

    key = (tile_id << depth_bits) | dq[:, None]
    key = jnp.where(pair_ok, key, jnp.int32(n_tiles) << depth_bits)  # sentinel

    flat_key = key.reshape(-1)
    gauss_of_pair = jnp.broadcast_to(
        jnp.arange(G, dtype=jnp.int32)[:, None], (G, T_cap)
    ).reshape(-1)

    # sort values alongside keys, unstable (ties = same tile + same quantized
    # depth, whose compositing order is immaterial).  (Two rejected
    # alternatives, both measured on v5e: argsort + 1D gathers hits a
    # pathological TPU gather compile path — see gather_1d; sorting keys ONLY
    # and recovering the gaussian from the key halves sort traffic but the
    # 2.1M-element scalar gather runs at ~100 Melem/s ≈ +17 ms.)
    sorted_key, sorted_gauss = jax.lax.sort(
        (flat_key, gauss_of_pair), num_keys=1, is_stable=False
    )
    tile_of_pair = sorted_key >> depth_bits

    tiles = jnp.arange(n_tiles, dtype=jnp.int32)
    starts = jnp.searchsorted(tile_of_pair, tiles, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(tile_of_pair, tiles, side="right").astype(jnp.int32)
    return TileBins(
        sorted_gauss=sorted_gauss,
        tile_starts=starts,
        tile_counts=ends - starts,
        n_tiles_x=n_tx,
        n_tiles_y=n_ty,
        tile_of_sorted=tile_of_pair,
    )
