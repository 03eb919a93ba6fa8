"""Tile-based rasterizer in pure XLA (jnp) — the shardable fast path.

The TPU-native analogue of gsplat's per-tile CUDA compositing (SURVEY.md §2.9),
expressed as dense, statically-shaped XLA ops so it (a) autodiffs, (b) runs on
CPU/TPU unchanged, and (c) shards over the tile axis with `shard_map`
(SURVEY.md §2.12 "tile-level rasterization parallelism").

Per tile: gather the depth-sorted intersection list from `TileBins` (capped at
``k_tile`` front-most entries), then front-to-back alpha-composite over the
tile's pixels, scanning the list in chunks with log-transmittance carried.
Tiles are processed in blocks of ``tile_block`` via `lax.map` to bound memory.

The Pallas kernel (`rasterize_pallas.py`) shares this exact binning + math and
replaces the inner loop with a VMEM-resident kernel.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from touchgs_tpu.config import RasterizeConfig
from touchgs_tpu.ops.projection import ProjectedGaussians
from touchgs_tpu.ops.rasterize_ref import RenderOutput
from touchgs_tpu.ops.tiles import TileBins, bin_gaussians, gather_1d


def rasterize_tiled(
    proj: ProjectedGaussians,
    colors: jnp.ndarray,      # (N, 3)
    opacities: jnp.ndarray,   # (N,)
    width: int,
    height: int,
    cfg: RasterizeConfig = RasterizeConfig(),
    background: jnp.ndarray | None = None,
    bins: TileBins | None = None,
    k_tile: int = 1024,       # max gaussians composited per tile (front-most)
    k_chunk: int = 64,        # gaussians per scan step
    tile_block: int = 64,     # tiles per lax.map block
    tile_shards: int = 0,     # >0: SPMD mode — shard the tile axis this many
                              # ways (one vectorized body, no lax.map) and
                              # constrain it with `tile_pspec`
    tile_pspec=None,          # PartitionSpec for the (tiles, ...) axis, e.g.
                              # P("data") — requires an active mesh context
) -> RenderOutput:
    if bins is None:
        bins = bin_gaussians(proj, width, height, cfg)
    n_tx, n_ty = bins.n_tiles_x, bins.n_tiles_y
    n_tiles = n_tx * n_ty
    th, tw = cfg.tile_h, cfg.tile_w
    P = th * tw
    M = bins.sorted_gauss.shape[0]
    # don't scan more entries than gaussians exist, nor pad past the tile count
    k_tile = min(k_tile, proj.means2d.shape[0])
    tile_block = min(tile_block, n_tiles)

    # pad gaussian attribute arrays with one dead slot at index N (gathers of
    # masked entries hit it harmlessly)
    means2d = jnp.concatenate([proj.means2d, jnp.zeros((1, 2))], axis=0)
    conics = jnp.concatenate([proj.conics, jnp.zeros((1, 3))], axis=0)
    cols = jnp.concatenate([colors, jnp.zeros((1, 3))], axis=0)
    opas = jnp.concatenate([opacities, jnp.zeros((1,))], axis=0)
    zs = jnp.concatenate([proj.depths, jnp.zeros((1,))], axis=0)
    N = proj.means2d.shape[0]

    # per-tile pixel centers
    tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    tile_x = tile_ids % n_tx
    tile_y = tile_ids // n_tx
    py, px = jnp.mgrid[0:th, 0:tw]
    # (n_tiles, P)
    pix_x = (tile_x[:, None] * tw + px.ravel()[None, :]) + 0.5
    pix_y = (tile_y[:, None] * th + py.ravel()[None, :]) + 0.5

    # per-tile capped index lists: (n_tiles, k_tile) into sorted_gauss
    ks = jnp.arange(k_tile, dtype=jnp.int32)
    ptr = bins.tile_starts[:, None] + ks[None, :]
    in_list = ks[None, :] < jnp.minimum(bins.tile_counts, k_tile)[:, None]
    ptr = jnp.clip(ptr, 0, M - 1)
    gidx = jnp.where(in_list, gather_1d(bins.sorted_gauss, ptr), N)  # N = dead slot

    # pad tiles to a multiple of tile_block (or of the shard count in SPMD mode)
    if tile_shards > 0:
        tile_block = -(-n_tiles // tile_shards)
        pad_tiles = tile_shards * tile_block - n_tiles
    else:
        pad_tiles = (-n_tiles) % tile_block
    if pad_tiles:
        gidx = jnp.pad(gidx, ((0, pad_tiles), (0, 0)), constant_values=N)
        pix_x = jnp.pad(pix_x, ((0, pad_tiles), (0, 0)))
        pix_y = jnp.pad(pix_y, ((0, pad_tiles), (0, 0)))
    n_blocks = gidx.shape[0] // tile_block

    n_steps = -(-k_tile // k_chunk)
    pad_k = n_steps * k_chunk - k_tile

    def run_block(args):
        gi, pxb, pyb = args  # (B, k_tile), (B, P), (B, P)
        B = gi.shape[0]
        if pad_k:
            gi = jnp.pad(gi, ((0, 0), (0, pad_k)), constant_values=N)
        gi_steps = gi.reshape(B, n_steps, k_chunk).transpose(1, 0, 2)

        init = (
            jnp.zeros((B, P, 3), jnp.float32),
            jnp.zeros((B, P), jnp.float32),
            jnp.zeros((B, P), jnp.float32),
            jnp.zeros((B, P), jnp.float32),
        )

        def body(carry, gi_c):  # gi_c: (B, k_chunk)
            rgb, dep, acc, logT = carry
            m2d = means2d[gi_c]          # (B, k, 2)
            con = conics[gi_c]           # (B, k, 3)
            col = cols[gi_c]             # (B, k, 3)
            opa = opas[gi_c]             # (B, k)
            z = zs[gi_c]                 # (B, k)
            dead = gi_c >= N
            dx = pxb[:, :, None] - m2d[:, None, :, 0]   # (B, P, k)
            dy = pyb[:, :, None] - m2d[:, None, :, 1]
            sigma = 0.5 * (con[:, None, :, 0] * dx * dx
                           + con[:, None, :, 2] * dy * dy) \
                + con[:, None, :, 1] * dx * dy
            alpha = jnp.minimum(cfg.alpha_clip, opa[:, None, :] * jnp.exp(-sigma))
            keep = (sigma >= 0) & (alpha >= cfg.alpha_threshold) & (~dead[:, None, :])
            alpha = jnp.where(keep, alpha, 0.0)
            log1m = jnp.log1p(-alpha)
            clogT = jnp.cumsum(log1m, axis=2) - log1m  # exclusive within chunk
            w = jnp.exp(logT[:, :, None] + clogT) * alpha  # (B, P, k)
            rgb = rgb + jnp.einsum("bpk,bkc->bpc", w, col)
            dep = dep + jnp.sum(w * z[:, None, :], axis=2)
            acc = acc + jnp.sum(w, axis=2)
            logT = logT + jnp.sum(log1m, axis=2)
            return (rgb, dep, acc, logT), None

        # remat the chunk body: without it XLA saves the (B, P, k) alpha
        # tensors of EVERY scan step as backward residuals (~30 GB at bench
        # scale); recomputing them in the backward sweep costs ~1 extra
        # forward at a tiny fraction of the memory
        (rgb, dep, acc, logT), _ = jax.lax.scan(
            jax.checkpoint(body, prevent_cse=False), init, gi_steps
        )
        return rgb, dep, acc, jnp.exp(logT)

    if tile_shards > 0:
        # SPMD: one vectorized pass over all tiles, the tile axis sharded
        # across devices (SURVEY.md §2.12 tile-level rasterization parallelism)
        def constrain(a):
            if tile_pspec is not None:
                return jax.lax.with_sharding_constraint(a, tile_pspec)
            return a

        rgb, dep, acc, T = run_block(
            (constrain(gidx), constrain(pix_x), constrain(pix_y))
        )
    else:
        gidx_b = gidx.reshape(n_blocks, tile_block, k_tile)
        pix_xb = pix_x.reshape(n_blocks, tile_block, P)
        pix_yb = pix_y.reshape(n_blocks, tile_block, P)
        rgb, dep, acc, T = jax.lax.map(run_block, (gidx_b, pix_xb, pix_yb))

    # (n_blocks, tile_block, ...) → image
    def assemble(a, ch=None):
        shape = (n_tiles + pad_tiles, th, tw) + ((ch,) if ch else ())
        a = a.reshape(shape)[:n_tiles]
        a = a.reshape((n_ty, n_tx, th, tw) + ((ch,) if ch else ()))
        a = jnp.swapaxes(a, 1, 2)  # (n_ty, th, n_tx, tw, ...)
        a = a.reshape((n_ty * th, n_tx * tw) + ((ch,) if ch else ()))
        return a[:height, :width]

    rgb = assemble(rgb, 3)
    dep = assemble(dep)
    acc = assemble(acc)
    T = assemble(T)

    if background is not None:
        rgb = rgb + T[..., None] * background
    dep = jnp.where(acc > 1e-10, dep / jnp.maximum(acc, 1e-10), 0.0)
    return RenderOutput(rgb=rgb, depth=dep, acc=acc)
