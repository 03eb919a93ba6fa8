"""Reference-semantics dense rasterizer (pure jnp oracle).

Differentiable alpha-compositing of depth-sorted Gaussians over every pixel —
the correctness anchor for the tiled/Pallas paths (SURVEY.md §7 stage 2,
BASELINE.json configs[0]).  O(N_gaussians) per pixel, so only for tests and
tiny scenes; memory is bounded by scanning over Gaussian chunks with the
transmittance carried in log space (mathematically identical to the
front-to-back compositing loop of the gsplat CUDA kernel, without its
T<1e-4 early exit — truncated tail contributions are < 1e-4 in weight).

Outputs match splatfacto's render heads: RGB, expected depth, accumulation
(alpha).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from touchgs_tpu.config import RasterizeConfig
from touchgs_tpu.ops.projection import ProjectedGaussians


class RenderOutput(NamedTuple):
    rgb: jnp.ndarray    # (H, W, 3)
    depth: jnp.ndarray  # (H, W) alpha-normalized expected depth
    acc: jnp.ndarray    # (H, W) accumulated opacity
    # scalar diagnostic (Pallas path only): tiles whose gaussian list was
    # capped at k_tile AND whose composite was still unsaturated when the
    # scan ended — i.e. tiles that actually LOST contributions to
    # truncation (VERDICT r3 #6: track during training, not just bench)
    lossy_tiles: jnp.ndarray | None = None


def _composite_pixels(
    pix: jnp.ndarray,       # (P, 2) pixel centers (x, y)
    means2d: jnp.ndarray,   # (G, 2) depth-sorted
    conics: jnp.ndarray,    # (G, 3)
    colors: jnp.ndarray,    # (G, 3)
    opacities: jnp.ndarray, # (G,)
    depths: jnp.ndarray,    # (G,)
    alive: jnp.ndarray,     # (G,) float mask
    cfg: RasterizeConfig,
):
    """Front-to-back composite all G sorted Gaussians over P pixels.

    Scans over Gaussian chunks carrying (rgb, depth, acc, logT) — the log
    transmittance makes the within/across-chunk ordering exact.
    """
    G = means2d.shape[0]
    chunk = min(cfg.gaussian_chunk, G)
    pad = (-G) % chunk
    if pad:
        means2d = jnp.pad(means2d, ((0, pad), (0, 0)))
        conics = jnp.pad(conics, ((0, pad), (0, 0)))
        colors = jnp.pad(colors, ((0, pad), (0, 0)))
        opacities = jnp.pad(opacities, ((0, pad),))
        depths = jnp.pad(depths, ((0, pad),))
        alive = jnp.pad(alive, ((0, pad),))
    n_chunks = means2d.shape[0] // chunk

    def resh(a):
        return a.reshape((n_chunks, chunk) + a.shape[1:])

    chunks = jax.tree.map(resh, (means2d, conics, colors, opacities, depths, alive))

    P = pix.shape[0]
    init = (
        jnp.zeros((P, 3), jnp.float32),  # rgb
        jnp.zeros((P,), jnp.float32),    # depth
        jnp.zeros((P,), jnp.float32),    # acc
        jnp.zeros((P,), jnp.float32),    # logT
    )

    def body(carry, ch):
        rgb, dep, acc, logT = carry
        m2d, con, col, opa, z, alv = ch
        # (P, chunk) quad form
        dx = pix[:, None, 0] - m2d[None, :, 0]
        dy = pix[:, None, 1] - m2d[None, :, 1]
        sigma = 0.5 * (con[None, :, 0] * dx * dx + con[None, :, 2] * dy * dy) \
            + con[None, :, 1] * dx * dy
        alpha = jnp.minimum(cfg.alpha_clip, opa[None, :] * jnp.exp(-sigma))
        keep = (sigma >= 0) & (alpha >= cfg.alpha_threshold) & (alv[None, :] > 0)
        alpha = jnp.where(keep, alpha, 0.0)
        # within-chunk exclusive cumulative transmittance (log space)
        log1m = jnp.log1p(-alpha)
        clogT = jnp.cumsum(log1m, axis=1) - log1m  # exclusive
        w = jnp.exp(logT[:, None] + clogT) * alpha  # (P, chunk)
        rgb = rgb + w @ col
        dep = dep + w @ z
        acc = acc + jnp.sum(w, axis=1)
        logT = logT + jnp.sum(log1m, axis=1)
        return (rgb, dep, acc, logT), None

    # remat: keep backward memory at O(carry) instead of O(P x G)
    (rgb, dep, acc, logT), _ = jax.lax.scan(
        jax.checkpoint(body, prevent_cse=False), init, chunks
    )
    return rgb, dep, acc, jnp.exp(logT)


def rasterize_dense(
    proj: ProjectedGaussians,
    colors: jnp.ndarray,     # (N, 3) post-SH colors in [0, 1]
    opacities: jnp.ndarray,  # (N,) activated opacities
    width: int,
    height: int,
    cfg: RasterizeConfig = RasterizeConfig(),
    background: jnp.ndarray | None = None,
    pixel_chunk: int = 16384,
) -> RenderOutput:
    """Rasterize via global depth sort + dense per-pixel compositing."""
    N = proj.means2d.shape[0]
    # depth sort with invalid Gaussians pushed to the back
    sort_depth = jnp.where(proj.valid, proj.depths, jnp.inf)
    order = jnp.argsort(sort_depth)
    means2d = proj.means2d[order]
    conics = proj.conics[order]
    cols = colors[order]
    opas = opacities[order]
    zs = proj.depths[order]
    alive = proj.valid[order].astype(jnp.float32)

    ys, xs = jnp.mgrid[0:height, 0:width]
    pix = jnp.stack([xs.ravel() + 0.5, ys.ravel() + 0.5], axis=-1).astype(jnp.float32)
    P = pix.shape[0]
    pc = min(pixel_chunk, P)
    pad = (-P) % pc
    pix_padded = jnp.pad(pix, ((0, pad), (0, 0)))
    pix_blocks = pix_padded.reshape(-1, pc, 2)

    def run_block(pb):
        return _composite_pixels(pb, means2d, conics, cols, opas, zs, alive, cfg)

    rgb, dep, acc, T = jax.lax.map(run_block, pix_blocks)
    rgb = rgb.reshape(-1, 3)[:P].reshape(height, width, 3)
    dep = dep.reshape(-1)[:P].reshape(height, width)
    acc = acc.reshape(-1)[:P].reshape(height, width)
    T = T.reshape(-1)[:P].reshape(height, width)

    if background is not None:
        rgb = rgb + T[..., None] * background
    # alpha-normalized expected depth (splatfacto convention)
    dep = jnp.where(acc > 1e-10, dep / jnp.maximum(acc, 1e-10), 0.0)
    return RenderOutput(rgb=rgb, depth=dep, acc=acc)
