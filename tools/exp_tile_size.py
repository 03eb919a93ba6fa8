"""Tile-size sweep for the Pallas rasterizer (round-4 perf work).

Bigger tiles cut per-gaussian overscan — a gaussian of radius r evaluated
on an s x s tile costs (2r+s)^2 pixel-evals per covered tile, and covering
one 64x64 region as a single tile beats 4x 32x32 tiles whenever r is not
tiny — and shrink the pair sort (fewer covered tiles per gaussian).  The
trade is coarser early-exit granularity and larger per-tile caps.

Times the full fwd and fwd+bwd render at bench scale for several
(tile, k_tile, T_cap) combos on the live TPU.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from touchgs_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from touchgs_tpu.config import RasterizeConfig
    from touchgs_tpu.data.cameras import Camera
    from touchgs_tpu.models.gaussians import init_random
    from touchgs_tpu.ops import rasterize_pallas as rp
    from touchgs_tpu.ops.projection import project_gaussians

    W = H = 800
    N, CAP = 100_000, 131_072
    params = init_random(n=N, capacity=CAP, sh_degree=3)
    cam = Camera(fx=jnp.float32(0.9 * W), fy=jnp.float32(0.9 * W),
                 cx=jnp.float32(W / 2), cy=jnp.float32(H / 2),
                 c2w=jnp.asarray([[1.0, 0, 0, 0], [0, 1, 0, 0],
                                  [0, 0, 1, 2.5], [0, 0, 0, 1]], jnp.float32),
                 width=W, height=H)
    opac = params.opacities()
    colors = jnp.abs(params.sh_dc)

    from touchgs_tpu.utils.profiling import measure

    def timeit(fn, *args, iters=15):
        return measure(fn, *args, iters=iters) * 1e3

    ref_rgb = None
    for th, tw, k_tile, tcap in ((32, 32, 512, 16), (32, 64, 1024, 12),
                                 (64, 64, 2048, 8), (64, 64, 1024, 8),
                                 (16, 32, 256, 24)):
        cfg = RasterizeConfig(tile_h=th, tile_w=tw, k_tile=k_tile,
                              max_tiles_per_gaussian=tcap, use_pallas=True)

        @jax.jit
        def fwd(p, cfg=cfg):
            proj = project_gaussians(p.means, p.quats, p.scales(), cam.w2c,
                                     cam.fx, cam.fy, cam.cx, cam.cy, W, H,
                                     cfg, extra_valid=p.alive,
                                     opacities=p.opacities())
            return rp.rasterize_pallas(proj, colors, opac, W, H, cfg).rgb

        @jax.jit
        def fwd_bwd(p, cfg=cfg):
            def loss(means):
                proj = project_gaussians(means, p.quats, p.scales(), cam.w2c,
                                         cam.fx, cam.fy, cam.cx, cam.cy, W, H,
                                         cfg, extra_valid=p.alive,
                                         opacities=p.opacities())
                out = rp.rasterize_pallas(proj, colors, opac, W, H, cfg)
                return jnp.sum(out.rgb) + jnp.sum(out.depth)
            return jax.grad(loss)(p.means)

        try:
            t_f = timeit(fwd, params)
            t_fb = timeit(fwd_bwd, params)
            rgb = np.asarray(fwd(params))
            note = ""
            if ref_rgb is None:
                ref_rgb = rgb
            else:
                note = f" maxdiff_vs_32x32={np.abs(rgb - ref_rgb).max():.2e}"
            print(f"tile {th}x{tw} k={k_tile} tcap={tcap}: "
                  f"fwd {t_f:6.2f} ms   fwd+bwd {t_fb:6.2f} ms{note}",
                  flush=True)
        except Exception as e:
            print(f"tile {th}x{tw} k={k_tile} tcap={tcap}: FAILED "
                  f"{type(e).__name__}: {str(e)[:150]}", flush=True)


if __name__ == "__main__":
    main()
