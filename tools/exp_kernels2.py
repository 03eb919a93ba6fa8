"""A/B: early-exit cond overhead + k_chunk sweep for both kernels."""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, n=20, warmup=3):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n * 1000


def main():
    import jax
    import jax.numpy as jnp
    from touchgs_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from touchgs_tpu.config import RasterizeConfig
    from touchgs_tpu.data.cameras import Camera
    from touchgs_tpu.models.gaussians import init_random
    from touchgs_tpu.ops.projection import project_gaussians
    from touchgs_tpu.ops.tiles import bin_gaussians
    from touchgs_tpu.ops import rasterize_pallas as rp

    WIDTH = HEIGHT = 800
    N, CAP = 100_000, 131_072
    rcfg = RasterizeConfig(use_pallas=True)
    params = init_random(n=N, capacity=CAP, sh_degree=3)
    cam = Camera(
        fx=jnp.float32(0.9 * WIDTH), fy=jnp.float32(0.9 * WIDTH),
        cx=jnp.float32(WIDTH / 2), cy=jnp.float32(HEIGHT / 2),
        c2w=jnp.asarray([[1.0, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 2.5],
                         [0, 0, 0, 1]], jnp.float32),
        width=WIDTH, height=HEIGHT,
    )
    opac = params.opacities()
    colors = jnp.abs(params.sh_dc)

    @jax.jit
    def prep(p):
        proj = project_gaussians(
            p.means, p.quats, p.scales(), cam.w2c, cam.fx, cam.fy, cam.cx,
            cam.cy, WIDTH, HEIGHT, rcfg, extra_valid=p.alive,
            opacities=opac)
        bins = bin_gaussians(proj, WIDTH, HEIGHT, rcfg)
        return proj, bins

    proj, bins = prep(params)
    bins = bins._replace(n_tiles_x=int(bins.n_tiles_x),
                         n_tiles_y=int(bins.n_tiles_y))
    n_tiles = bins.n_tiles_x * bins.n_tiles_y
    th, tw = rcfg.tile_h, rcfg.tile_w
    k_tile = rcfg.k_tile
    attrs = rp._pack_attrs(proj, colors, opac)
    gidx = rp._slot_lists(
        bins.sorted_gauss, bins.tile_starts,
        jnp.minimum(bins.tile_counts, k_tile), n_tiles, k_tile,
        proj.means2d.shape[0], False)
    attrs_tiled = attrs[gidx]
    tids = jnp.arange(n_tiles, dtype=jnp.int32)

    def p(name, fn, *args):
        try:
            print(f"{name:<24} {timeit(fn, *args):8.2f} ms", flush=True)
        except Exception as e:
            print(f"{name:<24} FAILED: {str(e)[:90]}", flush=True)

    for kc in (128, 256):
        nc = ((jnp.minimum(bins.tile_counts, k_tile) + kc - 1) // kc
              ).astype(jnp.int32)

        for ee in (True, False):
            @jax.jit
            def f_fwd(at, nc=nc, kc=kc, ee=ee):
                return rp._forward_tiles(nc, tids, at, th, tw, k_tile, kc,
                                         bins.n_tiles_x, rcfg, False, ee)
            fs = f_fwd(attrs_tiled)
            p(f"fwd kc={kc} ee={ee}", f_fwd, attrs_tiled)

        fwd_stack = f_fwd(attrs_tiled)
        grad_stack = jnp.ones_like(fwd_stack)

        @jax.jit
        def f_bwd(at, fs, gs, kc=kc):
            d = fs[:, rp._ROW_DONE, 0].astype(jnp.int32)
            return rp._backward_tiles(d, tids, at, fs, gs, th, tw, k_tile,
                                      kc, bins.n_tiles_x, rcfg, False)
        p(f"bwd kc={kc}", f_bwd, attrs_tiled, fwd_stack, grad_stack)


if __name__ == "__main__":
    main()
