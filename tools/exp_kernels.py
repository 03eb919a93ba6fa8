"""Isolated timings of the Pallas kernels + real-shape gather/scatter + SSIM
variants, at bench scale on the live accelerator."""
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
    bins = bins._replace(n_tiles_x=int(bins.n_tiles_x), n_tiles_y=int(bins.n_tiles_y))
    n_tiles = bins.n_tiles_x * bins.n_tiles_y
    th, tw = rcfg.tile_h, rcfg.tile_w
    k_tile = rcfg.k_tile
    attrs = rp._pack_attrs(proj, colors, opac)

    gidx = rp._slot_lists(
        bins.sorted_gauss, bins.tile_starts,
        jnp.minimum(bins.tile_counts, k_tile), n_tiles, k_tile,
        proj.means2d.shape[0], False)
    nc = ((jnp.minimum(bins.tile_counts, k_tile) + 127) // 128
          ).astype(jnp.int32)
    tids = jnp.arange(n_tiles, dtype=jnp.int32)

    @jax.jit
    def f_slots(sg, st, ct):
        return rp._slot_lists(sg, st, jnp.minimum(ct, k_tile), n_tiles,
                              k_tile, N, False)

    @jax.jit
    def f_gather(a):
        return a[gidx]

    attrs_tiled = f_gather(attrs)

    @jax.jit
    def f_fwd_kernel(at):
        return rp._forward_tiles(nc, tids, at, th, tw, k_tile, 128,
                                 bins.n_tiles_x, rcfg, False)

    fwd_stack = f_fwd_kernel(attrs_tiled)
    done = fwd_stack[:, rp._ROW_DONE, 0].astype(jnp.int32)
    print(f"tiles={n_tiles} mean nc={float(nc.mean()):.2f} "
          f"mean done={float(done.mean()):.2f}", flush=True)
    grad_stack = jnp.ones_like(fwd_stack)

    @jax.jit
    def f_bwd_kernel(at, fs, gs):
        d = fs[:, rp._ROW_DONE, 0].astype(jnp.int32)
        return rp._backward_tiles(d, tids, at, fs, gs, th, tw, k_tile, 128,
                                  bins.n_tiles_x, rcfg, False)

    dattrs = f_bwd_kernel(attrs_tiled, fwd_stack, grad_stack)

    @jax.jit
    def f_scatter(dat):
        _, vjp = jax.vjp(lambda a: a[gidx], attrs)
        return vjp(dat)[0]

    def p(name, fn, *args):
        try:
            print(f"{name:<16} {timeit(fn, *args):8.2f} ms", flush=True)
        except Exception as e:
            print(f"{name:<16} FAILED: {str(e)[:90]}", flush=True)

    p("slot lists", f_slots, bins.sorted_gauss, bins.tile_starts,
      bins.tile_counts)
    p("gather real", f_gather, attrs)
    p("fwd kernel", f_fwd_kernel, attrs_tiled)
    p("bwd kernel", f_bwd_kernel, attrs_tiled, fwd_stack, grad_stack)
    p("scatter real", f_scatter, dattrs)

    # --- SSIM variants ---
    from touchgs_tpu.ops.ssim import ssim
    rng = np.random.default_rng(0)
    img0 = jnp.asarray(rng.uniform(0, 1, (800, 800, 3)), jnp.float32)
    img1 = jnp.asarray(rng.uniform(0, 1, (800, 800, 3)), jnp.float32)

    @jax.jit
    def f_ssim(a):
        return ssim(a, img1)

    @jax.jit
    def f_ssim_grad(a):
        return jax.grad(lambda x: ssim(x, img1))(a)

    p("ssim fwd", f_ssim, img0)
    p("ssim fwd+grad", f_ssim_grad, img0)


if __name__ == "__main__":
    main()
