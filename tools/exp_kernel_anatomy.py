"""Attribute forward-kernel time to its pieces (round-4 perf work).

The roofline model prices the forward at ~34 VPU ops/(entry,pixel) but the
measured kernel runs at ~43% of that roof — a ~2.3x unexplained factor.
This strips the kernel down and adds pieces back one at a time on the SAME
tile data as bench.py, so the gap can be attributed to exp2 cost, the
prefix product, the MXU accumulation, the early-exit cond, or broadcasts.

Run on the TPU: python tools/exp_kernel_anatomy.py
"""
from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from touchgs_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from touchgs_tpu.config import (ModelConfig, RasterizeConfig, TrainConfig)
    from touchgs_tpu.data.cameras import Camera
    from touchgs_tpu.models.gaussians import init_random
    from touchgs_tpu.ops import rasterize_pallas as rp
    from touchgs_tpu.ops.projection import project_gaussians
    from touchgs_tpu.ops.tiles import bin_gaussians

    W = H = 800
    N, CAP = 100_000, 131_072
    rcfg = RasterizeConfig(use_pallas=True)
    params = init_random(n=N, capacity=CAP, sh_degree=3)
    cam = Camera(fx=jnp.float32(0.9 * W), fy=jnp.float32(0.9 * W),
                 cx=jnp.float32(W / 2), cy=jnp.float32(H / 2),
                 c2w=jnp.asarray([[1.0, 0, 0, 0], [0, 1, 0, 0],
                                  [0, 0, 1, 2.5], [0, 0, 0, 1]], jnp.float32),
                 width=W, height=H)

    @jax.jit
    def prep(p):
        proj = project_gaussians(p.means, p.quats, p.scales(), cam.w2c,
                                 cam.fx, cam.fy, cam.cx, cam.cy, W, H, rcfg,
                                 extra_valid=p.alive, opacities=p.opacities())
        return proj, bin_gaussians(proj, W, H, rcfg)

    proj, bins = prep(params)
    bins = bins._replace(n_tiles_x=int(bins.n_tiles_x),
                         n_tiles_y=int(bins.n_tiles_y))
    n_tiles = bins.n_tiles_x * bins.n_tiles_y
    th, tw, k_tile, k_chunk = rcfg.tile_h, rcfg.tile_w, rcfg.k_tile, 128
    npix = th * tw
    opac = params.opacities()
    colors = jnp.abs(params.sh_dc)
    attrs = rp._pack_attrs(proj, colors, opac)
    gidx = rp._slot_lists(bins.sorted_gauss, bins.tile_starts,
                          jnp.minimum(bins.tile_counts, k_tile), n_tiles,
                          k_tile, proj.means2d.shape[0], False)
    at = attrs[gidx]
    nc = ((jnp.minimum(bins.tile_counts, k_tile) + 127) // 128).astype(jnp.int32)
    tids = jnp.arange(n_tiles, dtype=jnp.int32)
    n_chunks = k_tile // k_chunk

    from touchgs_tpu.utils.profiling import measure

    def timeit(fn, *args, iters=20):
        return measure(fn, *args, iters=iters) * 1e3

    def make_variant(mode):
        def kernel(nc_ref, tid_ref, attr_ref, out_ref):
            tid = tid_ref[pl.program_id(0)]
            ox = ((tid % bins.n_tiles_x) * tw).astype(jnp.float32)
            oy = ((tid // bins.n_tiles_x) * th).astype(jnp.float32)
            px, py = rp._pixel_rows(th, tw)

            def body(c, carry):
                outs, T = carry
                attr_c = attr_ref[0, pl.ds(c * k_chunk, k_chunk), :]
                if mode == "noexp":
                    # same shape of math, exp2 replaced by a mul
                    mx = attr_c[:, 0:1] - ox
                    my = attr_c[:, 1:2] - oy
                    ca, cb, cc = attr_c[:, 2:3], attr_c[:, 3:4], attr_c[:, 4:5]
                    op = attr_c[:, 5:6]
                    dx = px - mx; dy = py - my
                    sigma = ca * dx * dx + cc * dy * dy + cb * dx * dy
                    expns = 1.0 - 0.25 * sigma           # stand-in for exp2
                    alpha = jnp.minimum(rcfg.alpha_clip, op * expns)
                    keep = (sigma >= 0) & (alpha >= rcfg.alpha_threshold)
                    alpha = jnp.where(keep, alpha, 0.0)
                else:
                    alpha, _ = rp._alpha_exact(attr_c, px, py, ox, oy, rcfg)
                if mode == "alpha_only" or mode == "noexp":
                    outs = outs + jnp.sum(alpha, axis=0, keepdims=True)
                    return outs, T
                om = 1.0 - alpha
                cprod = rp._exclusive_prefix_prod(om)
                w = (T * cprod) * alpha
                if mode == "no_mxu":
                    outs = outs + jnp.sum(w, axis=0, keepdims=True)
                else:  # full
                    V = rp._values(attr_c)
                    outs8 = rp._mm_tn(V, w)
                    outs = outs + outs8[4:5]
                T = T * (cprod[k_chunk - 1:] * om[k_chunk - 1:])
                return outs, T

            init = (jnp.zeros((1, npix), jnp.float32),
                    jnp.ones((1, npix), jnp.float32))
            outs, T = jax.lax.fori_loop(
                0, jnp.minimum(nc_ref[pl.program_id(0)], n_chunks), body, init)
            out_ref[0, 0:1, :] = outs
            out_ref[0, 1:2, :] = T

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(n_tiles,),
            in_specs=[pl.BlockSpec((1, k_tile, 16),
                                   lambda t, nc, tid: (t, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 2, npix), lambda t, nc, tid: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
        )
        f = pl.pallas_call(kernel, grid_spec=grid_spec,
                           out_shape=jax.ShapeDtypeStruct((n_tiles, 2, npix),
                                                          jnp.float32))
        return jax.jit(lambda a: f(nc, tids, a))

    # reference: the real forward kernel (with early exit and without)
    @jax.jit
    def real_fwd(a):
        return rp._forward_tiles(nc, tids, a, th, tw, k_tile, 128,
                                 bins.n_tiles_x, rcfg, False)

    @jax.jit
    def real_fwd_noexit(a):
        return rp._forward_tiles(nc, tids, a, th, tw, k_tile, 128,
                                 bins.n_tiles_x, rcfg, False,
                                 early_exit=False)

    done = np.asarray(real_fwd(at)[:, rp._ROW_DONE, 0], np.int64)
    scanned = int(done.sum()) * 128
    full_chunks = int(np.asarray(nc, np.int64).sum()) * 128
    print(f"scanned {scanned} (early exit) vs full lists {full_chunks}")
    print(f"real forward (early exit):    {timeit(real_fwd, at):7.2f} ms")
    print(f"real forward (no early exit): {timeit(real_fwd_noexit, at):7.2f} ms")
    for mode in ("full", "no_mxu", "alpha_only", "noexp"):
        f = make_variant(mode)
        print(f"variant {mode:11s}:          {timeit(f, at):7.2f} ms  "
              f"(no early exit, scans full lists)")


if __name__ == "__main__":
    main()


def bf16_probe():
    """Does bf16 elementwise double VPU throughput on this chip?

    ANSWER (round 4, v5e via the remote AOT service): the bf16 variant does
    not compile — Mosaic rejects bf16 comparisons ("Target does not support
    this comparison", arith.cmpf on vector<...xbf16>), and the compositing
    kernel needs its keep-mask/min/clip compares.  A bf16 compositing path
    is therefore blocked on this target independent of any throughput
    argument.  (The f32 leg of this probe also measured implausibly fast —
    its timing is NOT trustworthy evidence; use tools/exp_kernel_anatomy
    main() for calibrated numbers.)"""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import numpy as np, time, sys

    kc, npix, n_tiles = 128, 1024, 625
    n_chunks = 4
    rng = np.random.default_rng(0)
    at32 = jnp.asarray(rng.uniform(0.1, 1.0, (n_tiles, kc * n_chunks, 16)),
                       jnp.float32)

    def make(dtype):
        def kernel(attr_ref, out_ref):
            px = jax.lax.broadcasted_iota(jnp.int32, (1, npix), 1).astype(dtype)
            py = px * dtype(0.5)
            acc = jnp.zeros((1, npix), dtype)
            for c in range(n_chunks):
                a = attr_ref[0, pl.ds(c * kc, kc), :]
                mx, my = a[:, 0:1], a[:, 1:2]
                ca, cb, cc, op = a[:, 2:3], a[:, 3:4], a[:, 4:5], a[:, 5:6]
                dx = px - mx; dy = py - my
                sig = ca * dx * dx + cc * dy * dy + cb * dx * dy
                e = jnp.exp2(-sig)
                al = jnp.minimum(dtype(0.999), op * e)
                al = jnp.where((sig >= 0) & (al >= dtype(1/255.)), al, dtype(0))
                acc = acc + jnp.sum(al, axis=0, keepdims=True)
            out_ref[0] = acc.astype(jnp.float32).reshape(1, npix)

        f = pl.pallas_call(
            kernel, grid=(n_tiles,),
            in_specs=[pl.BlockSpec((1, kc * n_chunks, 16),
                                   lambda t: (t, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, 1, npix), lambda t: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_tiles, 1, npix), jnp.float32))
        return jax.jit(f)

    for dtype, at in ((jnp.float32, at32),
                      (jnp.bfloat16, at32.astype(jnp.bfloat16))):
        f = make(dtype)
        out = f(at); jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(30):
            out = f(at)
        jax.block_until_ready(out)
        print(f"bf16probe {dtype.__name__:9s}: {(time.time()-t0)/30*1e3:6.2f} ms")


if __name__ == "__main__" and "--bf16" in sys.argv:
    bf16_probe()
