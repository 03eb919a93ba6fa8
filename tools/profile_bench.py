"""Stage-by-stage timing of the bench train step on the live accelerator.

Isolates projection / binning / gather / Pallas fwd / fwd+bwd / full step so
kernel work can be attributed before optimizing (SURVEY.md §6 roofline duty).
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, n=20, warmup=2):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n * 1000  # ms


def main():
    import jax
    import jax.numpy as jnp

    from touchgs_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from touchgs_tpu.config import (
        DensifyConfig, DepthLossConfig, ModelConfig, OptimConfig,
        RasterizeConfig, TrainConfig,
    )
    from touchgs_tpu.data.cameras import Camera
    from touchgs_tpu.models.densify import DensifyState
    from touchgs_tpu.models.gaussians import init_random
    from touchgs_tpu.models.splatfacto import render, compute_losses
    from touchgs_tpu.ops.projection import project_gaussians
    from touchgs_tpu.ops.tiles import bin_gaussians, gather_1d
    from touchgs_tpu.ops import rasterize_pallas as rp
    from touchgs_tpu.train.optim import make_optimizer
    from touchgs_tpu.train.trainer import TrainState, _diff_params, make_train_step

    WIDTH = HEIGHT = 800
    N, CAP = 100_000, 131_072
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}", file=sys.stderr)

    rcfg = RasterizeConfig(use_pallas=(dev.platform == "tpu"))
    cfg = TrainConfig(
        model=ModelConfig(max_gaussians=CAP, sh_degree=3, rasterize=rcfg),
        depth=DepthLossConfig(), densify=DensifyConfig(), optim=OptimConfig(),
    )
    params = init_random(n=N, capacity=CAP, sh_degree=3)
    cam = Camera(
        fx=jnp.float32(0.9 * WIDTH), fy=jnp.float32(0.9 * WIDTH),
        cx=jnp.float32(WIDTH / 2), cy=jnp.float32(HEIGHT / 2),
        c2w=jnp.asarray([[1.0, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 2.5],
                         [0, 0, 0, 1]], jnp.float32),
        width=WIDTH, height=HEIGHT,
    )

    # --- stage fns ---
    def proj_of(p, means=None):
        return project_gaussians(
            means if means is not None else p.means, p.quats, p.scales(),
            cam.w2c, cam.fx, cam.fy, cam.cx, cam.cy, WIDTH, HEIGHT, rcfg,
            extra_valid=p.alive)

    @jax.jit
    def f_project(p):
        return proj_of(p)

    @jax.jit
    def f_bin(p):
        return bin_gaussians(proj_of(p), WIDTH, HEIGHT, rcfg)

    opac = params.opacities()
    colors = jnp.abs(params.sh_dc)

    @jax.jit
    def f_fwd(p):
        out = rp.rasterize_pallas(proj_of(p), colors, opac, WIDTH, HEIGHT, rcfg)
        return out.rgb

    @jax.jit
    def f_fwd_bwd(p):
        def loss(means):
            out = rp.rasterize_pallas(proj_of(p, means), colors, opac,
                                      WIDTH, HEIGHT, rcfg)
            return jnp.sum(out.rgb) + jnp.sum(out.depth)
        return jax.grad(loss)(p.means)

    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.uniform(0, 1, (HEIGHT, WIDTH, 3)), jnp.float32)
    depth = jnp.asarray(rng.uniform(1, 3, (HEIGHT, WIDTH)), jnp.float32)
    unc = jnp.ones((HEIGHT, WIDTH), jnp.float32)

    optimizer = make_optimizer(cfg.optim)
    # the train step donates its input state: give it a COPY of params so
    # donation can't delete the buffers the other stage fns still reference
    params_copy = jax.tree.map(jnp.copy, params)
    state = TrainState(params=params_copy,
                       opt_state=optimizer.init(_diff_params(params_copy)),
                       densify=DensifyState.zeros(CAP), step=jnp.int32(0))
    step = make_train_step(cfg, optimizer)

    def time_step(n=10, warmup=3):
        nonlocal state
        for _ in range(warmup):
            state, m = step(state, cam, image, depth, unc, jnp.int32(3))
        jax.block_until_ready(m["loss"])
        t0 = time.time()
        for _ in range(n):
            state, m = step(state, cam, image, depth, unc, jnp.int32(3))
        jax.block_until_ready(m["loss"])
        return (time.time() - t0) / n * 1000

    # isolate the attr gather + its VJP scatter-add (the XLA side of the
    # custom-vjp sandwich)
    proj0 = f_project(params)
    from touchgs_tpu.ops.rasterize_pallas import _pack_attrs
    bins0 = f_bin(params)
    attrs0 = _pack_attrs(proj0, colors, opac)
    K_TILE = 1024
    ks = jnp.arange(K_TILE, dtype=jnp.int32)
    M = bins0.sorted_gauss.shape[0]
    ptr = jnp.clip(bins0.tile_starts[:, None] + ks[None, :], 0, M - 1)
    in_list = ks[None, :] < jnp.minimum(bins0.tile_counts, K_TILE)[:, None]
    gidx0 = jnp.where(in_list, gather_1d(bins0.sorted_gauss, ptr),
                      attrs0.shape[0] - 1)

    @jax.jit
    def f_gather(attrs):
        return attrs[gidx0]

    dattrs0 = f_gather(attrs0)

    @jax.jit
    def f_scatter(dat):
        _, vjp = jax.vjp(lambda a: a[gidx0], attrs0)
        return vjp(dat)[0]

    # loss-side pieces
    from touchgs_tpu.ops.ssim import ssim as ssim_fn
    from touchgs_tpu.ops.sh import eval_sh

    @jax.jit
    def f_ssim_grad(img):
        return jax.grad(lambda a: ssim_fn(a, image))(img)

    @jax.jit
    def f_sh_grad(dc, rest):
        def f(dc, rest):
            sh = jnp.concatenate([dc[:, None, :], rest], axis=1)
            dirs = params.means / (jnp.linalg.norm(params.means, axis=-1,
                                                   keepdims=True) + 1e-9)
            return jnp.sum(eval_sh(sh, dirs, 3, 3))
        return jax.grad(f, argnums=(0, 1))(dc, rest)

    @jax.jit
    def f_full_loss_grad(p):
        diff = _diff_params(p)
        def loss(diff, off):
            from touchgs_tpu.train.trainer import _merge_params
            pm = _merge_params(p, diff)
            out, proj = render(pm, cam, cfg.model, active_sh_degree=jnp.int32(3),
                               means2d_offset=off)
            losses = compute_losses(out, image, depth, unc, cfg.depth, 0.2)
            return losses.total
        C = p.capacity
        return jax.grad(loss, argnums=(0, 1))(diff, jnp.zeros((C, 2), jnp.float32))

    @jax.jit
    def f_adam(p, opt_state):
        diff = _diff_params(p)
        g = jax.tree.map(jnp.ones_like, diff)
        updates, new_state = optimizer.update(g, opt_state, diff)
        return jax.tree.map(lambda a, u: a + u, diff, updates)

    # flush per line + per-stage guard: the tunnel's AOT compiles are
    # high-variance (25 s to 15 min for the same program) and occasionally
    # return backend errors for individual subgraphs — partial output must
    # survive both
    def p(name, fn, *args):
        try:
            print(f"{name:<10} {timeit(fn, *args):8.2f} ms", flush=True)
        except Exception as e:
            print(f"{name:<10} FAILED: {str(e)[:90]}", flush=True)

    print(f"step:      {time_step():8.2f} ms", flush=True)
    p("gather:", f_gather, attrs0)
    p("fwd:", f_fwd, params)
    p("fwd+bwd:", f_fwd_bwd, params)
    p("ssim+grad:", f_ssim_grad, image)
    p("adam:", f_adam, params, state.opt_state)
    p("scatter:", f_scatter, dattrs0)
    p("sh+grad:", f_sh_grad, params.sh_dc, params.sh_rest)
    p("loss+grad:", f_full_loss_grad, params)
    p("project:", f_project, params)
    p("bin:", f_bin, params)


if __name__ == "__main__":
    main()
