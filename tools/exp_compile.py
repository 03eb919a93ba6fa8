"""Bisect which component makes the train-step compile pathological:
times the jit compile of (a) loss+grad with matmul-SSIM, (b) fused adam,
(c) slot lists double-buffered, (d) full train step."""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WHICH = sys.argv[1] if len(sys.argv) > 1 else "all"


def main():
    import jax
    import jax.numpy as jnp
    from touchgs_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from touchgs_tpu.config import (DensifyConfig, DepthLossConfig,
                                    ModelConfig, OptimConfig, RasterizeConfig,
                                    TrainConfig)
    from touchgs_tpu.data.cameras import Camera
    from touchgs_tpu.models.densify import DensifyState
    from touchgs_tpu.models.gaussians import init_random
    from touchgs_tpu.train.optim import make_optimizer
    from touchgs_tpu.train.trainer import (TrainState, _diff_params,
                                           make_train_step)

    WIDTH = HEIGHT = 800
    N, CAP = 100_000, 131_072
    rcfg = RasterizeConfig(use_pallas=True)
    cfg = TrainConfig(
        model=ModelConfig(max_gaussians=CAP, sh_degree=3, rasterize=rcfg),
        depth=DepthLossConfig(), densify=DensifyConfig(), optim=OptimConfig())
    params = init_random(n=N, capacity=CAP, sh_degree=3)
    cam = Camera(
        fx=jnp.float32(0.9 * WIDTH), fy=jnp.float32(0.9 * WIDTH),
        cx=jnp.float32(WIDTH / 2), cy=jnp.float32(HEIGHT / 2),
        c2w=jnp.asarray([[1.0, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 2.5],
                         [0, 0, 0, 1]], jnp.float32),
        width=WIDTH, height=HEIGHT,
    )
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.uniform(0, 1, (HEIGHT, WIDTH, 3)), jnp.float32)
    depth = jnp.asarray(rng.uniform(1, 3, (HEIGHT, WIDTH)), jnp.float32)
    unc = jnp.ones((HEIGHT, WIDTH), jnp.float32)

    def clock(name, fn, *args):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        print(f"{name:<22} compile+run1: {time.time()-t0:8.1f} s", flush=True)
        return out

    if WHICH in ("ssim", "all"):
        from touchgs_tpu.ops.ssim import ssim

        @jax.jit
        def f_ssim_grad(a):
            return jax.grad(lambda x: ssim(x, image))(a)
        clock("matmul ssim fwd+grad", f_ssim_grad, image)

    if WHICH in ("adam", "all"):
        optimizer = make_optimizer(cfg.optim)
        diff = _diff_params(params)
        ost = optimizer.init(diff)

        @jax.jit
        def f_adam(d, s):
            g = jax.tree.map(jnp.ones_like, d)
            u, s2 = optimizer.update(g, s, d)
            return jax.tree.map(lambda a, b: a + b, d, u), s2
        clock("fused adam", f_adam, diff, ost)

    if WHICH in ("render", "all"):
        from touchgs_tpu.models.splatfacto import render

        @jax.jit
        def f_fwd(p):
            out, _ = render(p, cam, cfg.model, active_sh_degree=3)
            return out.rgb
        clock("render fwd (slots dbuf)", f_fwd, params)

        @jax.jit
        def f_fwd_bwd(p):
            def loss(means):
                import dataclasses as _dc
                out, _ = render(_dc.replace(p, means=means), cam, cfg.model,
                                active_sh_degree=3)
                return jnp.sum(out.rgb)
            return jax.grad(loss)(p.means)
        clock("render fwd+bwd", f_fwd_bwd, params)

    if WHICH in ("step", "all"):
        optimizer = make_optimizer(cfg.optim)
        state = TrainState(params=params,
                           opt_state=optimizer.init(_diff_params(params)),
                           densify=DensifyState.zeros(CAP),
                           step=jnp.int32(0))
        step = make_train_step(cfg, optimizer)
        clock("full train step", step, state, cam, image, depth, unc,
              jnp.int32(3))


if __name__ == "__main__":
    main()
