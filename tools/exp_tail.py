"""Measure loss/opt tail candidates on the live accelerator (r5 perf item).

The r5 profile attributes ~4.8 ms of the 27 ms step to the non-render tail,
dominated by SH eval+grad (2.75 ms) and the fused Adam (1.39 ms).  Both
operate on (C, 3)/(C, 4)/(C, 15, 3) arrays whose minor dims occupy 3-4 of
128 lanes — the same channel-major layout problem the SSIM stack had (fixed
in r4 at 3.9 → 1.3 ms).  Candidates:

- SH: evaluate in (3, K, C) channel-major with a (K, C) basis and a
  band mask, transposing at the boundary.
- Adam: run the elementwise m/v/update math on flat 1-D views (full lanes),
  reshaping per leaf at the boundary.
"""
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

    from touchgs_tpu.config import OptimConfig
    from touchgs_tpu.models.gaussians import init_random
    from touchgs_tpu.ops.sh import _C0, _C1, _C2, _C3, eval_sh
    from touchgs_tpu.train.optim import make_optimizer
    from touchgs_tpu.train.trainer import _diff_params

    CAP = 131_072
    params = init_random(n=100_000, capacity=CAP, sh_degree=3)
    print(f"device: {jax.devices()[0].device_kind}", flush=True)

    sh = jnp.concatenate([params.sh_dc[:, None, :], params.sh_rest], axis=1)
    rng = np.random.default_rng(0)
    dirs = jnp.asarray(rng.normal(size=(CAP, 3)), jnp.float32)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    # --- current SH ---
    @jax.jit
    def sh_old(dc, rest, d):
        def f(dc, rest):
            s = jnp.concatenate([dc[:, None, :], rest], axis=1)
            return jnp.sum(eval_sh(s, d, 3, 3))
        return jax.grad(f, argnums=(0, 1))(dc, rest)

    # --- channel-major SH ---
    def sh_basis_cm(x, y, z, degree):
        rows = [jnp.full_like(x, _C0)]
        if degree >= 1:
            rows += [-_C1 * y, _C1 * z, -_C1 * x]
        if degree >= 2:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            rows += [_C2[0] * xy, _C2[1] * yz,
                     _C2[2] * (2.0 * zz - xx - yy),
                     _C2[3] * xz, _C2[4] * (xx - yy)]
        if degree >= 3:
            rows += [_C3[0] * y * (3.0 * xx - yy), _C3[1] * xy * z,
                     _C3[2] * y * (4.0 * zz - xx - yy),
                     _C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
                     _C3[4] * x * (4.0 * zz - xx - yy),
                     _C3[5] * z * (xx - yy),
                     _C3[6] * x * (xx - 3.0 * yy)]
        return jnp.stack(rows)                       # (K, C)

    def eval_sh_cm(dc, rest, d, degree, active_degree):
        shT = jnp.transpose(
            jnp.concatenate([dc[:, None, :], rest], axis=1), (2, 1, 0))
        dT = d.T                                     # (3, C)
        B = sh_basis_cm(dT[0], dT[1], dT[2], degree)
        K = B.shape[0]
        band = jnp.concatenate([jnp.zeros((1,)), jnp.repeat(
            jnp.arange(1, degree + 1, dtype=jnp.float32),
            jnp.array([3, 5, 7][:degree]), total_repeat_length=K - 1)])
        mask = (band <= active_degree).astype(jnp.float32)
        out = jnp.sum(shT * (B * mask[:, None])[None], axis=1)   # (3, C)
        return out.T

    @jax.jit
    def sh_new(dc, rest, d):
        def f(dc, rest):
            return jnp.sum(eval_sh_cm(dc, rest, d, 3, jnp.int32(3)))
        return jax.grad(f, argnums=(0, 1))(dc, rest)

    # parity
    a = sh_old(params.sh_dc, params.sh_rest, dirs)
    b = sh_new(params.sh_dc, params.sh_rest, dirs)
    err = max(float(jnp.abs(a[0] - b[0]).max()),
              float(jnp.abs(a[1] - b[1]).max()))
    print(f"sh parity max err: {err:.2e}", flush=True)
    print(f"sh_old:  {timeit(sh_old, params.sh_dc, params.sh_rest, dirs):6.2f} ms",
          flush=True)
    print(f"sh_new:  {timeit(sh_new, params.sh_dc, params.sh_rest, dirs):6.2f} ms",
          flush=True)

    # --- Adam variants ---
    cfg = OptimConfig()
    opt = make_optimizer(cfg)
    diff = _diff_params(params)
    state = opt.init(diff)
    grads = jax.tree.map(jnp.ones_like, diff)

    @jax.jit
    def adam_old(g, s, p):
        u, s2 = opt.update(g, s, p)
        return jax.tree.map(lambda a, b: a + b, p, u), s2

    b1, b2 = 0.9, 0.999

    @jax.jit
    def adam_flat(g, s, p):
        count = s.count + 1
        c = count.astype(jnp.float32)
        bc1 = 1.0 - b1 ** c
        bc2 = 1.0 - b2 ** c
        lrs = {"means": 1e-3, "quats": 1e-3, "log_scales": 5e-3,
               "logit_opacities": 5e-2, "sh_dc": 2.5e-3, "sh_rest": 1.25e-4}
        mu, nu, out = {}, {}, {}
        for k, gk in g.items():
            sh_ = gk.shape
            g1 = gk.reshape(-1)
            m = b1 * s.mu[k].reshape(-1) + (1 - b1) * g1
            v = b2 * s.nu[k].reshape(-1) + (1 - b2) * (g1 * g1)
            upd = (-lrs[k]) * (m / bc1) / (jnp.sqrt(v / bc2) + 1e-15)
            mu[k] = m.reshape(sh_)
            nu[k] = v.reshape(sh_)
            out[k] = (p[k].reshape(-1) + upd).reshape(sh_)
        return out, type(s)(count=count, mu=mu, nu=nu)

    print(f"adam_old:  {timeit(adam_old, grads, state, diff):6.2f} ms",
          flush=True)
    print(f"adam_flat: {timeit(adam_flat, grads, state, diff):6.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
