"""Round-5 perf experiments, part 3: chained (dispatch-overhead-free)
measurements.  Part 2's standalone numbers were polluted: a bare sort
"measured" 0.02 ms (impossible) and two very different SH variants both
"measured" 1.4 ms forward — the remote-tunnel per-dispatch overhead and/or
pipelining swamps sub-ms kernels.  Here every candidate runs R times INSIDE
one jit with a data dependency between repeats; reported time is
(t_chain(R) - t_chain(1)) / (R - 1).
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

R = 9


def timeit(fn, *args, n=10, warmup=3):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n * 1000


def chain_ms(make, *args):
    f1 = make(1)
    fR = make(R)
    t1 = timeit(f1, *args)
    tR = timeit(fR, *args)
    return (tR - t1) / (R - 1), t1


def main():
    import jax
    import jax.numpy as jnp

    from touchgs_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    rng = np.random.default_rng(0)

    # --- sort at binning scale, chained ---
    M = 2 ** 21
    keys = jnp.asarray(rng.integers(0, 2 ** 31 - 1, M, dtype=np.int32))
    vals = jnp.asarray(rng.integers(0, 131072, M, dtype=np.int32))

    def make_sort_pair(reps):
        @jax.jit
        def f(k, v):
            for i in range(reps):
                k, v = jax.lax.sort((k ^ (i + 1), v), num_keys=1,
                                    is_stable=False)
            return k, v
        return f

    def make_sort_single(reps):
        @jax.jit
        def f(k):
            for i in range(reps):
                (k,) = jax.lax.sort((k ^ (i + 1),), num_keys=1,
                                    is_stable=False)
            return k
        return f

    ms, t1 = chain_ms(make_sort_pair, keys, vals)
    print(f"sort_pair(2M) chained: {ms:6.2f} ms   (single-call {t1:.2f})",
          flush=True)
    ms, t1 = chain_ms(make_sort_single, keys)
    print(f"sort_single(2M) chained: {ms:6.2f} ms (single-call {t1:.2f})",
          flush=True)

    # --- SH variants, chained ---
    from touchgs_tpu.models.gaussians import init_random
    from touchgs_tpu.ops.sh import _C0, _C1, _C2, _C3, eval_sh

    CAP = 131_072
    params = init_random(n=100_000, capacity=CAP, sh_degree=3)
    dirs = jnp.asarray(rng.normal(size=(CAP, 3)), jnp.float32)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    def make_sh_old(reps):
        @jax.jit
        def f(dc, rest, d):
            out = 0.0
            for i in range(reps):
                def g(dc, rest):
                    s = jnp.concatenate([dc[:, None, :], rest], axis=1)
                    return jnp.sum(eval_sh(s, d + i * 1e-6, 3, 3))
                gd = jax.grad(g, argnums=(0, 1))(dc, rest)
                dc = dc + 1e-9 * gd[0]
                rest = rest + 1e-9 * gd[1]
                out = out + gd[0].sum()
            return out, dc
        return f

    def basis_rows(x, y, z):
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        return [jnp.full_like(x, _C0),
                -_C1 * y, _C1 * z, -_C1 * x,
                _C2[0] * xy, _C2[1] * yz, _C2[2] * (2.0 * zz - xx - yy),
                _C2[3] * xz, _C2[4] * (xx - yy),
                _C3[0] * y * (3.0 * xx - yy), _C3[1] * xy * z,
                _C3[2] * y * (4.0 * zz - xx - yy),
                _C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
                _C3[4] * x * (4.0 * zz - xx - yy),
                _C3[5] * z * (xx - yy), _C3[6] * x * (xx - 3.0 * yy)]

    def eval_sh_2d(dc, rest, d):
        sh48 = jnp.concatenate([dc[:, None, :], rest], axis=1).reshape(-1, 48)
        T = sh48.T
        x, y, z = d[:, 0], d[:, 1], d[:, 2]
        B = basis_rows(x, y, z)
        outs = []
        for ch in range(3):
            acc = B[0] * T[ch]
            for k in range(1, 16):
                acc = acc + B[k] * T[3 * k + ch]
            outs.append(acc)
        return jnp.stack(outs, axis=-1)

    def make_sh_2d(reps):
        @jax.jit
        def f(dc, rest, d):
            out = 0.0
            for i in range(reps):
                def g(dc, rest):
                    return jnp.sum(eval_sh_2d(dc, rest, d + i * 1e-6))
                gd = jax.grad(g, argnums=(0, 1))(dc, rest)
                dc = dc + 1e-9 * gd[0]
                rest = rest + 1e-9 * gd[1]
                out = out + gd[0].sum()
            return out, dc
        return f

    ms, t1 = chain_ms(make_sh_old, params.sh_dc, params.sh_rest, dirs)
    print(f"sh_old fwd+grad chained: {ms:6.2f} ms (single-call {t1:.2f})",
          flush=True)
    ms, t1 = chain_ms(make_sh_2d, params.sh_dc, params.sh_rest, dirs)
    print(f"sh_2d  fwd+grad chained: {ms:6.2f} ms (single-call {t1:.2f})",
          flush=True)

    # --- Adam variants, chained ---
    from touchgs_tpu.config import OptimConfig
    from touchgs_tpu.train.optim import make_optimizer
    from touchgs_tpu.train.trainer import _diff_params

    opt = make_optimizer(OptimConfig())
    diff = _diff_params(params)
    state = opt.init(diff)
    grads = jax.tree.map(jnp.ones_like, diff)

    def make_adam(reps):
        @jax.jit
        def f(g, s, p):
            for _ in range(reps):
                u, s = opt.update(g, s, p)
                p = jax.tree.map(lambda a, b: a + b, p, u)
            return p, s
        return f

    b1, b2 = 0.9, 0.999

    def flat_update(g, s, p):
        count = s.count + 1
        c = count.astype(jnp.float32)
        bc1 = 1.0 - b1 ** c
        bc2 = 1.0 - b2 ** c
        mu, nu, out = {}, {}, {}
        for k, gk in g.items():
            sh_ = gk.shape
            g1 = gk.reshape(-1)
            m = b1 * s.mu[k].reshape(-1) + (1 - b1) * g1
            v = b2 * s.nu[k].reshape(-1) + (1 - b2) * (g1 * g1)
            upd = (-1e-3) * (m / bc1) / (jnp.sqrt(v / bc2) + 1e-15)
            mu[k] = m.reshape(sh_)
            nu[k] = v.reshape(sh_)
            out[k] = (p[k].reshape(-1) + upd).reshape(sh_)
        return out, type(s)(count=count, mu=mu, nu=nu)

    def make_adam_flat(reps):
        @jax.jit
        def f(g, s, p):
            for _ in range(reps):
                p, s = flat_update(g, s, p)
            return p, s
        return f

    ms, t1 = chain_ms(make_adam, grads, state, diff)
    print(f"adam_old chained:  {ms:6.2f} ms (single-call {t1:.2f})", flush=True)
    ms, t1 = chain_ms(make_adam_flat, grads, state, diff)
    print(f"adam_flat chained: {ms:6.2f} ms (single-call {t1:.2f})", flush=True)


if __name__ == "__main__":
    main()
