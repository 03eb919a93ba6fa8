"""Round-5 perf experiments, part 2: sort-width and SH-layout candidates.

- sort_pair vs sort_single: `lax.sort` of (key, value) vs key-only at the
  binning's 2^21 elements — how much of the 3.7 ms is the value operand?
- sh variants: old (C,K,3) slicing vs 2-D transpose layout ((K·3, C) rows,
  all elementwise math on full-lane (C,) vectors).
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

    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    rng = np.random.default_rng(0)

    # --- sort experiments at binning scale ---
    M = 2 ** 21
    keys = jnp.asarray(rng.integers(0, 2 ** 31 - 1, M, dtype=np.int32))
    vals = jnp.asarray(rng.integers(0, 131072, M, dtype=np.int32))

    @jax.jit
    def sort_pair(k, v):
        return jax.lax.sort((k, v), num_keys=1, is_stable=False)

    @jax.jit
    def sort_single(k):
        return jax.lax.sort((k,), num_keys=1, is_stable=False)

    @jax.jit
    def sort_half(k, v):
        return jax.lax.sort((k[: M // 2], v[: M // 2]), num_keys=1,
                            is_stable=False)

    print(f"sort_pair(2M):   {timeit(sort_pair, keys, vals):6.2f} ms", flush=True)
    print(f"sort_single(2M): {timeit(sort_single, keys):6.2f} ms", flush=True)
    print(f"sort_pair(1M):   {timeit(sort_half, keys, vals):6.2f} ms", flush=True)

    # --- SH variants ---
    from touchgs_tpu.models.gaussians import init_random
    from touchgs_tpu.ops.sh import _C0, _C1, _C2, _C3, eval_sh

    CAP = 131_072
    params = init_random(n=100_000, capacity=CAP, sh_degree=3)
    dirs = jnp.asarray(rng.normal(size=(CAP, 3)), jnp.float32)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    @jax.jit
    def sh_old(dc, rest, d):
        def f(dc, rest):
            s = jnp.concatenate([dc[:, None, :], rest], axis=1)
            return jnp.sum(eval_sh(s, d, 3, 3))
        return jax.grad(f, argnums=(0, 1))(dc, rest)

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
        # (C, 48) flatten → (48, C) transpose; all math on (C,) rows
        sh48 = jnp.concatenate([dc[:, None, :], rest], axis=1).reshape(-1, 48)
        T = sh48.T                                    # (48, C)
        x, y, z = d[:, 0], d[:, 1], d[:, 2]
        B = basis_rows(x, y, z)                       # 16 × (C,)
        outs = []
        for ch in range(3):
            acc = B[0] * T[ch]
            for k in range(1, 16):
                acc = acc + B[k] * T[3 * k + ch]
            outs.append(acc)
        return jnp.stack(outs, axis=-1)               # (C, 3)

    @jax.jit
    def sh_2d(dc, rest, d):
        def f(dc, rest):
            return jnp.sum(eval_sh_2d(dc, rest, d))
        return jax.grad(f, argnums=(0, 1))(dc, rest)

    a = sh_old(params.sh_dc, params.sh_rest, dirs)
    b = sh_2d(params.sh_dc, params.sh_rest, dirs)
    err = max(float(jnp.abs(a[0] - b[0]).max()),
              float(jnp.abs(a[1] - b[1]).max()))
    print(f"sh_2d parity: {err:.2e}", flush=True)
    print(f"sh_old: {timeit(sh_old, params.sh_dc, params.sh_rest, dirs):6.2f} ms",
          flush=True)
    print(f"sh_2d:  {timeit(sh_2d, params.sh_dc, params.sh_rest, dirs):6.2f} ms",
          flush=True)

    # fwd-only comparison (the fwd sits inside the big autodiff graph)
    @jax.jit
    def sh_old_f(dc, rest, d):
        s = jnp.concatenate([dc[:, None, :], rest], axis=1)
        return eval_sh(s, d, 3, 3)

    sh_2d_f = jax.jit(eval_sh_2d)
    print(f"sh_old fwd: {timeit(sh_old_f, params.sh_dc, params.sh_rest, dirs):6.2f} ms",
          flush=True)
    print(f"sh_2d  fwd: {timeit(sh_2d_f, params.sh_dc, params.sh_rest, dirs):6.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
