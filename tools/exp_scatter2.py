"""Scatter-add cost model: rows x width x dtype x OOB fraction."""
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

    rng = np.random.default_rng(0)
    C = 131_584

    def mk(rows, width, dtype, oob_frac=0.0):
        idx = rng.integers(0, C, rows)
        if oob_frac:
            dead = rng.random(rows) < oob_frac
            idx = np.where(dead, C + 10, idx)
        idxj = jnp.asarray(idx, jnp.int32)
        data = jnp.asarray(rng.normal(size=(rows, width)), dtype)

        @jax.jit
        def f(d):
            return jnp.zeros((C, width), dtype).at[idxj].add(d)
        return f, data

    cases = [
        ("806k x16 f32 (base)", 806_400, 16, jnp.float32, 0.0),
        ("806k x16 f32 31% OOB", 806_400, 16, jnp.float32, 0.31),
        ("806k x8  f32", 806_400, 8, jnp.float32, 0.0),
        ("806k x32 f32", 806_400, 32, jnp.float32, 0.0),
        ("806k x16 bf16", 806_400, 16, jnp.bfloat16, 0.0),
        ("403k x16 f32", 403_200, 16, jnp.float32, 0.0),
        ("202k x16 f32", 201_600, 16, jnp.float32, 0.0),
        ("806k x1  f32 scalar-ish", 806_400, 1, jnp.float32, 0.0),
    ]
    for name, rows, w, dt, oob in cases:
        try:
            f, d = mk(rows, w, dt, oob)
            print(f"{name:<26} {timeit(f, d):8.2f} ms", flush=True)
        except Exception as e:
            print(f"{name:<26} FAILED: {str(e)[:80]}", flush=True)

    # gather cost model for comparison
    for rows, src in [(806_400, C), (806_400, 806_400), (2_100_000, C)]:
        idx = jnp.asarray(rng.integers(0, src, rows), jnp.int32)
        data = jnp.asarray(rng.normal(size=(src, 16)), jnp.float32)

        @jax.jit
        def g(d, idx=idx):
            return d[idx]
        print(f"gather {rows//1000}k from {src//1000}k x16"
              f" {timeit(g, data):8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
