"""Micro-benchmarks for the backward gradient-reduction alternatives.

The r2 step spends 12.3 ms in the XLA scatter-add VJP of the per-tile attr
gather (806k rows with collisions -> 131k rows).  Candidate replacements:

  A. current: .at[gidx].add(rows) with duplicate indices
  B. pair-space: collision-free scatter of rows into (G*T_cap, 16) by unique
     pair id, then a dense reshape-sum over T_cap
  C. pair-space via dynamic_update? (n/a)
  D. sort-by-gaussian + Pallas running prefix + boundary gathers

Also times sort variants for binning (is_stable, uint32 depth-bit keys).
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

    rng = np.random.default_rng(0)
    N_TILES, K_WIDE, A = 700, 1152, 16
    C = 131_072 + 512
    T_CAP = 16
    G = 131_072
    rows = jnp.asarray(rng.normal(size=(N_TILES, K_WIDE, A)), jnp.float32)
    # realistic index structure: each tile's list = random gaussians
    gidx = jnp.asarray(rng.integers(0, C, (N_TILES, K_WIDE)), jnp.int32)
    # unique pair ids: each (tile, slot) -> distinct pair id
    pid = jnp.asarray(
        rng.permutation(G * T_CAP)[: N_TILES * K_WIDE].reshape(
            N_TILES, K_WIDE), jnp.int32)

    def p(name, fn, *args):
        try:
            print(f"{name:<28} {timeit(fn, *args):8.2f} ms", flush=True)
        except Exception as e:
            print(f"{name:<28} FAILED: {str(e)[:90]}", flush=True)

    @jax.jit
    def scatter_add_dup(r):
        return jnp.zeros((C, A), jnp.float32).at[gidx.reshape(-1)].add(
            r.reshape(-1, A))

    @jax.jit
    def scatter_unique_pairspace(r):
        buf = jnp.zeros((G * T_CAP, A), jnp.float32).at[pid.reshape(-1)].set(
            r.reshape(-1, A), unique_indices=True, indices_are_sorted=False)
        return buf.reshape(G, T_CAP, A).sum(axis=1)

    @jax.jit
    def scatter_add_unique_pairspace(r):
        buf = jnp.zeros((G * T_CAP, A), jnp.float32).at[pid.reshape(-1)].add(
            r.reshape(-1, A), unique_indices=True)
        return buf.reshape(G, T_CAP, A).sum(axis=1)

    # D: sort rows by gaussian id then segment boundaries via prefix diffs
    order = jnp.argsort(gidx.reshape(-1))

    @jax.jit
    def sort_gather_rows(r):
        return r.reshape(-1, A)[order]

    p("A scatter-add dup (r2)", scatter_add_dup, rows)
    p("B scatter set unique", scatter_unique_pairspace, rows)
    p("B' scatter add unique", scatter_add_unique_pairspace, rows)
    p("D gather rows by perm", sort_gather_rows, rows)

    # --- sort experiments (binning) ---
    M = G * T_CAP
    keys32 = jnp.asarray(rng.integers(0, 2**31 - 1, M), jnp.int32)
    keysu32 = keys32.astype(jnp.uint32)
    vals = jnp.asarray(rng.integers(0, G, M), jnp.int32)

    @jax.jit
    def sort_pair_stable(k, v):
        return jax.lax.sort((k, v), num_keys=1, is_stable=True)

    @jax.jit
    def sort_pair_unstable(k, v):
        return jax.lax.sort((k, v), num_keys=1, is_stable=False)

    @jax.jit
    def sort_keys_only(k):
        return jax.lax.sort((k,), num_keys=1, is_stable=False)

    @jax.jit
    def sort_u32(k, v):
        return jax.lax.sort((k, v), num_keys=1, is_stable=False)

    p("sort 2.1M (k,v) stable", sort_pair_stable, keys32, vals)
    p("sort 2.1M (k,v) unstable", sort_pair_unstable, keys32, vals)
    p("sort 2.1M keys only", sort_keys_only, keys32)
    p("sort 2.1M u32 (k,v)", sort_u32, keysu32, vals)

    # G-sized sorts (the rank double-sort)
    kg = jnp.asarray(rng.normal(size=G), jnp.float32)
    ig = jnp.arange(G, dtype=jnp.int32)

    @jax.jit
    def rank_double_sort(k):
        _, o = jax.lax.sort((k, ig), num_keys=1)
        _, rk = jax.lax.sort((o, ig), num_keys=1)
        return rk

    p("rank double-sort 131k", rank_double_sort, kg)


if __name__ == "__main__":
    main()
