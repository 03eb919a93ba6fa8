"""Gaussian primitive parameter pytree — fixed capacity, masked.

The splatfacto parameter groups (SURVEY.md §2.9: means/quats/log-scales/
logit-opacities/SH), stored in fixed-capacity arrays with an ``alive`` mask so
densify/clone/split/prune never changes shapes (jit-stability: SURVEY.md §7
stage 3, "hard part #2").  Dead slots carry garbage and are masked out of
projection via ``extra_valid``.

Capacity is a static int; shard the leading axis over the `model` mesh axis
for Gaussian parallelism (parallel/).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from touchgs_tpu.ops.sh import num_sh_bases, rgb_to_sh_dc


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GaussianParams:
    means: jax.Array             # (C, 3) world positions
    quats: jax.Array             # (C, 4) wxyz (unnormalized; normalized on use)
    log_scales: jax.Array        # (C, 3)
    logit_opacities: jax.Array   # (C,)
    sh_dc: jax.Array             # (C, 3) DC band coefficients
    sh_rest: jax.Array           # (C, K-1, 3) higher bands
    alive: jax.Array             # (C,) bool

    @property
    def capacity(self) -> int:
        return self.means.shape[0]

    @property
    def num_alive(self) -> jax.Array:
        return jnp.sum(self.alive)

    # --- activations ---
    def scales(self) -> jax.Array:
        return jnp.exp(self.log_scales)

    def opacities(self) -> jax.Array:
        return jax.nn.sigmoid(self.logit_opacities)

    def sh_coeffs(self) -> jax.Array:
        """(C, K, 3) stacked SH coefficients."""
        return jnp.concatenate([self.sh_dc[:, None, :], self.sh_rest], axis=1)


def _knn_mean_dist(points: np.ndarray, k: int = 3,
                   max_reference: int = 4096, seed: int = 0) -> np.ndarray:
    """Mean distance to the k nearest neighbors (host-side).

    For large clouds the neighbor search runs against a ``max_reference``-point
    random subsample — an O(N·R) approximation of the O(N²) exact search whose
    error on the *mean* kNN distance is negligible for scale initialization.
    """
    n = points.shape[0]
    if n <= k:
        return np.full((n,), 0.02, np.float32)
    ref = points
    if n > max_reference:
        rng = np.random.default_rng(seed)
        ref = points[rng.choice(n, max_reference, replace=False)]
    r = ref.shape[0]
    out = np.empty((n,), np.float32)
    chunk = max(1, min(2048, n))
    kk = min(k, r - 1)
    for s in range(0, n, chunk):
        d2 = ((points[s:s + chunk, None, :] - ref[None, :, :]) ** 2).sum(-1)
        # k+1 smallest may include a self-distance 0 when the point is in ref
        idx = np.argpartition(d2, kk, axis=1)[:, : kk + 1]
        dk = np.sqrt(np.take_along_axis(d2, idx, axis=1))
        dk = np.sort(dk, axis=1)
        # drop the self column only if it is an exact zero
        first_nonself = (dk[:, 0] == 0).astype(int)
        rows = np.arange(dk.shape[0])[:, None]
        cols = first_nonself[:, None] + np.arange(kk)[None, :]
        out[s:s + chunk] = dk[rows, cols].mean(axis=1)
    return np.maximum(out, 1e-7)


def init_from_points(
    points: np.ndarray,          # (P, 3)
    colors: np.ndarray,          # (P, 3) in [0, 1]
    capacity: int,
    sh_degree: int = 3,
    init_opacity: float = 0.1,
    knn: int = 3,
    seed: int = 0,
) -> GaussianParams:
    """Seed Gaussians from a point cloud (the `points_touch.npy` contract,
    SURVEY.md §2.9: "Gaussians seeded from points_touch.npy + points_colors.npy").

    Scales initialize to the mean k-NN distance (splatfacto convention);
    excess capacity stays dead for densification headroom.
    """
    P = points.shape[0]
    if P > capacity:
        rng = np.random.default_rng(seed)
        sel = rng.choice(P, capacity, replace=False)
        points, colors = points[sel], colors[sel]
        P = capacity
    K = num_sh_bases(sh_degree)
    dists = _knn_mean_dist(points.astype(np.float32), knn)

    def pad(a, fill=0.0):
        width = [(0, capacity - P)] + [(0, 0)] * (a.ndim - 1)
        return np.pad(a, width, constant_values=fill)

    means = pad(points.astype(np.float32))
    quats = pad(np.tile(np.array([1.0, 0, 0, 0], np.float32), (P, 1)))
    log_scales = pad(np.log(dists)[:, None].repeat(3, 1))
    logit_op = pad(np.full((P,), float(np.log(init_opacity / (1 - init_opacity))),
                           np.float32))
    sh_dc = pad(np.asarray(rgb_to_sh_dc(colors.astype(np.float32))))
    sh_rest = np.zeros((capacity, K - 1, 3), np.float32)
    alive = pad(np.ones((P,), bool), fill=False)
    return GaussianParams(
        means=jnp.asarray(means), quats=jnp.asarray(quats),
        log_scales=jnp.asarray(log_scales),
        logit_opacities=jnp.asarray(logit_op),
        sh_dc=jnp.asarray(sh_dc), sh_rest=jnp.asarray(sh_rest),
        alive=jnp.asarray(alive),
    )


def init_random(
    n: int,
    capacity: int,
    sh_degree: int = 3,
    extent: float = 1.0,
    init_opacity: float = 0.1,
    seed: int = 0,
) -> GaussianParams:
    """Random init inside +/-extent (splatfacto's `random_init` path for
    scenes without seed points)."""
    rng = np.random.default_rng(seed)
    points = rng.uniform(-extent, extent, (n, 3)).astype(np.float32)
    colors = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    return init_from_points(points, colors, capacity, sh_degree, init_opacity, seed=seed)
