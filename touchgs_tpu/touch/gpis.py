"""Gaussian Process Implicit Surface (GPIS) in pure JAX.

From-scratch rebuild of the empty ``gpis/`` submodule against its consumer
contract (SURVEY.md §2.8, ``utils/read_touch_depths.py:25-26,41-49``): touch
point clouds → per-view ``gpis_depth/Image{N}.npy`` (posterior mean depth,
meters, NaN where the GP has no support) + ``gpis_var/Image{N}.npy``
(posterior variance), sized like the RGB images.

Model: an implicit-surface GP f: R³→R with f=0 on the surface, f>0 in free
space.  Training points are the touch contact points (targets 0) plus
off-surface points offset along (estimated or provided) surface normals
(targets ±ε) — without them the zero-mean posterior has no sign change to
ray-march to.  RBF kernel by default (the in-repo precedent is GPy RBF,
``legacy/sensor_calibration/sensor_calibration.py:75-112``); Matérn 5/2
available.  Exact inference via Cholesky (MXU-friendly dense solves); queries
are chunked matmuls + triangular solves — all MXU work.

Rendering marches camera rays at ``n_samples`` fixed z-depths (static shapes),
finds the first +→− crossing of the posterior mean, linearly interpolates the
crossing depth, and reads the posterior variance there.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from touchgs_tpu.data.cameras import Camera


def _rbf(d2: jnp.ndarray, lengthscale, signal_var) -> jnp.ndarray:
    return signal_var * jnp.exp(-0.5 * d2 / (lengthscale**2))


def _matern52(d2: jnp.ndarray, lengthscale, signal_var) -> jnp.ndarray:
    d = jnp.sqrt(jnp.maximum(d2, 1e-20))
    s = jnp.sqrt(5.0) * d / lengthscale
    return signal_var * (1.0 + s + s**2 / 3.0) * jnp.exp(-s)


_KERNELS = {"rbf": _rbf, "matern52": _matern52}


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GPIS:
    X: jax.Array            # (N, 3) training inputs
    alpha: jax.Array        # (N,) K⁻¹ y
    L: jax.Array            # (N, N) lower Cholesky of K + σₙ²I
    lengthscale: jax.Array
    signal_var: jax.Array
    noise: jax.Array
    kernel: str = dataclasses.field(metadata=dict(static=True), default="rbf")
    # off-surface target magnitude ε (fit_gpis's off_surface_eps): the ray
    # marcher uses it to tell a real surface approach (mean peaks at ~ε
    # outside the surface) from prior noise around 0
    off_eps: jax.Array = dataclasses.field(
        default_factory=lambda: jnp.float32(0.02))

    @property
    def num_points(self) -> int:
        return self.X.shape[0]


def estimate_normals(
    points: np.ndarray, k: int = 8, orient_to: Optional[np.ndarray] = None
) -> np.ndarray:
    """Local-PCA normal estimation (host-side), oriented toward `orient_to`
    (e.g. the sensor/camera origin) when provided."""
    n = len(points)
    normals = np.zeros_like(points)
    chunk = max(1, min(1024, n))
    for s in range(0, n, chunk):
        d2 = ((points[s:s + chunk, None] - points[None]) ** 2).sum(-1)
        idx = np.argpartition(d2, min(k, n - 1), axis=1)[:, : k + 1]
        for i, nb in enumerate(idx):
            nbrs = points[nb]
            cov = np.cov((nbrs - nbrs.mean(0)).T)
            w, v = np.linalg.eigh(cov)
            normals[s + i] = v[:, 0]
    if orient_to is not None:
        flip = np.einsum("ij,ij->i", orient_to - points, normals) < 0
        normals[flip] *= -1
    norms = np.linalg.norm(normals, axis=1, keepdims=True)
    return normals / np.maximum(norms, 1e-12)


def fit_gpis(
    surface_points: np.ndarray,          # (P, 3)
    normals: Optional[np.ndarray] = None,  # (P, 3) outward normals
    lengthscale: float = 0.05,
    signal_var: float = 1.0,
    noise: float = 1e-4,
    off_surface_eps: float = 0.02,
    max_points: int = 2048,
    kernel: str = "rbf",
    orient_to: Optional[np.ndarray] = None,
    seed: int = 0,
) -> GPIS:
    """Fit the implicit-surface GP (host prep + device Cholesky)."""
    pts = np.asarray(surface_points, np.float32)
    if len(pts) > max_points:
        rng = np.random.default_rng(seed)
        sel = rng.choice(len(pts), max_points, replace=False)
        pts = pts[sel]
        normals = normals[sel] if normals is not None else None
    if normals is None:
        normals = estimate_normals(pts, orient_to=orient_to)

    X = np.concatenate([
        pts,
        pts + off_surface_eps * normals,   # outside: f = +ε
        pts - off_surface_eps * normals,   # inside:  f = −ε
    ])
    y = np.concatenate([
        np.zeros(len(pts)),
        np.full(len(pts), off_surface_eps),
        np.full(len(pts), -off_surface_eps),
    ]).astype(np.float32)

    Xd = jnp.asarray(X)
    yd = jnp.asarray(y)
    ls = jnp.float32(lengthscale)
    sv = jnp.float32(signal_var)
    nz = jnp.float32(noise)

    kfn = _KERNELS[kernel]
    d2 = jnp.sum((Xd[:, None] - Xd[None]) ** 2, axis=-1)
    # float32 Cholesky of a dense RBF Gram matrix needs a healthy nugget:
    # near-duplicate touch samples make K numerically rank-deficient
    jitter = nz**2 + 1e-4 * sv
    K = kfn(d2, ls, sv) + jitter * jnp.eye(len(X))
    L = jnp.linalg.cholesky(K)
    alpha = jax.scipy.linalg.cho_solve((L, True), yd)
    return GPIS(X=Xd, alpha=alpha, L=L, lengthscale=ls, signal_var=sv,
                noise=nz, kernel=kernel,
                off_eps=jnp.float32(off_surface_eps))


def posterior(gpis: GPIS, queries: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Posterior mean and variance at (Q, 3) query points."""
    kfn = _KERNELS[gpis.kernel]
    d2 = jnp.sum((queries[:, None] - gpis.X[None]) ** 2, axis=-1)  # (Q, N)
    k_star = kfn(d2, gpis.lengthscale, gpis.signal_var)
    mean = k_star @ gpis.alpha
    v = jax.scipy.linalg.solve_triangular(gpis.L, k_star.T, lower=True)  # (N, Q)
    var = gpis.signal_var - jnp.sum(v * v, axis=0)
    return mean, jnp.maximum(var, 0.0)


def posterior_mean(gpis: GPIS, queries: jnp.ndarray) -> jnp.ndarray:
    """Posterior mean only — O(N) per query (one MXU matvec) instead of the
    O(N²) triangular solve the variance needs.  The ray marcher samples the
    MEAN densely along every ray but needs the variance only at the single
    crossing point per pixel, so splitting the two turns the march from
    solve-bound into matmul-bound (measured: dense 400² view render went
    from minutes to ~1 s at 1.5k training points)."""
    kfn = _KERNELS[gpis.kernel]
    d2 = jnp.sum((queries[:, None] - gpis.X[None]) ** 2, axis=-1)
    return kfn(d2, gpis.lengthscale, gpis.signal_var) @ gpis.alpha


@functools.partial(jax.jit, static_argnames=("n_samples", "pixel_chunk",
                                             "support_var_frac"))
def _march(gpis: GPIS, origins, dirs, near, far, n_samples: int,
           pixel_chunk: int, support_var_frac: float = 0.5):
    """Ray march: (P, 3) origins/dirs (dir z-normalized so t == z-depth)."""
    ts = jnp.linspace(near, far, n_samples)  # (S,)
    P = origins.shape[0]
    pad = (-P) % pixel_chunk
    origins = jnp.pad(origins, ((0, pad), (0, 0)))
    dirs = jnp.pad(dirs, ((0, pad), (0, 0)), constant_values=1.0)

    def chunk_fn(args):
        o, d = args  # (C, 3)
        pts = o[:, None, :] + ts[None, :, None] * d[:, None, :]  # (C, S, 3)
        # MEAN-ONLY along the ray: the O(N²)-per-query variance is evaluated
        # below at just the one crossing point per pixel (posterior_mean
        # docstring) — S× fewer solve queries for identical depth output
        mean = posterior_mean(gpis, pts.reshape(-1, 3)).reshape(-1, n_samples)
        # A real surface approach makes the mean RISE toward ~ε in the
        # off-surface shell, then fall through 0 at the surface.  Prior-
        # noise wiggles near the support fringe also produce +→− sign
        # changes but with tiny amplitudes — the naive FIRST crossing put
        # 10× more spurious "surfaces" than real ones on the r5 hard
        # scene.  The detector therefore ARMS once the mean has clearly
        # entered a positive shell (> 0.25·ε) and fires at the next
        # zero-crossing.  (Arming on the global argmax instead was tried
        # and is wrong: the ray's largest peak can be the BACK shell exit,
        # which skips the true front surface.)
        armed = jnp.cumsum((mean > 0.25 * gpis.off_eps).astype(jnp.int32),
                           axis=1) > 0                      # (C, S)
        crossing = (mean[:, :-1] > 0) & (mean[:, 1:] <= 0) & armed[:, :-1]
        has = jnp.any(crossing, axis=1)
        first = jnp.argmax(crossing, axis=1)
        m0 = jnp.take_along_axis(mean, first[:, None], axis=1)[:, 0]
        m1 = jnp.take_along_axis(mean, first[:, None] + 1, axis=1)[:, 0]
        frac = m0 / jnp.maximum(m0 - m1, 1e-12)
        t0 = ts[first]
        t1 = ts[first + 1]
        depth = t0 + frac * (t1 - t0)
        # posterior variance AT the interpolated crossing point (previously:
        # linear interpolation of the per-sample variances — evaluating at
        # the point itself is at least as accurate)
        x_cross = o + depth[:, None] * d
        _, var_x = posterior(gpis, x_cross)
        # SUPPORT GATE (the "NaN where the GP has no support" contract,
        # utils/read_touch_depths.py:47-49): far from every contact the
        # zero-mean prior makes the posterior mean hover at ~0, and the
        # sign-change detector fires on numerical noise — measured on the
        # r5 hard scene: 33.5k spurious off-object "surfaces" vs 3.2k real
        # ones before this gate.  A crossing only counts where the
        # posterior variance says the GP actually knows something
        # (var < support_var_frac · signal_var; data-supported regions sit
        # well below, no-support regions saturate at the prior variance).
        has = has & (var_x < support_var_frac * gpis.signal_var)
        # DEPTH variance via the delta method: the implicit-function
        # variance var_f has no metric meaning for a depth map; the
        # consumer (Bayesian fusion, utils/fuse_touch_vision.py:116-126)
        # weighs it against vision sigmas in METERS.  σ_z² = var_f /
        # (∂f/∂t)² at the crossing — near contacts the slope is ~ε/off_eps
        # ≈ 1 per meter and var_f is tiny (σ_z ~ mm); at the support
        # fringe the peak is shallow (small slope) and var_f large, so the
        # phantom silhouette halo self-reports meter-scale uncertainty and
        # loses the fusion instead of poisoning it.
        slope = jnp.maximum((m0 - m1) / jnp.maximum(t1 - t0, 1e-9), 1e-3)
        var_z = var_x / (slope * slope)
        nan = jnp.float32(jnp.nan)
        return (jnp.where(has, depth, nan), jnp.where(has, var_z, nan))

    o_blocks = origins.reshape(-1, pixel_chunk, 3)
    d_blocks = dirs.reshape(-1, pixel_chunk, 3)
    depth, var = jax.lax.map(chunk_fn, (o_blocks, d_blocks))
    return depth.reshape(-1)[:P], var.reshape(-1)[:P]


def render_depth_var(
    gpis: GPIS,
    camera: Camera,
    near: float = 0.05,
    far: float = 2.0,
    n_samples: int = 128,
    pixel_chunk: int = 4096,
    support_var_frac: float = 0.5,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Render per-pixel expected surface z-depth + variance (the
    gpis_depth/gpis_var contract; NaN where the ray finds no surface OR the
    GP has no support there — crossings with posterior variance above
    ``support_var_frac·signal_var`` are noise of the zero prior, not
    surface)."""
    h, w = camera.height, camera.width
    vs, us = jnp.mgrid[0:h, 0:w]
    # OpenCV-convention ray dirs with z=1 so the march parameter is z-depth
    dir_cam = jnp.stack(
        [
            (us + 0.5 - camera.cx) / camera.fx,
            (vs + 0.5 - camera.cy) / camera.fy,
            jnp.ones_like(us, jnp.float32),
        ],
        axis=-1,
    ).reshape(-1, 3)
    R_cv = camera.c2w[:3, :3] @ jnp.diag(jnp.array([1.0, -1.0, -1.0]))
    dirs = dir_cam @ R_cv.T
    origins = jnp.broadcast_to(camera.c2w[:3, 3], dirs.shape)
    depth, var = _march(
        gpis, origins, dirs, jnp.float32(near), jnp.float32(far),
        n_samples, pixel_chunk, support_var_frac,
    )
    return depth.reshape(h, w), var.reshape(h, w)
