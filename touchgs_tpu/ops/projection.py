"""EWA projection of 3D Gaussians to screen space (pure jnp, fully batched).

TPU-native equivalent of the gsplat `project_gaussians` CUDA kernel
(SURVEY.md §2.9: project → tile-sort → composite).  Everything is elementwise
or tiny (3x3) matrix algebra over the Gaussian axis — ideal VPU work; XLA fuses
the whole thing into a handful of kernels.  No data-dependent shapes: invalid
(culled) Gaussians are masked, never dropped.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from touchgs_tpu.config import RasterizeConfig


def _rotmat_elems(q: jnp.ndarray):
    """(..., 4) wxyz quaternion → tuple of 9 (...,) rotation-matrix entries.

    Kept un-stacked: downstream consumers combine them scalar-wise, which XLA
    maps onto pure VPU work.  Stacking into (N, 3, 3) and using batched 3x3
    matmuls forces tiny-matrix MXU dispatches with terrible layouts (measured
    8.7 ms for projection at 131k Gaussians on v5e; scalar form is <1 ms).
    """
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return (
        1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
        2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
        2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
    )


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) wxyz quaternion → (..., 3, 3) rotation (normalizes input)."""
    r = jnp.stack(_rotmat_elems(q), axis=-1)
    return r.reshape(q.shape[:-1] + (3, 3))


class ProjectedGaussians(NamedTuple):
    """Screen-space splats. All arrays keep the full Gaussian axis (masked)."""

    means2d: jnp.ndarray   # (N, 2) pixel coords
    conics: jnp.ndarray    # (N, 3) upper-tri of inverse 2D covariance (a, b, c)
    depths: jnp.ndarray    # (N,) camera-space z
    radii: jnp.ndarray     # (N,) pixel radius at sigma_cutoff (0 for culled);
                           # feeds densify max-screen-size stats
    valid: jnp.ndarray     # (N,) bool — in front of near plane & non-degenerate
    # opacity-adaptive culling radius: beyond it α < alpha_threshold in every
    # direction, so dropping (gaussian, tile) pairs outside it is EXACT w.r.t.
    # the compositing kernels' keep-mask.  Falls back to `radii` when
    # projection was not given opacities.
    cull_radii: jnp.ndarray | None = None


def project_gaussians(
    means: jnp.ndarray,       # (N, 3) world
    quats: jnp.ndarray,       # (N, 4) wxyz
    scales: jnp.ndarray,      # (N, 3) world-space scales (already activated)
    w2c: jnp.ndarray,         # (4, 4) world→camera, OpenCV (+Z forward)
    fx, fy, cx, cy,
    width: int, height: int,
    cfg: RasterizeConfig = RasterizeConfig(),
    extra_valid: jnp.ndarray | None = None,  # (N,) e.g. alive-mask
    opacities: jnp.ndarray | None = None,    # (N,) activated; enables exact
                                             # opacity-adaptive cull radii
) -> ProjectedGaussians:
    """EWA splatting: perspective-project 3D Gaussians to 2D screen Gaussians.

    Math follows Zwicker et al. EWA splatting as used by 3DGS: camera-space
    cov Σ' = W Σ Wᵀ, screen cov = J Σ' Jᵀ with the local affine Jacobian J of
    the pinhole projection, dilated by ``cfg.eps2d`` for antialiasing.
    """
    # Everything below is expressed over un-stacked (N,) columns: the batched
    # (N,3,3) matmul formulation lowers to tiny-matrix MXU dispatches with
    # pathological layouts (8.7 ms at 131k Gaussians on v5e); the scalar
    # expansion is pure fused VPU work (<1 ms), numerically identical.
    W = [[w2c[i, j] for j in range(3)] for i in range(3)]
    t_w2c = [w2c[0, 3], w2c[1, 3], w2c[2, 3]]

    # camera-space means: p = W @ m + t
    m0, m1, m2 = means[..., 0], means[..., 1], means[..., 2]
    x = W[0][0] * m0 + W[0][1] * m1 + W[0][2] * m2 + t_w2c[0]
    y = W[1][0] * m0 + W[1][1] * m1 + W[1][2] * m2 + t_w2c[1]
    z = W[2][0] * m0 + W[2][1] * m1 + W[2][2] * m2 + t_w2c[2]
    zsafe = jnp.where(z > cfg.near, z, cfg.near)

    # A = (W @ R_g) ∘ broadcast(s): cam-frame gaussian axes scaled; then
    # cov_cam = A Aᵀ  (= W R S Sᵀ Rᵀ Wᵀ, the EWA camera-space covariance)
    Rg = _rotmat_elems(quats)                   # 9 × (N,)
    s0, s1, s2 = scales[..., 0], scales[..., 1], scales[..., 2]
    s = (s0, s1, s2)
    A = [[
        (W[i][0] * Rg[0 + j] + W[i][1] * Rg[3 + j] + W[i][2] * Rg[6 + j]) * s[j]
        for j in range(3)] for i in range(3)]

    def dotr(i, j):  # (A Aᵀ)_ij
        return A[i][0] * A[j][0] + A[i][1] * A[j][1] + A[i][2] * A[j][2]

    c00, c01, c02 = dotr(0, 0), dotr(0, 1), dotr(0, 2)
    c11, c12, c22 = dotr(1, 1), dotr(1, 2), dotr(2, 2)

    # clamped view-space coords for the Jacobian (3DGS trick: limit to 1.3x fov)
    lim_x = 1.3 * (0.5 * width / fx)
    lim_y = 1.3 * (0.5 * height / fy)
    tx = jnp.clip(x / zsafe, -lim_x, lim_x) * zsafe
    ty = jnp.clip(y / zsafe, -lim_y, lim_y) * zsafe

    # J rows: (j00, 0, j02), (0, j11, j12) — Jacobian of the pinhole map
    inv_z = 1.0 / zsafe
    inv_z2 = inv_z * inv_z
    j00 = fx * inv_z
    j02 = -fx * tx * inv_z2
    j11 = fy * inv_z
    j12 = -fy * ty * inv_z2

    # cov2d = J cov_cam Jᵀ, expanded through the zero pattern of J
    a = j00 * j00 * c00 + 2 * j00 * j02 * c02 + j02 * j02 * c22 + cfg.eps2d
    b = j00 * (c01 * j11 + c02 * j12) + j02 * (c12 * j11 + c22 * j12)
    c = j11 * j11 * c11 + 2 * j11 * j12 * c12 + j12 * j12 * c22 + cfg.eps2d

    det = a * c - b * b
    det_safe = jnp.where(det > 1e-12, det, 1e-12)
    # conic = inverse 2D covariance (A, B, C) with quad form A dx² + 2B dxdy + C dy²
    conic = jnp.stack([c / det_safe, -b / det_safe, a / det_safe], axis=-1)

    # screen means
    mean2d = jnp.stack([fx * x / zsafe + cx, fy * y / zsafe + cy], axis=-1)

    # radius: sigma_cutoff × sqrt(max eigenvalue)
    mid = 0.5 * (a + c)
    disc = jnp.sqrt(jnp.maximum(mid * mid - det, 0.01))
    lambda1 = mid + disc
    sigma_max = jnp.sqrt(lambda1)
    radius = jnp.ceil(cfg.sigma_cutoff * sigma_max)

    # opacity-adaptive cull radius: α(p) ≤ op·exp(−½·|p−μ|²/λ1), so
    # α < alpha_threshold whenever |p−μ| > σmax·√(2·ln(op/thr)).  The
    # compositing kernels zero those contributions anyway (keep-mask), so
    # binning with this radius is exact — and much tighter for the low-opacity
    # Gaussians that dominate after init/opacity resets.  Capped at
    # sigma_cutoff to preserve the historical 3σ truncation bound.
    if opacities is not None:
        cutoff = jnp.sqrt(2.0 * jnp.log(
            jnp.maximum(opacities, 1e-12) / cfg.alpha_threshold))
        cutoff = jnp.clip(cutoff, 0.0, cfg.sigma_cutoff)
        cull_radius = jnp.ceil(cutoff * sigma_max)
    else:
        cull_radius = radius

    valid = (z > cfg.near) & (det > 1e-12)
    # frustum cull with radius margin
    valid &= (mean2d[..., 0] + cull_radius > 0)
    valid &= (mean2d[..., 0] - cull_radius < width)
    valid &= (mean2d[..., 1] + cull_radius > 0)
    valid &= (mean2d[..., 1] - cull_radius < height)
    if opacities is not None:
        valid &= cull_radius > 0
    if extra_valid is not None:
        valid &= extra_valid

    radius = jnp.where(valid, radius, 0.0)
    cull_radius = jnp.where(valid, cull_radius, 0.0)
    return ProjectedGaussians(
        means2d=mean2d, conics=conic, depths=z, radii=radius, valid=valid,
        cull_radii=cull_radius,
    )


def view_directions(means: jnp.ndarray, cam_origin: jnp.ndarray) -> jnp.ndarray:
    """Unit directions from camera origin to each Gaussian (for SH eval)."""
    d = means - cam_origin
    return d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-12)
