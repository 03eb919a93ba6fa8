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


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) wxyz quaternion → (..., 3, 3) rotation (normalizes input)."""
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


class ProjectedGaussians(NamedTuple):
    """Screen-space splats. All arrays keep the full Gaussian axis (masked)."""

    means2d: jnp.ndarray   # (N, 2) pixel coords
    conics: jnp.ndarray    # (N, 3) upper-tri of inverse 2D covariance (a, b, c)
    depths: jnp.ndarray    # (N,) camera-space z
    radii: jnp.ndarray     # (N,) pixel radius (0 for culled)
    valid: jnp.ndarray     # (N,) bool — in front of near plane & non-degenerate


def project_gaussians(
    means: jnp.ndarray,       # (N, 3) world
    quats: jnp.ndarray,       # (N, 4) wxyz
    scales: jnp.ndarray,      # (N, 3) world-space scales (already activated)
    w2c: jnp.ndarray,         # (4, 4) world→camera, OpenCV (+Z forward)
    fx, fy, cx, cy,
    width: int, height: int,
    cfg: RasterizeConfig = RasterizeConfig(),
    extra_valid: jnp.ndarray | None = None,  # (N,) e.g. alive-mask
) -> ProjectedGaussians:
    """EWA splatting: perspective-project 3D Gaussians to 2D screen Gaussians.

    Math follows Zwicker et al. EWA splatting as used by 3DGS: camera-space
    cov Σ' = W Σ Wᵀ, screen cov = J Σ' Jᵀ with the local affine Jacobian J of
    the pinhole projection, dilated by ``cfg.eps2d`` for antialiasing.
    """
    R_w2c = w2c[:3, :3]
    t_w2c = w2c[:3, 3]

    # camera-space means
    p_cam = means @ R_w2c.T + t_w2c            # (N, 3)
    x, y, z = p_cam[..., 0], p_cam[..., 1], p_cam[..., 2]
    zsafe = jnp.where(z > cfg.near, z, cfg.near)

    # 3D covariance: R S Sᵀ Rᵀ
    Rg = quat_to_rotmat(quats)                  # (N, 3, 3)
    M = Rg * scales[..., None, :]               # R @ diag(s)
    cov3d = M @ jnp.swapaxes(M, -1, -2)         # (N, 3, 3)

    # clamped view-space coords for the Jacobian (3DGS trick: limit to 1.3x fov)
    lim_x = 1.3 * (0.5 * width / fx)
    lim_y = 1.3 * (0.5 * height / fy)
    tx = jnp.clip(x / zsafe, -lim_x, lim_x) * zsafe
    ty = jnp.clip(y / zsafe, -lim_y, lim_y) * zsafe

    # J: 2x3 Jacobian of (fx X/Z + cx, fy Y/Z + cy)
    inv_z = 1.0 / zsafe
    inv_z2 = inv_z * inv_z
    zeros = jnp.zeros_like(inv_z)
    J = jnp.stack(
        [
            jnp.stack([fx * inv_z, zeros, -fx * tx * inv_z2], axis=-1),
            jnp.stack([zeros, fy * inv_z, -fy * ty * inv_z2], axis=-1),
        ],
        axis=-2,
    )                                           # (N, 2, 3)

    W = jnp.broadcast_to(R_w2c, cov3d.shape)    # (N, 3, 3)
    cov_cam = W @ cov3d @ jnp.swapaxes(W, -1, -2)
    cov2d = J @ cov_cam @ jnp.swapaxes(J, -1, -2)  # (N, 2, 2)

    a = cov2d[..., 0, 0] + cfg.eps2d
    b = cov2d[..., 0, 1]
    c = cov2d[..., 1, 1] + cfg.eps2d

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
    radius = jnp.ceil(cfg.sigma_cutoff * jnp.sqrt(lambda1))

    valid = (z > cfg.near) & (det > 1e-12)
    # frustum cull with radius margin
    valid &= (mean2d[..., 0] + radius > 0) & (mean2d[..., 0] - radius < width)
    valid &= (mean2d[..., 1] + radius > 0) & (mean2d[..., 1] - radius < height)
    if extra_valid is not None:
        valid &= extra_valid

    radius = jnp.where(valid, radius, 0.0)
    return ProjectedGaussians(
        means2d=mean2d, conics=conic, depths=z, radii=radius, valid=valid
    )


def view_directions(means: jnp.ndarray, cam_origin: jnp.ndarray) -> jnp.ndarray:
    """Unit directions from camera origin to each Gaussian (for SH eval)."""
    d = means - cam_origin
    return d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-12)
