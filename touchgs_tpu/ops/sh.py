"""Real spherical harmonics color evaluation (degrees 0..3).

The view-dependent color model of 3DGS/splatfacto (SURVEY.md §2.9: per-Gaussian
SH coefficients).  Built from the standard real-SH constants; evaluated fully
vectorized on the VPU.  ``active_degree`` masks higher bands with a multiplier
so the function stays jit-static while the trainer grows the degree over time
(splatfacto's ``sh_degree_interval`` behavior).
"""
from __future__ import annotations

import jax.numpy as jnp

# band constants
_C0 = 0.28209479177387814
_C1 = 0.4886025119029199
_C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
       -1.0925484305920792, 0.5462742152960396)
_C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
       0.3731763325901154, -0.4570457994644658, 1.445305721320277,
       -0.5900435899266435)


def num_sh_bases(degree: int) -> int:
    return (degree + 1) ** 2


def eval_sh(
    sh: jnp.ndarray,           # (..., K, 3) coefficients, K = (deg+1)^2
    dirs: jnp.ndarray,         # (..., 3) unit view directions
    degree: int,
    active_degree: jnp.ndarray | int | None = None,
) -> jnp.ndarray:
    """Evaluate SH colors; returns (..., 3) (pre-sigmoid/offset).

    3DGS convention: final color = clip(eval_sh + 0.5, 0).  The +0.5 offset is
    applied by the caller so DC-only init math stays transparent.
    """
    K = num_sh_bases(degree)
    assert sh.shape[-2] == K, f"sh has {sh.shape[-2]} bases, want {K}"
    if active_degree is None:
        active_degree = degree

    result = _C0 * sh[..., 0, :]
    if degree >= 1:
        x, y, z = dirs[..., 0:1], dirs[..., 1:2], dirs[..., 2:3]
        band1 = (-_C1 * y * sh[..., 1, :]
                 + _C1 * z * sh[..., 2, :]
                 - _C1 * x * sh[..., 3, :])
        result = result + band1 * (active_degree >= 1)
    if degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        band2 = (_C2[0] * xy * sh[..., 4, :]
                 + _C2[1] * yz * sh[..., 5, :]
                 + _C2[2] * (2.0 * zz - xx - yy) * sh[..., 6, :]
                 + _C2[3] * xz * sh[..., 7, :]
                 + _C2[4] * (xx - yy) * sh[..., 8, :])
        result = result + band2 * (active_degree >= 2)
    if degree >= 3:
        band3 = (_C3[0] * y * (3.0 * xx - yy) * sh[..., 9, :]
                 + _C3[1] * xy * z * sh[..., 10, :]
                 + _C3[2] * y * (4.0 * zz - xx - yy) * sh[..., 11, :]
                 + _C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy) * sh[..., 12, :]
                 + _C3[4] * x * (4.0 * zz - xx - yy) * sh[..., 13, :]
                 + _C3[5] * z * (xx - yy) * sh[..., 14, :]
                 + _C3[6] * x * (xx - 3.0 * yy) * sh[..., 15, :])
        result = result + band3 * (active_degree >= 3)
    return result


def rgb_to_sh_dc(rgb: jnp.ndarray) -> jnp.ndarray:
    """Invert the DC band: color c → coefficient so eval_sh + 0.5 == c."""
    return (rgb - 0.5) / _C0


def sh_dc_to_rgb(dc: jnp.ndarray) -> jnp.ndarray:
    return dc * _C0 + 0.5
