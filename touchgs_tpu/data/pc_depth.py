"""Point-cloud → depth-image rendering (z-buffered, vectorized jnp).

Rebuild of ``data_preprocessing/vision/point_cloud/read_point_cloud.py``:
point projection + z-buffer depth images (:224-302) and normal-based
visibility filtering (:103-135,362-384), replacing its per-point Python loops
with scatter-min z-buffering (one `at[].min` — XLA lowers this to a
deterministic segment reduction; no atomics).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from touchgs_tpu.data.cameras import Camera


def visibility_by_normals(
    points: np.ndarray,      # (P, 3)
    normals: np.ndarray,     # (P, 3)
    cam_origin: np.ndarray,  # (3,)
    max_angle_deg: float = 90.0,
) -> np.ndarray:
    """Front-facing filter: keep points whose normal faces the camera within
    `max_angle_deg` (read_point_cloud.py:103-135 semantics)."""
    view = cam_origin[None, :] - points
    view = view / np.maximum(np.linalg.norm(view, axis=1, keepdims=True), 1e-12)
    n = normals / np.maximum(np.linalg.norm(normals, axis=1, keepdims=True), 1e-12)
    cosang = np.einsum("ij,ij->i", view, n)
    return cosang > np.cos(np.deg2rad(max_angle_deg))


@functools.partial(jax.jit, static_argnames=("width", "height", "splat"))
def render_pc_depth(
    points: jnp.ndarray,  # (P, 3) world
    w2c: jnp.ndarray,     # (4, 4) OpenCV (+Z forward)
    fx, fy, cx, cy,
    width: int,
    height: int,
    splat: int = 1,       # point footprint in pixels (square)
) -> jnp.ndarray:
    """Z-buffered depth image: nearest point per pixel, 0 where empty."""
    p_cam = points @ w2c[:3, :3].T + w2c[:3, 3]
    z = p_cam[:, 2]
    valid = z > 1e-6
    zs = jnp.where(valid, z, 1.0)
    u = fx * p_cam[:, 0] / zs + cx
    v = fy * p_cam[:, 1] / zs + cy
    ui = jnp.floor(u).astype(jnp.int32)
    vi = jnp.floor(v).astype(jnp.int32)

    big = jnp.float32(1e10)
    zbuf = jnp.full((height, width), big)
    zval = jnp.where(valid, z, big)
    for dy in range(splat):
        for dx in range(splat):
            uu = ui + dx - splat // 2
            vv = vi + dy - splat // 2
            inside = valid & (uu >= 0) & (uu < width) & (vv >= 0) & (vv < height)
            uu = jnp.where(inside, uu, 0)
            vv = jnp.where(inside, vv, 0)
            zz = jnp.where(inside, zval, big)
            zbuf = zbuf.at[vv, uu].min(zz)
    return jnp.where(zbuf < big, zbuf, 0.0)


def render_pc_depth_for_camera(
    points: np.ndarray,
    camera: Camera,
    normals: np.ndarray | None = None,
    splat: int = 1,
) -> np.ndarray:
    """Host wrapper with optional normal-based visibility filtering."""
    pts = np.asarray(points, np.float32)
    if normals is not None:
        keep = visibility_by_normals(
            pts, np.asarray(normals, np.float32),
            np.asarray(camera.c2w[:3, 3]),
        )
        pts = pts[keep]
        if len(pts) == 0:
            return np.zeros((camera.height, camera.width), np.float32)
    depth = render_pc_depth(
        jnp.asarray(pts), camera.w2c, camera.fx, camera.fy, camera.cx,
        camera.cy, camera.width, camera.height, splat,
    )
    return np.asarray(depth)
