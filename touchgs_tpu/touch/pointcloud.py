"""Touch point-cloud seeding (vectorized backprojection).

Replaces the per-pixel Python loop of
``utils/create_point_cloud_from_touches.py:48-58`` with one jnp expression:
pinhole backprojection through (fx, fy, cx, cy), OpenGL convention flip
``R @ diag(1, -1, -1)`` (:64), world transform, then random ``percent_take``%
subsampling (:154-167).  Output matches the ``points_touch.npy`` /
``points_colors.npy`` contract (:243-244): world xyz float, colors 0-255.
"""
from __future__ import annotations

from pathlib import Path
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def backproject_depth(
    depth: jnp.ndarray,          # (H, W) meters, 0 = invalid
    color: jnp.ndarray,          # (H, W, 3)
    intrinsics: Sequence[float],  # (fx, fy, cx, cy)
    c2w: jnp.ndarray,            # (4, 4) OpenGL camera-to-world
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """All pixels backprojected to world; returns (points, colors, valid).

    Fixed output size H·W with a validity mask (jit-friendly) — callers
    compress on host.
    """
    h, w = depth.shape
    fx, fy, cx, cy = intrinsics
    vs, us = jnp.mgrid[0:h, 0:w]
    z = depth
    x = (us - cx) * z / fx
    y = (vs - cy) * z / fy
    pts_cam = jnp.stack([x, y, z], axis=-1).reshape(-1, 3)
    valid = (depth > 0).reshape(-1)

    R = c2w[:3, :3] @ jnp.diag(jnp.array([1.0, -1.0, -1.0]))  # :64
    t = c2w[:3, 3]
    pts_world = pts_cam @ R.T + t
    cols = color.reshape(-1, 3)
    return pts_world, cols, valid


def seed_point_cloud(
    depths: np.ndarray,           # (V, H, W) touch depths, meters
    colors: np.ndarray,           # (V, H, W, 3) rgb in [0, 1]
    intrinsics: Sequence[float],
    c2ws: np.ndarray,             # (V, 4, 4)
    view_indices: np.ndarray,     # i_train (seeding split)
    percent_take: float = 100.0,
    seed: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """Seed Gaussians from touch depth across the training views.

    Returns (points (P,3) float32, colors_255 (P,3) float32) matching the
    reference file contract.
    """
    fn = jax.jit(backproject_depth, static_argnames=())
    all_pts, all_cols = [], []
    for v in view_indices:
        pts, cols, valid = fn(
            jnp.asarray(depths[v]), jnp.asarray(colors[v]),
            tuple(float(i) for i in intrinsics), jnp.asarray(c2ws[v]),
        )
        valid = np.asarray(valid)
        all_pts.append(np.asarray(pts)[valid])
        all_cols.append(np.asarray(cols)[valid])
    pts = np.concatenate(all_pts) if all_pts else np.zeros((0, 3), np.float32)
    cols = np.concatenate(all_cols) if all_cols else np.zeros((0, 3), np.float32)

    rng = np.random.default_rng(seed)
    n_take = int(len(pts) * percent_take / 100.0)
    sel = rng.choice(len(pts), n_take, replace=False) if len(pts) else []
    return pts[sel].astype(np.float32), (cols[sel] * 255.0).astype(np.float32)


def save_point_cloud(root_dir: str | Path, points: np.ndarray, colors_255: np.ndarray):
    """Write the scene-root seed files (:243-244)."""
    root = Path(root_dir)
    np.save(root / "points_touch.npy", points)
    np.save(root / "points_colors.npy", colors_255)
