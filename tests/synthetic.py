"""Synthetic Gaussian scenes for tests (BASELINE.json configs[0])."""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from touchgs_tpu.data.cameras import Camera


def random_gaussians(n: int, seed: int = 0, spread: float = 0.8):
    """Random 3D Gaussians inside the +/-spread box, looking sane."""
    rng = np.random.default_rng(seed)
    means = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    quats /= np.linalg.norm(quats, axis=-1, keepdims=True)
    scales = np.exp(rng.uniform(-4.5, -3.0, (n, 3))).astype(np.float32)
    colors = rng.uniform(0.0, 1.0, (n, 3)).astype(np.float32)
    opacities = rng.uniform(0.3, 0.95, n).astype(np.float32)
    return (
        jnp.asarray(means), jnp.asarray(quats), jnp.asarray(scales),
        jnp.asarray(colors), jnp.asarray(opacities),
    )


def look_at_camera(
    eye=(0.0, 0.0, 2.5), target=(0.0, 0.0, 0.0),
    width: int = 160, height: int = 120, focal: float = 150.0,
) -> Camera:
    """OpenGL-convention c2w camera looking at `target` from `eye`."""
    eye = np.asarray(eye, np.float64)
    target = np.asarray(target, np.float64)
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    up_hint = np.array([0.0, 1.0, 0.0])
    if abs(np.dot(fwd, up_hint)) > 0.99:
        up_hint = np.array([0.0, 0.0, 1.0])
    right = np.cross(fwd, up_hint)
    right /= np.linalg.norm(right)
    up = np.cross(right, fwd)
    c2w = np.eye(4)
    c2w[:3, 0] = right
    c2w[:3, 1] = up
    c2w[:3, 2] = -fwd  # OpenGL: camera looks down -Z
    c2w[:3, 3] = eye
    return Camera(
        fx=jnp.float32(focal), fy=jnp.float32(focal),
        cx=jnp.float32(width / 2), cy=jnp.float32(height / 2),
        c2w=jnp.asarray(c2w, jnp.float32), width=width, height=height,
    )
