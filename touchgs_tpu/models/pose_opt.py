"""SO3xR3 camera pose optimizer.

The reference trainer registers ``camera_optimizer mode="SO3xR3"``
(`/root/reference/legacy/config_tactile.py:36-37`): per-camera 6-DoF tangent
vectors — 3 translation + 3 so(3) — optimized jointly with the model and
applied to each camera-to-world on the fly.  TPU-native form: one
``(n_cameras, 6)`` parameter array living in the train state, the active
view's row sliced inside the jitted step so its gradient flows through the
rasterizer; the Adam update is dense over all rows exactly like a torch Adam
step with zero gradients elsewhere (nerfstudio semantics).
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from touchgs_tpu.data.cameras import Camera


def exp_so3(omega: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: (3,) so(3) tangent → (3, 3) rotation.

    Uses the series-safe form around θ→0 (sin θ/θ and (1−cos θ)/θ²)."""
    theta2 = jnp.sum(omega * omega)
    wx, wy, wz = omega[0], omega[1], omega[2]
    K = jnp.array([
        [0.0, -wz, wy],
        [wz, 0.0, -wx],
        [-wy, wx, 0.0],
    ], omega.dtype)
    # sinθ/θ and (1−cosθ)/θ² with small-angle Taylor guards.  The non-taken
    # branch is evaluated at θ² = 1 (double-where trick): otherwise its
    # 1/θ²-shaped GRADIENT at θ = 0 poisons autodiff through the jnp.where —
    # exactly the state every pose delta starts in.
    small = theta2 < 1e-12
    t2s = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(t2s)
    a = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / t2s)
    return jnp.eye(3, dtype=omega.dtype) + a * K + b * (K @ K)


def apply_pose_delta(camera: Camera, tau: jnp.ndarray) -> Camera:
    """Apply a 6-DoF tangent ``tau = [t(3), ω(3)]`` to the camera-to-world:
    R' = exp(ω)·R (left/world-frame perturbation), t' = t + t_delta."""
    R = exp_so3(tau[3:6]) @ camera.c2w[:3, :3]
    t = camera.c2w[:3, 3] + tau[0:3]
    c2w = jnp.eye(4, dtype=camera.c2w.dtype)
    c2w = c2w.at[:3, :3].set(R)
    c2w = c2w.at[:3, 3].set(t)
    return dataclasses.replace(camera, c2w=c2w)
