"""Pinhole camera containers.

Design: cameras are plain pytrees of stacked arrays (struct-of-arrays), so a
batch of cameras can be vmapped / sharded directly. World convention follows
transforms.json (OpenGL c2w: +X right, +Y up, camera looks down -Z); the
rasterizer converts to a view matrix with +Z forward internally.

Reference contract: nerfstudio ``Cameras`` built at
``legacy/dataparser_tactile.py:277-287`` (fx/fy/cx/cy/h/w + c2w[:3,:4]).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    """A single pinhole camera (all fields scalar / small arrays)."""

    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    c2w: jax.Array  # (4, 4) OpenGL camera-to-world
    width: int = dataclasses.field(metadata=dict(static=True))
    height: int = dataclasses.field(metadata=dict(static=True))

    @property
    def w2c(self) -> jax.Array:
        """World-to-camera in *OpenCV* convention (+Z forward).

        transforms.json stores OpenGL c2w; flipping the Y and Z columns of the
        rotation converts to OpenCV before inversion — the same diag(1,-1,-1)
        convention used by the reference back-projection
        (``utils/create_point_cloud_from_touches.py:64``).
        """
        R = self.c2w[:3, :3] * jnp.array([1.0, -1.0, -1.0])  # flip Y,Z cols
        t = self.c2w[:3, 3]
        Rt = R.T
        w2c = jnp.eye(4, dtype=self.c2w.dtype)
        w2c = w2c.at[:3, :3].set(Rt)
        w2c = w2c.at[:3, 3].set(-Rt @ t)
        return w2c

    @property
    def K(self) -> jax.Array:
        return jnp.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]],
            dtype=jnp.float32,
        )


@dataclasses.dataclass
class Cameras:
    """A batch of cameras sharing one resolution (struct-of-arrays, numpy).

    Host-side container produced by the dataparser; `at(i)` materializes the
    jit-friendly single `Camera`.
    """

    fx: np.ndarray  # (N,)
    fy: np.ndarray
    cx: np.ndarray
    cy: np.ndarray
    c2w: np.ndarray  # (N, 4, 4)
    width: int
    height: int

    def __len__(self) -> int:
        return self.fx.shape[0]

    def at(self, i: int) -> Camera:
        return Camera(
            fx=jnp.float32(self.fx[i]),
            fy=jnp.float32(self.fy[i]),
            cx=jnp.float32(self.cx[i]),
            cy=jnp.float32(self.cy[i]),
            c2w=jnp.asarray(self.c2w[i], dtype=jnp.float32),
            width=self.width,
            height=self.height,
        )

    def select(self, idx: np.ndarray) -> "Cameras":
        return Cameras(
            fx=self.fx[idx], fy=self.fy[idx], cx=self.cx[idx], cy=self.cy[idx],
            c2w=self.c2w[idx], width=self.width, height=self.height,
        )

    def stacked(self) -> Camera:
        """All cameras stacked into one pytree with a leading batch axis.

        Suitable for `vmap`/`shard_map` over views: fields have shape (N,) /
        (N,4,4) and `width`/`height` stay static.
        """
        return Camera(
            fx=jnp.asarray(self.fx, jnp.float32),
            fy=jnp.asarray(self.fy, jnp.float32),
            cx=jnp.asarray(self.cx, jnp.float32),
            cy=jnp.asarray(self.cy, jnp.float32),
            c2w=jnp.asarray(self.c2w, jnp.float32),
            width=self.width,
            height=self.height,
        )

    def rescale(self, factor: float) -> "Cameras":
        """Rescale output resolution (nerfstudio `rescale_output_resolution`,
        dataparser_tactile.py:290)."""
        return Cameras(
            fx=self.fx * factor, fy=self.fy * factor,
            cx=self.cx * factor, cy=self.cy * factor,
            c2w=self.c2w,
            width=int(round(self.width * factor)),
            height=int(round(self.height * factor)),
        )
