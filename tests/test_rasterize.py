"""Rasterizer tests: oracle self-consistency and tiled-vs-dense parity.

Mirrors the reference's implied kernel contract: rendered RGB/depth/acc from
the tile path must match the dense sorted-compositing oracle (SURVEY.md §4
item 1).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from touchgs_tpu.config import RasterizeConfig
from touchgs_tpu.ops.projection import project_gaussians
from touchgs_tpu.ops.rasterize_ref import rasterize_dense
from touchgs_tpu.ops.rasterize_tiled import rasterize_tiled

from tests.synthetic import look_at_camera, random_gaussians


@pytest.fixture(scope="module")
def scene():
    means, quats, scales, colors, opacities = random_gaussians(500, seed=3)
    cam = look_at_camera(width=160, height=120)
    cfg = RasterizeConfig(gaussian_chunk=128)
    proj = project_gaussians(
        means, quats, scales, cam.w2c, cam.fx, cam.fy, cam.cx, cam.cy,
        cam.width, cam.height, cfg,
    )
    return cam, cfg, proj, colors, opacities


def test_projection_sane(scene):
    cam, cfg, proj, _, _ = scene
    assert bool(jnp.any(proj.valid)), "some gaussians should project"
    v = proj.valid
    assert bool(jnp.all(proj.depths[v] > 0))
    assert bool(jnp.all(proj.radii[v] > 0))
    # conic must be positive definite where valid: A > 0, C > 0, AC - B^2 > 0
    a, b, c = proj.conics[:, 0], proj.conics[:, 1], proj.conics[:, 2]
    det = a * c - b * b
    assert bool(jnp.all(a[v] > 0))
    assert bool(jnp.all(det[v] > 0))


def test_dense_render_basic(scene):
    cam, cfg, proj, colors, opacities = scene
    out = rasterize_dense(proj, colors, opacities, cam.width, cam.height, cfg)
    assert out.rgb.shape == (cam.height, cam.width, 3)
    assert float(out.acc.max()) <= 1.0 + 1e-5
    assert float(out.acc.min()) >= 0.0
    assert float(out.acc.max()) > 0.1, "scene should hit the image"
    assert not bool(jnp.any(jnp.isnan(out.rgb)))
    d = out.depth[out.acc > 0.5]
    assert float(d.min()) > 0


def test_tiled_matches_dense(scene):
    cam, cfg, proj, colors, opacities = scene
    dense = rasterize_dense(proj, colors, opacities, cam.width, cam.height, cfg)
    tiled = rasterize_tiled(
        proj, colors, opacities, cam.width, cam.height, cfg,
        k_tile=512, k_chunk=64, tile_block=8,
    )
    np.testing.assert_allclose(tiled.rgb, dense.rgb, atol=2e-5)
    np.testing.assert_allclose(tiled.acc, dense.acc, atol=2e-5)
    np.testing.assert_allclose(tiled.depth, dense.depth, atol=2e-4)


def test_tiled_matches_dense_grads(scene):
    """Pixel-gradient parity between tiled and dense paths (SURVEY.md §4)."""
    cam, cfg, proj, colors, opacities = scene

    target = jnp.zeros((cam.height, cam.width, 3))

    def loss_dense(colors, opacities):
        out = rasterize_dense(proj, colors, opacities, cam.width, cam.height, cfg)
        return jnp.mean((out.rgb - target) ** 2) + jnp.mean(out.depth)

    def loss_tiled(colors, opacities):
        out = rasterize_tiled(
            proj, colors, opacities, cam.width, cam.height, cfg,
            k_tile=512, k_chunk=64, tile_block=8,
        )
        return jnp.mean((out.rgb - target) ** 2) + jnp.mean(out.depth)

    gd = jax.grad(loss_dense, argnums=(0, 1))(colors, opacities)
    gt = jax.grad(loss_tiled, argnums=(0, 1))(colors, opacities)
    np.testing.assert_allclose(gt[0], gd[0], atol=1e-6)
    np.testing.assert_allclose(gt[1], gd[1], atol=1e-6)


def test_background_composited(scene):
    cam, cfg, proj, colors, opacities = scene
    bg = jnp.array([1.0, 0.0, 0.0])
    out = rasterize_dense(
        proj, colors, opacities, cam.width, cam.height, cfg, background=bg
    )
    # empty pixels must be pure background
    empty = out.acc < 1e-6
    assert bool(jnp.any(empty))
    np.testing.assert_allclose(
        np.asarray(out.rgb)[np.asarray(empty)],
        np.tile(np.array([1.0, 0.0, 0.0]), (int(empty.sum()), 1)),
        atol=1e-5,
    )


def test_depth_ordering():
    """A red gaussian in front of a green one: pixel must be mostly red."""
    means = jnp.array([[0.0, 0.0, 0.0], [0.0, 0.0, -0.5]])  # 2nd is farther
    quats = jnp.tile(jnp.array([1.0, 0.0, 0.0, 0.0]), (2, 1))
    scales = jnp.full((2, 3), 0.05)
    colors = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    opacities = jnp.array([0.9, 0.9])
    cam = look_at_camera(width=64, height=64, focal=80.0)
    cfg = RasterizeConfig(gaussian_chunk=2)
    proj = project_gaussians(
        means, quats, scales, cam.w2c, cam.fx, cam.fy, cam.cx, cam.cy,
        cam.width, cam.height, cfg,
    )
    out = rasterize_dense(proj, colors, opacities, cam.width, cam.height, cfg)
    center = out.rgb[32, 32]
    assert float(center[0]) > float(center[1]) * 2
