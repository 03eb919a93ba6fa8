"""Point-cloud seeding: vectorized backprojection round-trip tests."""
import numpy as np
import jax.numpy as jnp

from touchgs_tpu.touch.pointcloud import backproject_depth, seed_point_cloud
from tests.synthetic import look_at_camera


def test_backproject_center_pixel():
    """Center pixel at depth z must land on the optical axis, z in front."""
    cam = look_at_camera(eye=(0.0, 0.0, 2.0), width=32, height=32, focal=40.0)
    depth = np.zeros((32, 32), np.float32)
    depth[16, 16] = 1.5
    color = np.full((32, 32, 3), 0.5, np.float32)
    pts, cols, valid = backproject_depth(
        jnp.asarray(depth), jnp.asarray(color),
        (float(cam.fx), float(cam.fy), float(cam.cx), float(cam.cy)),
        cam.c2w,
    )
    pts = np.asarray(pts)[np.asarray(valid)]
    assert pts.shape == (1, 1, 3) or pts.shape == (1, 3)
    p = pts.reshape(3)
    # camera at (0,0,2) looking at origin: depth 1.5 → world point near (_,_,0.5)
    np.testing.assert_allclose(p, [0.0, 0.0, 0.5], atol=0.05)


def test_backproject_roundtrip_projection():
    """Backprojected points must reproject to their source pixels."""
    from touchgs_tpu.ops.projection import project_gaussians
    from touchgs_tpu.config import RasterizeConfig

    cam = look_at_camera(eye=(0.5, -0.4, 1.8), width=40, height=30, focal=35.0)
    rng = np.random.default_rng(0)
    depth = rng.uniform(1.0, 2.5, (30, 40)).astype(np.float32)
    color = rng.uniform(0, 1, (30, 40, 3)).astype(np.float32)
    pts, _, valid = backproject_depth(
        jnp.asarray(depth), jnp.asarray(color),
        (float(cam.fx), float(cam.fy), float(cam.cx), float(cam.cy)), cam.c2w,
    )
    pts = np.asarray(pts)
    n = pts.shape[0]
    proj = project_gaussians(
        jnp.asarray(pts), jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1)),
        jnp.full((n, 3), 1e-4), cam.w2c, cam.fx, cam.fy, cam.cx, cam.cy,
        cam.width, cam.height, RasterizeConfig(),
    )
    vs, us = np.mgrid[0:30, 0:40]
    expected = np.stack([us.ravel() + 0.5, vs.ravel() + 0.5], -1)
    got = np.asarray(proj.means2d)
    # pixel centers: backprojection uses integer pixel coords (reference
    # convention, create_point_cloud_from_touches.py:55-56) so allow 1px
    np.testing.assert_allclose(got, expected - 0.5, atol=1e-2)


def test_seed_point_cloud_percent_take():
    cam = look_at_camera(width=16, height=16, focal=20.0)
    depths = np.ones((3, 16, 16), np.float32)
    colors = np.full((3, 16, 16, 3), 0.25, np.float32)
    c2ws = np.stack([np.asarray(cam.c2w)] * 3)
    intr = (float(cam.fx), float(cam.fy), float(cam.cx), float(cam.cy))
    pts, cols = seed_point_cloud(
        depths, colors, intr, c2ws, np.array([0, 1]), percent_take=10.0
    )
    assert len(pts) == int(2 * 16 * 16 * 0.10)
    assert np.allclose(cols, 0.25 * 255.0)
