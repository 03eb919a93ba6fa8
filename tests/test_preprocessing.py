"""Tests for RealSense reprojection, COLMAP parsing, and PC→depth rendering."""
import numpy as np
import jax.numpy as jnp
import pytest

from touchgs_tpu.data.colmap import (
    compute_scale_factor,
    read_colmap_cameras,
    read_colmap_images,
)
from touchgs_tpu.data.pc_depth import render_pc_depth_for_camera, visibility_by_normals
from touchgs_tpu.data.realsense import convert_intrinsics, process_realsense_dir
from tests.synthetic import look_at_camera


def test_convert_intrinsics_identity():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 3, (720, 1280)).astype(np.float32)
    K = (100.0, 100.0, 640.0, 360.0)
    out = np.asarray(convert_intrinsics(jnp.asarray(img), K, K, (1280, 720)))
    np.testing.assert_allclose(out, img, atol=1e-5)


def test_convert_intrinsics_vs_reference_remap():
    import cv2

    rng = np.random.default_rng(1)
    img = rng.uniform(0, 3, (276, 490)).astype(np.float32)
    old_i = (360.0, 360.0, 243.0, 137.8)
    new_i = (1297.0, 1304.0, 620.91, 238.28)
    size = (1280, 720)
    K_old = np.array([[old_i[0], 0, old_i[2]], [0, old_i[1], old_i[3]], [0, 0, 1]])
    K_new_inv = np.linalg.inv(
        np.array([[new_i[0], 0, new_i[2]], [0, new_i[1], new_i[3]], [0, 0, 1]])
    )
    x, y = np.meshgrid(np.arange(size[0]), np.arange(size[1]))
    hom = np.stack([x.ravel(), y.ravel(), np.ones_like(x).ravel()], -1).T
    old = K_old @ K_new_inv @ hom
    old /= old[2]
    map_x = old[0].reshape(size[1], size[0]).astype(np.float32)
    map_y = old[1].reshape(size[1], size[0]).astype(np.float32)
    ref = cv2.remap(img, map_x, map_y, interpolation=cv2.INTER_LINEAR)
    ours = np.asarray(convert_intrinsics(jnp.asarray(img), old_i, new_i, size))
    # cv2.remap uses 5-bit fixed-point interpolation weights; allow that noise
    np.testing.assert_allclose(ours, ref, atol=5e-3)


def test_process_realsense_dir(tmp_path):
    (tmp_path / "realsense_depth").mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        np.save(tmp_path / "realsense_depth" / f"{i}.npy",
                rng.uniform(500, 3000, (276, 490)).astype(np.float32))
    n = process_realsense_dir(tmp_path)
    assert n == 2
    from touchgs_tpu.data.depth_io import read_depth_mm
    d = read_depth_mm(tmp_path / "realsense_depths" / "0.png")
    assert d.shape == (720, 1280)


def test_colmap_parsing(tmp_path):
    (tmp_path / "cameras.txt").write_text(
        "# comment\n1 SIMPLE_RADIAL 1800 1100 2500 900 550 0.01\n"
    )
    cams = read_colmap_cameras(tmp_path / "cameras.txt")
    fx, fy, cx, cy = cams[1].intrinsics
    assert fx == fy == 2500 and cx == 900

    # identity rotation, t = (1, 2, 3) → center = -t
    (tmp_path / "images.txt").write_text(
        "# hdr\n1 1 0 0 0 1 2 3 1 img0.png\n0 0 0\n"
    )
    pos = read_colmap_images(tmp_path / "images.txt")
    np.testing.assert_allclose(pos["img0"], [-1, -2, -3], atol=1e-9)
    T = read_colmap_images(tmp_path / "images.txt", return_full_transforms=True)
    np.testing.assert_allclose(T["img0"][:3, :3], np.eye(3), atol=1e-9)


def test_scale_factor():
    a = {"x": np.array([0, 0, 0.0]), "y": np.array([2, 0, 0.0]),
         "z": np.array([0, 2, 0.0])}
    b = {k: v / 2 for k, v in a.items()}
    assert abs(compute_scale_factor(a, b) - 2.0) < 1e-9


def test_render_pc_depth_zbuffer():
    cam = look_at_camera(eye=(0, 0, 2.0), width=32, height=32, focal=40.0)
    # two points on the optical axis: nearer one must win the z-buffer
    pts = np.array([[0, 0, 0.0], [0, 0, 1.0]], np.float32)  # z=2 and z=1 away
    depth = render_pc_depth_for_camera(pts, cam)
    assert abs(depth[16, 16] - 1.0) < 1e-5
    assert depth[0, 0] == 0.0  # empty pixel


def test_visibility_by_normals():
    pts = np.array([[0, 0, 0.0]], np.float32)
    cam_origin = np.array([0, 0, 2.0])
    toward = np.array([[0, 0, 1.0]], np.float32)
    away = -toward
    assert visibility_by_normals(pts, toward, cam_origin)[0]
    assert not visibility_by_normals(pts, away, cam_origin)[0]
