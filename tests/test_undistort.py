"""Lens-distortion loading (legacy/dataparser_tactile.py:92-146; touch
cameras are OPENCV_FISHEYE per armPose2Nerf.py:143-146)."""
import json

import numpy as np
import pytest
from PIL import Image

from touchgs_tpu.data.scene import load_scene
from touchgs_tpu.data.undistort import distort_normalized, undistort_image


def test_distort_normalized_known_values():
    # OPENCV radial-only: x_d = x(1 + k1 r²)
    x = np.array([0.2]); y = np.array([0.1])
    xd, yd = distort_normalized(x, y, np.array([0.1, 0, 0, 0, 0, 0]), False)
    r2 = 0.05
    np.testing.assert_allclose(xd, 0.2 * (1 + 0.1 * r2), rtol=1e-12)
    np.testing.assert_allclose(yd, 0.1 * (1 + 0.1 * r2), rtol=1e-12)
    # fisheye: x_d = x·θ_d/r with θ_d = θ(1 + k1 θ²)
    xd, yd = distort_normalized(x, y, np.array([0.05, 0, 0, 0, 0, 0]), True)
    r = np.sqrt(r2)
    th = np.arctan(r)
    thd = th * (1 + 0.05 * th * th)
    np.testing.assert_allclose(xd, 0.2 * thd / r, rtol=1e-10)
    np.testing.assert_allclose(yd, 0.1 * thd / r, rtol=1e-10)
    # tangential terms
    xd, yd = distort_normalized(x, y, np.array([0, 0, 0, 0, 0.01, 0.02]),
                                False)
    np.testing.assert_allclose(
        xd, 0.2 + 2 * 0.01 * 0.02 + 0.02 * (r2 + 2 * 0.04), rtol=1e-10)


def test_undistort_identity_and_center():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (40, 52, 3)).astype(np.float32)
    zero = np.zeros(6)
    out = undistort_image(img, 60.0, 60.0, 26.0, 20.0, zero, False)
    np.testing.assert_allclose(out, img, atol=1e-6)
    # with radial distortion the principal point is a fixed point but the
    # borders move
    out = undistort_image(img, 60.0, 60.0, 26.0, 20.0,
                          np.array([0.2, 0, 0, 0, 0, 0]), False)
    np.testing.assert_allclose(out[20, 26], img[20, 26], atol=1e-2)
    assert np.abs(out[2, 2] - img[2, 2]).max() > 1e-4


def test_fisheye_scene_roundtrip(tmp_path):
    """A fisheye-flagged synthetic scene loads rectified (VERDICT r2 #6)."""
    h, w, n = 40, 48, 3
    rng = np.random.default_rng(1)
    (tmp_path / "imgs").mkdir()
    frames = []
    for i in range(n):
        img = rng.uniform(0, 255, (h, w, 3)).astype(np.uint8)
        Image.fromarray(img).save(tmp_path / "imgs" / f"f_{i}.png")
        frames.append({
            "file_path": f"imgs/f_{i}.png",
            "transform_matrix": np.eye(4).tolist(),
        })
    meta = {"fl_x": 40.0, "fl_y": 40.0, "cx": w / 2, "cy": h / 2,
            "w": w, "h": h, "camera_model": "OPENCV_FISHEYE",
            "k1": -0.1, "k2": 0.01, "frames": frames}
    (tmp_path / "transforms.json").write_text(json.dumps(meta))

    scene = load_scene(tmp_path, load_depth=False, load_uncertainty=False,
                       load_seed_points=False, auto_scale=False)
    assert scene.images.shape == (n, h, w, 3)
    # rectification actually ran: border pixels moved
    raw = np.asarray(Image.open(tmp_path / "imgs" / "f_0.png"),
                     np.float32) / 255.0
    assert np.abs(scene.images[0] - raw).max() > 1e-3
    assert np.isfinite(scene.images).all()
