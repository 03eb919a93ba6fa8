"""Camera-path rendering + capture tools tests."""
import json

import numpy as np

from touchgs_tpu.config import ModelConfig, RasterizeConfig, TrainConfig
from touchgs_tpu.data.capture_tools import (
    filter_blurry_dir,
    laplacian_blur_score,
    resize_scene_images,
)
from touchgs_tpu.eval.render_path import (
    interpolate_poses,
    load_camera_path_json,
    orbit_path,
    render_camera_path,
)
from touchgs_tpu.models.gaussians import init_from_points
from tests.synthetic import random_gaussians


def test_orbit_path_valid_poses():
    poses = orbit_path(radius=2.0, n_frames=8)
    assert len(poses) == 8
    for T in poses:
        R = T[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-9)
        assert abs(np.linalg.norm(T[:2, 3]) - 2.0) < 1e-9


def test_interpolate_poses_endpoints():
    a, b = orbit_path(n_frames=2)
    interp = interpolate_poses([a, b], 5)
    np.testing.assert_allclose(interp[0], a, atol=1e-9)
    np.testing.assert_allclose(interp[-1], b, atol=1e-7)
    R = interp[2][:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-9)


def test_render_camera_path(tmp_path):
    means, _, _, colors, _ = random_gaussians(150, seed=2)
    params = init_from_points(np.asarray(means), np.asarray(colors),
                              capacity=256, sh_degree=1)
    cfg = TrainConfig(model=ModelConfig(
        max_gaussians=256, sh_degree=1,
        rasterize=RasterizeConfig(gaussian_chunk=64)))
    frames = render_camera_path(
        params, orbit_path(radius=2.0, n_frames=3), cfg,
        width=64, height=48, out_dir=tmp_path / "frames",
    )
    assert len(frames) == 3
    assert frames[0].shape == (48, 64, 3)
    assert len(list((tmp_path / "frames").iterdir())) == 3
    assert any(f.max() > 0 for f in frames)


def test_load_camera_path_json(tmp_path):
    pose = np.eye(4)
    data = {"render_width": 320, "render_height": 240,
            "camera_path": [{"camera_to_world": pose.ravel().tolist(),
                             "fov": 50.0}]}
    p = tmp_path / "path.json"
    p.write_text(json.dumps(data))
    poses, w, h, fov = load_camera_path_json(p)
    assert (w, h, fov) == (320, 240, 50.0)
    np.testing.assert_allclose(poses[0], pose)


def test_blur_filtering(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    sharp = rng.integers(0, 256, (64, 64), np.uint8)  # noise = very sharp
    blurry = np.full((64, 64), 128, np.uint8)          # flat = zero variance
    Image.fromarray(sharp).save(tmp_path / "a_sharp.png")
    Image.fromarray(blurry).save(tmp_path / "b_blurry.png")
    assert laplacian_blur_score(sharp) > laplacian_blur_score(blurry)
    keep, reject = filter_blurry_dir(tmp_path, blur_threshold=150.0,
                                     similarity_threshold=None)
    assert [p.name for p in keep] == ["a_sharp.png"]
    assert [p.name for p in reject] == ["b_blurry.png"]


def test_resize_scene(tmp_path):
    from PIL import Image

    (tmp_path / "imgs").mkdir()
    Image.fromarray(np.zeros((50, 100, 3), np.uint8)).save(
        tmp_path / "imgs" / "x.png")
    meta = {"fl_x": 100.0, "fl_y": 100.0, "cx": 50.0, "cy": 25.0,
            "w": 100, "h": 50, "frames": []}
    (tmp_path / "transforms.json").write_text(json.dumps(meta))
    n = resize_scene_images(tmp_path, size=(200, 100))
    assert n == 1
    with Image.open(tmp_path / "imgs" / "x.png") as img:
        assert img.size == (200, 100)
    meta2 = json.loads((tmp_path / "transforms.json").read_text())
    assert meta2["fl_x"] == 200.0 and meta2["cy"] == 50.0
    assert meta2["w"] == 200
