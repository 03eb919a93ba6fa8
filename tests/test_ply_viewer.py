"""PLY splat export/import round-trip + live viewer server."""
import json
import urllib.request

import numpy as np
import pytest

from touchgs_tpu.data.ply import (
    load_gaussians_ply, read_pointcloud_ply, read_ply, save_gaussians_ply,
    write_pointcloud_ply,
)
from touchgs_tpu.models.gaussians import init_random


def test_gaussian_ply_roundtrip(tmp_path):
    params = init_random(n=100, capacity=128, sh_degree=3, seed=1)
    path = tmp_path / "splat.ply"
    n = save_gaussians_ply(path, params)
    assert n == 100

    loaded = load_gaussians_ply(path)
    assert int(loaded.num_alive) == 100
    a = np.asarray(params.alive)
    np.testing.assert_allclose(
        np.asarray(loaded.means)[:100], np.asarray(params.means)[a], rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(loaded.sh_rest)[:100], np.asarray(params.sh_rest)[a],
        rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(loaded.logit_opacities)[:100],
        np.asarray(params.logit_opacities)[a], rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(loaded.quats)[:100], np.asarray(params.quats)[a], rtol=1e-6)


def test_gaussian_ply_header_layout(tmp_path):
    """Property names/order must match the INRIA 3DGS layout."""
    params = init_random(n=10, capacity=16, sh_degree=3, seed=0)
    path = tmp_path / "s.ply"
    save_gaussians_ply(path, params)
    v = read_ply(path)
    names = list(v)
    assert names[:9] == ["x", "y", "z", "nx", "ny", "nz",
                         "f_dc_0", "f_dc_1", "f_dc_2"]
    assert sum(k.startswith("f_rest_") for k in names) == 45  # 3*(16-1)
    assert names[-8:] == ["opacity", "scale_0", "scale_1", "scale_2",
                          "rot_0", "rot_1", "rot_2", "rot_3"]


def test_pointcloud_ply_roundtrip(tmp_path):
    pts = np.random.default_rng(0).normal(size=(50, 3)).astype(np.float32)
    cols = np.random.default_rng(1).uniform(size=(50, 3)).astype(np.float32)
    path = tmp_path / "pc.ply"
    write_pointcloud_ply(path, pts, cols)
    p2, c2 = read_pointcloud_ply(path)
    np.testing.assert_allclose(p2, pts, rtol=1e-6)
    assert np.abs(c2 - cols).max() < 1.0 / 255 + 1e-6


@pytest.fixture(scope="module")
def viewer():
    from touchgs_tpu.viewer import ViewerServer

    calls = []

    def render_fn(c2w, w, h):
        calls.append(c2w)
        rgb = np.zeros((h, w, 3), np.float32)
        rgb[..., 0] = 0.5
        return {"rgb": rgb, "depth": np.ones((h, w), np.float32),
                "acc": np.ones((h, w), np.float32)}

    srv = ViewerServer(render_fn=render_fn, port=0).start()
    yield srv
    srv.stop()


def test_viewer_state_endpoint(viewer):
    viewer.update_status(42, 0.125, 1000)
    with urllib.request.urlopen(viewer.url + "state", timeout=10) as r:
        s = json.loads(r.read())
    assert s["step"] == 42 and s["num_alive"] == 1000


def test_viewer_render_endpoint(viewer):
    url = viewer.url + "render?theta=0.5&phi=0.2&radius=3&w=64&h=48&mode=rgb"
    with urllib.request.urlopen(url, timeout=30) as r:
        png = r.read()
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    from PIL import Image
    import io
    img = np.asarray(Image.open(io.BytesIO(png)))
    assert img.shape == (48, 64, 3)
    assert abs(int(img[0, 0, 0]) - 127) <= 1  # 0.5 red


def test_viewer_index_page(viewer):
    with urllib.request.urlopen(viewer.url, timeout=10) as r:
        body = r.read()
    assert b"touchgs_tpu viewer" in body


def test_orbit_c2w_looks_at_center():
    from touchgs_tpu.viewer import orbit_c2w

    c2w = orbit_c2w(theta=0.7, phi=0.3, radius=2.0, center=(0.1, -0.2, 0.3))
    eye = c2w[:3, 3]
    fwd = -c2w[:3, 2]  # OpenGL: camera looks down -Z
    to_center = np.array([0.1, -0.2, 0.3]) - eye
    np.testing.assert_allclose(np.linalg.norm(to_center), 2.0, rtol=1e-5)
    cos = to_center @ fwd / np.linalg.norm(to_center)
    assert cos > 0.9999
    # orthonormal rotation
    R = c2w[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
