"""Sensor-net and monodepth interface tests (contract-level; weights are
random in this zero-egress image)."""
import numpy as np
import pytest

from touchgs_tpu.touch.sensor_nets import (
    FORCE_RANGE,
    FORCE_RESIDUAL,
    DenseTactSensor,
    denormalize_force,
)
from touchgs_tpu.vision.monodepth import VisualPipeline, save_npz_weights
from touchgs_tpu.data.capture_convert import (
    captures_to_transforms,
    convert_capture_pose,
    rescale_depth_capture,
    resolve_focal,
)


@pytest.fixture(scope="module")
def sensor():
    return DenseTactSensor(input_size=64)  # small for CPU tests


def test_depth_net_contract(sensor):
    img = np.random.default_rng(0).integers(0, 256, (64, 64, 3), np.uint8)
    d = sensor.get_depth(img)
    assert d.shape == (64, 64)
    assert d.dtype == np.uint8


def test_force_net_contract(sensor):
    img = np.random.default_rng(0).integers(0, 256, (64, 64, 3), np.uint8)
    f = sensor.get_force(img)
    assert f.shape == (6,)
    # denormalized outputs must lie inside the physical ranges
    lo = -FORCE_RESIDUAL
    hi = FORCE_RANGE - FORCE_RESIDUAL
    assert np.all(f >= lo - 1e-5) and np.all(f <= hi + 1e-5)


def test_denormalize_force_extremes():
    import jax.numpy as jnp
    np.testing.assert_allclose(
        np.asarray(denormalize_force(jnp.zeros(6))), -FORCE_RESIDUAL, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(denormalize_force(jnp.ones(6))),
        FORCE_RANGE - FORCE_RESIDUAL, atol=1e-6,
    )


def test_rectify_identity_and_mask(sensor):
    raw = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    assert np.array_equal(sensor.rectify(raw), raw)
    s2 = DenseTactSensor(input_size=64,
                         calib_index=np.arange(16))  # 4x4 crop remap
    out = s2.rectify(raw)
    assert out.shape == (4, 4, 3)
    np.testing.assert_array_equal(out.reshape(-1, 3), raw.reshape(-1, 3)[:16])


def test_monodepth_pipeline(tmp_path):
    vp = VisualPipeline(model_type="dpt", image_size=(64, 64))
    rgb = np.random.default_rng(0).integers(0, 256, (48, 80, 3), np.uint8)
    depth = vp.predict_depth(rgb)
    assert depth.shape == (48, 80)
    assert (depth >= 0).all()

    from PIL import Image
    (tmp_path / "imgs").mkdir()
    Image.fromarray(rgb).save(tmp_path / "imgs" / "a.png")
    vp.predict(tmp_path / "imgs", tmp_path / "zoe_out")
    assert (tmp_path / "zoe_out" / "a.png").exists()

    with pytest.raises(ValueError):
        VisualPipeline(model_type="bogus")


def test_monodepth_weight_roundtrip(tmp_path):
    vp = VisualPipeline(model_type="dpt", image_size=(64, 64))
    path = tmp_path / "w.npz"
    save_npz_weights(vp.params, path)
    vp2 = VisualPipeline(model_type="dpt", image_size=(64, 64), seed=1,
                         weights_path=str(path))
    rgb = np.random.default_rng(0).integers(0, 256, (64, 64, 3), np.uint8)
    np.testing.assert_allclose(vp.predict_depth(rgb), vp2.predict_depth(rgb),
                               atol=1e-5)


# --- capture conversion (armPose2Nerf contract) -----------------------------

def test_resolve_focal_variants():
    assert resolve_focal(100, 200, {"fl_x": 3.0}) == (3.0, 3.0)
    fx, fy = resolve_focal(100, 200, {"camera_angle_x": np.pi / 2})
    assert abs(fx - 100.0) < 1e-9 and fx == fy
    with pytest.raises(RuntimeError):
        resolve_focal(10, 10, {})


def test_rescale_depth_capture():
    raw = np.array([[0, 128, 255]], np.uint8)
    d = rescale_depth_capture(raw, near=0.1, far=1.1)
    assert d[0, 0] == 0.0  # near → invalid
    assert abs(d[0, 2] - 1.1) < 1e-6


def test_convert_capture_pose_orthonormal():
    rng = np.random.default_rng(0)
    q = rng.normal(size=4); q /= np.linalg.norm(q)
    from touchgs_tpu.utils.transforms import quat_to_rotmat_np
    pose = np.eye(4)
    pose[:3, :3] = quat_to_rotmat_np(q)
    pose[:3, 3] = rng.normal(size=3)
    out = convert_capture_pose(pose, units=1000.0)
    R = out[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-9)


def test_captures_to_transforms(tmp_path):
    from PIL import Image

    (tmp_path / "color").mkdir()
    Image.fromarray(np.zeros((20, 30, 3), np.uint8)).save(
        tmp_path / "color" / "im0.png"
    )
    meta = {"camera_angle_x": 1.0,
            "frames": [{"file_path": "im0.png",
                        "transform_matrix": np.eye(4).tolist()}]}
    (tmp_path / "color" / "transforms_train.json").write_text(
        __import__("json").dumps(meta)
    )
    out = captures_to_transforms(tmp_path, modes=("color",), units=1000.0,
                                 output_path=tmp_path / "transforms.json")
    assert len(out["frames"]) == 1
    f = out["frames"][0]
    assert f["camera_model"] == "OPENCV"
    assert f["w"] == 30 and f["h"] == 20
    assert (tmp_path / "transforms.json").exists()


def test_sensor_loop_end_to_end(tmp_path):
    """RunCamera-equivalent loop (cam_ros.py:276-321): grab → rectify →
    depth/force nets → published outputs at the dir contract."""
    from touchgs_tpu.touch.sensor_loop import SensorLoop, SyntheticSource

    sensor = DenseTactSensor(input_size=64)
    loop = SensorLoop(sensor=sensor, out_dir=tmp_path / "run",
                      rate_hz=1000.0)  # no artificial sleep in tests
    n = loop.run(SyntheticSource(size=64, n_frames=3))
    assert n == 3
    depth_files = sorted((tmp_path / "run" / "depth").iterdir())
    assert len(depth_files) == 3
    import numpy as _np
    from PIL import Image

    d = _np.asarray(Image.open(depth_files[0]))
    assert d.dtype == _np.uint8 and d.shape == (64, 64)
    force = (tmp_path / "run" / "force.csv").read_text().splitlines()
    assert force[0] == "index,fx,fy,fz,tx,ty,tz"
    assert len(force) == 4


def test_sensor_loop_directory_replay(tmp_path):
    """DirectorySource replays a tgs_capture-style dir through the loop."""
    from PIL import Image

    from touchgs_tpu.touch.sensor_loop import DirectorySource, SensorLoop

    cap = tmp_path / "cap"
    cap.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        Image.fromarray(
            rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        ).save(cap / f"frame_{i:05d}.png")
    got = []
    loop = SensorLoop(sensor=DenseTactSensor(input_size=64), rate_hz=1000.0,
                      run_force=False, on_frame=lambda i, r: got.append(i))
    assert loop.run(DirectorySource(cap)) == 2
    assert got == [0, 1]
