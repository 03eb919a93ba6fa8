"""Sensor calibration: radial line detection + radius↔angle GP regression
(reference: legacy/sensor_calibration/sensor_calibration.py)."""
import numpy as np
import pytest

from touchgs_tpu.touch.calibration import (
    build_lookup_table,
    calibrate_sensor,
    detect_radial_lines,
    fit_radius_angle_gp,
    rectification_indices,
)


def _target_image(size=256, n_lines=8):
    """Synthetic calibration target: radial lines through the center."""
    img = np.zeros((size, size), np.uint8)
    c = size / 2.0
    for k in range(n_lines):
        ang = k * np.pi / n_lines
        for r in np.linspace(20, size / 2 - 5, 400):
            x = int(round(c + r * np.cos(ang)))
            y = int(round(c + r * np.sin(ang)))
            if 0 <= x < size and 0 <= y < size:
                img[y, x] = 255
                if x + 1 < size:
                    img[y, x + 1] = 255
    return img


def test_detect_radial_lines_finds_center_lines():
    img = _target_image()
    segs = detect_radial_lines(img)
    assert len(segs) >= 4
    # every kept segment's line passes near the center
    c = img.shape[0] / 2.0
    x0, y0, x1, y1 = segs.T
    dx, dy = x1 - x0, y1 - y0
    dist = np.abs(dy * (c - x0) - dx * (c - y0)) / np.hypot(dx, dy)
    assert np.all(dist <= 25.0)


def test_detect_rejects_tangential_lines():
    size = 256
    img = np.zeros((size, size), np.uint8)
    img[40, 10:240] = 255  # horizontal line far from center row
    img[41, 10:240] = 255
    segs = detect_radial_lines(img)
    assert len(segs) == 0


def test_gp_regression_recovers_smooth_curve():
    rng = np.random.default_rng(0)
    radii = np.linspace(5, 300, 60)
    true = np.deg2rad(90.0) * (radii / 300.0) ** 1.1  # smooth monotonic
    noisy = true + rng.normal(0, 0.005, radii.shape)
    gp = fit_radius_angle_gp(radii, noisy, lengthscale=0.3, noise=5e-3)
    mean, var = gp.predict(radii)
    np.testing.assert_allclose(np.asarray(mean), true, atol=0.02)
    assert np.all(np.asarray(var) >= 0)
    # uncertainty grows outside the data support
    _, var_far = gp.predict(np.array([600.0]))
    assert float(var_far[0]) > float(np.max(np.asarray(var)))


def test_lookup_table_and_rectification_indices():
    radii = np.linspace(5, 300, 40)
    angles = np.deg2rad(90.0) * radii / 300.0
    gp = fit_radius_angle_gp(radii, angles)
    lut = build_lookup_table(gp, max_radius=300)
    assert lut.shape == (301,)
    idx = rectification_indices(lut, image_size=64)
    assert idx.shape == (64 * 64,)
    assert idx.min() >= 0 and idx.max() < 64 * 64


def test_calibrate_sensor_end_to_end():
    img = _target_image()
    gp = calibrate_sensor(
        img, known_angles=lambda r: np.deg2rad(80.0) * r / 128.0,
        lengthscale=0.4,
    )
    mean, _ = gp.predict(np.array([64.0]))
    assert abs(float(mean[0]) - np.deg2rad(40.0)) < 0.15
