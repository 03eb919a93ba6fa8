"""DenseTact fisheye calibration: line detection + GP radius↔angle regression.

Rebuild of the reference's sensor-calibration tooling
(`legacy/sensor_calibration/sensor_calibration.py`):

- the reference detects radial line segments on a printed calibration target
  with OpenCV's FastLineDetector (:9-56) and keeps segments that point at the
  image center;
- it then fits a **GPy RBF-kernel GP regression** mapping pixel radius →
  outgoing ray angle (:75-112) and evaluates it on a dense radius grid to
  build the per-sensor lookup table consumed by the rectification path
  (`data_collection/ros1/dtv2_tactile_camera/src/cam_ros.py:64-65` loads the
  baked `calib_idx/*.npy` masks derived from this table).

TPU-native design: the 1D GP is a tiny exact-GP solve (Cholesky on device —
the same machinery as `touch.gpis`, specialized to 1D), and the line detector
is a thin OpenCV front-end (host-side preprocessing, like the reference).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def detect_radial_lines(
    image: np.ndarray,
    center: Optional[tuple[float, float]] = None,
    min_length: float = 20.0,
    max_center_miss: float = 25.0,
) -> np.ndarray:
    """Detect line segments pointing at the image center.

    Returns (K, 4) array of segments [x0, y0, x1, y1] whose infinite extension
    passes within ``max_center_miss`` px of the (given or image) center —
    the radial-line filter of `sensor_calibration.py:9-56`.
    Falls back to a Hough-based detector when FastLineDetector (opencv
    contrib) is unavailable.
    """
    import cv2

    gray = image
    if gray.ndim == 3:
        gray = cv2.cvtColor(gray, cv2.COLOR_RGB2GRAY)
    gray = np.asarray(gray, np.uint8)
    h, w = gray.shape
    cx, cy = center if center is not None else (w / 2.0, h / 2.0)

    segs = None
    if hasattr(cv2, "ximgproc") and hasattr(cv2.ximgproc, "createFastLineDetector"):
        fld = cv2.ximgproc.createFastLineDetector(
            length_threshold=int(min_length)
        )
        out = fld.detect(gray)
        if out is not None:
            segs = out.reshape(-1, 4)
    if segs is None:
        edges = cv2.Canny(gray, 50, 150)
        out = cv2.HoughLinesP(
            edges, 1, np.pi / 180, threshold=40,
            minLineLength=int(min_length), maxLineGap=4,
        )
        segs = out.reshape(-1, 4).astype(np.float32) if out is not None else \
            np.zeros((0, 4), np.float32)

    if len(segs) == 0:
        return segs

    # keep segments whose supporting line passes near the center
    x0, y0, x1, y1 = segs[:, 0], segs[:, 1], segs[:, 2], segs[:, 3]
    dx, dy = x1 - x0, y1 - y0
    length = np.hypot(dx, dy)
    ok_len = length >= min_length
    # distance from center to the infinite line through the segment
    dist = np.abs(dy * (cx - x0) - dx * (cy - y0)) / np.maximum(length, 1e-9)
    return segs[ok_len & (dist <= max_center_miss)]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RadiusAngleGP:
    """Exact 1D GP regression pixel-radius → ray angle (GPy RBF contract)."""

    x: jax.Array          # (N, 1) training radii (normalized)
    alpha: jax.Array      # (N,)  K⁻¹ y
    L: jax.Array          # (N, N)
    lengthscale: jax.Array
    signal_var: jax.Array
    x_scale: jax.Array    # normalization constant

    def predict(self, radii: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Posterior mean and variance at query radii (any shape)."""
        q = jnp.asarray(radii, jnp.float32).reshape(-1, 1) / self.x_scale
        d2 = (q - self.x[:, 0][None, :]) ** 2
        ks = self.signal_var * jnp.exp(-0.5 * d2 / self.lengthscale**2)
        mean = ks @ self.alpha
        v = jax.scipy.linalg.solve_triangular(self.L, ks.T, lower=True)
        var = jnp.maximum(self.signal_var - jnp.sum(v * v, axis=0), 0.0)
        shape = jnp.shape(radii)
        return mean.reshape(shape), var.reshape(shape)


def fit_radius_angle_gp(
    radii: np.ndarray,
    angles: np.ndarray,
    lengthscale: float = 0.2,
    signal_var: float = 1.0,
    noise: float = 1e-3,
) -> RadiusAngleGP:
    """Fit the radius→angle GP (`sensor_calibration.py:75-112` GPy RBF)."""
    r = np.asarray(radii, np.float32).reshape(-1)
    a = np.asarray(angles, np.float32).reshape(-1)
    x_scale = float(max(np.abs(r).max(), 1e-6))
    x = jnp.asarray(r[:, None] / x_scale)
    y = jnp.asarray(a)

    d2 = (x - x[:, 0][None, :]) ** 2
    ls = jnp.float32(lengthscale)
    sv = jnp.float32(signal_var)
    K = sv * jnp.exp(-0.5 * d2 / ls**2)
    K = K + (noise**2 + 1e-6) * jnp.eye(len(r))
    L = jnp.linalg.cholesky(K)
    alpha = jax.scipy.linalg.cho_solve((L, True), y)
    return RadiusAngleGP(x=x, alpha=alpha, L=L, lengthscale=ls,
                         signal_var=sv, x_scale=jnp.float32(x_scale))


def build_lookup_table(
    gp: RadiusAngleGP, max_radius: int, n: Optional[int] = None
) -> np.ndarray:
    """Dense radius→angle LUT (what the reference bakes into calib npy files)."""
    n = n if n is not None else max_radius + 1
    grid = jnp.linspace(0.0, float(max_radius), n)
    mean, _ = gp.predict(grid)
    return np.asarray(mean)


def rectification_indices(
    lut: np.ndarray,
    image_size: int,
    fov_deg: float = 180.0,
) -> np.ndarray:
    """Equidistant-fisheye rectification index map from a radius→angle LUT.

    Produces the flat pixel-index array used like the reference's
    `calib_idx/*.npy` masks (`cam_ros.py:64-65,230-250`): output pixel (i, j)
    at target angle θ maps to the source radius whose LUT angle is nearest θ.
    """
    half = image_size / 2.0
    yy, xx = np.mgrid[0:image_size, 0:image_size]
    r_out = np.hypot(xx - half, yy - half)
    theta = r_out / half * np.deg2rad(fov_deg / 2.0)

    lut_angles = np.asarray(lut)
    # monotonic envelope so searchsorted is valid even with GP wiggle
    lut_mono = np.maximum.accumulate(lut_angles)
    src_r = np.searchsorted(lut_mono, theta.reshape(-1)).clip(
        0, len(lut_mono) - 1
    ).astype(np.float32)

    ang = np.arctan2(yy - half, xx - half).reshape(-1)
    sx = (half + src_r * np.cos(ang)).clip(0, image_size - 1)
    sy = (half + src_r * np.sin(ang)).clip(0, image_size - 1)
    return (sy.round() * image_size + sx.round()).astype(np.int64)


def calibrate_sensor(
    image: np.ndarray,
    known_angles: Callable[[np.ndarray], np.ndarray],
    center: Optional[tuple[float, float]] = None,
    **gp_kwargs,
) -> RadiusAngleGP:
    """End-to-end: detect radial lines → sample endpoint radii → fit GP.

    ``known_angles`` maps endpoint radii to target angles (from the printed
    target's geometry, as in the reference's manual correspondence step).
    """
    segs = detect_radial_lines(image, center=center)
    if len(segs) == 0:
        raise ValueError("no radial line segments detected")
    h, w = image.shape[:2]
    cx, cy = center if center is not None else (w / 2.0, h / 2.0)
    pts = np.concatenate([segs[:, :2], segs[:, 2:]], axis=0)
    radii = np.hypot(pts[:, 0] - cx, pts[:, 1] - cy)
    angles = known_angles(radii)
    return fit_radius_angle_gp(radii, angles, **gp_kwargs)
