"""RealSense depth ingestion (jnp, jittable remap).

Rebuild of ``utils/read_realsense_depth.py``: raw RealSense .npy depth (mm)
is reprojected from the depth camera's intrinsics to the RGB camera's via the
``K_old · K_new⁻¹`` pixel remap (:13-48), then written as uint16-mm PNG to
``realsense_depths/`` (:129-139).  The default intrinsics are the reference's
hardcoded pair (:12).
"""
from __future__ import annotations

import functools
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from touchgs_tpu.data.depth_io import write_depth_mm

# reference defaults (read_realsense_depth.py:12)
OLD_INTRINSICS = (360.0, 360.0, 243.0, 137.8)
NEW_INTRINSICS = (1297.0, 1304.0, 620.91, 238.28)
NEW_SIZE = (1280, 720)


def _bilinear_sample(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray):
    """cv2.remap(INTER_LINEAR) equivalent: sample img at float coords,
    out-of-range → 0 (BORDER_CONSTANT)."""
    h, w = img.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(yi, xi):
        inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        v = img[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
        return jnp.where(inside, v, 0.0)

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    return ((1 - fy) * ((1 - fx) * v00 + fx * v01)
            + fy * ((1 - fx) * v10 + fx * v11))


@functools.partial(jax.jit, static_argnames=("new_size",))
def convert_intrinsics(
    img: jnp.ndarray,
    old_intrinsics: tuple = OLD_INTRINSICS,
    new_intrinsics: tuple = NEW_INTRINSICS,
    new_size: tuple[int, int] = NEW_SIZE,
) -> jnp.ndarray:
    """Remap an image between camera intrinsics (reference :13-48)."""
    ofx, ofy, ocx, ocy = old_intrinsics
    nfx, nfy, ncx, ncy = new_intrinsics
    width, height = new_size
    ys, xs = jnp.mgrid[0:height, 0:width]
    # K_old @ K_new^-1 action on homogeneous pixel coords
    map_x = ofx * (xs - ncx) / nfx + ocx
    map_y = ofy * (ys - ncy) / nfy + ocy
    return _bilinear_sample(jnp.asarray(img, jnp.float32), map_x, map_y)


def process_realsense_dir(
    root: str | Path,
    in_dir: str = "realsense_depth",
    out_dir: str = "realsense_depths",
    old_intrinsics: tuple = OLD_INTRINSICS,
    new_intrinsics: tuple = NEW_INTRINSICS,
    new_size: tuple[int, int] = NEW_SIZE,
) -> int:
    """`read_realsense_depth.py` main loop (:108-139): npy mm → remap →
    uint16-mm PNG.  Returns the number of frames written."""
    root = Path(root)
    out = root / out_dir
    out.mkdir(exist_ok=True)
    count = 0
    for f in sorted((root / in_dir).glob("*.npy")):
        depth_m = np.load(f).astype(np.float32) / 1000.0  # :101-106
        remapped = convert_intrinsics(
            jnp.asarray(depth_m), old_intrinsics, new_intrinsics, new_size
        )
        write_depth_mm(out / f"{f.stem}.png", np.asarray(remapped))
        count += 1
    return count
