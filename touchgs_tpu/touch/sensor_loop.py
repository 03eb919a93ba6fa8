"""DenseTact live sensor loop — the RunCamera equivalent without ROS.

Rebuild of the reference's 30 Hz camera loop
(``data_collection/ros1/dtv2_tactile_camera/src/cam_ros.py:276-321``
``CAM_camerashow`` and the ROS2 timer variant
``ros2/vtnf_camera/vtnf_camera/dtv2_cam_pub.py:120-127``): per tick —
grab a tactile frame → fisheye rectify (per-sensor calib index map,
cam_ros.py:230-250) → run the depth and force nets → publish.

Publishing without ROS topics: outputs land in a run directory
(``depth/frame_%05d.png`` uint8 like ``/RunCamera/imgDepth``,
``force.csv`` rows like ``/RunCamera/force``) and optionally via a live
callback (the viewer or a capture pipeline can subscribe in-process).

Frame sources, mirroring the capture stack's layering:
- ``DirectorySource`` — replays a capture dir (tgs_capture / tgs_sync_capture
  output) at the configured rate.
- ``SyntheticSource`` — procedural frames, for hardware-free tests/CI.
- a V4L2 device can be wired by pointing ``DirectorySource`` at a dir that
  ``tgs_capture`` is concurrently filling (the native tool owns the ioctl
  loop; this process owns rectify + nets — the same split as the reference's
  usb_cam node vs. RunCamera).
"""
from __future__ import annotations

import dataclasses
import time
from pathlib import Path
from typing import Callable, Iterator, Optional

import numpy as np

from touchgs_tpu.touch.sensor_nets import DenseTactSensor


class SyntheticSource:
    """Procedural tactile-looking frames (moving bump on a flat field)."""

    def __init__(self, size: int = 640, n_frames: int = 30, seed: int = 0):
        self.size = size
        self.n_frames = n_frames
        self.rng = np.random.default_rng(seed)

    def frames(self) -> Iterator[np.ndarray]:
        s = self.size
        yy, xx = np.mgrid[0:s, 0:s].astype(np.float32)
        for t in range(self.n_frames):
            cx = s / 2 + s / 4 * np.sin(t * 0.3)
            cy = s / 2 + s / 4 * np.cos(t * 0.3)
            bump = np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2)
                            / (2 * (s / 12) ** 2)))
            img = np.stack([120 + 80 * bump, 100 + 60 * bump,
                            90 + 40 * bump], axis=-1)
            yield img.astype(np.uint8)


class DirectorySource:
    """Replay frames from a capture dir (sorted PNG/JPG)."""

    def __init__(self, path: str | Path):
        self.paths = sorted(
            p for p in Path(path).iterdir()
            if p.suffix.lower() in (".png", ".jpg", ".jpeg"))

    def frames(self) -> Iterator[np.ndarray]:
        from PIL import Image

        for p in self.paths:
            yield np.asarray(Image.open(p).convert("RGB"))


@dataclasses.dataclass
class SensorLoop:
    """Grab → rectify → depth/force nets → publish, at ``rate_hz``."""

    sensor: DenseTactSensor
    out_dir: Optional[str | Path] = None
    rate_hz: float = 30.0             # cam_ros runs 30 Hz; ROS2 variant 25
    run_depth: bool = True            # ispos
    run_force: bool = True            # isforce
    on_frame: Optional[Callable[[int, dict], None]] = None

    def run(self, source) -> int:
        """Process every frame from ``source``; returns frames processed."""
        from touchgs_tpu.data.depth_io import write_depth_mm  # noqa: F401

        out = Path(self.out_dir) if self.out_dir else None
        force_rows = []
        if out:
            (out / "depth").mkdir(parents=True, exist_ok=True)
            (out / "rect").mkdir(parents=True, exist_ok=True)
        period = 1.0 / self.rate_hz
        n = 0
        for i, frame in enumerate(source.frames()):
            t0 = time.time()
            rect = self.sensor.rectify(frame)
            result = {"rect": rect}
            if self.run_depth:
                result["depth"] = self.sensor.get_depth(rect)
            if self.run_force:
                result["force"] = self.sensor.get_force(rect)
            if out:
                from PIL import Image

                Image.fromarray(rect.astype(np.uint8)).save(
                    out / "rect" / f"frame_{i:05d}.png")
                if "depth" in result:
                    Image.fromarray(result["depth"]).save(
                        out / "depth" / f"frame_{i:05d}.png")
                if "force" in result:
                    force_rows.append(
                        f"{i}," + ",".join(f"{v:.6f}" for v in result["force"]))
            if self.on_frame:
                self.on_frame(i, result)
            n += 1
            dt = time.time() - t0
            if dt < period:
                time.sleep(period - dt)
        if out and force_rows:
            (out / "force.csv").write_text(
                "index,fx,fy,fz,tx,ty,tz\n" + "\n".join(force_rows) + "\n")
        return n
