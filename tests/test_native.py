"""Native layer tests: build, PNG codec round-trips vs PIL, threaded loader."""
import subprocess
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from touchgs_tpu.native.loader import NativeLoader, decode_png, native_available

NATIVE_DIR = Path(__file__).parent.parent / "touchgs_tpu" / "native"


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native_available():
        pytest.skip("native toolchain unavailable")


def test_capture_tool_builds():
    subprocess.run(
        ["make", "-C", str(NATIVE_DIR), "build/tgs_capture"],
        check=True, capture_output=True, timeout=120,
    )
    r = subprocess.run(
        [str(NATIVE_DIR / "build" / "tgs_capture"), "--device",
         "/dev/null", "--count", "1"],
        capture_output=True, timeout=10,
    )
    # no camera in this environment: must fail *gracefully*
    assert r.returncode == 1
    assert b"tgs_capture:" in r.stderr


def test_decode_rgb8_matches_pil(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (37, 53, 3), dtype=np.uint8)
    p = tmp_path / "rgb.png"
    Image.fromarray(img).save(p)
    out = decode_png(p)
    assert out.shape == (37, 53, 3)
    np.testing.assert_allclose(out, img.astype(np.float32) / 255.0, atol=1e-7)


def test_decode_u16_gray_matches_contract(tmp_path):
    rng = np.random.default_rng(1)
    depth_mm = rng.integers(0, 5000, (24, 31), dtype=np.uint16)
    p = tmp_path / "depth.png"
    Image.fromarray(depth_mm).save(p)
    out = decode_png(p)
    assert out.shape == (24, 31, 1)
    np.testing.assert_allclose(
        out[..., 0], depth_mm.astype(np.float32) / 1000.0, atol=1e-6
    )


def test_threaded_loader_prefetch(tmp_path):
    rng = np.random.default_rng(2)
    paths = []
    imgs = []
    for i in range(6):
        img = rng.integers(0, 256, (20, 28, 3), dtype=np.uint8)
        p = tmp_path / f"img_{i}.png"
        Image.fromarray(img).save(p)
        paths.append(p)
        imgs.append(img)
    loader = NativeLoader(paths, n_threads=3)
    for i in range(6):
        loader.prefetch(i)
    # fetch out of order
    for i in [3, 0, 5, 1, 4, 2]:
        out = loader.get(i)
        np.testing.assert_allclose(out, imgs[i].astype(np.float32) / 255.0,
                                   atol=1e-7)
    loader.close()


def test_native_encode_roundtrip(tmp_path):
    """WritePng → PIL read (cross-codec validation)."""
    import ctypes
    from touchgs_tpu.native import loader as L

    lib = L._ensure_built()
    depth = np.arange(16 * 20, dtype=np.uint16).reshape(16, 20) * 7
    p = tmp_path / "enc.png"
    rc = lib.tgs_encode_png_u16(
        str(p).encode(), depth.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        16, 20,
    )
    assert rc == 0
    back = np.asarray(Image.open(p))
    np.testing.assert_array_equal(back, depth)


def test_sync_capture_tool(tmp_path):
    """tgs_sync_capture (capturedata.cpp Save-class equivalent): synchronized
    multi-stream snapshot under one shared index, pose feed over a Unix
    datagram socket, CSV + per-camera PNG layout."""
    import socket
    import subprocess
    import time as _time

    subprocess.run(["make", "-C", str(NATIVE_DIR), "build/tgs_sync_capture"],
                   check=True, capture_output=True)
    out = tmp_path / "cap"
    sock_path = str(tmp_path / "pose.sock")
    proc = subprocess.Popen(
        [str(NATIVE_DIR / "build" / "tgs_sync_capture"), "--out", str(out),
         "--sim", "2", "--auto-capture", "4", "--rate-hz", "20",
         "--pose-socket", sock_path],
        stdin=subprocess.DEVNULL, stdout=subprocess.PIPE,
        stderr=subprocess.PIPE)
    # feed poses while it captures
    s = socket.socket(socket.AF_UNIX, socket.SOCK_DGRAM)
    for _ in range(40):
        if Path(sock_path).exists():
            break
        _time.sleep(0.05)
    for i in range(10):
        try:
            s.sendto(f"pose ee 0.1 0.2 {i} 0 0 0 1".encode(), sock_path)
            s.sendto(b"wrench 1 2 3 0.1 0.2 0.3", sock_path)
        except OSError:
            pass
        _time.sleep(0.05)
    rc = proc.wait(timeout=30)
    assert rc == 0, proc.stderr.read().decode()[-300:]
    for cam in ("imgs_cam0", "imgs_cam1"):
        frames = sorted((out / cam).iterdir())
        assert len(frames) == 4, (cam, frames)
    poses = (out / "poses.csv").read_text().strip().splitlines()
    wrench = (out / "wrench.csv").read_text().strip().splitlines()
    assert len(poses) == 5 and len(wrench) == 5  # header + 4 rows
    assert poses[0].startswith("index,frame,x,y,z")
    # at least one pose row picked up the socket feed
    assert any(",ee," in row for row in poses[1:])


def test_jpeg_decode_native():
    """MJPEG capture-path codec (usb_cam.cpp ffmpeg-MJPEG equivalent): the
    native libjpeg decode matches PIL on a round-tripped JPEG."""
    import ctypes
    import io

    import numpy as np
    from PIL import Image

    from touchgs_tpu.native.loader import _ensure_built

    lib = _ensure_built()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    lib.tgs_decode_jpeg.restype = ctypes.c_int
    lib.tgs_decode_jpeg.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
        ctypes.POINTER(ctypes.c_int)]

    rng = np.random.default_rng(0)
    # smooth image: JPEG is lossy, keep content low-frequency for a tight bound
    yy, xx = np.mgrid[0:48, 0:64]
    img = np.stack([
        (127 + 120 * np.sin(xx / 11.0)),
        (127 + 120 * np.cos(yy / 9.0)),
        (127 + 100 * np.sin((xx + yy) / 15.0)),
    ], axis=-1).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=95)
    data = np.frombuffer(buf.getvalue(), np.uint8)

    out = np.zeros(48 * 64 * 3, np.uint8)
    shape = (ctypes.c_int * 3)()
    n = lib.tgs_decode_jpeg(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(data),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out.size, shape)
    assert n == 48 * 64 * 3
    assert tuple(shape) == (48, 64, 3)
    ref = np.asarray(Image.open(io.BytesIO(buf.getvalue())).convert("RGB"))
    got = out.reshape(48, 64, 3)
    # IDCT implementations differ by a few LSBs
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 3

    # malformed stream fails cleanly (no exit())
    bad = np.arange(100, dtype=np.uint8)
    n = lib.tgs_decode_jpeg(
        bad.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(bad),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out.size, shape)
    assert n == -2
