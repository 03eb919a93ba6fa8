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


# ---------------- compliant arm controller (arm_control.cpp) ----------------

def _arm3():
    """3-DoF arm: yaw base + two pitch links in a vertical plane."""
    from touchgs_tpu.native.arm import CompliantArm

    dh = [[0.0, -np.pi / 2, 0.4, 0.0],
          [0.4, 0.0, 0.0, 0.0],
          [0.3, 0.0, 0.0, 0.0]]
    mass = [2.0, 1.5, 0.8]
    com = [[0.0, 0.0, 0.2], [0.2, 0.0, 0.0], [0.15, 0.0, 0.0]]
    return CompliantArm(dh, mass, com)


def test_arm_fk_planar():
    from touchgs_tpu.native.arm import CompliantArm, arm_available
    if not arm_available():
        pytest.skip("native toolchain unavailable")
    arm = CompliantArm([[1.0, 0, 0, 0], [1.0, 0, 0, 0]])
    p = arm.fk([0.0, 0.0])
    np.testing.assert_allclose(p[:3, 3], [2, 0, 0], atol=1e-12)
    p = arm.fk([np.pi / 2, 0.0])
    np.testing.assert_allclose(p[:3, 3], [0, 2, 0], atol=1e-12)
    p = arm.fk([np.pi / 2, -np.pi / 2])
    np.testing.assert_allclose(p[:3, 3], [1, 1, 0], atol=1e-12)


def test_arm_jacobian_matches_finite_difference():
    from touchgs_tpu.native.arm import arm_available
    if not arm_available():
        pytest.skip("native toolchain unavailable")
    arm = _arm3()
    q = np.array([0.3, -0.7, 1.1])
    J = arm.jacobian(q)
    eps = 1e-6
    for i in range(3):
        qp, qm = q.copy(), q.copy()
        qp[i] += eps; qm[i] -= eps
        dpos = (arm.fk(qp)[:3, 3] - arm.fk(qm)[:3, 3]) / (2 * eps)
        np.testing.assert_allclose(J[:3, i], dpos, atol=1e-5)


def test_arm_gravity_matches_potential_energy_gradient():
    from touchgs_tpu.native.arm import arm_available
    if not arm_available():
        pytest.skip("native toolchain unavailable")
    arm = _arm3()
    mass = [2.0, 1.5, 0.8]
    com = [[0.0, 0.0, 0.2], [0.2, 0.0, 0.0], [0.15, 0.0, 0.0]]
    dh = [[0.0, -np.pi / 2, 0.4, 0.0],
          [0.4, 0.0, 0.0, 0.0],
          [0.3, 0.0, 0.0, 0.0]]

    def pe(q):
        # world COM z of each link via the joint frames
        import numpy as _np
        T = _np.eye(4)
        total = 0.0
        for i in range(3):
            a, al, d, th0 = dh[i]
            ct, st = _np.cos(th0 + q[i]), _np.sin(th0 + q[i])
            ca, sa = _np.cos(al), _np.sin(al)
            L = _np.array([[ct, -st * ca, st * sa, a * ct],
                           [st, ct * ca, -ct * sa, a * st],
                           [0, sa, ca, d],
                           [0, 0, 0, 1]])
            T = T @ L
            c = T @ _np.array([*com[i], 1.0])
            total += mass[i] * 9.81 * c[2]
        return total

    q = np.array([0.4, -0.5, 0.9])
    tau = arm.gravity(q)
    eps = 1e-6
    for i in range(3):
        qp, qm = q.copy(), q.copy()
        qp[i] += eps; qm[i] -= eps
        np.testing.assert_allclose(tau[i], (pe(qp) - pe(qm)) / (2 * eps),
                                   atol=1e-4)


def test_arm_compliance_converges_to_target_pose():
    from touchgs_tpu.native.arm import ArmSim, arm_available
    if not arm_available():
        pytest.skip("native toolchain unavailable")
    arm = _arm3()
    q_target = np.array([0.2, -0.6, 0.9])
    target = arm.fk(q_target)
    sim = ArmSim(arm, q0=[0.0, -0.3, 0.5])
    K = [400.0] * 3 + [20.0] * 3
    D = [40.0] * 3 + [2.0] * 3
    for _ in range(6000):
        sim.step_compliance(target, K, D, dt=1e-3)
    q, dq = sim.state()
    err = np.linalg.norm(arm.fk(q)[:3, 3] - target[:3, 3])
    assert err < 2e-3, f"pose error {err*1e3:.2f} mm"
    assert np.abs(dq).max() < 0.05


def test_arm_guarded_touch_reaches_force_setpoint():
    """The touch-capture primitive: approach along -z until the contact
    force reaches the setpoint, then hold it (the reference controller's
    press-DenseTact-on-surface behavior)."""
    from touchgs_tpu.native.arm import ArmSim, arm_available
    if not arm_available():
        pytest.skip("native toolchain unavailable")
    arm = _arm3()
    q0 = np.array([0.0, -0.4, 0.8])
    z0 = arm.fk(q0)[2, 3]
    sim = ArmSim(arm, q0=q0, plane_z=z0 - 0.03, k_contact=2000.0)
    K = [600.0] * 3 + [30.0] * 3
    D = [50.0] * 3 + [3.0] * 3
    held = False
    for _ in range(12000):
        held = sim.step_guarded([0.0, 0.0, -1.0], speed=0.05, f_stop=5.0,
                                stiffness=K, damping=D, dt=1e-3, tol_n=0.5)
    assert held, f"contact force {sim.contact_force()} never held at 5 N"
    fz = sim.contact_force()[2]
    assert abs(fz - 5.0) < 0.5, f"held force {fz:.2f} N"
