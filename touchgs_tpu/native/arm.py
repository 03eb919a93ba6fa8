"""ctypes bindings for the native compliant arm controller.

Python-side interface to `arm_control.cpp` — the framework's equivalent of
the reference's compliant capture controller
(`/root/reference/data_collection/ros1/capturedata/src/arm_compliant_control.cpp`).
Used for touch-capture motion: Cartesian compliance toward a target pose and
guarded approach-until-contact-force moves, plus a built-in simulator so the
control law is testable without a robot.
"""
from __future__ import annotations

import ctypes
from typing import Optional, Sequence

import numpy as np

from touchgs_tpu.native.loader import _ensure_built


def _bind(lib) -> None:
    if getattr(lib, "_tgs_arm_bound", False):
        return
    d = ctypes.POINTER(ctypes.c_double)
    lib.tgs_arm_create.restype = ctypes.c_void_p
    lib.tgs_arm_create.argtypes = [ctypes.c_int, d, d, d]
    lib.tgs_arm_destroy.argtypes = [ctypes.c_void_p]
    for name, extra in (("tgs_arm_fk", [d, d]),
                        ("tgs_arm_jacobian", [d, d]),
                        ("tgs_arm_gravity", [d, d]),
                        ("tgs_arm_compliance_tau", [d, d, d, d, d, d])):
        fn = getattr(lib, name)
        fn.restype = None
        fn.argtypes = [ctypes.c_void_p] + extra
    lib.tgs_sim_create.restype = ctypes.c_void_p
    lib.tgs_sim_create.argtypes = [ctypes.c_void_p, d, d, ctypes.c_double,
                                   ctypes.c_double, ctypes.c_double]
    lib.tgs_sim_destroy.argtypes = [ctypes.c_void_p]
    lib.tgs_sim_state.argtypes = [ctypes.c_void_p, d, d]
    lib.tgs_sim_contact_force.argtypes = [ctypes.c_void_p, d]
    lib.tgs_sim_step_compliance.restype = None
    lib.tgs_sim_step_compliance.argtypes = [ctypes.c_void_p, d, d, d,
                                            ctypes.c_double]
    lib.tgs_sim_step_guarded.restype = ctypes.c_int
    lib.tgs_sim_step_guarded.argtypes = [ctypes.c_void_p, d, ctypes.c_double,
                                         ctypes.c_double, d, d,
                                         ctypes.c_double, ctypes.c_double]
    lib._tgs_arm_bound = True


def _dp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def arm_available() -> bool:
    return _ensure_built() is not None


class CompliantArm:
    """Serial arm (standard DH) with compliance control primitives."""

    def __init__(self, dh: Sequence[Sequence[float]],
                 mass: Optional[Sequence[float]] = None,
                 com: Optional[Sequence[Sequence[float]]] = None):
        lib = _ensure_built()
        if lib is None:
            raise RuntimeError("native arm controller unavailable")
        _bind(lib)
        self._lib = lib
        self.n = len(dh)
        dh_a = np.ascontiguousarray(dh, np.float64).reshape(self.n, 4)
        mass_a = np.ascontiguousarray(
            mass if mass is not None else np.zeros(self.n), np.float64)
        com_a = np.ascontiguousarray(
            com if com is not None else np.zeros((self.n, 3)), np.float64)
        self._h = lib.tgs_arm_create(self.n, _dp(dh_a), _dp(mass_a),
                                     _dp(com_a))
        if not self._h:
            raise ValueError(
                f"tgs_arm_create rejected n_joints={self.n} "
                f"(must be 1..{16})")

    def fk(self, q) -> np.ndarray:
        q = np.ascontiguousarray(q, np.float64)
        out = np.empty(16, np.float64)
        self._lib.tgs_arm_fk(self._h, _dp(q), _dp(out))
        return out.reshape(4, 4, order="F")

    def jacobian(self, q) -> np.ndarray:
        q = np.ascontiguousarray(q, np.float64)
        out = np.empty(6 * self.n, np.float64)
        self._lib.tgs_arm_jacobian(self._h, _dp(q), _dp(out))
        return out.reshape(6, self.n)

    def gravity(self, q) -> np.ndarray:
        q = np.ascontiguousarray(q, np.float64)
        out = np.empty(self.n, np.float64)
        self._lib.tgs_arm_gravity(self._h, _dp(q), _dp(out))
        return out

    def compliance_tau(self, q, dq, target_pose: np.ndarray,
                       stiffness, damping) -> np.ndarray:
        q = np.ascontiguousarray(q, np.float64)
        dq = np.ascontiguousarray(dq, np.float64)
        t = np.asfortranarray(target_pose, np.float64).reshape(16, order="F")
        t = np.ascontiguousarray(t)
        k = np.ascontiguousarray(stiffness, np.float64)
        d = np.ascontiguousarray(damping, np.float64)
        out = np.empty(self.n, np.float64)
        self._lib.tgs_arm_compliance_tau(self._h, _dp(q), _dp(dq), _dp(t),
                                         _dp(k), _dp(d), _dp(out))
        return out

    def close(self):
        # The C++ Sim keeps a raw Arm*: destroying the arm while a sim is
        # alive would leave it dangling (use-after-free on the next step).
        # Close dependent sims first so teardown order never matters.
        for sim in list(getattr(self, "_sims", ())):
            sim.close()
        if self._h:
            self._lib.tgs_arm_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class ArmSim:
    """Fixed-step simulator around a CompliantArm (contact plane optional)."""

    def __init__(self, arm: CompliantArm, q0, inertia=None, damping: float = 2.0,
                 plane_z: float = -1e9, k_contact: float = 0.0):
        self.arm = arm
        self._lib = arm._lib
        q0 = np.ascontiguousarray(q0, np.float64)
        inertia_a = np.ascontiguousarray(
            inertia if inertia is not None else np.full(arm.n, 0.1),
            np.float64)
        self._h = self._lib.tgs_sim_create(arm._h, _dp(q0), _dp(inertia_a),
                                           damping, plane_z, k_contact)
        if not self._h:
            raise ValueError("tgs_sim_create failed (arm handle invalid?)")
        if not hasattr(arm, "_sims"):
            import weakref
            arm._sims = weakref.WeakSet()
        arm._sims.add(self)

    def state(self):
        q = np.empty(self.arm.n, np.float64)
        dq = np.empty(self.arm.n, np.float64)
        self._lib.tgs_sim_state(self._h, _dp(q), _dp(dq))
        return q, dq

    def contact_force(self) -> np.ndarray:
        f = np.empty(3, np.float64)
        self._lib.tgs_sim_contact_force(self._h, _dp(f))
        return f

    def step_compliance(self, target_pose, stiffness, damping, dt=1e-3):
        t = np.ascontiguousarray(
            np.asfortranarray(target_pose, np.float64).reshape(16, order="F"))
        k = np.ascontiguousarray(stiffness, np.float64)
        d = np.ascontiguousarray(damping, np.float64)
        self._lib.tgs_sim_step_compliance(self._h, _dp(t), _dp(k), _dp(d), dt)

    def step_guarded(self, direction, speed, f_stop, stiffness, damping,
                     dt=1e-3, tol_n=0.5) -> bool:
        dr = np.ascontiguousarray(direction, np.float64)
        k = np.ascontiguousarray(stiffness, np.float64)
        d = np.ascontiguousarray(damping, np.float64)
        return bool(self._lib.tgs_sim_step_guarded(
            self._h, _dp(dr), speed, f_stop, _dp(k), _dp(d), dt, tol_n))

    def close(self):
        if self._h:
            self._lib.tgs_sim_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
