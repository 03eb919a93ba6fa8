"""GPIS tests: recover known geometry from touch points (SURVEY.md §2.8)."""
import numpy as np
import pytest

from touchgs_tpu.touch.gpis import fit_gpis, posterior, render_depth_var
from tests.synthetic import look_at_camera

import jax.numpy as jnp


def _sphere_points(n=400, radius=0.3, center=(0.0, 0.0, 0.0), seed=0):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pts = np.asarray(center) + radius * v
    normals = v  # outward
    return pts.astype(np.float32), normals.astype(np.float32)


@pytest.fixture(scope="module")
def sphere_gpis():
    pts, normals = _sphere_points()
    return fit_gpis(pts, normals, lengthscale=0.1, noise=1e-3,
                    off_surface_eps=0.05)


def test_posterior_zero_on_surface(sphere_gpis):
    pts, _ = _sphere_points(n=50, seed=1)
    mean, var = posterior(sphere_gpis, jnp.asarray(pts))
    assert float(jnp.abs(mean).max()) < 0.02
    assert float(var.min()) >= 0


def test_posterior_sign_convention(sphere_gpis):
    outside = jnp.asarray([[0.0, 0.0, 0.45]])
    inside = jnp.asarray([[0.0, 0.0, 0.1]])
    m_out, _ = posterior(sphere_gpis, outside)
    m_in, _ = posterior(sphere_gpis, inside)
    assert float(m_out[0]) > 0
    assert float(m_in[0]) < 0


def test_render_depth_matches_sphere(sphere_gpis):
    cam = look_at_camera(eye=(0.0, 0.0, 1.2), width=48, height=36, focal=60.0)
    depth, var = render_depth_var(
        sphere_gpis, cam, near=0.4, far=1.4, n_samples=96, pixel_chunk=512
    )
    depth = np.asarray(depth)
    var = np.asarray(var)
    # center pixel: ray hits the sphere front at z = 1.2 - 0.3 = 0.9
    c = depth[18, 24]
    assert np.isfinite(c), "center ray must hit the surface"
    assert abs(c - 0.9) < 0.05, c
    # image corners: rays miss the sphere → NaN (the contract's no-info value)
    assert np.isnan(depth[0, 0]) and np.isnan(depth[-1, -1])
    # variance defined exactly where depth is
    assert np.isnan(var[0, 0]) and np.isfinite(var[18, 24])
    # variance near data should be small relative to signal variance
    assert var[18, 24] < 0.5


def test_variance_grows_off_data():
    """Fit only a hemisphere; rays hitting the unseen side carry more var."""
    pts, normals = _sphere_points(n=400)
    seen = pts[:, 2] > 0
    g = fit_gpis(pts[seen], normals[seen], lengthscale=0.1, noise=1e-3,
                 off_surface_eps=0.05)
    front = posterior(g, jnp.asarray([[0.0, 0.0, 0.3]]))[1]   # on seen side
    back = posterior(g, jnp.asarray([[0.0, 0.0, -0.3]]))[1]   # unseen side
    assert float(back[0]) > float(front[0])


def test_matern_kernel_fits():
    pts, normals = _sphere_points(n=200)
    g = fit_gpis(pts, normals, lengthscale=0.15, kernel="matern52")
    mean, _ = posterior(g, jnp.asarray(pts[:20]))
    assert float(jnp.abs(mean).max()) < 0.03


def test_no_phantom_surfaces_without_support():
    """r5 regression: rays far from every contact must report NaN, not the
    prior's zero-noise crossings (the ungated marcher reported 10x more
    phantom surfaces than real ones on the hard scene)."""
    pts, normals = _sphere_points(n=300)
    # contacts only on the +z cap — the -z hemisphere is unsupported
    cap = pts[:, 2] > 0.25
    g = fit_gpis(pts[cap], normals[cap], lengthscale=0.1, noise=1e-3,
                 off_surface_eps=0.05)
    cam = look_at_camera(eye=(0.0, 0.0, -1.2), width=32, height=24,
                         focal=40.0)
    depth, var = render_depth_var(g, cam, near=0.4, far=1.4, n_samples=96,
                                  pixel_chunk=256)
    depth = np.asarray(depth)
    # looking at the UNSEEN side: almost everything must be no-support NaN
    finite = np.isfinite(depth)
    assert finite.mean() < 0.2, f"phantom surfaces: {finite.mean():.0%}"


def test_depth_variance_is_metric():
    """The returned map is depth variance (m^2): near-contact readings must
    be far more certain than the support fringe."""
    pts, normals = _sphere_points(n=400)
    g = fit_gpis(pts, normals, lengthscale=0.12, noise=1e-3,
                 off_surface_eps=0.05)
    cam = look_at_camera(eye=(0.0, 0.0, 1.2), width=48, height=36,
                         focal=60.0)
    depth, var = render_depth_var(g, cam, near=0.4, far=1.4, n_samples=96,
                                  pixel_chunk=512)
    depth = np.asarray(depth)
    var = np.asarray(var)
    c = var[18, 24]                      # center: densely supported
    assert np.isfinite(c) and c < 0.01   # sub-10cm sigma at contacts
