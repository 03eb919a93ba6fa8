"""Poisson reconstruction + marching tetrahedra + offscreen depth render
(the read_point_cloud.py:399-483 capability, SURVEY.md §2.6)."""
import numpy as np

from tests.synthetic import look_at_camera
from touchgs_tpu.data.meshing import (
    estimate_normals,
    marching_tetrahedra,
    point_cloud_to_depth_via_mesh,
    poisson_indicator,
    render_mesh_depth,
)


def _sphere_cloud(n=3000, r=0.5, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return v * r


def test_estimate_normals_sphere():
    pts = _sphere_cloud()
    nrm = estimate_normals(pts, viewpoint=np.array([0, 0, 5.0], np.float32))
    # sphere normals are radial; check alignment on the +z hemisphere where
    # the viewpoint orientation is unambiguous
    top = pts[:, 2] > 0.2
    cos = np.einsum("ni,ni->n", nrm[top],
                    pts[top] / np.linalg.norm(pts[top], axis=1, keepdims=True))
    assert np.mean(np.abs(cos)) > 0.9


def test_poisson_marching_sphere_surface():
    pts = _sphere_cloud(4000)
    nrm = pts / np.linalg.norm(pts, axis=1, keepdims=True)  # exact normals
    chi, origin, spacing, level = poisson_indicator(pts, nrm, grid_res=64)
    verts, faces = marching_tetrahedra(np.asarray(chi), float(level),
                                       np.asarray(origin), float(spacing))
    assert len(faces) > 500
    radii = np.linalg.norm(verts, axis=1)
    # reconstructed zero level set hugs the r=0.5 sphere
    assert abs(np.median(radii) - 0.5) < 0.06
    assert np.percentile(np.abs(radii - 0.5), 90) < 0.1


def test_render_mesh_depth_analytic():
    # a simple quad at z-plane in front of the camera
    cam = look_at_camera(eye=(0, 0, 2.0), width=64, height=64, focal=64.0)
    verts = np.array([[-0.5, -0.5, 0], [0.5, -0.5, 0], [0.5, 0.5, 0],
                      [-0.5, 0.5, 0]], np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    depth = np.asarray(render_mesh_depth(verts, faces, cam,
                                         max_pixels_per_face=4096))
    center = depth[32, 32]
    assert abs(center - 2.0) < 1e-3          # plane is 2m from the eye
    assert (depth > 0).mean() > 0.05         # quad covers part of the view
    assert depth.max() < 2.5


def test_full_pipeline_sphere_depth():
    pts = _sphere_cloud(4000)
    cam = look_at_camera(eye=(0, 0, 2.0), width=48, height=48, focal=48.0)
    depth = np.asarray(point_cloud_to_depth_via_mesh(
        pts, cam, grid_res=48, max_pixels_per_face=256))
    hit = depth > 0
    assert hit.mean() > 0.05
    # nearest surface point toward the camera is ~1.5m away
    assert abs(depth[hit].min() - 1.5) < 0.15
