"""Point-cloud → surface → offscreen depth rendering (TPU-native).

Capability-parity rebuild of the reference's Open3D pipeline at
``data_preprocessing/vision/point_cloud/read_point_cloud.py:399-483``
(estimate normals → Poisson surface reconstruction → offscreen depth
render), redesigned for XLA instead of wrapping a CPU mesh library:

- ``estimate_normals`` — k-NN PCA normals (chunked brute-force distances,
  orientation flipped toward a viewpoint), the
  ``pcd.estimate_normals`` analogue.
- ``poisson_indicator`` — screened-Poisson-style reconstruction as an FFT
  solve: splat the oriented normal field onto a regular grid (trilinear
  scatter), solve ∇²χ = ∇·V spectrally, shift by the mean indicator value
  at the input samples → zero-level-set surface.  One batched FFT instead
  of an octree — the TPU-native formulation of ``create_from_point_cloud_
  poisson``.
- ``marching_tetrahedra`` — zero-isosurface triangulation (6 tets/cell;
  small case tables, fully vectorized) → (verts, faces).
- ``render_mesh_depth`` — offscreen z-buffer depth: project triangles,
  enumerate a capped pixel-footprint per face (same static-shape trick as
  ``ops/tiles.py``), barycentric inside-test, scatter-min depth.  The
  ``o3d OffscreenRenderer`` analogue.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


# ------------------------------------------------------------ normals

def estimate_normals(points: np.ndarray, k: int = 16,
                     viewpoint=None, chunk: int = 1024) -> np.ndarray:
    """k-NN PCA normals, oriented toward ``viewpoint`` (default centroid+z)."""
    pts = np.asarray(points, np.float32)
    n = len(pts)
    k = min(k, n - 1)
    normals = np.zeros_like(pts)
    for s in range(0, n, chunk):
        blk = pts[s:s + chunk]
        d2 = ((blk[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
        idx = np.argpartition(d2, k + 1, axis=1)[:, : k + 1]
        nb = pts[idx]                                  # (b, k+1, 3)
        nb = nb - nb.mean(axis=1, keepdims=True)
        cov = np.einsum("bki,bkj->bij", nb, nb) / (k + 1)
        _, vecs = np.linalg.eigh(cov)
        normals[s:s + chunk] = vecs[:, :, 0]           # smallest eigenvector
    if viewpoint is None:
        viewpoint = pts.mean(0) + np.array([0, 0, 10.0], np.float32)
    flip = np.einsum("ni,ni->n", viewpoint[None] - pts, normals) < 0
    normals[flip] *= -1
    return normals


# ------------------------------------------------------- poisson solve

def poisson_indicator(points, normals, grid_res: int = 96, pad: float = 0.15,
                      screen: float = 1e-2):
    """FFT Poisson reconstruction → (grid (R,R,R), origin (3,), spacing).

    Solves (∇² − screen)χ = ∇·V for the indicator-like field χ, where V is
    the normal field splatted onto the grid; the surface is χ = level with
    ``level`` = mean χ at the sample points (also returned)."""
    pts = jnp.asarray(points, jnp.float32)
    nrm = jnp.asarray(normals, jnp.float32)
    lo = pts.min(0)
    hi = pts.max(0)
    span = jnp.max(hi - lo)
    origin = lo - pad * span
    spacing = (span * (1 + 2 * pad)) / (grid_res - 1)

    # trilinear scatter of the normal field
    g = (pts - origin) / spacing
    g0 = jnp.floor(g).astype(jnp.int32)
    f = g - g0
    R = grid_res
    V = jnp.zeros((R, R, R, 3), jnp.float32)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                wgt = (jnp.where(dx, f[:, 0], 1 - f[:, 0])
                       * jnp.where(dy, f[:, 1], 1 - f[:, 1])
                       * jnp.where(dz, f[:, 2], 1 - f[:, 2]))
                idx = jnp.clip(g0 + jnp.array([dx, dy, dz]), 0, R - 1)
                V = V.at[idx[:, 0], idx[:, 1], idx[:, 2]].add(
                    wgt[:, None] * nrm)

    # divergence via central differences
    def ddx(a, axis):
        return (jnp.roll(a, -1, axis) - jnp.roll(a, 1, axis)) / (2 * spacing)

    div = ddx(V[..., 0], 0) + ddx(V[..., 1], 1) + ddx(V[..., 2], 2)

    # spectral solve: χ̂ = div̂ / (−k² − screen)
    kx = jnp.fft.fftfreq(R) * 2 * jnp.pi / spacing
    k2 = (kx[:, None, None] ** 2 + kx[None, :, None] ** 2
          + kx[None, None, :] ** 2)
    denom = -(k2 + screen)
    chi = jnp.real(jnp.fft.ifftn(jnp.fft.fftn(div) / denom))

    # iso level = mean χ at the samples (Kazhdan's convention)
    gi = jnp.clip(jnp.round(g).astype(jnp.int32), 0, R - 1)
    level = jnp.mean(chi[gi[:, 0], gi[:, 1], gi[:, 2]])
    return chi, origin, spacing, level


# --------------------------------------------------- marching tetrahedra

# 6 tetrahedra per cube (corner indices into the 8 cube corners)
_TETS = np.array([[0, 5, 1, 6], [0, 1, 2, 6], [0, 2, 3, 6],
                  [0, 3, 7, 6], [0, 7, 4, 6], [0, 4, 5, 6]], np.int32)
_CORNERS = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                     [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]], np.int32)
# per 4-bit sign case: up to 2 triangles, as edge pairs (i, j) of the tet
_TET_EDGES = {
    0b0001: [[(0, 1), (0, 2), (0, 3)]],
    0b0010: [[(1, 0), (1, 3), (1, 2)]],
    0b0100: [[(2, 0), (2, 1), (2, 3)]],
    0b1000: [[(3, 0), (3, 2), (3, 1)]],
    0b0011: [[(0, 2), (1, 3), (0, 3)], [(0, 2), (1, 2), (1, 3)]],
    0b0101: [[(0, 1), (2, 3), (0, 3)], [(0, 1), (1, 2), (2, 3)]],
    0b0110: [[(1, 0), (2, 3), (1, 3)], [(1, 0), (2, 0), (2, 3)]],
}


def marching_tetrahedra(grid: np.ndarray, level: float, origin, spacing):
    """Zero-isosurface of ``grid - level`` → (verts (V,3), faces (F,3))."""
    vol = np.asarray(grid, np.float32) - float(level)
    R = vol.shape[0]
    cells = R - 1
    # corner values per cell: (cells³, 8)
    base = np.stack(np.meshgrid(np.arange(cells), np.arange(cells),
                                np.arange(cells), indexing="ij"),
                    axis=-1).reshape(-1, 3)
    cvals = np.stack([vol[base[:, 0] + c[0], base[:, 1] + c[1],
                          base[:, 2] + c[2]] for c in _CORNERS], axis=1)
    triangles = []  # list of (n, 3 verts, 3 xyz) blocks
    for tet in _TETS:
        tv = cvals[:, tet]                              # (C, 4)
        case = ((tv < 0) << np.arange(4)).sum(axis=1)
        case = np.where(case > 0b0111, case ^ 0b1111, case)  # sign symmetry
        for c, tris in _TET_EDGES.items():
            sel = np.nonzero(case == c)[0]
            if len(sel) == 0:
                continue
            for tri in tris:
                block = np.empty((len(sel), 3, 3), np.float32)
                for vi_idx, (i, j) in enumerate(tri):
                    vi = tv[sel, i]
                    vj = tv[sel, j]
                    denom = vi - vj
                    t = vi / np.where(np.abs(denom) < 1e-12, 1e-12, denom)
                    pi = (base[sel] + _CORNERS[tet[i]]).astype(np.float32)
                    pj = (base[sel] + _CORNERS[tet[j]]).astype(np.float32)
                    block[:, vi_idx] = pi + t[:, None] * (pj - pi)
                triangles.append(block)
    if not triangles:
        return (np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32))
    verts = np.concatenate(triangles).reshape(-1, 3)
    faces = np.arange(len(verts), dtype=np.int32).reshape(-1, 3)
    verts = np.asarray(origin)[None] + verts * float(spacing)
    return verts, faces


# ----------------------------------------------------- offscreen render

def render_mesh_depth(verts, faces, camera, max_pixels_per_face: int = 64):
    """Z-buffer triangle depth render → (H, W) float32 (0 = no hit).

    Static-shape rasterization: each face enumerates up to
    ``max_pixels_per_face`` pixels of its screen bbox (row-major), does the
    barycentric inside-test, and scatter-mins interpolated depth."""
    W, H = camera.width, camera.height
    v = jnp.asarray(verts, jnp.float32)
    f = jnp.asarray(faces, jnp.int32)
    ones = jnp.ones((v.shape[0], 1), v.dtype)
    vc = (jnp.concatenate([v, ones], axis=1) @ camera.w2c.T)[:, :3]
    z = vc[:, 2]
    x = vc[:, 0] / jnp.maximum(z, 1e-9) * camera.fx + camera.cx
    y = vc[:, 1] / jnp.maximum(z, 1e-9) * camera.fy + camera.cy
    tri_x = x[f]                                        # (F, 3)
    tri_y = y[f]
    tri_z = z[f]
    valid = jnp.all(tri_z > 1e-6, axis=1)

    x0 = jnp.clip(jnp.floor(tri_x.min(1)), 0, W - 1).astype(jnp.int32)
    x1 = jnp.clip(jnp.ceil(tri_x.max(1)), 0, W - 1).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(tri_y.min(1)), 0, H - 1).astype(jnp.int32)
    y1 = jnp.clip(jnp.ceil(tri_y.max(1)), 0, H - 1).astype(jnp.int32)
    bw = x1 - x0 + 1
    k = jnp.arange(max_pixels_per_face, dtype=jnp.int32)[None, :]
    px = x0[:, None] + k % bw[:, None]
    py = y0[:, None] + k // bw[:, None]
    in_bbox = (px <= x1[:, None]) & (py <= y1[:, None]) & valid[:, None]

    cx = px.astype(jnp.float32) + 0.5
    cy = py.astype(jnp.float32) + 0.5
    ax, ay = tri_x[:, 0:1], tri_y[:, 0:1]
    bx, by = tri_x[:, 1:2], tri_y[:, 1:2]
    gx, gy = tri_x[:, 2:3], tri_y[:, 2:3]
    den = (by - gy) * (ax - gx) + (gx - bx) * (ay - gy)
    den = jnp.where(jnp.abs(den) < 1e-12, 1e-12, den)
    w0 = ((by - gy) * (cx - gx) + (gx - bx) * (cy - gy)) / den
    w1 = ((gy - ay) * (cx - gx) + (ax - gx) * (cy - gy)) / den
    w2 = 1.0 - w0 - w1
    inside = (w0 >= -1e-6) & (w1 >= -1e-6) & (w2 >= -1e-6) & in_bbox
    pz = w0 * tri_z[:, 0:1] + w1 * tri_z[:, 1:2] + w2 * tri_z[:, 2:3]

    flat = jnp.where(inside, py * W + px, H * W)        # OOB slot dropped
    zbuf = jnp.full((H * W + 1,), jnp.inf, jnp.float32)
    zbuf = zbuf.at[flat.ravel()].min(jnp.where(inside, pz, jnp.inf).ravel(),
                                     mode="drop")
    depth = zbuf[: H * W].reshape(H, W)
    return jnp.where(jnp.isfinite(depth), depth, 0.0)


def point_cloud_to_depth_via_mesh(points, camera, normals=None,
                                  grid_res: int = 96,
                                  max_pixels_per_face: int = 64):
    """The full read_point_cloud.py:399-483 pipeline in one call."""
    pts = np.asarray(points, np.float32)
    if normals is None:
        eye = np.asarray(camera.c2w[:3, 3], np.float32)
        normals = estimate_normals(pts, viewpoint=eye)
    chi, origin, spacing, level = poisson_indicator(pts, normals, grid_res)
    verts, faces = marching_tetrahedra(np.asarray(chi), float(level),
                                       np.asarray(origin), float(spacing))
    if len(faces) == 0:
        import jax.numpy as _jnp

        return _jnp.zeros((camera.height, camera.width), _jnp.float32)
    return render_mesh_depth(verts, faces, camera,
                             max_pixels_per_face=max_pixels_per_face)
