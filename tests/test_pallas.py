"""Pallas rasterizer parity vs the tiled/dense oracles (interpret mode on CPU).

SURVEY.md §7 stage 4: "Validate allclose vs. stage-2 oracle on rendered
RGB+depth and pixel grads."
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from touchgs_tpu.config import RasterizeConfig
from touchgs_tpu.ops.projection import project_gaussians
from touchgs_tpu.ops.rasterize_pallas import rasterize_pallas
from touchgs_tpu.ops.rasterize_tiled import rasterize_tiled

from tests.synthetic import look_at_camera, random_gaussians


@pytest.fixture(scope="module")
def scene():
    means, quats, scales, colors, opacities = random_gaussians(300, seed=5)
    cam = look_at_camera(width=256, height=64)  # 2x8 tiles of 8x128
    cfg = RasterizeConfig()
    proj = project_gaussians(
        means, quats, scales, cam.w2c, cam.fx, cam.fy, cam.cx, cam.cy,
        cam.width, cam.height, cfg,
    )
    return cam, cfg, proj, colors, opacities


def test_pallas_forward_matches_tiled(scene):
    cam, cfg, proj, colors, opacities = scene
    ref = rasterize_tiled(proj, colors, opacities, cam.width, cam.height, cfg,
                          k_tile=512)
    out = rasterize_pallas(proj, colors, opacities, cam.width, cam.height,
                           cfg, k_tile=512, interpret=True)
    np.testing.assert_allclose(out.rgb, ref.rgb, atol=3e-5)
    np.testing.assert_allclose(out.acc, ref.acc, atol=3e-5)
    np.testing.assert_allclose(out.depth, ref.depth, atol=3e-4)


def test_pallas_background(scene):
    cam, cfg, proj, colors, opacities = scene
    bg = jnp.array([0.2, 0.4, 0.6])
    ref = rasterize_tiled(proj, colors, opacities, cam.width, cam.height, cfg,
                          k_tile=512, background=bg)
    out = rasterize_pallas(proj, colors, opacities, cam.width, cam.height,
                           cfg, k_tile=512, background=bg, interpret=True)
    np.testing.assert_allclose(out.rgb, ref.rgb, atol=3e-5)


def test_pallas_grads_match_tiled(scene):
    cam, cfg, proj, colors, opacities = scene
    target = jnp.zeros((cam.height, cam.width, 3))
    bg = jnp.array([0.1, 0.1, 0.1])

    def loss_with(rfn):
        def fn(means2d_off, colors, opacities):
            p = proj._replace(means2d=proj.means2d + means2d_off)
            out = rfn(p, colors, opacities)
            return (jnp.mean((out.rgb - target) ** 2)
                    + 0.3 * jnp.mean(out.depth) + 0.1 * jnp.mean(out.acc))
        return fn

    f_ref = loss_with(lambda p, c, o: rasterize_tiled(
        p, c, o, cam.width, cam.height, cfg, k_tile=512, background=bg))
    f_pal = loss_with(lambda p, c, o: rasterize_pallas(
        p, c, o, cam.width, cam.height, cfg, k_tile=512, background=bg,
        interpret=True))

    off0 = jnp.zeros_like(proj.means2d)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(off0, colors, opacities)
    g_pal = jax.grad(f_pal, argnums=(0, 1, 2))(off0, colors, opacities)

    for a, b, name in zip(g_pal, g_ref, ("means2d", "colors", "opacities")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-6,
            err_msg=f"grad mismatch: {name}",
        )


def test_pallas_grad_finite_diff(scene):
    """Independent check: directional derivative vs finite differences."""
    cam, cfg, proj, colors, opacities = scene

    def f(opacities):
        out = rasterize_pallas(proj, colors, opacities, cam.width, cam.height,
                               cfg, k_tile=512, interpret=True)
        return jnp.mean(out.rgb**2)

    g = jax.grad(f)(opacities)
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.normal(size=opacities.shape).astype(np.float32))
    eps = 1e-3
    fd = (f(opacities + eps * v) - f(opacities - eps * v)) / (2 * eps)
    np.testing.assert_allclose(float(jnp.vdot(g, v)), float(fd), rtol=2e-2)


def test_invalid_k_chunk_rejected():
    """k_chunk must keep k_tile 128-aligned for the slot-list DMA roll
    (r5: k_chunk=96 rounds k_tile 512->576 and Mosaic rejects the
    unaligned dynamic rotate at compile time — fail fast instead)."""
    import pytest

    from touchgs_tpu.config import RasterizeConfig
    from touchgs_tpu.ops.projection import project_gaussians
    from touchgs_tpu.ops.rasterize_pallas import rasterize_pallas
    from tests.synthetic import look_at_camera, random_gaussians

    means, quats, scales, colors, opac = random_gaussians(64, seed=0)
    cam = look_at_camera(eye=(1.0, 1.0, 1.0), width=64, height=64)
    cfg = RasterizeConfig()
    proj = project_gaussians(means, quats, scales, cam.w2c, cam.fx, cam.fy,
                             cam.cx, cam.cy, 64, 64, cfg)
    with pytest.raises(ValueError, match="k_chunk"):
        rasterize_pallas(proj, colors, opac, 64, 64, cfg, k_chunk=96,
                         interpret=True)
