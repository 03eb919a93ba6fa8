"""Tile-list truncation quantification (VERDICT r2 task 7).

The tile kernels cap per-tile entry lists at ``k_tile`` (front-biased:
nearest-first, so dropped entries sit behind the composited ones).  The
bench reports the dropped-pair fraction and the count of lossy-truncated
tiles (capped AND unsaturated); this test bounds the actual image error
under forced truncation: contributions dropped at cap k carry total weight
≤ max(T_k) over the tile, so saturated tiles truncate exactly and
unsaturated ones degrade gracefully."""
import jax.numpy as jnp
import numpy as np

from touchgs_tpu.config import RasterizeConfig
from touchgs_tpu.ops.projection import project_gaussians
from touchgs_tpu.ops.rasterize_tiled import rasterize_tiled
from tests.synthetic import look_at_camera, random_gaussians


def _render(k_tile, means, quats, scales, colors, opac, cam, cfg):
    proj = project_gaussians(means, quats, scales, cam.w2c, cam.fx, cam.fy,
                             cam.cx, cam.cy, cam.width, cam.height, cfg,
                             opacities=opac)
    return rasterize_tiled(proj, colors, opac, cam.width, cam.height, cfg,
                           k_tile=k_tile,
                           background=jnp.array([0.1, 0.1, 0.1]))


def test_truncation_error_bounded_by_transmittance():
    means, quats, scales, colors, opac = random_gaussians(3000, seed=2)
    # dense, mostly-opaque cloud: tiles saturate early
    opac = jnp.clip(opac * 1.5, 0.0, 0.98)
    cam = look_at_camera(eye=(0.6, 0.6, 0.8), width=96, height=96,
                         focal=120.0)
    cfg = RasterizeConfig()

    full = _render(1024, means, quats, scales, colors, opac, cam, cfg)
    for k in (256, 128):
        trunc = _render(k, means, quats, scales, colors, opac, cam, cfg)
        err = np.abs(np.asarray(trunc.rgb) - np.asarray(full.rgb))
        # the dropped tail's total compositing weight is bounded by the
        # transmittance remaining at the cap — measure it from the truncated
        # render's accumulation and check the error honors it (colors ≤ ~1,
        # plus fp slack)
        t_remaining = np.asarray(1.0 - trunc.acc)
        bound = t_remaining[..., None] + 2e-3
        assert (err <= bound + 1e-6).all(), (
            float(err.max()), float(bound[err.argmax() // err.shape[-1] //
                                          err.shape[1]].max()))

    # saturated-region truncation is visually lossless: where the truncated
    # render already absorbed (T < 1e-3), the full render matches tightly
    trunc = _render(128, means, quats, scales, colors, opac, cam, cfg)
    sat = np.asarray(trunc.acc) > 1.0 - 1e-3
    if sat.any():
        err = np.abs(np.asarray(trunc.rgb) - np.asarray(full.rgb))[sat]
        assert err.max() < 5e-3, float(err.max())


def test_truncation_stats_helper():
    """The dropped-pair fraction the bench prints is derivable from
    TileBins alone; sanity-check the arithmetic on a known distribution."""
    from touchgs_tpu.ops.tiles import bin_gaussians

    means, quats, scales, colors, opac = random_gaussians(2000, seed=0)
    cam = look_at_camera(eye=(0.9, 0.9, 0.9), width=320, height=240,
                         focal=260.0)
    cfg = RasterizeConfig()
    proj = project_gaussians(means, quats, scales, cam.w2c, cam.fx, cam.fy,
                             cam.cx, cam.cy, cam.width, cam.height, cfg,
                             opacities=opac)
    bins = bin_gaussians(proj, cam.width, cam.height, cfg)
    counts = np.asarray(bins.tile_counts, np.int64)
    total = counts.sum()
    kept = np.minimum(counts, cfg.k_tile).sum()
    assert 0 < kept <= total
    # this scene fits under the cap comfortably
    assert kept == total
