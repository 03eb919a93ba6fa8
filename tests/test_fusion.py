"""Fusion/alignment/uncertainty parity vs the reference numpy code as oracle.

SURVEY.md §4 item 2: the reference's own functions (imported read-only from
/root/reference/utils) are the ground truth for our jnp rewrites.
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "/root/reference/utils")

from touchgs_tpu.touch import fusion as F
from touchgs_tpu.touch import uncertainty as U


@pytest.fixture(scope="module")
def ref():
    """Reference modules (oracle). Skip gracefully if unimportable."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import fuse_touch_vision as ref_fuse
        import create_uncertainty_from_depth as ref_unc
        return ref_fuse, ref_unc
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference oracle unavailable: {e}")


def _synthetic_maps(seed=0, h=48, w=64):
    rng = np.random.default_rng(seed)
    vision = rng.uniform(0.5, 3.0, (h, w)).astype(np.float64)
    touch = np.zeros((h, w))
    touch[10:30, 20:40] = rng.uniform(0.8, 1.2, (20, 20))
    touch_var = np.zeros((h, w))
    touch_var[10:30, 20:40] = rng.uniform(0.01, 0.5, (20, 20))
    grounded = np.zeros((h, w))
    mask = rng.random((h, w)) < 0.05
    grounded[mask] = (1.5 * vision + 0.3)[mask]
    return grounded, touch, vision, touch_var


def test_scale_offset_matches_scipy(ref):
    ref_fuse, _ = ref
    grounded, _, vision, _ = _synthetic_maps()
    s_ref, o_ref = ref_fuse.compute_scale_and_offset_best(
        grounded, vision, None, (0, None), (None, None)
    )
    s, o = F.compute_scale_and_offset(
        jnp.asarray(grounded, jnp.float32), jnp.asarray(vision, jnp.float32),
        (0.0, None), (None, None),
    )
    np.testing.assert_allclose(float(s), s_ref, rtol=1e-3)
    np.testing.assert_allclose(float(o), o_ref, rtol=1e-2, atol=1e-3)


def test_scale_offset_pinned_scale(ref):
    ref_fuse, _ = ref
    _, touch, vision, _ = _synthetic_maps()
    s_ref, o_ref = ref_fuse.compute_scale_and_offset_best(
        touch, vision, None, (1, 1), (None, None)
    )
    s, o = F.compute_scale_and_offset(
        jnp.asarray(touch, jnp.float32), jnp.asarray(vision, jnp.float32),
        (1.0, 1.0), (None, None),
    )
    assert float(s) == 1.0
    np.testing.assert_allclose(float(o), o_ref, rtol=1e-3, atol=1e-4)


def test_bayes_fusion_matches_reference(ref):
    ref_fuse, _ = ref
    _, touch, vision, touch_var = _synthetic_maps()
    vision_unc = 5.0 + 0.05 * vision
    with np.errstate(divide="ignore", invalid="ignore"):
        d_ref, u_ref = ref_fuse.fuse_depth_maps_with_uncertainty(
            touch, vision, touch_var.copy(), vision_unc.copy()
        )
    d, u = F.fuse_depth_maps_with_uncertainty(
        jnp.asarray(touch, jnp.float32), jnp.asarray(vision, jnp.float32),
        jnp.asarray(touch_var, jnp.float32), jnp.asarray(vision_unc, jnp.float32),
    )
    np.testing.assert_allclose(np.asarray(d), d_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(u), u_ref, rtol=1e-4, atol=1e-5)


def test_naive_fusion_matches_reference(ref):
    ref_fuse, _ = ref
    _, touch, vision, _ = _synthetic_maps()
    d_ref = ref_fuse.fuse_depth_maps(touch, vision)
    d = F.fuse_depth_maps(jnp.asarray(touch), jnp.asarray(vision))
    np.testing.assert_allclose(np.asarray(d), d_ref, atol=1e-6)


def test_uncertainty_main_path_matches_reference(ref):
    _, ref_unc = ref
    grounded, _, vision, _ = _synthetic_maps()
    u_ref = ref_unc.compute_uncertainty_map_with_edges(
        vision, grounded, edge_weight=0, distance_uncertainty_weight=0.05,
        proximity_weight=0.0, depth_difference_weight=0.0, dilation_size=5,
    )
    u = U.compute_uncertainty_map_with_edges(
        jnp.asarray(vision, jnp.float32), jnp.asarray(grounded, jnp.float32),
        edge_weight=0.0, distance_uncertainty_weight=0.05,
        proximity_weight=0.0, depth_difference_weight=0.0, dilation_size=5,
    )
    np.testing.assert_allclose(np.asarray(u), u_ref, rtol=1e-5, atol=1e-6)


def test_uncertainty_all_terms_match_reference(ref):
    """Non-default weights exercise EDT, Sobel edges, dilation, diff term."""
    _, ref_unc = ref
    grounded, _, vision, _ = _synthetic_maps(seed=7)
    kwargs = dict(edge_weight=2.0, distance_uncertainty_weight=0.1,
                  proximity_weight=0.5, depth_difference_weight=1.0,
                  dilation_size=2)
    u_ref = ref_unc.compute_uncertainty_map_with_edges(vision, grounded, **kwargs)
    u = U.compute_uncertainty_map_with_edges(
        jnp.asarray(vision, jnp.float32), jnp.asarray(grounded, jnp.float32),
        **kwargs,
    )
    np.testing.assert_allclose(np.asarray(u), u_ref, rtol=1e-3, atol=2e-3)


def test_align_vision_depth_semantics():
    """Stage-2 offset applies only at touch pixels; output non-negative."""
    grounded, touch, vision, _ = _synthetic_maps()
    res = F.align_vision_depth(
        jnp.asarray(grounded, jnp.float32), jnp.asarray(touch, jnp.float32),
        jnp.asarray(vision, jnp.float32), is_real_world=True,
    )
    assert float(res.vision_depth.min()) >= 0
    # untouched pixels: stage2 leaves stage1 values
    untouched = np.asarray(touch) == 0
    np.testing.assert_allclose(
        np.asarray(res.vision_depth)[untouched],
        np.asarray(res.ds_gs_visual_depth)[untouched],
        atol=1e-5,
    )
    # uncertainty = clip(0.05*depth, 0, 10) + 5 in main path
    u = np.asarray(res.vision_uncertainty)
    assert (u >= 5.0 - 1e-6).all() and (u <= 15.0 + 1e-6).all()


def test_fuse_view_end_to_end():
    grounded, touch, vision, touch_var = _synthetic_maps()
    out = F.fuse_view(
        jax.random.PRNGKey(0),
        jnp.asarray(grounded, jnp.float32), jnp.asarray(touch, jnp.float32),
        jnp.asarray(vision, jnp.float32), jnp.asarray(touch_var, jnp.float32),
        use_uncertainty=True, is_real_world=True,
    )
    for a in out:
        assert not bool(jnp.any(jnp.isnan(a)))
    assert float(out.fused_depth.min()) >= 0
    assert float(out.fused_uncertainty.max()) <= 10.0


def test_edt_matches_scipy():
    from scipy.ndimage import distance_transform_edt
    rng = np.random.default_rng(3)
    mask = rng.random((40, 56)) < 0.03  # sparse seeds
    ref_d = distance_transform_edt(~mask)
    d = np.sqrt(np.asarray(U.squared_edt(jnp.asarray(~mask))))
    np.testing.assert_allclose(d, ref_d, atol=1e-4)
