"""Depth-Anything (DINOv2 + DPT neck) torch → JAX forward parity.

VERDICT r2 item 4 (second architecture of the reference's monodepth switch,
run_zoe_depth.py:63-65): a tiny random-weight torch
``DepthAnythingForDepthEstimation`` must produce the same depth map through
the faithful JAX forward."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from touchgs_tpu.vision.depth_anything import (
    DepthAnythingArch,
    arch_from_params,
    depth_anything_forward,
)
from tools.port_weights import port_state_dict


def _tiny_da(depth_estimation_type="relative", max_depth=None):
    from transformers import (DepthAnythingConfig,
                              DepthAnythingForDepthEstimation, Dinov2Config)

    backbone = Dinov2Config(
        image_size=56, patch_size=14, hidden_size=32, num_hidden_layers=4,
        num_attention_heads=2, mlp_ratio=4,
        out_indices=[1, 2, 3, 4],
        apply_layernorm=True, reshape_hidden_states=False,
    )
    cfg = DepthAnythingConfig(
        backbone_config=backbone, patch_size=14, reassemble_hidden_size=32,
        neck_hidden_sizes=[16, 24, 32, 32], fusion_hidden_size=24,
        head_hidden_size=16, head_in_index=-1,
        depth_estimation_type=depth_estimation_type, max_depth=max_depth,
    )
    torch.manual_seed(0)
    model = DepthAnythingForDepthEstimation(cfg).eval()
    arch = DepthAnythingArch(
        hidden_size=32, num_layers=4, num_heads=2, mlp_ratio=4,
        patch_size=14, image_size=56, out_indices=(1, 2, 3, 4),
        reassemble_hidden_size=32, neck_hidden_sizes=(16, 24, 32, 32),
        fusion_hidden_size=24, head_hidden_size=16,
        depth_estimation_type=depth_estimation_type,
        max_depth=max_depth or 1.0)
    return model, arch


def test_depth_anything_forward_parity():
    model, arch = _tiny_da()
    params = port_state_dict(model.state_dict())

    rng = np.random.default_rng(0)
    img = rng.uniform(-1, 1, (56, 56, 3)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(img).permute(2, 0, 1)[None]
                    ).predicted_depth[0].numpy()
    out = np.asarray(depth_anything_forward(params, img, arch))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


def test_depth_anything_parity_nonnative_size():
    """Pos-embed bicubic interpolation path (input ≠ native grid)."""
    model, arch = _tiny_da()
    params = port_state_dict(model.state_dict())
    rng = np.random.default_rng(1)
    img = rng.uniform(-1, 1, (84, 84, 3)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(img).permute(2, 0, 1)[None]
                    ).predicted_depth[0].numpy()
    out = np.asarray(depth_anything_forward(params, img, arch))
    # bicubic interpolation differs slightly between torch and jax.image at
    # the borders; interior must match tightly
    np.testing.assert_allclose(out[8:-8, 8:-8], ref[8:-8, 8:-8],
                               atol=5e-3, rtol=5e-2)


def test_depth_anything_metric_head():
    model, arch = _tiny_da("metric", max_depth=20.0)
    params = port_state_dict(model.state_dict())
    rng = np.random.default_rng(2)
    img = rng.uniform(-1, 1, (56, 56, 3)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(img).permute(2, 0, 1)[None]
                    ).predicted_depth[0].numpy()
    out = np.asarray(depth_anything_forward(params, img, arch))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)
    assert (out <= 20.0).all() and (out >= 0).all()


def test_arch_from_params():
    model, arch = _tiny_da()
    params = port_state_dict(model.state_dict())
    got = arch_from_params(params)
    assert got.hidden_size == arch.hidden_size
    assert got.num_layers == arch.num_layers
    assert got.patch_size == arch.patch_size
    assert got.out_indices == arch.out_indices
    assert got.neck_hidden_sizes == arch.neck_hidden_sizes
    assert got.fusion_hidden_size == arch.fusion_hidden_size
