"""ZoeDepth (BEiT + metric bins) torch → JAX forward parity.

VERDICT r2 item 4: the reference's primary monodepth model is ZoeD_NK
(vision_utils/zoe_depth.py:3-10).  Tiny random-weight torch
``ZoeDepthForDepthEstimation`` models (single-head NYU and two-head NK with
patch-transformer routing) must produce the same metric depth through the
faithful JAX forward."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from touchgs_tpu.vision.zoedepth import (
    BinConfig,
    ZoeDepthArch,
    classify_domain,
    zoedepth_forward,
)
from tools.port_weights import port_state_dict


def _beit_cfg():
    from transformers import BeitConfig

    return BeitConfig(
        image_size=64, patch_size=16, hidden_size=32, num_hidden_layers=4,
        num_attention_heads=2, intermediate_size=64,
        use_relative_position_bias=True,
        use_shared_relative_position_bias=False,
        use_absolute_position_embeddings=False,
        layer_scale_init_value=0.1,
        out_indices=[1, 2, 3, 4],
        reshape_hidden_states=False,
        add_fpn=False,
    )


def _arch(bins, **kw):
    return ZoeDepthArch(
        hidden_size=32, num_layers=4, num_heads=2, intermediate_size=64,
        patch_size=16, image_size=64, backbone_out_indices=(1, 2, 3, 4),
        neck_hidden_sizes=(16, 24, 32, 32), fusion_hidden_size=24,
        bottleneck_features=24, num_relative_features=8,
        num_attractors=(4, 2, 2, 1), bin_configurations=bins, **kw)


def _tiny_zoe_single():
    from transformers import ZoeDepthConfig, ZoeDepthForDepthEstimation

    cfg = ZoeDepthConfig(
        backbone_config=_beit_cfg(),
        neck_hidden_sizes=[16, 24, 32, 32], fusion_hidden_size=24,
        bottleneck_features=24, num_relative_features=8,
        bin_embedding_dim=16, num_attractors=[4, 2, 2, 1],
        bin_centers_type="softplus",
        bin_configurations=[{"n_bins": 8, "min_depth": 1e-3,
                             "max_depth": 10.0}],
    )
    torch.manual_seed(0)
    model = ZoeDepthForDepthEstimation(cfg).eval()
    arch = _arch((BinConfig("nyu", 8, 1e-3, 10.0),))
    return model, arch


def _tiny_zoe_nk(bin_centers_type="softplus"):
    from transformers import ZoeDepthConfig, ZoeDepthForDepthEstimation

    cfg = ZoeDepthConfig(
        backbone_config=_beit_cfg(),
        neck_hidden_sizes=[16, 24, 32, 32], fusion_hidden_size=24,
        bottleneck_features=24, num_relative_features=8,
        bin_embedding_dim=16, num_attractors=[4, 2, 2, 1],
        bin_centers_type=bin_centers_type,
        bin_configurations=[
            {"name": "nyu", "n_bins": 8, "min_depth": 1e-3,
             "max_depth": 10.0},
            {"name": "kitti", "n_bins": 8, "min_depth": 1e-3,
             "max_depth": 80.0},
        ],
        num_patch_transformer_layers=4,
        patch_transformer_hidden_size=128,
        patch_transformer_intermediate_size=256,
        patch_transformer_num_attention_heads=4,
    )
    torch.manual_seed(1)
    model = ZoeDepthForDepthEstimation(cfg).eval()
    arch = _arch((BinConfig("nyu", 8, 1e-3, 10.0),
                  BinConfig("kitti", 8, 1e-3, 80.0)),
                 bin_centers_type=bin_centers_type)
    return model, arch


def test_zoedepth_single_head_parity():
    model, arch = _tiny_zoe_single()
    params = port_state_dict(model.state_dict())
    rng = np.random.default_rng(0)
    img = rng.uniform(-1, 1, (64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(img).permute(2, 0, 1)[None]
                    ).predicted_depth[0].numpy()
    out = np.asarray(zoedepth_forward(params, img, arch))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=5e-4, rtol=1e-3)


def test_zoedepth_nk_routing_and_parity():
    model, arch = _tiny_zoe_nk()
    params = port_state_dict(model.state_dict())
    rng = np.random.default_rng(1)
    img = rng.uniform(-1, 1, (64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        out_t = model(torch.from_numpy(img).permute(2, 0, 1)[None])
        ref = out_t.predicted_depth[0].numpy()
        ref_logits = out_t.domain_logits[0].numpy()

    # route the same way HF does (argmax over batch-summed softmax)
    from touchgs_tpu.vision.zoedepth import _beit_backbone, _neck

    taps, ph, pw = _beit_backbone(params, img[None], arch)
    _, bottleneck = _neck(params, taps, ph, pw, arch)
    logits = np.asarray(classify_domain(params, bottleneck, arch))[0]
    np.testing.assert_allclose(logits, ref_logits, atol=5e-4, rtol=1e-3)
    name = arch.bin_configurations[int(np.argmax(logits))].name

    out = np.asarray(zoedepth_forward(params, img, arch,
                                      bin_config_name=name))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=5e-4, rtol=1e-3)


def test_zoedepth_normed_bins_parity():
    """The 'normed' bin-centers variant (AttractorLayer with the preserved
    HF indexing bug + sorted, clipped centers)."""
    model, arch = _tiny_zoe_nk(bin_centers_type="normed")
    params = port_state_dict(model.state_dict())
    rng = np.random.default_rng(2)
    img = rng.uniform(-1, 1, (64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        out_t = model(torch.from_numpy(img).permute(2, 0, 1)[None])
        ref = out_t.predicted_depth[0].numpy()
    logits_name = arch.bin_configurations[0].name  # route manually to head 0
    out = np.asarray(zoedepth_forward(params, img, arch,
                                      bin_config_name=logits_name))
    # only compare when torch routed to the same head
    names = [b.name for b in arch.bin_configurations]
    t_name = names[int(np.argmax(out_t.domain_logits.sum(0).numpy()))]
    if t_name == logits_name:
        np.testing.assert_allclose(out, ref, atol=5e-4, rtol=1e-3)
    else:
        out = np.asarray(zoedepth_forward(params, img, arch,
                                          bin_config_name=t_name))
        np.testing.assert_allclose(out, ref, atol=5e-4, rtol=1e-3)


def test_zoedepth_nonnative_size_parity():
    """Relative-position-bias table interpolation path (non-square input)."""
    model, arch = _tiny_zoe_single()
    params = port_state_dict(model.state_dict())
    rng = np.random.default_rng(3)
    img = rng.uniform(-1, 1, (96, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(img).permute(2, 0, 1)[None]
                    ).predicted_depth[0].numpy()
    out = np.asarray(zoedepth_forward(params, img, arch))
    np.testing.assert_allclose(out, ref, atol=5e-3, rtol=5e-2)


def test_visual_pipeline_dispatch(tmp_path):
    """The three-way model_type switch (run_zoe_depth.py:63-65) picks the
    faithful architecture from a ported checkpoint's keys."""
    from touchgs_tpu.vision.monodepth import VisualPipeline

    model, _ = _tiny_zoe_single()
    params = port_state_dict(model.state_dict())
    path = tmp_path / "zoe.npz"
    np.savez(path, **params)

    pipe = VisualPipeline(model_type="zoe", image_size=(64, 64),
                          weights_path=str(path))
    assert pipe._faithful
    rng = np.random.default_rng(0)
    rgb = rng.uniform(0, 255, (50, 70, 3)).astype(np.uint8)
    depth = pipe.predict_depth(rgb)
    assert depth.shape == (50, 70)
    assert np.isfinite(depth).all() and (depth >= 0).all()
