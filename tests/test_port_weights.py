"""Weight-porting round-trip: torch model → npz → JAX forward parity.

VERDICT r1 item 4: prove the torch→JAX mapping with a synthetically-built
torch-layout model (no network access needed) — a tiny DPTForDepthEstimation
with random weights must produce the same depth map through our faithful JAX
forward as through transformers' torch forward.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from touchgs_tpu.vision.dpt import DPTArch, dpt_forward
from tools.port_weights import port_dpt, port_state_dict


def _tiny_dpt():
    from transformers import DPTConfig, DPTForDepthEstimation

    cfg = DPTConfig(
        hidden_size=32, num_hidden_layers=4, num_attention_heads=2,
        intermediate_size=64, image_size=64, patch_size=16,
        backbone_out_indices=[0, 1, 2, 3],
        neck_hidden_sizes=[16, 24, 32, 32], fusion_hidden_size=24,
        readout_type="project",
    )
    torch.manual_seed(0)
    model = DPTForDepthEstimation(cfg).eval()
    arch = DPTArch(hidden_size=32, num_layers=4, num_heads=2,
                   intermediate_size=64, patch_size=16, image_size=64,
                   backbone_out_indices=(0, 1, 2, 3),
                   neck_hidden_sizes=(16, 24, 32, 32), fusion_hidden_size=24)
    return model, arch


def test_dpt_port_forward_parity():
    model, arch = _tiny_dpt()
    params = port_dpt(model.state_dict())

    rng = np.random.default_rng(0)
    img = rng.uniform(-1, 1, (64, 64, 3)).astype(np.float32)

    with torch.no_grad():
        ref = model(torch.from_numpy(img).permute(2, 0, 1)[None]
                    ).predicted_depth[0].numpy()

    out = np.asarray(dpt_forward(params, img, arch))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


def test_dpt_port_parity_nonnative_size():
    """Pos-embed interpolation path: input size != config.image_size."""
    model, arch = _tiny_dpt()
    params = port_dpt(model.state_dict())
    rng = np.random.default_rng(1)
    img = rng.uniform(-1, 1, (96, 96, 3)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(img).permute(2, 0, 1)[None]
                    ).predicted_depth[0].numpy()
    out = np.asarray(dpt_forward(params, img, arch))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=5e-4, rtol=1e-3)


def test_generic_layout_rules():
    """Conv/ConvT/Linear layout conversion against torch ops directly."""
    import torch.nn as nn

    torch.manual_seed(1)
    x = torch.randn(1, 3, 16, 16)

    conv = nn.Conv2d(3, 5, 3, padding=1)
    lin = nn.Linear(7, 4)
    ct = nn.ConvTranspose2d(3, 6, 2, stride=2)

    sd = {"conv.weight": conv.weight, "conv.bias": conv.bias,
          "lin.weight": lin.weight, "lin.bias": lin.bias,
          "ct.weight": ct.weight, "ct.bias": ct.bias,
          "bn.num_batches_tracked": torch.tensor(3)}
    p = port_state_dict(sd)
    assert "bn.num_batches_tracked" not in p
    assert p["conv.weight"].shape == (3, 3, 3, 5)
    assert p["lin.weight"].shape == (7, 4)
    assert p["ct.weight"].shape == (2, 2, 6, 3)  # (kh, kw, O, I)

    import jax
    import jax.numpy as jnp

    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    y = jax.lax.conv_general_dilated(
        xj, jnp.asarray(p["conv.weight"]), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["conv.bias"]
    with torch.no_grad():
        yt = conv(x).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(y), yt, atol=1e-5)

    yct = jax.lax.conv_transpose(
        xj, jnp.asarray(p["ct.weight"]), (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        transpose_kernel=True) + p["ct.bias"]
    with torch.no_grad():
        ytc = ct(x).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(yct), ytc, atol=1e-5)


def test_visual_pipeline_uses_ported_dpt(tmp_path):
    """End-to-end: ported npz → VisualPipeline picks the faithful DPT."""
    model, arch = _tiny_dpt()
    params = port_dpt(model.state_dict())
    npz = tmp_path / "dpt_tiny.npz"
    np.savez(npz, **params)

    from touchgs_tpu.vision.monodepth import VisualPipeline

    pipe = VisualPipeline(model_type="zoe", image_size=(64, 64),
                          weights_path=str(npz))
    assert pipe._faithful
    rng = np.random.default_rng(2)
    rgb = rng.integers(0, 255, (80, 100, 3), dtype=np.uint8)
    depth = pipe.predict_depth(rgb)
    assert depth.shape == (80, 100)
    assert np.isfinite(depth).all() and (depth >= 0).all()

    # and the numbers match torch end-to-end (same preprocessing)
    img = pipe._dpt_preprocess(rgb, 64)
    with torch.no_grad():
        ref = model(torch.from_numpy(np.asarray(img)).permute(2, 0, 1)[None]
                    ).predicted_depth[0].numpy()
    out = np.asarray(pipe._apply(pipe.params, img))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


def test_lpips_vgg_parity(tmp_path, monkeypatch):
    """Faithful LPIPS: torch-side LPIPS computation (VGG taps + unit-norm +
    1x1 lin convs + spatial mean) ports onto eval.lpips_vgg exactly."""
    import torch.nn as nn
    import torch.nn.functional as F

    from touchgs_tpu.eval.lpips_vgg import lpips_vgg

    # scaled-down VGG16 (same torchvision indices, narrower channels)
    chans = (8, 16, 32, 32, 32)
    convs = ((0, 2), (5, 7), (10, 12, 14), (17, 19, 21), (24, 26, 28))
    torch.manual_seed(0)
    feats = {}
    cin = 3
    for bi, block in enumerate(convs):
        for ci in block:
            feats[ci] = nn.Conv2d(cin, chans[bi], 3, padding=1)
            cin = chans[bi]
    lins = [nn.Conv2d(c, 1, 1, bias=False) for c in chans]
    for l in lins:
        l.weight.data.abs_()

    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def torch_taps(x):
        taps = []
        for bi, block in enumerate(convs):
            for ci in block:
                x = F.relu(feats[ci](x))
            taps.append(x)
            if bi < len(convs) - 1:
                x = F.max_pool2d(x, 2)
        return taps

    def torch_lpips(a, b):
        a = ((a * 2 - 1) - shift) / scale
        b = ((b * 2 - 1) - shift) / scale
        ta, tb = torch_taps(a), torch_taps(b)
        tot = 0.0
        for k, (fa, fb) in enumerate(zip(ta, tb)):
            na = fa / (fa.norm(dim=1, keepdim=True) + 1e-10)
            nb = fb / (fb.norm(dim=1, keepdim=True) + 1e-10)
            tot = tot + lins[k]((na - nb) ** 2).mean()
        return tot

    sd = {}
    for ci, m in feats.items():
        sd[f"features.{ci}.weight"] = m.weight
        sd[f"features.{ci}.bias"] = m.bias
    for k, l in enumerate(lins):
        sd[f"lin{k}.model.1.weight"] = l.weight
    params = {k: np.asarray(v) for k, v in port_state_dict(sd).items()}

    rng = np.random.default_rng(0)
    img0 = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    img1 = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = float(torch_lpips(
            torch.from_numpy(img0).permute(2, 0, 1)[None],
            torch.from_numpy(img1).permute(2, 0, 1)[None]))
    import jax.numpy as jnp
    out = float(lpips_vgg({k: jnp.asarray(v) for k, v in params.items()},
                          img0, img1, convs))
    np.testing.assert_allclose(out, ref, rtol=1e-4)

    # identical images → 0
    same = float(lpips_vgg({k: jnp.asarray(v) for k, v in params.items()},
                           img0, img0, convs))
    assert abs(same) < 1e-6

    # env-var wiring: metrics.lpips_distance picks up the ported npz
    npz = tmp_path / "lpips.npz"
    np.savez(npz, **params)
    from touchgs_tpu.eval import metrics
    metrics._lpips_vgg_params.cache_clear()
    metrics._lpips_params.cache_clear()
    monkeypatch.setenv("TOUCHGS_LPIPS_WEIGHTS", str(npz))
    try:
        # scaled-down cfg differs from VGG16 tap indices only in widths, so
        # the env path works with the same convs structure
        from touchgs_tpu.eval import lpips_vgg as lv
        monkeypatch.setattr(lv, "VGG16_CONVS", convs)
        got = float(metrics.lpips_distance(jnp.asarray(img0),
                                           jnp.asarray(img1)))
        np.testing.assert_allclose(got, ref, rtol=1e-4)
    finally:
        metrics._lpips_vgg_params.cache_clear()
        metrics._lpips_params.cache_clear()
