"""SwinV2 force-trunk parity against the reference's vendored torch code.

SURVEY.md §4 test strategy: reference functions run as oracles.  The vendored
``swin_transformer_force.py`` (PUBLIC SwinV2 code vendored by the reference)
is imported read-only from /root/reference with its timm/newcrf deps stubbed,
instantiated at a tiny config, randomized, ported through
tools/port_weights.py, and compared against our JAX forward.
"""
import importlib.util
import sys
import types
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from tools.port_weights import port_state_dict
from touchgs_tpu.touch.swin_force import SwinArch, swin_v2_forward

_REF = Path("/root/reference/data_collection/ros1/dtv2_tactile_camera/src/"
            "Img2Depth/networks/swin_transformer_force.py")


@pytest.fixture(scope="module")
def ref_swin_module():
    if not _REF.exists():
        pytest.skip("reference checkout not available")

    # stub timm.models.layers (DropPath is identity at eval; the test config
    # uses drop_path_rate=0 anyway) and the package-relative newcrf_utils
    timm = types.ModuleType("timm")
    timm_models = types.ModuleType("timm.models")
    timm_layers = types.ModuleType("timm.models.layers")

    class DropPath(nn.Module):
        def __init__(self, p=0.0):
            super().__init__()

        def forward(self, x):
            return x

    timm_layers.DropPath = DropPath
    timm_layers.to_2tuple = lambda v: v if isinstance(v, tuple) else (v, v)
    timm_layers.trunc_normal_ = lambda t, std=0.02: t.data.normal_(0, std)
    sys.modules.setdefault("timm", timm)
    sys.modules.setdefault("timm.models", timm_models)
    sys.modules["timm.models.layers"] = timm_layers

    pkg = types.ModuleType("refnets")
    pkg.__path__ = [str(_REF.parent)]
    sys.modules["refnets"] = pkg
    ncu = types.ModuleType("refnets.newcrf_utils")
    ncu.load_checkpoint = lambda *a, **k: None
    sys.modules["refnets.newcrf_utils"] = ncu

    spec = importlib.util.spec_from_file_location(
        "refnets.swin_transformer_force", _REF)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod


def _randomize(model, seed):
    g = torch.Generator().manual_seed(seed)
    sd = model.state_dict()
    for k, v in sd.items():
        if v.dtype.is_floating_point and "relative" not in k:
            sd[k] = torch.randn(v.shape, generator=g) * 0.05
    model.load_state_dict(sd)
    return model.eval()


TINY = SwinArch(img_size=32, patch_size=4, embed_dim=8, depths=(2, 2),
                num_heads=(2, 4), window_size=4, num_classes=10)


def test_swin_v2_parity_vs_reference(ref_swin_module):
    ref = ref_swin_module.SwinTransformerV2(
        img_size=TINY.img_size, patch_size=TINY.patch_size,
        embed_dim=TINY.embed_dim, depths=list(TINY.depths),
        num_heads=list(TINY.num_heads), window_size=TINY.window_size,
        num_classes=TINY.num_classes, drop_path_rate=0.0, ape=False,
        patch_norm=True)
    ref = _randomize(ref, 0)
    sd = {f"backbone.{k}": v for k, v in ref.state_dict().items()}
    params = port_state_dict(sd)

    rng = np.random.default_rng(0)
    img = rng.normal(0, 1, (32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.from_numpy(img).permute(2, 0, 1)[None])[0].numpy()
    out = np.asarray(swin_v2_forward(params, img, TINY))
    assert out.shape == out_ref.shape
    np.testing.assert_allclose(out, out_ref, atol=2e-4, rtol=1e-3)


def test_swin_shifted_window_mask_matters(ref_swin_module):
    """The parity config exercises SW-MSA (window 4 < resolution 8 at stage
    0); sanity-check our mask really is active by perturbing shift."""
    ref = ref_swin_module.SwinTransformerV2(
        img_size=TINY.img_size, patch_size=TINY.patch_size,
        embed_dim=TINY.embed_dim, depths=list(TINY.depths),
        num_heads=list(TINY.num_heads), window_size=TINY.window_size,
        num_classes=TINY.num_classes, drop_path_rate=0.0)
    blk = ref.layers[0].blocks[1]
    assert blk.shift_size > 0 and blk.attn_mask is not None


def test_stforce_head_wiring(ref_swin_module):
    """STForce = backbone logits → fc2(fc1(x)) with no activations
    (STForce.py:114-122, 218-227)."""
    from touchgs_tpu.touch.swin_force import stforce_forward

    ref = ref_swin_module.SwinTransformerV2(
        img_size=TINY.img_size, patch_size=TINY.patch_size,
        embed_dim=TINY.embed_dim, depths=list(TINY.depths),
        num_heads=list(TINY.num_heads), window_size=TINY.window_size,
        num_classes=TINY.num_classes, drop_path_rate=0.0)
    ref = _randomize(ref, 1)
    fc1 = nn.Linear(10, 5)
    fc2 = nn.Linear(5, 6)
    sd = {f"backbone.{k}": v for k, v in ref.state_dict().items()}
    sd.update({"force_head.fc1.weight": fc1.weight,
               "force_head.fc1.bias": fc1.bias,
               "force_head.fc2.weight": fc2.weight,
               "force_head.fc2.bias": fc2.bias})
    params = port_state_dict(sd)
    rng = np.random.default_rng(1)
    img = rng.normal(0, 1, (32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        logits = ref(torch.from_numpy(img).permute(2, 0, 1)[None])
        out_ref = fc2(fc1(logits))[0].numpy()
    out = np.asarray(stforce_forward(params, img, TINY))
    np.testing.assert_allclose(out, out_ref, atol=2e-4, rtol=1e-3)
