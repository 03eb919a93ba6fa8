"""Faithful DenseTact net parity: torch oracle → port → JAX forward.

The torch side reconstructs the reference's deployed nets from nn primitives
with torchvision-compatible state_dict names (DenseNet-161 layout facts +
``/root/reference/.../networks/DenseNet.py:443-572``, ``STForce.py:123-227``),
so a real ``torch.load``-able checkpoint ports through tools/port_weights.py
onto ``touchgs_tpu.touch.densetact_nets`` unchanged.
"""
from collections import OrderedDict

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from tools.port_weights import port_state_dict
from touchgs_tpu.touch.densetact_nets import (
    decoder_skip_channels,
    dense_depth_forward,
    densenet161_classify,
    densenet_force_forward,
)

TINY = dict(init_features=16, growth=8, blocks=(2, 2, 2, 2), bn_size=2)


def _torch_densenet(cfg):
    """torchvision densenet layout (features Sequential + classifier)."""
    init, growth, bn_size = cfg["init_features"], cfg["growth"], cfg["bn_size"]

    class DenseLayer(nn.Module):
        def __init__(self, cin):
            super().__init__()
            self.norm1 = nn.BatchNorm2d(cin)
            self.relu1 = nn.ReLU()
            self.conv1 = nn.Conv2d(cin, bn_size * growth, 1, bias=False)
            self.norm2 = nn.BatchNorm2d(bn_size * growth)
            self.relu2 = nn.ReLU()
            self.conv2 = nn.Conv2d(bn_size * growth, growth, 3, padding=1,
                                   bias=False)

        def forward(self, x):
            h = self.conv1(self.relu1(self.norm1(x)))
            h = self.conv2(self.relu2(self.norm2(h)))
            return torch.cat([x, h], 1)

    class Transition(nn.Sequential):
        def __init__(self, cin):
            super().__init__(OrderedDict([
                ("norm", nn.BatchNorm2d(cin)), ("relu", nn.ReLU()),
                ("conv", nn.Conv2d(cin, cin // 2, 1, bias=False)),
                ("pool", nn.AvgPool2d(2)),
            ]))

    layers = OrderedDict([
        ("conv0", nn.Conv2d(3, init, 7, 2, 3, bias=False)),
        ("norm0", nn.BatchNorm2d(init)),
        ("relu0", nn.ReLU()),
        ("pool0", nn.MaxPool2d(3, 2, 1)),
    ])
    c = init
    for bi, n in enumerate(cfg["blocks"], start=1):
        block = nn.Module()
        for li in range(1, n + 1):
            block.add_module(f"denselayer{li}", DenseLayer(c))
            c += growth

        def fwd(self, x):
            for m in self.children():
                x = m(x)
            return x

        block.forward = fwd.__get__(block)
        layers[f"denseblock{bi}"] = block
        if bi < len(cfg["blocks"]):
            layers[f"transition{bi}"] = Transition(c)
            c //= 2
    layers["norm5"] = nn.BatchNorm2d(c)

    net = nn.Module()
    net.features = nn.Sequential(layers)
    net.classifier = nn.Linear(c, 1000)
    net.num_features = c
    return net


def _torch_feature_maps(dn, x):
    maps = [x]
    for m in dn.features.children():
        maps.append(m(maps[-1]))
    return maps


class _TorchUpsample(nn.Module):
    # DenseNet.py:459-487
    def __init__(self, cin, cout):
        super().__init__()
        self.convA = nn.Conv2d(cin, cout, 3, 1, 1)
        self.convB = nn.Conv2d(cout, cout, 3, 1, 1)

    def forward(self, x, skip):
        x = F.interpolate(x, size=skip.shape[2:], mode="bilinear",
                          align_corners=True)
        x = torch.cat([x, skip], 1)
        x = F.leaky_relu(self.convA(x), 0.2)
        return F.leaky_relu(self.convB(x), 0.2)


def _torch_dense_depth(cfg):
    # DenseNet.py:489-572 wiring (encoder taps 3/4/6/8/11, conv2 pad quirk)
    dn = _torch_densenet(cfg)
    features = dn.num_features // 2
    skips = decoder_skip_channels(cfg)

    class DenseDepth(nn.Module):
        def __init__(self):
            super().__init__()
            enc = nn.Module()
            enc.densenet = dn
            self.encoder = enc
            dec = nn.Module()
            dec.conv2 = nn.Conv2d(dn.num_features, features, 1, 1, 1)
            for i, (div, sk) in enumerate(zip((1, 2, 4, 8), skips), 1):
                dec.add_module(f"upsample{i}",
                               _TorchUpsample(features // div + sk,
                                              features // (div * 2)))
            dec.conv3 = nn.Conv2d(features // 16, 1, 3, 1, 1)
            head = nn.Module()
            head.conv1 = nn.Conv2d(1, 1, 3, padding=1)
            dec.dispheader = head
            self.decoder = dec

        def forward(self, x, max_depth):
            maps = _torch_feature_maps(self.encoder.densenet, x)
            b0, b1, b2, b3, b4 = maps[3], maps[4], maps[6], maps[8], maps[11]
            d = self.decoder
            x = d.conv2(b4)
            x = d.upsample1(x, b3)
            x = d.upsample2(x, b2)
            x = d.upsample3(x, b1)
            x = d.upsample4(x, b0)
            x = d.conv3(x)
            x = torch.sigmoid(d.dispheader.conv1(x))
            x = F.interpolate(x, scale_factor=2, mode="bilinear",
                              align_corners=False)
            return x * max_depth

    return DenseDepth()


def _torch_force(cfg):
    # STForce.py:123-143,195-227
    dn = _torch_densenet(cfg)

    class Force(nn.Module):
        def __init__(self):
            super().__init__()
            enc = nn.Module()
            enc.densenet = dn
            self.encoder = enc
            head = nn.Module()
            head.fc1 = nn.Linear(1000, 500)
            head.fc2 = nn.Linear(500, 6)
            self.force_head = head

        def forward(self, x):
            feats = self.encoder.densenet.features(x)
            h = F.relu(feats)
            h = F.adaptive_avg_pool2d(h, 1).flatten(1)
            logits = self.encoder.densenet.classifier(h)
            return self.force_head.fc2(self.force_head.fc1(logits))

    return Force()


def _randomize(model, seed):
    g = torch.Generator().manual_seed(seed)
    sd = model.state_dict()
    for k, v in sd.items():
        if v.dtype.is_floating_point:
            sd[k] = torch.randn(v.shape, generator=g) * 0.05
            if "running_var" in k:
                sd[k] = sd[k].abs() + 0.5
    model.load_state_dict(sd)
    return model.eval()


def test_dense_depth_parity():
    model = _randomize(_torch_dense_depth(TINY), 0)
    params = port_state_dict(model.state_dict())
    rng = np.random.default_rng(0)
    img = rng.normal(0, 1, (64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(img).permute(2, 0, 1)[None],
                    256.0)[0, 0].numpy()
    out = np.asarray(dense_depth_forward(params, img, max_depth=256.0,
                                         cfg=TINY))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=1e-3, rtol=1e-3)


def test_densenet_force_parity():
    model = _randomize(_torch_force(TINY), 1)
    params = port_state_dict(model.state_dict())
    rng = np.random.default_rng(1)
    img = rng.normal(0, 1, (64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(img).permute(2, 0, 1)[None])[0].numpy()
    out = np.asarray(densenet_force_forward(params, img, cfg=TINY))
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-3)


def test_densenet_classifier_parity():
    model = _randomize(_torch_force(TINY), 2)
    params = port_state_dict(model.state_dict())
    rng = np.random.default_rng(2)
    img = rng.normal(0, 1, (32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        dn = model.encoder.densenet
        h = F.relu(dn.features(torch.from_numpy(img).permute(2, 0, 1)[None]))
        ref = dn.classifier(F.adaptive_avg_pool2d(h, 1).flatten(1))[0].numpy()
    out = np.asarray(densenet161_classify(
        params, np.asarray(img)[None], cfg=TINY))[0]
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-3)


def test_random_init_shapes_run():
    """The random-init helpers produce a usable full-size-compatible tree."""
    from touchgs_tpu.touch.densetact_nets import (
        init_dense_depth_params, init_densenet_force_params,
    )

    p = init_dense_depth_params(cfg=TINY)
    img = np.zeros((64, 64, 3), np.float32)
    d = np.asarray(dense_depth_forward(p, img, cfg=TINY))
    assert d.shape == (64, 64) and np.isfinite(d).all()
    pf = init_densenet_force_params(cfg=TINY)
    f = np.asarray(densenet_force_forward(pf, img, cfg=TINY))
    assert f.shape == (6,) and np.isfinite(f).all()
