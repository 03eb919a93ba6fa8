"""Parity tests for the DenseTact sensor-net training losses.

Each test re-derives the reference torch formula
(`/root/reference/.../Img2Depth/utils.py:171-250`,
`.../networks/DenseNet_loss.py:23-105`) as an in-test oracle and checks the
JAX implementation in `touchgs_tpu/touch/losses.py` against it.
"""
import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from touchgs_tpu.touch.losses import (
    compute_depth_errors,
    compute_force_errors,
    densetact_depth_loss,
    densetact_ssim,
    gradient_loss,
    image_gradients,
    rmse_loss,
    rmslog_loss,
    silog_loss,
)


@pytest.fixture()
def depth_pair():
    rng = np.random.default_rng(0)
    gt = rng.uniform(0.5, 3.0, (2, 1, 32, 32)).astype(np.float32)
    pred = gt * rng.uniform(0.8, 1.2, gt.shape).astype(np.float32)
    return gt, pred


def torch_silog(pred, gt, mask, vf):
    d = torch.log(pred[mask]) - torch.log(gt[mask])
    return (torch.sqrt((d ** 2).mean() - vf * (d.mean() ** 2)) * 10.0).item()


def test_silog_matches_reference(depth_pair):
    gt, pred = depth_pair
    mask = gt > 1.0
    ref = torch_silog(torch.tensor(pred), torch.tensor(gt),
                      torch.tensor(mask), 0.85)
    got = float(silog_loss(pred, gt, mask, variance_focus=0.85))
    np.testing.assert_allclose(got, ref, rtol=1e-5)
    # nomask variant (silog_loss_nomask)
    ref_nm = torch_silog(torch.tensor(pred), torch.tensor(gt),
                         torch.ones_like(torch.tensor(mask)), 0.85)
    np.testing.assert_allclose(float(silog_loss(pred, gt)), ref_nm, rtol=1e-5)


def test_rmslog_and_rmse(depth_pair):
    gt, pred = depth_pair
    d = np.log(pred) - np.log(gt)
    np.testing.assert_allclose(float(rmslog_loss(pred, gt)),
                               np.sqrt((d ** 2).mean()), rtol=1e-5)
    np.testing.assert_allclose(float(rmse_loss(pred, gt)),
                               np.sqrt(((gt - pred) ** 2).mean()), rtol=1e-5)


def _torch_window(window_size, sigma=1.5):
    g = torch.tensor([math.exp(-(x - window_size // 2) ** 2
                               / float(2 * sigma ** 2))
                      for x in range(window_size)])
    g = (g / g.sum()).unsqueeze(1)
    w2 = g.mm(g.t()).float().unsqueeze(0).unsqueeze(0)
    return w2


def torch_densetact_ssim(img1, img2, window_size=11):
    """The DenseNet_loss.ssim formula (conv2d gaussian window, unscaled
    C1/C2 — the val_range quirk)."""
    channels = img1.shape[1]
    win = _torch_window(window_size).expand(channels, 1, window_size,
                                            window_size).contiguous()
    pad = window_size // 2
    mu1 = F.conv2d(img1, win, padding=pad, groups=channels)
    mu2 = F.conv2d(img2, win, padding=pad, groups=channels)
    s1 = F.conv2d(img1 * img1, win, padding=pad, groups=channels) - mu1 ** 2
    s2 = F.conv2d(img2 * img2, win, padding=pad, groups=channels) - mu2 ** 2
    s12 = F.conv2d(img1 * img2, win, padding=pad, groups=channels) - mu1 * mu2
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    score = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
        (mu1 ** 2 + mu2 ** 2 + c1) * (s1 + s2 + c2))
    return score.mean().item()


def test_ssim_matches_reference(depth_pair):
    gt, pred = depth_pair
    ref = torch_densetact_ssim(torch.tensor(pred), torch.tensor(gt))
    got = float(densetact_ssim(pred, gt))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_ssim_identity_is_one(depth_pair):
    gt, _ = depth_pair
    assert float(densetact_ssim(gt, gt)) > 0.999


def test_image_gradients_match_torch(depth_pair):
    gt, _ = depth_pair
    t = torch.tensor(gt)
    dy_ref = torch.cat([t[:, :, 1:, :] - t[:, :, :-1, :],
                        torch.zeros_like(t[:, :, :1, :])], dim=2)
    dx_ref = torch.cat([t[:, :, :, 1:] - t[:, :, :, :-1],
                        torch.zeros_like(t[:, :, :, :1])], dim=3)
    dy, dx = image_gradients(gt)
    np.testing.assert_allclose(np.asarray(dy), dy_ref.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(dx), dx_ref.numpy(), atol=1e-6)


def test_combined_depth_loss_matches_reference(depth_pair):
    gt, pred = depth_pair
    t_gt, t_pred = torch.tensor(gt), torch.tensor(pred)
    ssim_term = float(torch.clamp(
        (1 - torch.tensor(torch_densetact_ssim(t_pred, t_gt))) * 0.5,
        min=0, max=1))
    dy_t, dx_t = image_gradients(gt)
    dy_p, dx_p = image_gradients(pred)
    grad_term = float(np.mean(np.abs(np.asarray(dy_p) - np.asarray(dy_t))
                              + np.abs(np.asarray(dx_p) - np.asarray(dx_t))))
    l1 = float(np.abs(pred - gt).mean())
    ref = ssim_term + 0.2 * l1 + grad_term
    got = float(densetact_depth_loss(pred, gt, theta=0.2))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_gradient_loss_zero_on_identical(depth_pair):
    gt, _ = depth_pair
    assert float(gradient_loss(gt, gt)) == 0.0


def test_depth_error_metrics(depth_pair):
    gt, pred = depth_pair
    m = compute_depth_errors(gt, pred)
    # oracle: the numpy formulas of compute_errors (utils.py:81-101)
    thresh = np.maximum(gt / pred, pred / gt)
    err = np.log(pred) - np.log(gt)
    np.testing.assert_allclose(
        float(m["silog"]),
        np.sqrt((err ** 2).mean() - err.mean() ** 2) * 100, rtol=1e-4)
    np.testing.assert_allclose(float(m["abs_rel"]),
                               (np.abs(gt - pred) / gt).mean(), rtol=1e-5)
    np.testing.assert_allclose(float(m["rms"]),
                               np.sqrt(((gt - pred) ** 2).mean()), rtol=1e-5)
    np.testing.assert_allclose(float(m["d1"]), (thresh < 1.25).mean(),
                               rtol=1e-6)
    assert 0.0 <= float(m["d3"]) <= 1.0


def test_force_error_metrics():
    rng = np.random.default_rng(1)
    gt = rng.uniform(-5, 5, (16, 6)).astype(np.float32)
    pred = gt + rng.normal(0, 0.1, gt.shape).astype(np.float32)
    m = compute_force_errors(gt, pred)
    np.testing.assert_allclose(float(m["rms"]),
                               np.sqrt(((gt - pred) ** 2).mean()), rtol=1e-5)
    assert m["l1_per_axis"].shape == (6,)


def test_losses_are_differentiable(depth_pair):
    import jax
    import jax.numpy as jnp
    gt, pred = depth_pair
    g = jax.grad(lambda p: densetact_depth_loss(p, jnp.asarray(gt)))(
        jnp.asarray(pred))
    assert np.isfinite(np.asarray(g)).all()
    g2 = jax.grad(lambda p: silog_loss(p, jnp.asarray(gt),
                                       jnp.asarray(gt) > 1.0))(
        jnp.asarray(pred))
    assert np.isfinite(np.asarray(g2)).all()


def test_depth_net_trains_with_reference_loss():
    """End-to-end: the flax touch depth net trains under the reference's
    combined DenseDepth loss and the loss decreases."""
    import jax
    import jax.numpy as jnp
    import optax

    from touchgs_tpu.touch.sensor_nets import TouchDepthNet
    from touchgs_tpu.touch.sensor_train import make_depth_train_step

    rng = np.random.default_rng(0)
    net = TouchDepthNet(base=32)  # channel counts must divide GroupNorm's 8 groups
    imgs = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)), jnp.float32)
    # target: smooth depth in the net's [0,255] output range
    yy, xx = np.mgrid[0:32, 0:32]
    target = jnp.asarray(
        np.stack([100 + 50 * np.sin(xx / 6) + yy] * 2), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), imgs[0])
    opt = optax.adam(2e-4)  # higher lr saturates the sigmoid head
    step = make_depth_train_step(net, opt, loss="densetact")
    opt_state = opt.init(params)
    losses = []
    for _ in range(25):
        params, opt_state, m = step(params, opt_state, imgs, target)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.95, losses[::8]

    # silog variant also runs and is finite
    step2 = make_depth_train_step(net, opt, loss="silog")
    params, opt_state, m2 = step2(params, opt_state, imgs, target)
    assert np.isfinite(float(m2["loss"]))


def test_force_net_trains_with_rmse():
    import jax
    import jax.numpy as jnp
    import optax

    from touchgs_tpu.touch.sensor_nets import ForceNet
    from touchgs_tpu.touch.sensor_train import make_force_train_step

    rng = np.random.default_rng(1)
    net = ForceNet(dim=32, blocks=1)
    imgs = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)), jnp.float32)
    forces = jnp.asarray(rng.uniform(0.2, 0.8, (2, 6)), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), imgs[0])
    opt = optax.adam(1e-3)
    step = make_force_train_step(net, opt)
    opt_state = opt.init(params)
    losses = []
    for _ in range(12):
        params, opt_state, m = step(params, opt_state, imgs, forces)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses[::4]
