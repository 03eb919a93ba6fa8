"""Tactile-NeRF model family tests (legacy/model_tactile.py parity)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from touchgs_tpu.models.nerf import (
    NerfConfig,
    NerfDepthLossType,
    NerfTrainer,
    ds_nerf_depth_loss,
    distortion_loss,
    urf_depth_loss,
    volume_render,
)

from tests.test_train import _make_synthetic_scene


def _tiny_nerf_cfg(**kw):
    base = dict(num_levels=4, hash_size=2**12, base_res=4, max_res=64,
                mlp_width=32, num_coarse=24, num_fine=24,
                rays_per_batch=512, near=0.5, far=4.0,
                depth_loss_mult=0.05, lr=5e-3)
    base.update(kw)
    return NerfConfig(**base)


def test_volume_render_opaque_surface():
    """A wall of density at sample 5 → depth ≈ t[5], acc ≈ 1."""
    R, S = 4, 16
    ts = jnp.broadcast_to(jnp.linspace(0.5, 2.0, S), (R, S))
    density = jnp.zeros((R, S)).at[:, 5:].set(1000.0)
    rgb = jnp.ones((R, S, 3)) * 0.7
    out = volume_render(density, rgb, ts, jnp.ones((R,)))
    np.testing.assert_allclose(np.asarray(out.acc), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.depth), float(ts[0, 5]),
                               atol=0.05)
    np.testing.assert_allclose(np.asarray(out.rgb), 0.7, atol=1e-4)


def test_ds_nerf_loss_prefers_correct_depth():
    """Weights concentrated at the sensor depth score lower loss."""
    R, S = 8, 32
    ts = jnp.broadcast_to(jnp.linspace(0.5, 2.0, S), (R, S))
    td = jnp.full((R,), 1.2)
    good = jnp.exp(-0.5 * ((ts - 1.2) / 0.05) ** 2)
    good = good / good.sum(-1, keepdims=True)
    bad = jnp.exp(-0.5 * ((ts - 1.8) / 0.05) ** 2)
    bad = bad / bad.sum(-1, keepdims=True)
    assert float(ds_nerf_depth_loss(good, ts, td, 0.05)) < float(
        ds_nerf_depth_loss(bad, ts, td, 0.05))


def test_urf_loss_prefers_correct_depth():
    R, S = 8, 32
    ts = jnp.broadcast_to(jnp.linspace(0.5, 2.0, S), (R, S))
    td = jnp.full((R,), 1.2)

    def make(depth):
        w = jnp.exp(-0.5 * ((ts - depth) / 0.05) ** 2)
        w = w / w.sum(-1, keepdims=True)
        from touchgs_tpu.models.nerf import NerfRender
        d = jnp.sum(w * ts, -1)
        return NerfRender(rgb=jnp.zeros((R, 3)), depth=d,
                          acc=jnp.ones((R,)), weights=w, ts=ts)

    assert float(urf_depth_loss(make(1.2), td, 0.05)) < float(
        urf_depth_loss(make(1.8), td, 0.05))


def test_distortion_loss_prefers_compact_weights():
    R, S = 4, 32
    ts = jnp.broadcast_to(jnp.linspace(0.5, 2.0, S), (R, S))
    compact = jnp.zeros((R, S)).at[:, 10].set(1.0)
    spread = jnp.ones((R, S)) / S
    assert float(distortion_loss(compact, ts)) < float(
        distortion_loss(spread, ts))


@pytest.mark.parametrize("loss_type", [NerfDepthLossType.DS_NERF,
                                       NerfDepthLossType.URF])
def test_nerf_training_improves(loss_type):
    scene = _make_synthetic_scene(n_views=4, width=64, height=48, n_gauss=200)
    cfg = _tiny_nerf_cfg(depth_loss_type=loss_type)
    trainer = NerfTrainer(scene, cfg)
    first = trainer.run(1)
    last = trainer.run(60)
    assert np.isfinite(last["loss"])
    assert last["psnr"] > first["psnr"]


def test_sigma_decay():
    scene = _make_synthetic_scene(n_views=2, width=32, height=24, n_gauss=50)
    cfg = _tiny_nerf_cfg(should_decay_sigma=True, starting_depth_sigma=0.2,
                         depth_sigma=0.01, sigma_decay_rate=0.5)
    trainer = NerfTrainer(scene, cfg)
    assert float(trainer.sigma) == pytest.approx(0.2)
    for _ in range(3):
        trainer.decay_sigma()
    assert float(trainer.sigma) == pytest.approx(0.025)
    for _ in range(10):
        trainer.decay_sigma()
    assert float(trainer.sigma) == pytest.approx(0.01)  # floor


def test_nerf_render_view():
    scene = _make_synthetic_scene(n_views=2, width=32, height=24, n_gauss=50)
    trainer = NerfTrainer(scene, _tiny_nerf_cfg())
    trainer.run(5)
    img = trainer.render_view(0, chunk=256)
    assert img.shape == (24, 32, 3)
    assert np.isfinite(img).all()
