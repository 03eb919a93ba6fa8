"""Multi-device sharded training tests on the 8-device virtual CPU mesh.

SURVEY.md §4 item 4: the same scene trained on 1 chip vs N chips must be
numerically identical (up to reduction-order fp noise).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from touchgs_tpu.parallel.mesh import make_mesh, state_shardings
from touchgs_tpu.parallel.sharded import make_sharded_train_step, shard_state
from touchgs_tpu.train.trainer import Trainer

from tests.test_train import _make_synthetic_scene, _tiny_cfg


@pytest.fixture(scope="module")
def scene():
    return _make_synthetic_scene(n_views=4, width=128, height=96, n_gauss=200)


def test_mesh_construction():
    mesh = make_mesh()
    assert mesh.shape["data"] * mesh.shape["model"] == jax.device_count()
    mesh2 = make_mesh(data=4, model=2)
    assert mesh2.shape == {"data": 4, "model": 2}


def test_sharded_step_matches_single_device(scene):
    cfg = _tiny_cfg()
    trainer = Trainer(scene, cfg)
    cam, image, depth, unc = trainer._batch(0)
    sh = jnp.int32(0)

    # single-device reference step
    ref_state, ref_metrics = trainer.train_step(
        jax.tree.map(lambda x: x, trainer.state), cam, image, depth, unc, sh
    )

    # sharded step on 4x2 mesh
    mesh = make_mesh(data=4, model=2)
    trainer2 = Trainer(scene, cfg)
    state = shard_state(trainer2.state, mesh)
    step = make_sharded_train_step(cfg, mesh, trainer2.optimizer)
    new_state, metrics = step(state, cam, image, depth, unc, sh)

    assert np.isfinite(float(metrics["loss"]))
    np.testing.assert_allclose(
        float(metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(new_state.params.means), np.asarray(ref_state.params.means),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(new_state.params.sh_dc), np.asarray(ref_state.params.sh_dc),
        atol=1e-5,
    )


def test_sharded_multi_step_runs(scene):
    cfg = _tiny_cfg()
    mesh = make_mesh()  # default full-device mesh
    trainer = Trainer(scene, cfg)
    state = shard_state(trainer.state, mesh)
    step = make_sharded_train_step(cfg, mesh, trainer.optimizer)
    losses = []
    for i in range(5):
        cam, image, depth, unc = trainer._batch(i % len(scene.i_train))
        state, metrics = step(state, cam, image, depth, unc, jnp.int32(0))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses)
    # params stayed fully sharded over the Gaussian axis (ZeRO-style)
    shardings = state_shardings(mesh, state)
    means_spec = state.params.means.sharding.spec
    assert means_spec[0] == ("model", "data")


def test_sharded_pallas_matches_single_device(scene):
    """VERDICT r1 item 3: the flagship Pallas kernel must compose with the
    mesh — sharded (shard_map tiles over 'data') vs single-device parity."""
    from touchgs_tpu.config import ModelConfig, RasterizeConfig

    cfg = _tiny_cfg()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(
            cfg.model, rasterize=RasterizeConfig(gaussian_chunk=128,
                                                 use_pallas=True)))
    trainer = Trainer(scene, cfg)
    cam, image, depth, unc = trainer._batch(0)
    sh = jnp.int32(0)

    ref_state, ref_metrics = trainer.train_step(
        jax.tree.map(lambda x: x, trainer.state), cam, image, depth, unc, sh
    )

    mesh = make_mesh(data=4, model=2)
    trainer2 = Trainer(scene, cfg)
    state = shard_state(trainer2.state, mesh)
    step = make_sharded_train_step(cfg, mesh, trainer2.optimizer)
    new_state, metrics = step(state, cam, image, depth, unc, sh)

    assert np.isfinite(float(metrics["loss"]))
    np.testing.assert_allclose(
        float(metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(new_state.params.means), np.asarray(ref_state.params.means),
        atol=1e-5,
    )


def test_distributed_helpers_single_process():
    """Multi-host scaffolding degrades to single-host behavior (no
    coordinator configured → no-op init, full-device mesh, full slice)."""
    from touchgs_tpu.parallel.distributed import (
        global_mesh, init_distributed, local_batch_slice,
    )

    assert init_distributed() is False  # no env/args → single-process no-op
    mesh = global_mesh(model=2)
    assert mesh.shape["data"] * mesh.shape["model"] == jax.device_count()
    sl = local_batch_slice(10)
    np.testing.assert_array_equal(sl, np.arange(10))


@pytest.mark.slow
def test_sharded_bench_shape_tiles():
    """Bench-shaped tile counts (VERDICT r2 task 3): 800x800 → 625 tiles at
    32x32, sharded over the 8-device mesh vs single device, on the jnp tiled
    path (the Pallas kernels run interpret-mode on CPU, far too slow at 625
    grid steps; the tile-sharding machinery under test is identical)."""
    scene = _make_synthetic_scene(n_views=2, width=800, height=800,
                                  n_gauss=2000)
    cfg = _tiny_cfg()
    trainer = Trainer(scene, cfg)
    cam, image, depth, unc = trainer._batch(0)
    sh = jnp.int32(0)

    ref_state, ref_metrics = trainer.train_step(
        jax.tree.map(lambda x: x, trainer.state), cam, image, depth, unc, sh)

    mesh = make_mesh(data=4, model=2)
    trainer2 = Trainer(scene, cfg)
    state = shard_state(trainer2.state, mesh)
    step = make_sharded_train_step(cfg, mesh, trainer2.optimizer)
    new_state, metrics = step(state, cam, image, depth, unc, sh)

    assert np.isfinite(float(metrics["loss"]))
    np.testing.assert_allclose(float(metrics["loss"]),
                               float(ref_metrics["loss"]), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(new_state.params.means),
                               np.asarray(ref_state.params.means), atol=1e-5)
