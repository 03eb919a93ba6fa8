"""Multi-scene batch training tests (scene axis sharded over 'data')."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from touchgs_tpu.config import ModelConfig, RasterizeConfig, TrainConfig
from touchgs_tpu.models.gaussians import init_from_points
from touchgs_tpu.parallel.mesh import make_mesh
from touchgs_tpu.parallel.multiscene import (
    make_multiscene_state,
    make_multiscene_train_step,
    multiscene_shardings,
    stack_cameras,
)
from touchgs_tpu.train.optim import make_optimizer

from tests.synthetic import look_at_camera, random_gaussians


def _scene_params(seed, capacity=256):
    means, quats, scales, colors, opac = random_gaussians(100, seed=seed)
    return init_from_points(np.asarray(means), np.asarray(colors),
                            capacity=capacity, sh_degree=1, seed=seed)


@pytest.fixture(scope="module")
def batch():
    S = 4
    cfg = TrainConfig(
        model=ModelConfig(max_gaussians=256, sh_degree=1,
                          rasterize=RasterizeConfig(gaussian_chunk=64)),
    )
    params = [_scene_params(i) for i in range(S)]
    cams = stack_cameras(
        [look_at_camera(eye=(1.5, i * 0.3, 1.0), width=64, height=48)
         for i in range(S)]
    )
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 1, (S, 48, 64, 3)), jnp.float32)
    depths = jnp.asarray(rng.uniform(1, 3, (S, 48, 64)), jnp.float32)
    uncs = jnp.ones((S, 48, 64), jnp.float32)
    return cfg, params, cams, images, depths, uncs


def test_multiscene_step_runs(batch):
    cfg, params, cams, images, depths, uncs = batch
    opt = make_optimizer(cfg.optim)
    state = make_multiscene_state(params, cfg, opt)
    step = make_multiscene_train_step(cfg, opt)
    losses = []
    for _ in range(3):
        state, m = step(state, cams, images, depths, uncs, jnp.int32(1))
        losses.append(float(m["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert m["psnr_per_scene"].shape == (4,)
    assert losses[-1] < losses[0]  # learning something


def test_multiscene_sharded(batch):
    cfg, params, cams, images, depths, uncs = batch
    mesh = make_mesh(data=4, model=2)
    opt = make_optimizer(cfg.optim)
    state = make_multiscene_state(params, cfg, opt)
    state = jax.device_put(state, multiscene_shardings(mesh, state))
    step = make_multiscene_train_step(cfg, opt, mesh=mesh)
    state, m = step(state, cams, images, depths, uncs, jnp.int32(1))
    assert np.isfinite(float(m["loss"]))
    # scene axis stays sharded over 'data'
    assert state.params.means.sharding.spec[0] == "data"

    # parity with unsharded step
    state2 = make_multiscene_state(params, cfg, opt)
    step2 = make_multiscene_train_step(cfg, opt)
    state2, m2 = step2(state2, cams, images, depths, uncs, jnp.int32(1))
    np.testing.assert_allclose(float(m["loss"]), float(m2["loss"]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(state.params.means),
                               np.asarray(state2.params.means), atol=1e-5)
