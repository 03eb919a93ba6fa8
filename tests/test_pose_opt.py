"""SO3xR3 camera pose optimizer: perturbed poses recover toward truth
(legacy/config_tactile.py:36-37 camera_optimizer mode="SO3xR3")."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from touchgs_tpu.config import (ModelConfig, OptimConfig, PoseOptConfig,
                                RasterizeConfig, TrainConfig)
from touchgs_tpu.models.densify import DensifyState
from touchgs_tpu.models.gaussians import GaussianParams
from touchgs_tpu.models.pose_opt import apply_pose_delta, exp_so3
from touchgs_tpu.models.splatfacto import render
from touchgs_tpu.ops.sh import rgb_to_sh_dc
from touchgs_tpu.train.optim import make_optimizer
from touchgs_tpu.train.trainer import TrainState, _diff_params, make_train_step
from tests.synthetic import look_at_camera, random_gaussians


def test_exp_so3_basic():
    # zero tangent -> identity
    np.testing.assert_allclose(np.asarray(exp_so3(jnp.zeros(3))), np.eye(3),
                               atol=1e-6)
    # 90 deg about z
    R = np.asarray(exp_so3(jnp.array([0.0, 0.0, np.pi / 2])))
    np.testing.assert_allclose(R @ np.array([1.0, 0, 0]),
                               np.array([0.0, 1.0, 0]), atol=1e-5)
    # orthonormal for a random tangent
    R = np.asarray(exp_so3(jnp.array([0.3, -0.2, 0.5])))
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)


def _gt_params(n=400):
    means, quats, scales, colors, opac = random_gaussians(n, seed=3)
    return GaussianParams(
        means=means, quats=quats, log_scales=jnp.log(scales),
        logit_opacities=jnp.log(opac / (1 - opac)),
        sh_dc=rgb_to_sh_dc(colors), sh_rest=jnp.zeros((n, 0, 3)),
        alive=jnp.ones((n,), bool))


def _pose_err(c2w_a, c2w_b):
    dR = np.asarray(c2w_a)[:3, :3] @ np.asarray(c2w_b)[:3, :3].T
    ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
    dt = np.linalg.norm(np.asarray(c2w_a)[:3, 3] - np.asarray(c2w_b)[:3, 3])
    return ang, dt


@pytest.mark.slow
def test_pose_recovery():
    params = _gt_params()
    cfg = TrainConfig(
        model=ModelConfig(max_gaussians=params.capacity, sh_degree=0,
                          rasterize=RasterizeConfig()),
        # freeze the model (tiny LRs) so only the pose moves
        optim=OptimConfig(means_lr_init=1e-12, means_lr_final=1e-13,
                          features_dc_lr=0.0, features_rest_lr=0.0,
                          opacities_lr=0.0, scales_lr=0.0, quats_lr=0.0),
        pose_opt=PoseOptConfig(mode="SO3xR3", lr=3e-3),
        ssim_lambda=0.2,
    )
    true_cam = look_at_camera(width=96, height=96, focal=110.0)
    target, _ = render(params, true_cam, cfg.model, active_sh_degree=0)
    target = jax.lax.stop_gradient(target.rgb)

    # perturb: small rotation + translation
    tau_true = jnp.array([0.03, -0.02, 0.015, 0.02, -0.03, 0.025])
    bad_cam = apply_pose_delta(true_cam, tau_true)
    ang0, dt0 = _pose_err(bad_cam.c2w, true_cam.c2w)

    optimizer = make_optimizer(cfg.optim,
                               extra_lrs={"pose_deltas": cfg.pose_opt.lr})
    diff0 = _diff_params(params)
    diff0["pose_deltas"] = jnp.zeros((1, 6), jnp.float32)
    state = TrainState(
        params=params, opt_state=optimizer.init(diff0),
        densify=DensifyState.zeros(params.capacity), step=jnp.int32(0),
        pose_deltas=jnp.zeros((1, 6), jnp.float32))
    step = make_train_step(cfg, optimizer)

    losses = []
    for i in range(120):
        state, metrics = step(state, bad_cam, target, None, None,
                              jnp.int32(0), jnp.int32(0))
        losses.append(float(metrics["loss"]))

    fixed = apply_pose_delta(bad_cam, state.pose_deltas[0])
    ang1, dt1 = _pose_err(fixed.c2w, true_cam.c2w)
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])
    assert ang1 < 0.5 * ang0, (ang0, ang1)
    assert dt1 < 0.5 * dt0, (dt0, dt1)
