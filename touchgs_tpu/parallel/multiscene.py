"""Multi-scene batch training — BASELINE.json configs[4]: "Multi-scene batch
training sharded across v5p-16: tiles + Gaussians partitioned".

S scenes train simultaneously: every parameter / optimizer / densify leaf
gains a leading scene axis, the per-scene loss is vmapped, and the scene axis
is sharded over the mesh's ``data`` dimension (scenes are independent, so this
is embarrassingly parallel — the right first axis to fill a pod with).  The
``model`` axis continues to shard the Gaussian capacity *within* each scene.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from touchgs_tpu.config import TrainConfig
from touchgs_tpu.data.cameras import Camera
from touchgs_tpu.models.densify import DensifyState, update_stats
from touchgs_tpu.models.gaussians import GaussianParams
from touchgs_tpu.models.splatfacto import compute_losses, render
from touchgs_tpu.train.optim import make_optimizer
from touchgs_tpu.train.trainer import TrainState, _diff_params, _merge_params


def stack_params(params_list: Sequence[GaussianParams]) -> GaussianParams:
    """Stack per-scene params into one pytree with a leading scene axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *params_list)


def stack_cameras(cams: Sequence[Camera]) -> Camera:
    assert len({(c.width, c.height) for c in cams}) == 1, \
        "multi-scene batch requires equal resolutions"
    return Camera(
        fx=jnp.stack([c.fx for c in cams]),
        fy=jnp.stack([c.fy for c in cams]),
        cx=jnp.stack([c.cx for c in cams]),
        cy=jnp.stack([c.cy for c in cams]),
        c2w=jnp.stack([c.c2w for c in cams]),
        width=cams[0].width, height=cams[0].height,
    )


def make_multiscene_state(
    params_list: Sequence[GaussianParams], cfg: TrainConfig, optimizer=None
) -> TrainState:
    if optimizer is None:
        optimizer = make_optimizer(cfg.optim)
    params = stack_params(params_list)
    S, C = params.means.shape[:2]
    return TrainState(
        params=params,
        opt_state=optimizer.init(_diff_params(params)),
        densify=DensifyState(
            grad_accum=jnp.zeros((S, C)), grad_count=jnp.zeros((S, C)),
            max_radii=jnp.zeros((S, C)),
        ),
        step=jnp.int32(0),
    )


def make_multiscene_train_step(
    cfg: TrainConfig,
    optimizer=None,
    mesh: Optional[Mesh] = None,
) -> Callable:
    """step(state, cameras, images, depths, uncs, sh_degree) over S scenes.

    With a mesh, the scene axis is constrained to ``data`` and the Gaussian
    axis to ``model``.
    """
    if optimizer is None:
        optimizer = make_optimizer(cfg.optim)

    def constrain(tree, spec_leading):
        if mesh is None:
            return tree
        return jax.tree.map(
            lambda a: jax.lax.with_sharding_constraint(
                a, NamedSharding(mesh, spec_leading)
            ),
            tree,
        )

    def step_fn(state: TrainState, cameras: Camera, images, depths, uncs,
                active_sh_degree):
        S, C = state.params.means.shape[:2]
        # static per-batch camera resolution (make_batch asserts uniformity)
        cameras0_width, cameras0_height = cameras.width, cameras.height

        def scene_loss(params_s: GaussianParams, cam: Camera, image, depth,
                       unc, offset):
            out, proj = render(
                params_s, cam, cfg.model,
                active_sh_degree=active_sh_degree,
                means2d_offset=offset,
            )
            losses = compute_losses(out, image, depth, unc, cfg.depth,
                                    cfg.ssim_lambda)
            return losses.total, (losses.psnr, proj.radii, proj.valid)

        def total_loss(diff, offsets):
            diff = constrain(diff, P("data", "model"))
            params = _merge_params(state.params, diff)
            totals, aux = jax.vmap(scene_loss)(
                params, cameras, images, depths, uncs, offsets
            )
            return jnp.mean(totals), aux

        diff = _diff_params(state.params)
        offsets0 = jnp.zeros((S, C, 2), jnp.float32)
        (loss, (psnrs, radii, valid)), grads = jax.value_and_grad(
            total_loss, argnums=(0, 1), has_aux=True
        )(diff, offsets0)
        param_grads, screen_grads = grads

        updates, opt_state = optimizer.update(param_grads, state.opt_state, diff)
        diff = jax.tree.map(lambda p, u: p + u, diff, updates)
        params = _merge_params(state.params, constrain(diff, P("data", "model")))

        # normalized units (splatfacto's 0.5·max(W,H) grad rescale and the
        # max(W,H) radius fraction), same as the single-scene trainer —
        # all scenes share one camera resolution (asserted in make_batch)
        densify = jax.vmap(
            lambda s, g, r, v: update_stats(s, g, r, v, cameras0_width,
                                            cameras0_height)
        )(state.densify, screen_grads, radii, valid)
        new_state = TrainState(params=params, opt_state=opt_state,
                               densify=densify, step=state.step + 1)
        metrics = {"loss": loss, "psnr_per_scene": psnrs}
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,))


def multiscene_shardings(mesh: Mesh, state: TrainState):
    """scene axis → data, gaussian axis → model, everything else replicated."""
    S, C = state.params.means.shape[:2]

    def spec_for(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 2 and leaf.shape[:2] == (S, C):
            return NamedSharding(mesh, P("data", "model"))
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] == S:
            return NamedSharding(mesh, P("data"))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec_for, state)
