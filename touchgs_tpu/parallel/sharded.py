"""pjit'd multi-device training step (data=tiles × model=gaussians).

One jitted SPMD program per train step:

1. Gaussian params + Adam moments live sharded over ``model`` (leading axis).
2. Projection runs shard-local (elementwise over the Gaussian axis).
3. Projected 2D splats (~12 floats/Gaussian) are all-gathered (sharding
   constraint → replicated) for binning; the gather's transpose reduces
   per-Gaussian gradients across the ``data`` axis.  MEASURED (compiled HLO
   of this step on an 8-device virtual mesh, see SCALING_r03.md): XLA emits
   that reduction as an **all-reduce** of the per-Gaussian gradient tensor
   (e.g. ``all-reduce (f32[C/model, 16], ...)``), NOT the reduce-scatter a
   hand-scheduled implementation would use — each model shard keeps only its
   slice afterwards, so ~(model−1)/model of the all-reduce payload is wasted
   bandwidth.  Whether the collective overlaps the backward sweep is decided
   by XLA's async-collective pass on real multi-chip hardware and is not
   observable on this single-chip setup; treat overlap as unverified.
4. The compositing tile axis is sharded over ``data``.
5. Loss reduction + param update happen under their natural shardings; the
   optimizer update is shard-local over ``model``.

Run the returned step function normally — it enters the mesh context itself.
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from touchgs_tpu.config import TrainConfig
from touchgs_tpu.data.cameras import Camera
from touchgs_tpu.models.densify import update_stats
from touchgs_tpu.models.splatfacto import compute_losses, render
from touchgs_tpu.train.optim import make_optimizer
from touchgs_tpu.train.trainer import TrainState, _diff_params, _merge_params


def make_sharded_train_step(
    cfg: TrainConfig, mesh: Mesh, optimizer=None
) -> Callable:
    """Returns step(state, camera, image, depth, unc, active_sh_degree)."""
    if optimizer is None:
        optimizer = make_optimizer(cfg.optim)
    n_data = mesh.shape["data"]
    replicate = NamedSharding(mesh, P())

    def step_fn(state: TrainState, camera: Camera, image, depth, unc,
                active_sh_degree):
        C = state.params.capacity

        def constrain_params(tree):
            return jax.tree.map(
                lambda a: jax.lax.with_sharding_constraint(
                    a, NamedSharding(mesh, P("model"))
                ),
                tree,
            )

        def loss_fn(diff, means2d_offset):
            diff = constrain_params(diff)
            params = _merge_params(state.params, diff)
            out, proj = render(
                params, camera, cfg.model,
                active_sh_degree=active_sh_degree,
                means2d_offset=means2d_offset,
                tile_shards=n_data,
                tile_pspec=NamedSharding(mesh, P("data")),
            )
            losses = compute_losses(
                out, image, depth, unc, cfg.depth, cfg.ssim_lambda
            )
            return losses.total, (losses, proj)

        diff = _diff_params(state.params)
        offset0 = jnp.zeros((C, 2), jnp.float32)
        (loss, (losses, proj)), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(diff, offset0)
        param_grads, screen_grads = grads
        param_grads = constrain_params(param_grads)

        updates, opt_state = optimizer.update(param_grads, state.opt_state, diff)
        diff = jax.tree.map(lambda p, u: p + u, diff, updates)
        params = _merge_params(state.params, constrain_params(diff))

        densify = update_stats(state.densify, screen_grads, proj.radii,
                               proj.valid, camera.width, camera.height)
        new_state = TrainState(
            params=params, opt_state=opt_state, densify=densify,
            step=state.step + 1,
        )
        metrics = {
            "loss": loss, "psnr": losses.psnr, "depth_loss": losses.depth_loss,
            "num_alive": state.params.num_alive,
        }
        return new_state, metrics

    # all constraints use NamedSharding, so no ambient mesh context is needed
    return jax.jit(step_fn, donate_argnums=(0,))


def shard_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Place a TrainState on the mesh (params/moments over 'model')."""
    from touchgs_tpu.parallel.mesh import state_shardings

    return jax.device_put(state, state_shardings(mesh, state))
