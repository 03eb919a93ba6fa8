"""pjit'd multi-device training step (data=tiles × model=gaussians).

One jitted SPMD program per train step (round-4 explicit-reduce-scatter
design; the round-3 implicit form measured an ALL-reduce in HLO,
SCALING_r03.md §3):

1. Gaussian params + Adam moments live fully sharded over EVERY device —
   leading axis split over ``('model', 'data')`` (ZeRO-style; the optimizer
   update is shard-local with zero resharding).
2. Projection runs shard-local (elementwise over the Gaussian axis).
3. The packed attribute table enters the rasterizer's shard_map region
   sharded and is ``all_gather``-ed (tiled) inside; the all_gather's
   TRANSPOSE is ``psum_scatter`` — the compiled HLO carries a literal
   ``reduce-scatter`` for the per-Gaussian gradient reduction, each device
   receiving exactly its 1/(model·data) slice (no wasted payload, unlike
   the all-reduce XLA emits for the implicit form).
4. The compositing tile axis is sharded over ``('data', 'model')`` — every
   chip composites a distinct slice of the tile grid (the round-3 design
   replicated tile work across ``model``, wasting (model−1)/model of the
   fleet's compositing throughput).
5. Loss reduction happens under its natural sharding.

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
    n_total = mesh.shape["data"] * mesh.shape["model"]
    gaussian_spec = NamedSharding(mesh, P(("model", "data")))

    def step_fn(state: TrainState, camera: Camera, image, depth, unc,
                active_sh_degree):
        C = state.params.capacity

        def constrain_params(tree):
            return jax.tree.map(
                lambda a: jax.lax.with_sharding_constraint(a, gaussian_spec),
                tree,
            )

        def loss_fn(diff, means2d_offset):
            diff = constrain_params(diff)
            params = _merge_params(state.params, diff)
            out, proj = render(
                params, camera, cfg.model,
                active_sh_degree=active_sh_degree,
                means2d_offset=means2d_offset,
                tile_shards=n_total,
                tile_pspec=NamedSharding(mesh, P(("data", "model"))),
                gaussian_pspec=gaussian_spec,
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
