"""Per-group optimizers (splatfacto's per-param-group Adam, SURVEY.md §2.9).

Six Adam groups with the splatfacto learning rates; the means group uses an
exponential decay schedule.  Implemented as `optax.multi_transform` over a
dict-of-arrays param pytree (the differentiable subset of `GaussianParams`).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from touchgs_tpu.config import OptimConfig

PARAM_GROUPS = ("means", "quats", "log_scales", "logit_opacities", "sh_dc", "sh_rest")


def make_optimizer(cfg: OptimConfig) -> optax.GradientTransformation:
    means_schedule = optax.exponential_decay(
        init_value=cfg.means_lr_init,
        transition_steps=cfg.means_lr_max_steps,
        decay_rate=cfg.means_lr_final / cfg.means_lr_init,
        end_value=cfg.means_lr_final,
    )
    txs = {
        "means": optax.adam(means_schedule, eps=cfg.eps),
        "quats": optax.adam(cfg.quats_lr, eps=cfg.eps),
        "log_scales": optax.adam(cfg.scales_lr, eps=cfg.eps),
        "logit_opacities": optax.adam(cfg.opacities_lr, eps=cfg.eps),
        "sh_dc": optax.adam(cfg.features_dc_lr, eps=cfg.eps),
        "sh_rest": optax.adam(cfg.features_rest_lr, eps=cfg.eps),
    }
    return optax.multi_transform(txs, {g: g for g in PARAM_GROUPS})


def reset_opt_slots(opt_state, touched: jnp.ndarray, capacity: int):
    """Zero Adam moments at (re)written Gaussian slots after densification.

    splatfacto resets optimizer state for new gaussians; here that's a masked
    zeroing of every optimizer-state leaf whose leading axis is the Gaussian
    capacity.
    """

    def maybe_zero(leaf):
        if hasattr(leaf, "shape") and leaf.ndim >= 1 and leaf.shape[0] == capacity:
            mask = touched.reshape((capacity,) + (1,) * (leaf.ndim - 1))
            return jnp.where(mask, jnp.zeros_like(leaf), leaf)
        return leaf

    return jax.tree.map(maybe_zero, opt_state)
