"""Per-group optimizers (splatfacto's per-param-group Adam, SURVEY.md §2.9).

Six Adam groups with the splatfacto learning rates; the means group uses an
exponential decay schedule.  Hand-fused single-kernel Adam over the
dict-of-arrays param pytree (the differentiable subset of `GaussianParams`):
numerically identical to ``optax.multi_transform`` of six ``optax.adam``s
(same m/v/bias-correction/eps placement), but one fused elementwise pass —
the multi_transform wrapper measured 1.7 ms/step at 7.7M params on v5e
against ~0.3 ms of actual HBM traffic.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from touchgs_tpu.config import OptimConfig

PARAM_GROUPS = ("means", "quats", "log_scales", "logit_opacities", "sh_dc", "sh_rest")


class FusedAdamState(NamedTuple):
    count: jnp.ndarray          # shared step counter (int32 scalar)
    mu: dict
    nu: dict


def make_optimizer(cfg: OptimConfig,
                   b1: float = 0.9, b2: float = 0.999,
                   extra_lrs: dict | None = None
                   ) -> optax.GradientTransformation:
    means_schedule = optax.exponential_decay(
        init_value=cfg.means_lr_init,
        transition_steps=cfg.means_lr_max_steps,
        decay_rate=cfg.means_lr_final / cfg.means_lr_init,
        end_value=cfg.means_lr_final,
    )
    fixed_lrs = {
        "quats": cfg.quats_lr,
        "log_scales": cfg.scales_lr,
        "logit_opacities": cfg.opacities_lr,
        "sh_dc": cfg.features_dc_lr,
        "sh_rest": cfg.features_rest_lr,
    }
    if extra_lrs:
        # e.g. {"pose_deltas": PoseOptConfig.lr} — any extra diff group
        fixed_lrs.update(extra_lrs)

    def init_fn(params):
        zeros = {k: jnp.zeros_like(v) for k, v in params.items()}
        return FusedAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=zeros,
            nu={k: jnp.zeros_like(v) for k, v in params.items()},
        )

    def update_fn(grads, state, params=None):
        del params
        count = state.count + 1
        c = count.astype(jnp.float32)
        # optax.adam bias correction: m̂ = m/(1−b1^t), v̂ = v/(1−b2^t);
        # update = −lr · m̂ / (sqrt(v̂) + eps)   (eps after the sqrt)
        bc1 = 1.0 - b1 ** c
        bc2 = 1.0 - b2 ** c
        # optax.exponential_decay is evaluated at the PRE-increment count,
        # matching optax.adam's scale_by_schedule semantics
        lrs = dict(fixed_lrs, means=means_schedule(state.count))
        mu = {}
        nu = {}
        updates = {}
        for k, g in grads.items():
            m = b1 * state.mu[k] + (1.0 - b1) * g
            v = b2 * state.nu[k] + (1.0 - b2) * (g * g)
            mu[k] = m
            nu[k] = v
            updates[k] = (-lrs[k]) * (m / bc1) / (
                jnp.sqrt(v / bc2) + cfg.eps)
        return updates, FusedAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


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
