"""Training steps for the DenseTact sensor nets.

The reference ships the nets' TRAINING machinery alongside inference
(silog/RMSE losses at `/root/reference/.../Img2Depth/utils.py:171-250`, the
DenseDepth combined loss at `.../networks/DenseNet_loss.py`, the torch
train loops implied by `newcrf_utils.py` checkpoint plumbing).  This module
is the TPU-native counterpart: jitted vmapped train steps over the flax
nets in `sensor_nets.py`, using the parity-tested loss formulas in
`touch/losses.py`.

The depth net trains with the reference's ``prev_net_loss`` combination
(SSIM + gradient + θ·L1, `utils.py:189-210`) or pure silog; the force net
with the reference's ``rmseloss`` (`utils.py:243-250`).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from touchgs_tpu.touch.losses import (
    densetact_depth_loss,
    rmse_loss,
    silog_loss,
)


def make_depth_train_step(
    net,
    optimizer: optax.GradientTransformation,
    loss: str = "densetact",
    variance_focus: float = 0.85,
    theta: float = 0.2,
) -> Callable:
    """(params, opt_state, images (B,H,W,3), depths (B,H,W)) → (params,
    opt_state, metrics).  ``loss``: "densetact" (SSIM+∇+θ·L1, the DenseDepth
    combination the reference trains with) or "silog"."""

    def loss_fn(params, images, depths):
        preds = jax.vmap(lambda im: net.apply(params, im))(images)
        if loss == "silog":
            # reference masks zero-depth pixels (silog_loss mask arg)
            l = silog_loss(preds, depths, depths > 0,
                           variance_focus=variance_focus)
        else:
            l = densetact_depth_loss(preds, depths, theta=theta)
        l1 = jnp.mean(jnp.abs(preds - depths))
        return l, l1

    @jax.jit
    def step(params, opt_state, images, depths):
        (l, l1), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, images, depths)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": l, "l1": l1}

    return step


def make_force_train_step(
    net,
    optimizer: optax.GradientTransformation,
) -> Callable:
    """(params, opt_state, images (B,H,W,3), forces (B,6) normalized) →
    (params, opt_state, metrics) — the reference's rmseloss on the
    normalized 6-DoF head output."""

    def loss_fn(params, images, forces):
        preds = jax.vmap(lambda im: net.apply(params, im))(images)
        return rmse_loss(preds, forces)

    @jax.jit
    def step(params, opt_state, images, forces):
        l, grads = jax.value_and_grad(loss_fn)(params, images, forces)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": l}

    return step
