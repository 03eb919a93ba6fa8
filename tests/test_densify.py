"""Densification bookkeeping tests (clone/split/prune over masked arrays)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from touchgs_tpu.config import DensifyConfig
from touchgs_tpu.models.densify import DensifyState, refine, reset_opacities, update_stats
from touchgs_tpu.models.gaussians import GaussianParams


def _params(capacity=32, n_alive=8, scale=0.005):
    C = capacity
    rng = np.random.default_rng(0)
    alive = np.zeros(C, bool)
    alive[:n_alive] = True
    return GaussianParams(
        means=jnp.asarray(rng.normal(0, 0.3, (C, 3)).astype(np.float32)),
        quats=jnp.tile(jnp.array([1.0, 0, 0, 0]), (C, 1)),
        log_scales=jnp.full((C, 3), np.log(scale), jnp.float32),
        logit_opacities=jnp.full((C,), 2.0, jnp.float32),
        sh_dc=jnp.zeros((C, 3)),
        sh_rest=jnp.zeros((C, 0, 3)),
        alive=jnp.asarray(alive),
    )


def _state_with_grads(params, grad_value):
    C = params.capacity
    st = DensifyState.zeros(C)
    g = jnp.full((C, 2), grad_value)
    return update_stats(st, g, jnp.ones((C,)), params.alive)


def test_clone_small_gaussians():
    cfg = DensifyConfig(grad_threshold=0.001, densify_size_threshold=0.01)
    params = _params(scale=0.005)  # below size threshold → clone
    st = _state_with_grads(params, 0.01)
    n0 = int(params.num_alive)
    new_params, _, touched = refine(params, st, jax.random.PRNGKey(0), cfg)
    assert int(new_params.num_alive) == 2 * n0  # every alive gaussian cloned
    assert int(touched.sum()) == n0
    # clones land at the sources' positions
    assert bool(jnp.all(jnp.isin(new_params.means[touched][:, 0],
                                 params.means[params.alive][:, 0])))


def test_split_large_gaussians():
    cfg = DensifyConfig(grad_threshold=0.001, densify_size_threshold=0.01,
                        split_samples=2)
    params = _params(scale=0.05)  # above size threshold → split
    st = _state_with_grads(params, 0.01)
    n0 = int(params.num_alive)
    new_params, _, _ = refine(params, st, jax.random.PRNGKey(0), cfg)
    # each split: source dies, 2 children born → net +1 each
    assert int(new_params.num_alive) == 2 * n0
    # children have shrunk scales
    child_scales = new_params.log_scales[new_params.alive]
    assert float(child_scales.max()) < np.log(0.05) + 1e-5


def test_no_refine_below_threshold():
    cfg = DensifyConfig(grad_threshold=0.5)
    params = _params()
    st = _state_with_grads(params, 0.01)  # small grads
    new_params, _, touched = refine(params, st, jax.random.PRNGKey(0), cfg)
    assert int(new_params.num_alive) == int(params.num_alive)
    assert int(touched.sum()) == 0


def test_prune_low_opacity():
    cfg = DensifyConfig(grad_threshold=10.0, prune_opacity_threshold=0.005)
    params = _params()
    params = dataclasses.replace(
        params,
        logit_opacities=params.logit_opacities.at[:4].set(-10.0),  # ~4.5e-5
    )
    st = DensifyState.zeros(params.capacity)
    new_params, _, _ = refine(params, st, jax.random.PRNGKey(0), cfg)
    assert int(new_params.num_alive) == int(params.num_alive) - 4


def test_capacity_saturation():
    """When free slots run out, refine must not corrupt state."""
    cfg = DensifyConfig(grad_threshold=0.001, densify_size_threshold=0.01)
    params = _params(capacity=10, n_alive=8, scale=0.005)
    st = _state_with_grads(params, 0.01)
    new_params, _, _ = refine(params, st, jax.random.PRNGKey(0), cfg)
    assert int(new_params.num_alive) <= 10
    assert int(new_params.num_alive) >= 8


def test_reset_opacities():
    params = _params()
    out = reset_opacities(params, 0.01)
    assert float(jax.nn.sigmoid(out.logit_opacities).max()) <= 0.0101
