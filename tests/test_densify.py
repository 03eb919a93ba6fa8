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


def test_grad_normalization_resolution_invariant():
    """splatfacto units: update_stats rescales pixel grads by 0.5*max(W,H),
    so the densify decision for the same scene is resolution-independent
    (gsplat convention — raw pixel grads would differ ~2x between these)."""
    import jax

    from touchgs_tpu.config import ModelConfig, RasterizeConfig
    from touchgs_tpu.models.splatfacto import render
    from tests.synthetic import look_at_camera

    def normalized_avg_grad(width, height):
        C = 1
        params = GaussianParams(
            means=jnp.array([[0.05, 0.0, 0.0]], jnp.float32),
            quats=jnp.array([[1.0, 0, 0, 0]], jnp.float32),
            log_scales=jnp.full((C, 3), np.log(0.15), jnp.float32),
            logit_opacities=jnp.full((C,), 1.0, jnp.float32),
            sh_dc=jnp.full((C, 3), 1.0, jnp.float32),
            sh_rest=jnp.zeros((C, 0, 3), jnp.float32),
            alive=jnp.ones((C,), bool),
        )
        target_params = dataclasses.replace(
            params, means=jnp.array([[-0.05, 0.0, 0.0]], jnp.float32))
        cam = look_at_camera(eye=(0, 0, 2.0), width=width, height=height,
                             focal=1.2 * width)
        mcfg = ModelConfig(max_gaussians=C, sh_degree=0,
                           rasterize=RasterizeConfig(gaussian_chunk=128))
        target, _ = render(target_params, cam, mcfg, active_sh_degree=0)
        target = jax.lax.stop_gradient(target.rgb)

        def loss(off):
            out, _ = render(params, cam, mcfg, active_sh_degree=0,
                            means2d_offset=off)
            return jnp.mean(jnp.abs(out.rgb - target))

        g = jax.grad(loss)(jnp.zeros((C, 2), jnp.float32))
        st = update_stats(DensifyState.zeros(C), g, jnp.ones((C,)),
                          params.alive, width, height)
        return float(st.grad_accum[0] / st.grad_count[0])

    g_lo = normalized_avg_grad(64, 64)
    g_hi = normalized_avg_grad(128, 128)
    assert g_lo > 0 and g_hi > 0
    # normalized units agree across resolutions (raw pixel grads differ ~2x)
    assert abs(g_hi - g_lo) / max(g_hi, g_lo) < 0.25, (g_lo, g_hi)
