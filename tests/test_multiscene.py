"""Multi-scene batch training tests (scene axis sharded over 'data')."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from touchgs_tpu.config import ModelConfig, RasterizeConfig, TrainConfig
from touchgs_tpu.models.gaussians import init_from_points
from touchgs_tpu.parallel.mesh import make_mesh
from touchgs_tpu.parallel.multiscene import (
    make_multiscene_refine_step,
    make_multiscene_reset_opacity_step,
    make_multiscene_state,
    make_multiscene_train_step,
    multiscene_shardings,
    run_multiscene,
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


def test_multiscene_step_parity_vs_single_scene(batch):
    """The batched S-scene step must train each scene EXACTLY as the
    single-scene trainer would (scenes are independent; the step
    differentiates the sum of per-scene losses)."""
    from touchgs_tpu.models.densify import DensifyState
    from touchgs_tpu.train.trainer import (TrainState, _diff_params,
                                           make_train_step)

    cfg, params, cams, images, depths, uncs = batch
    S = len(params)
    opt = make_optimizer(cfg.optim)
    ms_state = make_multiscene_state(params, cfg, opt)
    ms_step = make_multiscene_train_step(cfg, opt)
    for _ in range(2):
        ms_state, ms_m = ms_step(ms_state, cams, images, depths, uncs,
                                 jnp.int32(1))

    single_step = make_train_step(cfg, opt)
    for s in range(S):
        # copy: single_step donates its state — the fixture's params must
        # survive for later tests
        p_s = jax.tree.map(jnp.copy, params[s])
        st = TrainState(
            params=p_s,
            opt_state=opt.init(_diff_params(p_s)),
            densify=DensifyState.zeros(params[s].capacity),
            step=jnp.int32(0),
        )
        cam = jax.tree.map(lambda a: a[s] if getattr(a, "ndim", 0) else a,
                           cams)
        for _ in range(2):
            st, m = single_step(st, cam, images[s], depths[s], uncs[s],
                                jnp.int32(1))
        np.testing.assert_allclose(
            np.asarray(ms_state.params.means[s]),
            np.asarray(st.params.means), atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(ms_state.densify.grad_accum[s]),
            np.asarray(st.densify.grad_accum), rtol=2e-4, atol=1e-7)
        np.testing.assert_allclose(float(ms_m["psnr_per_scene"][s]),
                                   float(m["psnr"]), atol=1e-3)


def test_multiscene_refine_parity_vs_single_scene(batch):
    """vmapped refine ≡ per-scene refine with the same keys/flags, including
    the per-scene Adam-moment reset at touched slots."""
    from touchgs_tpu.models.densify import DensifyState, refine
    from touchgs_tpu.train.optim import reset_opt_slots
    from touchgs_tpu.train.trainer import TrainState, _diff_params

    cfg, params, cams, images, depths, uncs = batch
    S = len(params)
    opt = make_optimizer(cfg.optim)
    state = make_multiscene_state(params, cfg, opt)
    step = make_multiscene_train_step(cfg, opt)
    # a few steps so grad stats are non-trivial
    for _ in range(3):
        state, _ = step(state, cams, images, depths, uncs, jnp.int32(1))

    keys = jax.random.split(jax.random.PRNGKey(7), S)
    refine_step = make_multiscene_refine_step(cfg)
    # copy state (donated by refine_step)
    state_copy = jax.tree.map(jnp.copy, state)
    refined = refine_step(state_copy, keys, True, True, False)

    alive_counts = []
    for s in range(S):
        p_s = jax.tree.map(lambda a: a[s], state.params)
        d_s = jax.tree.map(lambda a: a[s], state.densify)
        p_ref, d_ref, touched = refine(p_s, d_s, keys[s], cfg.densify,
                                       do_densify=True, use_size_cull=True,
                                       use_screen_size=False)
        np.testing.assert_allclose(np.asarray(refined.params.means[s]),
                                   np.asarray(p_ref.means), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(refined.params.alive[s]),
                                      np.asarray(p_ref.alive))
        # per-scene opt-moment reset matches the single-scene helper
        opt_s = jax.tree.map(
            lambda a: a[s] if (getattr(a, "ndim", 0) >= 2
                               and a.shape[:2] == (S, p_s.capacity)) else a,
            state.opt_state)
        opt_ref = reset_opt_slots(opt_s, touched, p_s.capacity)
        np.testing.assert_allclose(
            np.asarray(refined.opt_state.mu["means"][s]),
            np.asarray(opt_ref.mu["means"]), atol=1e-7)
        alive_counts.append(int(np.asarray(p_ref.alive).sum()))
    # refine actually did something in at least one scene
    before = np.asarray(state.params.alive).sum(axis=-1)
    assert any(a != b for a, b in zip(alive_counts, before.tolist()))


def test_run_multiscene_densifies_per_scene(batch):
    """End-to-end: the multi-scene driver fires densification and scenes
    end with different alive counts (per-scene stats, not a shared one)."""
    import dataclasses as dc

    from touchgs_tpu.config import DensifyConfig

    cfg, params, cams, images, depths, uncs = batch
    cfg = dc.replace(
        cfg,
        densify=DensifyConfig(warmup_steps=2, refine_every=4,
                              stop_refine_at=100,
                              reset_opacity_every=10 ** 6,
                              grad_threshold=1e-6),
        log_every=10,
    )
    opt = make_optimizer(cfg.optim)
    state = make_multiscene_state(params, cfg, opt)
    step = make_multiscene_train_step(cfg, opt)
    alive0 = np.asarray(jnp.sum(state.params.alive, axis=-1))

    def batch_fn(step_i, rng):
        return (cams, images, depths, uncs, jnp.int32(1))

    logs = []
    state, metrics = run_multiscene(
        state, cfg, step, batch_fn, steps=13, n_train_views=1,
        log_fn=logs.append)
    alive1 = np.asarray(jnp.sum(state.params.alive, axis=-1))
    assert (alive1 != alive0).any(), "densification never fired"
    assert logs and "alive_per_scene" in logs[-1]
    assert np.isfinite(float(np.asarray(metrics["loss"])))


def test_multiscene_refine_sharded(batch):
    """Refine runs under the mesh and matches the unsharded refine."""
    cfg, params, cams, images, depths, uncs = batch
    mesh = make_mesh(data=4, model=2)
    opt = make_optimizer(cfg.optim)
    state = make_multiscene_state(params, cfg, opt)
    step = make_multiscene_train_step(cfg, opt)
    for _ in range(3):
        state, _ = step(state, cams, images, depths, uncs, jnp.int32(1))
    keys = jax.random.split(jax.random.PRNGKey(7), len(params))

    ref = make_multiscene_refine_step(cfg)(
        jax.tree.map(jnp.copy, state), keys, True, True, False)

    sharded = jax.device_put(jax.tree.map(jnp.copy, state),
                             multiscene_shardings(mesh, state))
    got = make_multiscene_refine_step(cfg, mesh=mesh)(
        sharded, keys, True, True, False)
    np.testing.assert_array_equal(np.asarray(got.params.alive),
                                  np.asarray(ref.params.alive))
    np.testing.assert_allclose(np.asarray(got.params.means),
                               np.asarray(ref.params.means), atol=1e-6)
