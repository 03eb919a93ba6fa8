"""End-to-end training smoke: fit a tiny synthetic scene (SURVEY.md §4 item 3).

Ground truth = an oracle render of random gaussians; the trainer starts from
noisy-position init and must drive loss down / PSNR up within a few hundred
steps on CPU.
"""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from touchgs_tpu.config import (
    DensifyConfig,
    DepthLossConfig,
    DepthLossType,
    ModelConfig,
    OptimConfig,
    RasterizeConfig,
    TrainConfig,
)
from touchgs_tpu.data.cameras import Cameras
from touchgs_tpu.data.scene import Scene
from touchgs_tpu.models.gaussians import init_from_points
from touchgs_tpu.models.splatfacto import render
from touchgs_tpu.train.trainer import Trainer

from tests.synthetic import look_at_camera, random_gaussians


def _make_synthetic_scene(n_views=6, width=96, height=72, n_gauss=300, seed=0):
    """Render GT images of a known gaussian cloud from a ring of cameras."""
    means, quats, scales, colors, opacities = random_gaussians(
        n_gauss, seed=seed, spread=0.5
    )
    cams = []
    for i in range(n_views):
        ang = 2 * np.pi * i / n_views
        eye = (2.0 * np.cos(ang), 2.0 * np.sin(ang), 1.0)
        cams.append(look_at_camera(eye=eye, width=width, height=height, focal=90.0))

    # use our model's own render path with a GT parameter set
    from touchgs_tpu.models.gaussians import GaussianParams
    from touchgs_tpu.ops.sh import rgb_to_sh_dc

    C = n_gauss
    gt = GaussianParams(
        means=means, quats=quats, log_scales=jnp.log(scales),
        logit_opacities=jnp.log(opacities / (1 - opacities)),
        sh_dc=rgb_to_sh_dc(colors),
        sh_rest=jnp.zeros((C, 0, 3)),
        alive=jnp.ones((C,), bool),
    )
    mcfg = ModelConfig(max_gaussians=C, sh_degree=0,
                       rasterize=RasterizeConfig(gaussian_chunk=128))
    images, depths = [], []
    for cam in cams:
        out, _ = render(gt, cam, mcfg, active_sh_degree=0)
        images.append(np.asarray(out.rgb))
        depths.append(np.asarray(out.depth))

    cameras = Cameras(
        fx=np.array([float(c.fx) for c in cams], np.float32),
        fy=np.array([float(c.fy) for c in cams], np.float32),
        cx=np.array([float(c.cx) for c in cams], np.float32),
        cy=np.array([float(c.cy) for c in cams], np.float32),
        c2w=np.stack([np.asarray(c.c2w) for c in cams]),
        width=width, height=height,
    )
    scene = Scene(
        cameras=cameras,
        images=np.stack(images),
        depths=np.stack(depths),
        uncertainties=np.ones((n_views, height, width), np.float32),
        i_train=np.arange(n_views),
        i_eval=np.array([], int),
        seed_points=np.asarray(means) + np.random.default_rng(1).normal(
            0, 0.05, means.shape
        ).astype(np.float32),
        seed_colors=np.asarray(colors),
        scale_factor=1.0,
        transform=np.eye(4)[:3],
        name="synthetic",
    )
    return scene


@pytest.fixture(scope="module")
def tiny_scene():
    return _make_synthetic_scene()


def _tiny_cfg(**depth_kwargs):
    return TrainConfig(
        max_steps=120,
        model=ModelConfig(
            max_gaussians=512, sh_degree=1,
            rasterize=RasterizeConfig(gaussian_chunk=128),
        ),
        depth=DepthLossConfig(**depth_kwargs) if depth_kwargs else DepthLossConfig(),
        # 3DGS-era prune/reset values: at 200 tiny-lr steps the opacities of
        # correct gaussians haven't risen past splatfacto's 0.1 cull yet
        densify=DensifyConfig(warmup_steps=40, refine_every=40, stop_refine_at=100,
                              reset_opacity_every=10_000,
                              prune_opacity_threshold=0.005,
                              reset_opacity_value=0.01),
        optim=OptimConfig(means_lr_max_steps=200),
        sh_degree_interval=50,
        log_every=20,
        seed=0,
    )


def test_training_improves_psnr(tiny_scene):
    trainer = Trainer(tiny_scene, _tiny_cfg())
    first = None

    def log(m):
        nonlocal first
        if first is None:
            first = m

    last = trainer.run(log_fn=log)
    assert np.isfinite(last["loss"])
    assert last["psnr"] > first["psnr"] + 2.0, (first, last)
    assert last["num_alive"] > 0


def test_training_with_uncertainty_depth_loss(tiny_scene):
    cfg = _tiny_cfg(
        depth_loss_mult=0.2,
        depth_loss_type=DepthLossType.DEPTH_UNCERTAINTY_WEIGHTED_LOSS,
        uncertainty_weight=1.0,
    )
    trainer = Trainer(tiny_scene, cfg)
    last = trainer.run(max_steps=60)
    assert np.isfinite(last["depth_loss"])
    assert last["depth_loss"] > 0


def test_render_after_training(tiny_scene):
    trainer = Trainer(tiny_scene, _tiny_cfg())
    trainer.run(max_steps=40)
    out = trainer.render_view(0)
    assert out.rgb.shape == (tiny_scene.images.shape[1], tiny_scene.images.shape[2], 3)
    assert not np.any(np.isnan(np.asarray(out.rgb)))


def test_resume_continues_from_step(tiny_scene):
    """ns-train --load-dir semantics: a restored state resumes schedules and
    the step budget from state.step instead of replaying from 0."""
    cfg = _tiny_cfg()
    tr = Trainer(tiny_scene, cfg)
    tr.run(max_steps=40)
    assert int(tr.state.step) == 40
    tr2 = Trainer(tiny_scene, cfg)
    tr2.state = tr.state  # what CheckpointManager.restore produces
    tr2.run(max_steps=60)
    assert int(tr2.state.step) == 60  # ran exactly the 20-step remainder
    assert all(h["step"] >= 40 for h in tr2.history)


def test_capacity_growth(tiny_scene):
    """Progressive capacity: arrays start at a small pow2 and double when
    densify fills them; padded slots are dead and the Adam moments stay
    slot-aligned, so training continues seamlessly after a growth."""
    from touchgs_tpu.train.trainer import grow_state

    cfg = dataclasses.replace(
        _tiny_cfg(), init_capacity=512, grow_trigger_fraction=0.25,
        model=ModelConfig(max_gaussians=1024, sh_degree=1,
                          rasterize=RasterizeConfig(gaussian_chunk=128)),
    )
    tr = Trainer(tiny_scene, cfg)
    assert tr.state.params.capacity == 512          # not max up front
    alive0 = float(tr.state.params.num_alive)
    last = tr.run()                                 # 300 alive > 0.25*512
    assert tr.state.params.capacity == 1024         # auto-grew at refine
    assert np.isfinite(last["loss"])
    assert last["num_alive"] >= alive0              # nothing lost in growth
    # manual grow_state: alive count and optimizer alignment preserved
    st = grow_state(tr.state, 2048)
    assert st.params.capacity == 2048
    assert float(st.params.num_alive) == float(tr.state.params.num_alive)
    assert not bool(st.params.alive[1024:].any())


def test_restore_after_capacity_growth(tiny_scene, tmp_path):
    """r3 advisor (high): a checkpoint saved AFTER a progressive-capacity
    growth has larger leaves than a fresh Trainer's template; restore must
    grow the template to the saved capacity first (via the sidecar capacity
    index) instead of failing on shape mismatch."""
    from touchgs_tpu.train.checkpoint import CheckpointManager, restore_trainer

    cfg = dataclasses.replace(
        _tiny_cfg(), init_capacity=512, grow_trigger_fraction=0.25,
        model=ModelConfig(max_gaussians=1024, sh_degree=1,
                          rasterize=RasterizeConfig(gaussian_chunk=128)),
    )
    tr = Trainer(tiny_scene, cfg)
    mgr = CheckpointManager(tmp_path / "run", cfg)
    tr.run(ckpt_manager=mgr)                        # grows 512 → 1024 mid-run
    assert tr.state.params.capacity == 1024
    saved_alive = float(tr.state.params.num_alive)
    step = mgr.latest_step()
    assert mgr.saved_capacity(step) == 1024
    mgr.close()

    tr2 = Trainer(tiny_scene, cfg)                  # fresh: capacity 512
    assert tr2.state.params.capacity == 512
    mgr2 = CheckpointManager(tmp_path / "run")
    restore_trainer(tr2, mgr2)                      # grows template, restores
    mgr2.close()
    assert tr2.state.params.capacity == 1024
    assert int(tr2.state.step) == step
    assert float(tr2.state.params.num_alive) == saved_alive
    out = tr2.render_view(0)
    assert not np.any(np.isnan(np.asarray(out.rgb)))


def test_restore_recovers_escalated_k_tile(tiny_scene, tmp_path):
    """r4 review: the truncation-guard's escalated k_tile must survive a
    checkpoint resume, or the resumed run silently trains lossy again."""
    from touchgs_tpu.train.checkpoint import CheckpointManager, restore_trainer
    from touchgs_tpu.train.trainer import make_train_step

    cfg = _tiny_cfg()
    tr = Trainer(tiny_scene, cfg)
    tr._k_tile = 1024  # as the truncation guard would have set
    tr.train_step = make_train_step(cfg, tr.optimizer, k_tile=1024)
    mgr = CheckpointManager(tmp_path / "run", cfg)
    tr.run(max_steps=20, ckpt_manager=mgr)
    mgr.close()

    tr2 = Trainer(tiny_scene, cfg)
    assert tr2._k_tile is None
    mgr2 = CheckpointManager(tmp_path / "run")
    restore_trainer(tr2, mgr2)
    mgr2.close()
    assert tr2._k_tile == 1024


def test_truncation_guard_escalates_past_2048(tmp_path):
    """r4 verdict #3: a scene whose single tile legitimately needs >2048
    entries must escalate all the way to lossless WITHOUT manual config —
    the old guard silently stopped at 2048 and trained lossy forever.

    Scene: one 32x32 tile covered by 3000 low-opacity gaussians — per-pixel
    alpha stays unsaturated, so every dropped entry is a real loss until
    k_tile >= 3000.
    """
    rng = np.random.default_rng(0)
    n = 3000
    pts = rng.uniform(-0.45, 0.45, (n, 3)).astype(np.float32)
    cols = rng.uniform(0.2, 0.9, (n, 3)).astype(np.float32)
    cam = look_at_camera(eye=(0.0, 0.0, 2.0), width=32, height=32, focal=30.0)
    cameras = Cameras(
        fx=np.array([30.0], np.float32), fy=np.array([30.0], np.float32),
        cx=np.array([16.0], np.float32), cy=np.array([16.0], np.float32),
        c2w=np.asarray(cam.c2w)[None], width=32, height=32,
    )
    scene = Scene(
        cameras=cameras,
        images=np.full((1, 32, 32, 3), 0.5, np.float32),
        depths=None, uncertainties=None,
        i_train=np.array([0]), i_eval=np.array([], int),
        seed_points=pts, seed_colors=cols,
        scale_factor=1.0, transform=np.eye(4)[:3], name="dense_tile",
    )
    cfg = TrainConfig(
        max_steps=10,
        model=ModelConfig(
            max_gaussians=4096, sh_degree=0, init_opacity=0.01,
            rasterize=RasterizeConfig(use_pallas=True, k_tile=1024),
        ),
        densify=DensifyConfig(warmup_steps=10 ** 6),
        grow_capacity=False,
        log_every=1,
        seed=0,
    )
    tr = Trainer(scene, cfg)
    tr.run(max_steps=10)
    # needed >2048: guard must have escalated past the old hard cap
    assert tr._k_tile is not None and tr._k_tile > 2048, (
        f"guard stopped at {tr._k_tile}")
    # and training is now lossless: the final logged window reports zero
    assert tr.history[-1].get("lossy_tiles_window_max", 0) == 0


def test_restore_zeroes_pixel_unit_max_radii(tiny_scene, tmp_path):
    """r4 advisor: a checkpoint saved before the pixel→normalized max_radii
    unit change has no ``densify_units`` marker — restore must zero the
    accumulated radii or the first refine mass-culls against the
    normalized screen-size gates."""
    import json

    from touchgs_tpu.train.checkpoint import CheckpointManager, restore_trainer

    cfg = _tiny_cfg()
    tr = Trainer(tiny_scene, cfg)
    tr.run(max_steps=10, ckpt_manager=CheckpointManager(tmp_path / "run", cfg))

    # new-format checkpoint: marker present, stats restored as-is
    tr2 = Trainer(tiny_scene, cfg)
    mgr = CheckpointManager(tmp_path / "run")
    restore_trainer(tr2, mgr)
    assert np.asarray(tr2.state.densify.grad_count).sum() > 0

    # simulate a pre-r4 checkpoint: strip the unit marker from the sidecar
    idx_path = tmp_path / "run" / "capacities.json"
    idx = json.loads(idx_path.read_text())
    for entry in idx.values():
        entry.pop("densify_units", None)
    idx_path.write_text(json.dumps(idx))
    tr3 = Trainer(tiny_scene, cfg)
    mgr3 = CheckpointManager(tmp_path / "run")
    restore_trainer(tr3, mgr3)
    mgr3.close()
    mgr.close()
    assert np.asarray(tr3.state.densify.max_radii).max() == 0.0
