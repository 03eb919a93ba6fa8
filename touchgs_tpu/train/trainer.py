"""Training loop for depth-supervised Gaussian splatting.

TPU-native rebuild of the fork's `ns-train depth-gaussian-splatting` trainer
(SURVEY.md §3.2): per step — render one training view, photometric + depth
loss, per-group Adam update, densify bookkeeping; periodic refine / opacity
reset / checkpoint.  The hot step is one jitted function; densification runs
as a second jitted function at refine boundaries (host-side schedule, fixed
shapes throughout).
"""
from __future__ import annotations

import dataclasses
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from touchgs_tpu.config import TrainConfig
from touchgs_tpu.data.cameras import Camera
from touchgs_tpu.data.scene import Scene
from touchgs_tpu.models.densify import (
    DensifyState,
    refine,
    reset_opacities,
    update_stats,
)
from touchgs_tpu.models.gaussians import GaussianParams, init_from_points, init_random
from touchgs_tpu.models.splatfacto import compute_losses, render
from touchgs_tpu.train.optim import PARAM_GROUPS, make_optimizer, reset_opt_slots


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: GaussianParams
    opt_state: object
    densify: DensifyState
    step: jax.Array
    # (n_cameras, 6) SO3xR3 tangents when cfg.pose_opt.mode != "off"
    # (legacy/config_tactile.py:36-37), else None
    pose_deltas: Optional[jax.Array] = None


def _diff_params(params: GaussianParams) -> dict:
    return {g: getattr(params, g) for g in PARAM_GROUPS}


def _merge_params(params: GaussianParams, diff: dict) -> GaussianParams:
    return dataclasses.replace(params, **diff)


def make_train_step(cfg: TrainConfig, optimizer,
                    k_tile: Optional[int] = None) -> Callable:
    """Build the jitted train step: (state, camera, image, depth, unc,
    active_sh_degree[, view_idx]) → (state, metrics).  ``view_idx`` selects
    the camera's row of ``state.pose_deltas`` when the SO3xR3 pose optimizer
    is enabled (cfg.pose_opt.mode).  ``k_tile`` overrides the config's
    per-tile entry cap (the trainer escalates it when truncation telemetry
    reports lossy tiles)."""
    pose_on = cfg.pose_opt.mode != "off"

    def step_fn(state: TrainState, camera: Camera, image, depth, unc,
                active_sh_degree, view_idx=None):
        C = state.params.capacity

        def loss_fn(diff, means2d_offset):
            params = _merge_params(
                state.params,
                {k: v for k, v in diff.items() if k != "pose_deltas"})
            cam = camera
            if pose_on:
                from touchgs_tpu.models.pose_opt import apply_pose_delta

                cam = apply_pose_delta(camera, diff["pose_deltas"][view_idx])
            out, proj = render(
                params, cam, cfg.model,
                active_sh_degree=active_sh_degree,
                means2d_offset=means2d_offset,
                k_tile=k_tile,
            )
            losses = compute_losses(
                out, image, depth, unc, cfg.depth, cfg.ssim_lambda
            )
            return losses.total, (losses, proj, out.lossy_tiles)

        diff = _diff_params(state.params)
        if pose_on:
            diff["pose_deltas"] = state.pose_deltas
        offset0 = jnp.zeros((C, 2), jnp.float32)
        (loss, (losses, proj, lossy_tiles)), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(diff, offset0)
        param_grads, screen_grads = grads

        updates, opt_state = optimizer.update(param_grads, state.opt_state, diff)
        diff = jax.tree.map(lambda p, u: p + u, diff, updates)
        pose_deltas = diff.pop("pose_deltas", state.pose_deltas)
        params = _merge_params(state.params, diff)

        densify = update_stats(state.densify, screen_grads, proj.radii,
                               proj.valid, camera.width, camera.height)
        new_state = TrainState(
            params=params, opt_state=opt_state, densify=densify,
            step=state.step + 1, pose_deltas=pose_deltas,
        )
        metrics = {
            "loss": loss,
            "rgb_l1": losses.rgb_l1,
            "ssim_loss": losses.ssim_loss,
            "depth_loss": losses.depth_loss,
            "psnr": losses.psnr,
            "num_alive": state.params.num_alive,
        }
        if lossy_tiles is not None:  # Pallas path truncation telemetry
            metrics["lossy_tiles"] = lossy_tiles
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,))


def make_refine_step(cfg: TrainConfig):
    """Jitted refine with splatfacto's step-dependent schedule flags as
    static args (a handful of flag transitions per run → a handful of
    recompiles, each cached)."""

    def refine_fn(state: TrainState, key, do_densify=True,
                  use_size_cull=True, use_screen_size=False):
        params, densify, touched = refine(
            state.params, state.densify, key, cfg.densify,
            do_densify=do_densify, use_size_cull=use_size_cull,
            use_screen_size=use_screen_size,
        )
        opt_state = reset_opt_slots(state.opt_state, touched, params.capacity)
        return dataclasses.replace(
            state, params=params, opt_state=opt_state, densify=densify
        )

    return jax.jit(refine_fn, donate_argnums=(0,),
                   static_argnums=(2, 3, 4))


def make_reset_opacity_step(cfg: TrainConfig):
    def reset_fn(state: TrainState):
        params = reset_opacities(state.params, cfg.densify.reset_opacity_value)
        return dataclasses.replace(state, params=params)

    return jax.jit(reset_fn, donate_argnums=(0,))


def _next_pow2(n: int) -> int:
    return 1 << max(int(n) - 1, 1).bit_length()


def grow_state(state: TrainState, new_capacity: int) -> TrainState:
    """Re-pad every per-gaussian leaf of the train state to ``new_capacity``.

    Leaves whose leading dimension equals the current capacity (params,
    densify stats, Adam moments — the same heuristic as
    ``reset_opt_slots``) are zero-padded; padded slots are dead
    (``alive`` pads to False) so semantics are unchanged.  The jitted
    steps recompile once per growth, which happens O(log capacity) times
    per run.
    """
    old = state.params.capacity
    if new_capacity <= old:
        return state

    def pad(leaf, fill=0.0):
        if (hasattr(leaf, "shape") and getattr(leaf, "ndim", 0) >= 1
                and leaf.shape[0] == old):
            width = [(0, new_capacity - old)] + [(0, 0)] * (leaf.ndim - 1)
            return jnp.pad(leaf, width, constant_values=fill)
        return leaf

    # log_scales pads with a large negative (scale ≈ 0) so virgin slots can
    # never trip a size-based prune before their first write (r3 advisor)
    padded_params = jax.tree.map(pad, state.params)
    padded_params = dataclasses.replace(
        padded_params, log_scales=pad(state.params.log_scales, fill=-12.0))

    return TrainState(
        params=padded_params,
        opt_state=jax.tree.map(pad, state.opt_state),
        densify=jax.tree.map(pad, state.densify),
        step=state.step,
        pose_deltas=state.pose_deltas,
    )


class Trainer:
    """Host-side training driver for one scene."""

    def __init__(self, scene: Scene, cfg: TrainConfig):
        self.scene = scene
        self.cfg = cfg
        pose_on = cfg.pose_opt.mode != "off"
        self.optimizer = make_optimizer(
            cfg.optim,
            extra_lrs={"pose_deltas": cfg.pose_opt.lr} if pose_on else None,
        )

        n_seed = (len(scene.seed_points)
                  if scene.seed_points is not None
                  and len(scene.seed_points) > 0 else 50_000)
        init_cap = cfg.model.max_gaussians
        if cfg.grow_capacity:
            init_cap = min(init_cap,
                           cfg.init_capacity
                           or max(_next_pow2(2 * n_seed), 4096))
        if scene.seed_points is not None and len(scene.seed_points) > 0:
            params = init_from_points(
                scene.seed_points, scene.seed_colors,
                capacity=init_cap,
                sh_degree=cfg.model.sh_degree,
                init_opacity=cfg.model.init_opacity,
                seed=cfg.seed,
            )
        else:
            params = init_random(
                n=min(50_000, cfg.model.max_gaussians // 2),
                capacity=init_cap,
                sh_degree=cfg.model.sh_degree,
                init_opacity=cfg.model.init_opacity,
                seed=cfg.seed,
            )
        pose_deltas = (
            jnp.zeros((len(scene.cameras), 6), jnp.float32) if pose_on
            else None
        )
        diff0 = _diff_params(params)
        if pose_on:
            diff0["pose_deltas"] = pose_deltas
        opt_state = self.optimizer.init(diff0)
        self.state = TrainState(
            params=params, opt_state=opt_state,
            densify=DensifyState.zeros(params.capacity),
            step=jnp.int32(0), pose_deltas=pose_deltas,
        )
        self._k_tile: Optional[int] = None   # escalated cap (None = config)
        self._lossy_streak = 0
        self._lossy_window: list = []  # per-step lossy_tiles since last check
        self.train_step = make_train_step(cfg, self.optimizer)
        self.refine_step = make_refine_step(cfg)
        self.reset_step = make_reset_opacity_step(cfg)
        self.rng = np.random.default_rng(cfg.seed)
        self.key = jax.random.PRNGKey(cfg.seed)
        self.history: list[dict] = []
        self._batch_cache: dict = {}
        self._batch_cache_bytes = 0

    def _batch(self, view_idx: int):
        # Batches are cached as device-resident arrays: without this every
        # step re-uploads ~13 MB (image + depth + uncertainty) host→device,
        # which dominates the step on remote-attached TPUs.  The cache is
        # capped so huge scenes degrade to streaming instead of OOMing HBM.
        hit = self._batch_cache.get(view_idx)
        if hit is not None:
            return hit
        s = self.scene
        cam = s.cameras.at(view_idx)
        image = jnp.asarray(s.images[view_idx])
        depth = jnp.asarray(s.depths[view_idx]) if s.depths is not None else None
        unc = (
            jnp.asarray(s.uncertainties[view_idx])
            if s.uncertainties is not None
            else None
        )
        batch = (cam, image, depth, unc)
        nbytes = sum(int(a.nbytes) for a in (image, depth, unc)
                     if a is not None)
        if self._batch_cache_bytes + nbytes <= self.cfg.view_cache_bytes:
            self._batch_cache[view_idx] = batch
            self._batch_cache_bytes += nbytes
        return batch

    def active_sh_degree(self, step: int) -> int:
        return min(step // self.cfg.sh_degree_interval, self.cfg.model.sh_degree)

    def run(
        self,
        max_steps: Optional[int] = None,
        log_fn: Optional[Callable[[dict], None]] = None,
        ckpt_manager=None,
        viewer=None,
    ) -> dict:
        cfg = self.cfg
        steps = max_steps if max_steps is not None else cfg.max_steps
        dcfg = cfg.densify
        # Resume from the restored step (ns-train --load-dir semantics): the
        # SH warmup / densify window / opacity-reset schedules, the remaining
        # step budget, and checkpoint indices all continue from state.step.
        start = int(self.state.step)
        if start:
            # deterministic resume: re-derive the host RNG streams from the
            # restored step so a resumed run doesn't replay the early stream
            self.rng = np.random.default_rng(cfg.seed + start)
            self.key = jax.random.fold_in(jax.random.PRNGKey(cfg.seed), start)
        t0 = time.time()
        last_metrics = {}
        for step in range(start, steps):
            view = int(self.rng.choice(self.scene.i_train))
            cam, image, depth, unc = self._batch(view)
            self.state, metrics = self.train_step(
                self.state, cam, image, depth, unc,
                jnp.int32(self.active_sh_degree(step)),
                jnp.int32(view),
            )
            if "lossy_tiles" in metrics:
                # device scalar — no sync; the guard reads the window max at
                # log points so truncation bursts BETWEEN log points are
                # seen too (r4 verdict: log-point sampling hid them)
                self._lossy_window.append(metrics["lossy_tiles"])
            if (
                dcfg.warmup_steps <= step < dcfg.stop_refine_at
                and step % dcfg.refine_every == 0
                and step > 0
            ):
                cap = self.state.params.capacity
                if (cfg.grow_capacity and cap < cfg.model.max_gaussians
                        and float(self.state.params.num_alive)
                        > cfg.grow_trigger_fraction * cap):
                    self.state = grow_state(
                        self.state, min(cap * 2, cfg.model.max_gaussians))
                self.key, sub = jax.random.split(self.key)
                # splatfacto's step schedule: pause densification for
                # (num_train_views + refine_every) steps after each opacity
                # reset (grad stats are garbage there — cull only); enable
                # size culling only after the first reset period; screen-size
                # gates until stop_screen_size_at.
                pause = min(len(self.scene.i_train) + dcfg.refine_every,
                            dcfg.reset_opacity_every // 2)
                do_densify = (step % dcfg.reset_opacity_every) > pause
                self.state = self.refine_step(
                    self.state, sub, do_densify,
                    step > dcfg.reset_opacity_every,
                    step < dcfg.stop_screen_size_at,
                )
            if step > 0 and step % dcfg.reset_opacity_every == 0 and step < dcfg.stop_refine_at:
                self.state = self.reset_step(self.state)
            if step % cfg.log_every == 0 or step == steps - 1:
                last_metrics = {k: float(v) for k, v in metrics.items()}
                last_metrics["step"] = step
                # truncation guard: when > 0.5% of tiles report
                # capped-and-unsaturated (max over EVERY step since the last
                # check, not just the log-point step) on two consecutive log
                # windows, double the per-tile entry cap (one recompile) so
                # training never silently drops meaningful contributions
                # (VERDICT r3 #6 / r4 #3).  The fraction threshold keeps a
                # handful of borderline tiles (e.g. 3/625, observed
                # post-escalation) from paying a 2x scatter-row cost for a
                # sub-luminance-step effect.  The ceiling is the same 8192
                # eval uses (rcfg.k_tile_max_train) — a scene that needs
                # >2048 entries/tile escalates all the way instead of
                # training lossy forever.
                rcfg = cfg.model.rasterize
                n_tiles = (-(-self.scene.cameras.width // rcfg.tile_w)
                           * -(-self.scene.cameras.height // rcfg.tile_h))
                if self._lossy_window:
                    window_lossy = float(jnp.max(jnp.stack(self._lossy_window)))
                    self._lossy_window.clear()
                    last_metrics["lossy_tiles_window_max"] = window_lossy
                else:
                    window_lossy = 0.0
                # absolute floor of 2 tiles under the 0.5% fraction: at small
                # resolutions (400² = 169 tiles) a bare fraction threshold
                # lets a SINGLE borderline tile escalate k_tile repeatedly
                # (observed r5: 2/169 tiles marched the cap to 8192).  The
                # floor is itself capped at half the tile count so tiny
                # grids (tests render single-tile scenes) still escalate.
                thr = min(max(0.005 * n_tiles, 2.0), 0.5 * n_tiles)
                if window_lossy > thr:
                    self._lossy_streak += 1
                else:
                    self._lossy_streak = 0
                cur_k = self._k_tile or cfg.model.rasterize.k_tile
                if self._lossy_streak >= 2 and cur_k < rcfg.k_tile_max_train:
                    self._k_tile = cur_k * 2
                    self._lossy_streak = 0
                    self.train_step = make_train_step(
                        cfg, self.optimizer, k_tile=self._k_tile)
                    last_metrics["k_tile_escalated_to"] = self._k_tile
                last_metrics["iters_per_sec"] = (
                    (step + 1 - start) / (time.time() - t0))
                self.history.append(last_metrics)
                if log_fn:
                    log_fn(last_metrics)
                if viewer is not None:
                    viewer.update_status(
                        step, last_metrics.get("loss", float("nan")),
                        last_metrics.get("num_alive", 0),
                        training=step < steps - 1)
            if ckpt_manager is not None and (
                (step + 1) % cfg.checkpoint_every == 0 or step == steps - 1
            ):
                extra = {"k_tile": self._k_tile} if self._k_tile else None
                ckpt_manager.save(step + 1, self.state, extra=extra)
        return last_metrics

    def render_view(self, view_idx: int, use_dense: bool = False):
        cam = self.scene.cameras.at(view_idx)
        if use_dense:
            out, _ = render(
                self.state.params, cam, self.cfg.model,
                active_sh_degree=self.cfg.model.sh_degree,
                use_dense=True,
            )
            return out
        from touchgs_tpu.models.splatfacto import render_lossless

        # lossless: a trained model routinely exceeds the training k_tile
        return render_lossless(self.state.params, cam, self.cfg.model,
                               active_sh_degree=self.cfg.model.sh_degree)
