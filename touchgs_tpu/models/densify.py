"""Adaptive density control over fixed-capacity masked arrays (jit-stable).

splatfacto/3DGS densification (SURVEY.md §2.9: "densify (clone/split by
positional-gradient threshold), prune (opacity/size), periodic opacity
reset"), redesigned for XLA: primitive counts never change — new Gaussians are
written into dead slots located with a static-shape argsort, clones/splits are
scatters, prunes flip the ``alive`` mask.  When free slots run out the refine
saturates gracefully (highest-gradient candidates win).

All functions are pure and jittable; the trainer calls `refine` every
``refine_every`` steps outside the hot per-step jit.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from touchgs_tpu.config import DensifyConfig
from touchgs_tpu.models.gaussians import GaussianParams


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DensifyState:
    grad_accum: jax.Array   # (C,) accumulated screen-space positional grad norms
    grad_count: jax.Array   # (C,) number of steps each gaussian was visible
    max_radii: jax.Array    # (C,) max screen radius seen since last refine

    @staticmethod
    def zeros(capacity: int) -> "DensifyState":
        return DensifyState(
            grad_accum=jnp.zeros((capacity,), jnp.float32),
            grad_count=jnp.zeros((capacity,), jnp.float32),
            max_radii=jnp.zeros((capacity,), jnp.float32),
        )


def update_stats(
    state: DensifyState,
    means2d_grad: jnp.ndarray,  # (C, 2) grad of loss w.r.t. PIXEL positions
    radii: jnp.ndarray,         # (C,)
    visible: jnp.ndarray,       # (C,) bool
    width: int = 0,
    height: int = 0,
) -> DensifyState:
    """Accumulate positional-gradient stats in splatfacto's units.

    gsplat returns pixel-space screen gradients; splatfacto rescales them by
    ``0.5 * max(W, H)`` (pixel → NDC-like units) before comparing the running
    average to ``grad_threshold = 0.0002`` — without this, the same threshold
    means something ~400x different at 800² and densification never fires.
    Screen radii are likewise normalized to fractions of ``max(W, H)``
    (splatfacto ``max_2Dsize``), the units of the ``split_screen_size`` /
    ``cull_screen_size`` gates.  ``width/height = 0`` keeps raw pixel units
    (legacy callers/tests).
    """
    g = jnp.linalg.norm(means2d_grad, axis=-1)
    r = radii
    if width or height:
        g = g * (0.5 * max(width, height))
        r = r / float(max(width, height))
    vis = visible.astype(jnp.float32)
    return DensifyState(
        grad_accum=state.grad_accum + g * vis,
        grad_count=state.grad_count + vis,
        max_radii=jnp.maximum(state.max_radii, r * vis),
    )


def _scatter_children(
    params: GaussianParams,
    source_idx: jnp.ndarray,   # (C,) for each *child rank* r: source gaussian
    child_slot: jnp.ndarray,   # (C,) destination slot for child rank r
    child_ok: jnp.ndarray,     # (C,) bool: this child rank is real
    new_means: jnp.ndarray,    # (C, 3) child means (indexed by child rank)
    new_log_scales: jnp.ndarray,
) -> GaussianParams:
    """Scatter child gaussians (inheriting everything else) into dead slots."""
    slot = jnp.where(child_ok, child_slot, params.capacity)  # OOB drops writes

    def put(dst, src_vals):
        return dst.at[slot].set(src_vals, mode="drop")

    return GaussianParams(
        means=put(params.means, new_means),
        quats=put(params.quats, params.quats[source_idx]),
        log_scales=put(params.log_scales, new_log_scales),
        logit_opacities=put(params.logit_opacities,
                            params.logit_opacities[source_idx]),
        sh_dc=put(params.sh_dc, params.sh_dc[source_idx]),
        sh_rest=put(params.sh_rest, params.sh_rest[source_idx]),
        alive=put(params.alive, child_ok),
    )


def refine(
    params: GaussianParams,
    state: DensifyState,
    key: jax.Array,
    cfg: DensifyConfig,
    do_densify: bool = True,
    use_size_cull: bool = True,
    use_screen_size: bool = False,
) -> tuple[GaussianParams, DensifyState, jax.Array]:
    """One densify+prune pass.  Returns (params, reset stats, touched_mask).

    ``touched_mask`` marks slots whose parameters were (re)written — the
    trainer zeroes optimizer moments there (splatfacto resets Adam state for
    new gaussians).

    The three static flags reproduce splatfacto's step-dependent schedule
    (the trainer derives them from the step; standalone callers get the
    legacy always-on behavior):
      * ``do_densify`` — False right after an opacity reset, when grad stats
        are garbage: cull only, no clone/split.
      * ``use_size_cull`` — world/screen size culling starts only after the
        first opacity-reset period (fresh gaussians must not be size-culled
        before their scales settle).
      * ``use_screen_size`` — screen-size split/cull gates, active while
        ``step < stop_screen_size_at``; requires ``state.max_radii`` in
        normalized units (update_stats with width/height).
    """
    C = params.capacity
    avg_grad = state.grad_accum / jnp.maximum(state.grad_count, 1.0)
    scale_max = jnp.max(params.scales(), axis=-1)

    dense_candidate = (avg_grad > cfg.grad_threshold) & params.alive
    if not do_densify:
        dense_candidate = jnp.zeros_like(dense_candidate)
    split_by_size = scale_max > cfg.densify_size_threshold
    if use_screen_size:
        # splatfacto: oversized-on-screen gaussians split even when their
        # world scale is small (floaters near the camera)
        split_by_size = split_by_size | (state.max_radii > cfg.split_screen_size)
    do_split = dense_candidate & split_by_size
    do_clone = dense_candidate & ~do_split

    # children per source: clone→1 (copy at same spot), split→split_samples
    n_children = (do_clone.astype(jnp.int32)
                  + do_split.astype(jnp.int32) * cfg.split_samples)

    # free slots, stable order (dead first)
    dead_first = jnp.argsort(params.alive.astype(jnp.int32), stable=True)
    n_free = C - jnp.sum(params.alive.astype(jnp.int32))

    # priority: higher-gradient sources allocate first when slots are scarce
    priority = jnp.argsort(-jnp.where(n_children > 0, avg_grad, -jnp.inf))
    n_children_sorted = n_children[priority]
    offsets_sorted = jnp.cumsum(n_children_sorted) - n_children_sorted
    # map back: offset per source gaussian
    offsets = jnp.zeros((C,), jnp.int32).at[priority].set(offsets_sorted)

    touched = jnp.zeros((C,), bool)
    new_params = params
    max_k = max(1, cfg.split_samples)
    for k in range(max_k):
        want = n_children > k
        slot_rank = offsets + k
        ok = want & (slot_rank < n_free)
        child_slot = dead_first[jnp.clip(slot_rank, 0, C - 1)]
        # child position: clones stay at source; splits sample from the
        # gaussian's own ellipsoid
        key, sub = jax.random.split(key)
        eps = jax.random.normal(sub, (C, 3))
        from touchgs_tpu.ops.projection import quat_to_rotmat  # local: avoid cycle
        R = quat_to_rotmat(params.quats)
        offset_world = jnp.einsum("nij,nj->ni", R, eps * params.scales())
        split_means = params.means + offset_world
        child_means = jnp.where(do_split[:, None], split_means, params.means)
        child_log_scales = jnp.where(
            do_split[:, None],
            params.log_scales - jnp.log(cfg.split_scale_shrink),
            params.log_scales,
        )
        new_params = _scatter_children(
            new_params, jnp.arange(C), child_slot, ok, child_means,
            child_log_scales,
        )
        touched = touched.at[jnp.where(ok, child_slot, C)].set(True, mode="drop")

    # split sources die (replaced by children); shrink their slot params too
    died_split = do_split & (offsets + cfg.split_samples - 1 < n_free)
    alive = new_params.alive & ~died_split
    new_params = dataclasses.replace(new_params, alive=alive)

    # prune: low opacity, and (after the first reset period) oversized
    # gaussians in world or screen units.  Sizes are recomputed POST-scatter
    # so freshly written children are judged by their own scales, not by
    # whatever garbage the dead slot held before (r3 advisor finding: fresh
    # grown slots pad log_scales=0 → exp=1 > 0.5 and every first child in
    # such a slot was pruned in the same pass).
    prune = new_params.opacities() < cfg.prune_opacity_threshold
    if use_size_cull:
        new_scale_max = jnp.max(new_params.scales(), axis=-1)
        toobig = new_scale_max > cfg.prune_scale_threshold
        if use_screen_size:
            # children have no screen-size history yet — exempt them
            max2d = jnp.where(touched, 0.0, state.max_radii)
            toobig = toobig | (max2d > cfg.cull_screen_size)
        prune = prune | toobig
    alive = new_params.alive & ~prune
    new_params = dataclasses.replace(new_params, alive=alive)

    return new_params, DensifyState.zeros(C), touched


def reset_opacities(params: GaussianParams, value: float) -> GaussianParams:
    """Periodic opacity clamp-down (3DGS `reset_opacity`)."""
    cap = jnp.log(value / (1.0 - value))
    return dataclasses.replace(
        params, logit_opacities=jnp.minimum(params.logit_opacities, cap)
    )
