"""Benchmark: steady-state training iterations/sec on the flagship model.

Runs on whatever accelerator JAX finds (the driver runs it on one real TPU
chip).  Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference repo publishes no numbers (BASELINE.md); the comparison anchor
is the north-star proxy: splatfacto on A100 trains a Touch-GS-scale scene at
roughly 20 iters/sec (30k iters in ~25 min).  ``vs_baseline`` is measured
iters/sec over that 20 it/s proxy; the >=3x target from BASELINE.json means
vs_baseline >= 3.0.

Robustness contract (VERDICT r3 #1 — two of three rounds lost their perf
evidence to compile stalls): the headline JSON is ALWAYS printed, exactly
once, before this process ends.
  * a watchdog thread emits the best-known number and hard-exits rc=0 when
    the wall-clock budget (BENCH_BUDGET_S, default 420 s) is nearly spent —
    a remote-tunnel compile observed to take 15+ min (utils/cache.py) can
    no longer turn into rc=124 with no output;
  * the timed loop runs in chunks, updating the shared headline after each,
    so even a partially-timed run lands a real rate;
  * the roofline extras run strictly AFTER the headline is printed and only
    if budget remains — they are diagnostics, not gatekeepers.
Run tools/prewarm_bench.py after any compute-path change so the driver's
fresh process hits the persistent compile cache.
"""
from __future__ import annotations

import json
import os
import sys
import threading
import time

import numpy as np

REFERENCE_ITERS_PER_SEC = 20.0  # A100 splatfacto proxy (see module docstring)

# benchmark scene scale (BASELINE.json configs[3]-ish, single chip)
WIDTH, HEIGHT = 800, 800
N_GAUSSIANS = 100_000
CAPACITY = 131_072
WARMUP_STEPS = 5
TIMED_STEPS = 40
CHUNK = 10  # window size; headline = MEDIAN window rate (see timed loop)

START = time.time()
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "420"))

_lock = threading.Lock()
_headline = {
    "metric": "train_iters_per_sec_800x800_100k_gaussians",
    "value": 0.0,
    "unit": "iters/sec",
    "vs_baseline": 0.0,
}
_note: str | None = "compile_did_not_finish"
_printed = threading.Event()


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def remaining() -> float:
    return BUDGET_S - (time.time() - START)


def set_headline(iters_per_sec: float, note: str | None) -> None:
    global _note
    with _lock:
        _headline["value"] = round(iters_per_sec, 3)
        _headline["vs_baseline"] = round(
            iters_per_sec / REFERENCE_ITERS_PER_SEC, 3)
        _note = note


def emit() -> None:
    """Print the headline JSON exactly once (thread-safe)."""
    with _lock:
        if _printed.is_set():
            return
        _printed.set()
        h = dict(_headline)
        if _note:
            h["note"] = _note
        print(json.dumps(h), flush=True)


def _watchdog() -> None:
    wait = remaining() - 20.0
    if wait > 0:
        time.sleep(wait)
    if not _printed.is_set():
        log(f"bench watchdog: budget {BUDGET_S:.0f}s nearly spent — emitting "
            "best-known headline and exiting")
        emit()
        sys.stdout.flush()
        os._exit(0)


def pallas_compile_smoke():
    """Fail fast if Mosaic can't compile a trivial kernel on this backend
    (VERDICT r1: interpret-only tests let a Mosaic regression ship)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 2.0

    x = jnp.ones((8, 128), jnp.float32)
    out = pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        interpret=jax.default_backend() == "cpu",
    )(x)
    jax.block_until_ready(out)
    log("pallas compile smoke OK")


def build_state_and_step():
    import jax
    import jax.numpy as jnp

    from touchgs_tpu.config import (
        DensifyConfig, DepthLossConfig, ModelConfig, OptimConfig,
        RasterizeConfig, TrainConfig,
    )
    from touchgs_tpu.data.cameras import Camera
    from touchgs_tpu.models.densify import DensifyState
    from touchgs_tpu.models.gaussians import init_random
    from touchgs_tpu.train.optim import make_optimizer
    from touchgs_tpu.train.trainer import TrainState, _diff_params, make_train_step

    dev = jax.devices()[0]
    log(f"device: {dev.platform} {dev.device_kind}")

    cfg = TrainConfig(
        model=ModelConfig(max_gaussians=CAPACITY, sh_degree=3,
                          rasterize=RasterizeConfig(
                              use_pallas=(dev.platform == "tpu")
                          )),
        depth=DepthLossConfig(),
        densify=DensifyConfig(),
        optim=OptimConfig(),
    )
    params = init_random(n=N_GAUSSIANS, capacity=CAPACITY, sh_degree=3)
    optimizer = make_optimizer(cfg.optim)
    state = TrainState(
        params=params,
        opt_state=optimizer.init(_diff_params(params)),
        densify=DensifyState.zeros(CAPACITY),
        step=jnp.int32(0),
    )

    cam = Camera(
        fx=jnp.float32(0.9 * WIDTH), fy=jnp.float32(0.9 * WIDTH),
        cx=jnp.float32(WIDTH / 2), cy=jnp.float32(HEIGHT / 2),
        c2w=jnp.asarray(
            [[1.0, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 2.5], [0, 0, 0, 1]],
            jnp.float32,
        ),
        width=WIDTH, height=HEIGHT,
    )
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.uniform(0, 1, (HEIGHT, WIDTH, 3)), jnp.float32)
    depth = jnp.asarray(rng.uniform(1.0, 3.0, (HEIGHT, WIDTH)), jnp.float32)
    unc = jnp.ones((HEIGHT, WIDTH), jnp.float32)

    step = make_train_step(cfg, optimizer)
    return cfg, state, step, cam, image, depth, unc


def roofline_report(cfg, state, cam, dt_per_step):
    """Per-stage roofline diagnostics (BASELINE.md 'per-kernel roofline per
    chip').  Best-effort: runs after the headline JSON, budget permitting."""
    import jax
    import jax.numpy as jnp

    from touchgs_tpu.models.splatfacto import render as render_fn
    from touchgs_tpu.ops import rasterize_pallas as rp
    from touchgs_tpu.ops.projection import project_gaussians
    from touchgs_tpu.ops.tiles import bin_gaussians
    from touchgs_tpu.utils import profiling as prof

    rcfg = cfg.model.rasterize
    p0 = state.params
    opac = p0.opacities()
    colors = jnp.abs(p0.sh_dc)

    @jax.jit
    def prep(p):
        proj = project_gaussians(
            p.means, p.quats, p.scales(), cam.w2c, cam.fx, cam.fy,
            cam.cx, cam.cy, WIDTH, HEIGHT, rcfg, extra_valid=p.alive,
            opacities=p.opacities())
        return proj, bin_gaussians(proj, WIDTH, HEIGHT, rcfg)

    proj, bins = prep(p0)
    bins = bins._replace(n_tiles_x=int(bins.n_tiles_x),
                         n_tiles_y=int(bins.n_tiles_y))
    n_tiles = bins.n_tiles_x * bins.n_tiles_y
    th, tw = rcfg.tile_h, rcfg.tile_w
    k_tile = rcfg.k_tile
    counts = np.asarray(bins.tile_counts, dtype=np.int64)
    total_pairs = int(counts.sum())
    kept_pairs = int(np.minimum(counts, k_tile).sum())

    attrs = rp._pack_attrs(proj, colors, opac)
    gidx = rp._slot_lists(
        bins.sorted_gauss, bins.tile_starts,
        jnp.minimum(bins.tile_counts, k_tile), n_tiles, k_tile,
        proj.means2d.shape[0], False)
    attrs_tiled = attrs[gidx]
    kc = rcfg.k_chunk
    nc = ((jnp.minimum(bins.tile_counts, k_tile) + kc - 1) // kc
          ).astype(jnp.int32)
    tids = jnp.arange(n_tiles, dtype=jnp.int32)

    @jax.jit
    def fwd_kernel(at):
        return rp._forward_tiles(nc, tids, at, th, tw, k_tile, kc,
                                 bins.n_tiles_x, rcfg, False)

    fwd_stack = fwd_kernel(attrs_tiled)
    done = np.asarray(fwd_stack[:, rp._ROW_DONE, 0], dtype=np.int64)
    scanned = int(done.sum()) * kc
    # lossy truncation: tiles whose list was capped AND ≥10% of whose pixels
    # were still unsaturated when the scan ended (same statistic as the
    # in-graph telemetry in rasterize_pallas.py)
    unsat = np.asarray((fwd_stack[:, rp._ROW_T] > 1e-3).mean(axis=-1))
    lossy = int(((counts > k_tile) & (unsat > 0.1)).sum())
    grad_stack = jnp.ones_like(fwd_stack)

    @jax.jit
    def bwd_kernel(at, fs, gs):
        d = fs[:, rp._ROW_DONE, 0].astype(jnp.int32)
        return rp._backward_tiles(d, tids, at, fs, gs, th, tw, k_tile,
                                  kc, bins.n_tiles_x, rcfg, False)

    @jax.jit
    def fwd_only(p):
        out, _ = render_fn(p, cam, cfg.model, active_sh_degree=3)
        return out.rgb

    @jax.jit
    def fwd_bwd(p):
        def loss(means):
            import dataclasses as _dc
            out, _ = render_fn(_dc.replace(p, means=means), cam,
                               cfg.model, active_sh_degree=3)
            return jnp.sum(out.rgb) + jnp.sum(out.depth)
        return jax.grad(loss)(p.means)

    # binning measured = (project + bin) − project (VERDICT r4: the roofline
    # row was `meas n/a`)
    @jax.jit
    def proj_only(p):
        return project_gaussians(
            p.means, p.quats, p.scales(), cam.w2c, cam.fx, cam.fy,
            cam.cx, cam.cy, WIDTH, HEIGHT, rcfg, extra_valid=p.alive,
            opacities=p.opacities())

    npix = th * tw
    t_fwdk = prof.measure(fwd_kernel, attrs_tiled, iters=10)
    t_bwdk = prof.measure(bwd_kernel, attrs_tiled, fwd_stack, grad_stack,
                          iters=10)
    t_fwd = prof.measure(fwd_only, state.params, iters=10)
    t_bwd = prof.measure(fwd_bwd, state.params, iters=10)
    t_proj = prof.measure(proj_only, state.params, iters=10)
    t_bin = max(prof.measure(prep, state.params, iters=10) - t_proj, 0.0)
    stages = [
        prof.composite_cost(scanned, npix, n_tiles, "composite_fwd", 34),
        prof.composite_cost(scanned, npix, n_tiles, "composite_bwd", 76),
        prof.binning_cost(CAPACITY, rcfg.max_tiles_per_gaussian),
    ]
    log(prof.report(stages, {"composite_fwd": t_fwdk,
                             "composite_bwd": t_bwdk,
                             "binning": t_bin}))
    log(f"tile lists: {total_pairs} pairs, mean {counts.mean():.0f}/tile"
        f", cap {k_tile} keeps {kept_pairs} "
        f"({100 * kept_pairs / max(total_pairs, 1):.1f}%); "
        f"kernels scanned {scanned} "
        f"({100 * scanned / max(total_pairs, 1):.1f}% — early exit); "
        f"lossy-truncated tiles (capped & unsaturated): {lossy}/{n_tiles}")
    log(f"render fwd: {t_fwd*1e3:.2f} ms (kernel {t_fwdk*1e3:.2f})   "
        f"render fwd+bwd: {t_bwd*1e3:.2f} ms (bwd kernel "
        f"{t_bwdk*1e3:.2f})   full step: {dt_per_step*1e3:.2f} ms "
        f"(loss/opt tail: {(dt_per_step - t_bwd)*1e3:.2f} ms)")


def main():
    threading.Thread(target=_watchdog, daemon=True).start()

    import jax
    import jax.numpy as jnp

    from touchgs_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    pallas_compile_smoke()

    cfg, state, step, cam, image, depth, unc = build_state_and_step()
    sh = jnp.int32(3)

    t0 = time.time()
    state, metrics = step(state, cam, image, depth, unc, sh)
    jax.block_until_ready(metrics)
    log(f"first step (compile): {time.time()-t0:.1f}s "
        f"loss={float(metrics['loss']):.4f}")
    set_headline(0.0, "compiled_but_untimed")

    for _ in range(WARMUP_STEPS - 1):
        state, metrics = step(state, cam, image, depth, unc, sh)
    jax.block_until_ready(metrics)

    # timed loop in fixed windows; every window ends in a FORCED host sync
    # (float() on the loss — r5 finding: block_until_ready can return
    # without waiting through the axon tunnel, and tunnel jitter makes
    # single-window averages noisy by ±10%).  The headline is the MEDIAN
    # window rate: robust to a one-off tunnel hiccup, not a cherry-picked
    # best.  Each window's rate still includes its own sync RTT.
    done_steps = 0
    window_rates = []
    while done_steps < TIMED_STEPS:
        n = min(CHUNK, TIMED_STEPS - done_steps)
        tw0 = time.time()
        for _ in range(n):
            state, metrics = step(state, cam, image, depth, unc, sh)
        _ = float(metrics["loss"])
        window_rates.append(n / (time.time() - tw0))
        done_steps += n
        rate = float(np.median(window_rates))
        set_headline(rate, None if done_steps >= TIMED_STEPS
                     else f"partial_{done_steps}_steps")
    dt = TIMED_STEPS / float(np.median(window_rates))
    iters_per_sec = float(np.median(window_rates))
    log(f"window rates: {[round(r, 2) for r in window_rates]} it/s")
    mpix_per_sec = iters_per_sec * WIDTH * HEIGHT / 1e6
    log(f"{TIMED_STEPS} steps in {dt:.2f}s -> {iters_per_sec:.2f} it/s, "
        f"{mpix_per_sec:.1f} Mpix/s rasterized (fwd+bwd), "
        f"loss={float(metrics['loss']):.4f}")

    emit()  # headline is on stdout before any diagnostics run

    if remaining() > 60:
        try:
            roofline_report(cfg, state, cam, dt / TIMED_STEPS)
        except Exception as e:  # pragma: no cover - diagnostics only
            log(f"roofline report skipped: {e}")
    else:
        log(f"roofline skipped: only {remaining():.0f}s of budget left")


if __name__ == "__main__":
    main()
    # the watchdog thread is daemonic; make the exit explicit and immediate
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)
