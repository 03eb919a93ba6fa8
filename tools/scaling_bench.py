"""Scaling harness: train-step throughput vs device count.

BASELINE.md north star asks for iters/s + Mpix/s at 1 chip / 1 host /
≥2 hosts with linear tile-scaling.  This sweeps an increasing device count
and records sharded-train-step throughput; on a dev box it uses virtual CPU
devices (one subprocess per count so each gets a fresh backend), on real
slices run it once per topology (it measures whatever ``jax.devices()``
exposes, after ``init_distributed``).

    python tools/scaling_bench.py                 # sweep 1,2,4,8 virtual CPU
    python tools/scaling_bench.py --devices 4     # one measurement, 4 devices
    python tools/scaling_bench.py --tpu           # measure the real backend

Prints one JSON line per measurement:
    {"n_devices": N, "iters_per_sec": X, "mpix_per_sec": Y, "mesh": {...}}
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WIDTH = HEIGHT = 256
N_GAUSS, CAPACITY = 20_000, 32_768
STEPS, WARMUP = 10, 2


def measure(n_devices: int | None, use_tpu: bool) -> dict:
    import jax

    if not use_tpu:
        jax.config.update("jax_platforms", "cpu")
        if n_devices is not None:
            jax.config.update("jax_num_cpu_devices", n_devices)
    else:
        from touchgs_tpu.parallel.distributed import init_distributed

        init_distributed()
    import jax.numpy as jnp
    import numpy as np

    from touchgs_tpu.config import (DensifyConfig, DepthLossConfig,
                                    ModelConfig, OptimConfig, RasterizeConfig,
                                    TrainConfig)
    from touchgs_tpu.models.densify import DensifyState
    from touchgs_tpu.models.gaussians import init_random
    from touchgs_tpu.parallel.distributed import global_mesh
    from touchgs_tpu.parallel.sharded import make_sharded_train_step, shard_state
    from touchgs_tpu.train.optim import make_optimizer
    from touchgs_tpu.train.trainer import TrainState, _diff_params
    from touchgs_tpu.data.cameras import Camera

    n = jax.device_count()
    model_axis = 2 if n >= 4 and n % 2 == 0 else 1
    mesh = global_mesh(model=model_axis)

    # census mode inspects the FLAGSHIP path: pallas kernels (interpret on
    # CPU) + the explicit reduce-scatter gaussian sharding
    use_pallas = (jax.default_backend() != "cpu"
                  or bool(os.environ.get("TGS_HLO_CENSUS")))
    cfg = TrainConfig(
        model=ModelConfig(max_gaussians=CAPACITY, sh_degree=1,
                          rasterize=RasterizeConfig(use_pallas=use_pallas)),
        depth=DepthLossConfig(), densify=DensifyConfig(),
        optim=OptimConfig(),
    )
    params = init_random(n=N_GAUSS, capacity=CAPACITY, sh_degree=1)
    optimizer = make_optimizer(cfg.optim)
    state = shard_state(TrainState(
        params=params, opt_state=optimizer.init(_diff_params(params)),
        densify=DensifyState.zeros(CAPACITY), step=jnp.int32(0)), mesh)
    cam = Camera(
        fx=jnp.float32(0.9 * WIDTH), fy=jnp.float32(0.9 * WIDTH),
        cx=jnp.float32(WIDTH / 2), cy=jnp.float32(HEIGHT / 2),
        c2w=jnp.asarray([[1.0, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 2.5],
                         [0, 0, 0, 1]], jnp.float32),
        width=WIDTH, height=HEIGHT)
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.uniform(0, 1, (HEIGHT, WIDTH, 3)), jnp.float32)
    depth = jnp.asarray(rng.uniform(1, 3, (HEIGHT, WIDTH)), jnp.float32)
    unc = jnp.ones((HEIGHT, WIDTH), jnp.float32)

    step = make_sharded_train_step(cfg, mesh, optimizer)
    sh = jnp.int32(1)
    if os.environ.get("TGS_HLO_CENSUS"):
        # collective census of the compiled sharded step (SCALING_r04.md §2)
        import collections
        import re

        hlo = step.lower(state, cam, image, depth, unc, sh).compile().as_text()
        census = collections.Counter()
        for opname in ("reduce-scatter", "all-reduce", "all-gather",
                       "all-to-all", "collective-permute"):
            census[opname] = len(re.findall(r"\b" + opname, hlo))
        lines = [ln.strip()[:160] for ln in hlo.splitlines()
                 if "reduce-scatter(" in ln and "=" in ln]
        return {"n_devices": n, "mesh": dict(mesh.shape),
                "hlo_census": dict(census), "reduce_scatter_ops": lines}
    for _ in range(WARMUP):
        state, m = step(state, cam, image, depth, unc, sh)
    jax.block_until_ready(m["loss"])
    t0 = time.time()
    for _ in range(STEPS):
        state, m = step(state, cam, image, depth, unc, sh)
    jax.block_until_ready(m["loss"])
    dt = time.time() - t0
    ips = STEPS / dt
    return {
        "n_devices": n,
        "n_hosts": jax.process_count(),
        "iters_per_sec": round(ips, 3),
        "mpix_per_sec": round(ips * WIDTH * HEIGHT / 1e6, 3),
        "mesh": dict(mesh.shape),
        "backend": jax.default_backend(),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=None,
                    help="measure exactly this many virtual CPU devices")
    ap.add_argument("--sweep", default="1,2,4,8",
                    help="comma-separated device counts (subprocess each)")
    ap.add_argument("--tpu", action="store_true",
                    help="measure the real backend (after init_distributed)")
    ap.add_argument("--hlo", action="store_true",
                    help="print the compiled collective census instead of "
                         "timing (reduce-scatter evidence, SCALING_r04.md)")
    args = ap.parse_args()

    if args.hlo:
        os.environ["TGS_HLO_CENSUS"] = "1"
        print(json.dumps(measure(args.devices or 8, args.tpu)), flush=True)
        return
    if args.devices is not None or args.tpu:
        print(json.dumps(measure(args.devices, args.tpu)), flush=True)
        return

    for n in (int(x) for x in args.sweep.split(",")):
        # fresh process per device count: the backend is per-process state
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--devices", str(n)],
            capture_output=True, text=True, cwd=os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))))
        line = (out.stdout.strip().splitlines() or ["<no output>"])[-1]
        if out.returncode != 0:
            print(f"n={n} FAILED: {out.stderr.strip()[-200:]}", flush=True)
        else:
            print(line, flush=True)


if __name__ == "__main__":
    main()
