"""Multi-host initialization (jax.distributed) + process-level helpers.

The reference is single-GPU-only (SURVEY.md §2.12); the TPU build scales over
ICI within a slice and DCN across hosts.  This module is the multi-host entry
point (BASELINE.md north star: throughput at 1 chip / 1 host / ≥2 hosts):

- ``init_distributed()`` — idempotent ``jax.distributed.initialize`` driven
  by explicit args or the standard env vars (``COORDINATOR_ADDRESS``,
  ``NUM_PROCESSES``, ``PROCESS_ID``; TPU pods auto-detect all three).
- ``global_mesh()`` — a ('data', 'model') mesh over all global devices,
  data-major so tile/data sharding rides ICI within a host and only the
  per-Gaussian gradient reduce-scatter crosses DCN.
- ``local_batch_slice()`` — which views of a global batch this process feeds
  (per-host data loading: each host reads only its shard of the scene).

On a single process all helpers degrade to the single-host behavior, so the
same training script runs unchanged from 1 chip to a multi-host slice.
"""
from __future__ import annotations

import os

import jax
import numpy as np


_INITIALIZED = False


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> bool:
    """Initialize jax.distributed once.  Returns True when multi-process.

    No-ops when neither args nor env vars request a multi-process setup
    (single-host dev loop, CI, the CPU mesh tests).
    """
    global _INITIALIZED
    if _INITIALIZED:
        return jax.process_count() > 1
    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS")
    num_processes = num_processes or _int_env("NUM_PROCESSES")
    process_id = process_id if process_id is not None else _int_env(
        "PROCESS_ID")
    on_tpu_pod = os.environ.get("TPU_WORKER_HOSTNAMES") or os.environ.get(
        "MEGASCALE_COORDINATOR_ADDRESS")
    if coordinator_address is None and not on_tpu_pod:
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError):
        # pod-looking env vars but no resolvable coordinator (e.g. a dev box
        # with a single tunneled chip exporting TPU_WORKER_HOSTNAMES): stay
        # single-process rather than crash the training script
        return False
    _INITIALIZED = True
    return jax.process_count() > 1


def _int_env(name: str):
    v = os.environ.get(name)
    return int(v) if v is not None else None


def global_mesh(model: int = 1):
    """('data', 'model') mesh over ALL global devices, data axis outermost so
    per-host device groups stay contiguous (collectives over 'data' ride ICI;
    only the 'model' reduce-scatter may cross hosts when model > chips/host).
    """
    from touchgs_tpu.parallel.mesh import make_mesh

    n = jax.device_count()
    assert n % model == 0, f"{n} devices not divisible by model={model}"
    return make_mesh(jax.devices(), data=n // model, model=model)


def local_batch_slice(n_items: int) -> np.ndarray:
    """Indices of the global work list this process is responsible for
    (per-host data loading; all processes see the same global order)."""
    pid, pcount = jax.process_index(), jax.process_count()
    return np.arange(n_items)[pid::pcount]
