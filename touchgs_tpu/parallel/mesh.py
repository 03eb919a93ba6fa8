"""Device mesh construction and sharding specs.

The reference is single-GPU CUDA (SURVEY.md §2.12); the TPU build makes
parallelism first-class with two mesh axes:

- ``data``  — pixel tiles / views.  Rasterization work is embarrassingly
  parallel over tiles; the tile axis of the compositing pass is sharded here.
- ``model`` — Gaussians.  Primitive arrays and their Adam moments are sharded
  over this axis (ZeRO-style); projected 2D splats (a few floats each) are
  all-gathered for rasterization, and XLA transposes that gather into a
  reduce-scatter of per-Gaussian gradients in the backward pass — the
  "per-Gaussian gradients reduce-scattered, overlapped with the backward tile
  sweep" design of BASELINE.json `north_star`.

Collectives are inserted by the XLA SPMD partitioner from sharding
constraints; they ride ICI within a slice (scaling-book recipe: pick a mesh,
annotate, let XLA place collectives).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from touchgs_tpu.train.optim import PARAM_GROUPS


def make_mesh(
    devices: Optional[Sequence] = None,
    data: Optional[int] = None,
    model: Optional[int] = None,
) -> Mesh:
    """Build a ('data', 'model') mesh.  Default split: put at most 2 ways on
    'model' (projected-splat all-gather is cheap but not free), rest on 'data'
    where rasterization work lives."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None and model is None:
        model = 2 if n % 2 == 0 and n > 2 else 1
        data = n // model
    elif data is None:
        data = n // model
    elif model is None:
        model = n // data
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))


def param_pspecs() -> dict:
    """PartitionSpecs for the differentiable param dict: Gaussian axis fully
    sharded over every device (ZeRO-style)."""
    return {g: P(("model", "data")) for g in PARAM_GROUPS}


def state_shardings(mesh: Mesh, state) -> object:
    """NamedShardings for a TrainState pytree: every leaf whose leading axis
    is the Gaussian capacity is sharded over ('model', 'data') — params,
    Adam moments, and densify stats all live fully sharded, so the optimizer
    update runs shard-local on 1/(model·data) of the rows per device;
    everything else replicated."""
    capacity = state.params.capacity

    def spec_for(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] == capacity:
            return NamedSharding(mesh, P(("model", "data")))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec_for, state)
