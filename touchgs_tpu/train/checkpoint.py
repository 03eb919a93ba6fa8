"""Checkpoint/resume via orbax (SURVEY.md §5: "orbax-style checkpoint of
Gaussian pytree + opt state + densification counters").

Run-dir layout mirrors nerfstudio's
``outputs/<scene>/<method>/<timestamp>/`` contract
(``experiment_utils/run_eval.py:28-43``): each run dir holds ``config.json``
plus orbax step checkpoints; ``latest_run``/``load_run`` resolution is
newest-first like run_eval.py:28-37.
"""
from __future__ import annotations

import dataclasses
import datetime
import json
import os
import warnings
from pathlib import Path
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

METHOD_NAME = "depth-gaussian-splatting"


def _find_leading_dim(meta, key_name: str):
    """Walk an orbax item-metadata tree (nested dicts / dataclass-likes)
    for an entry named ``key_name`` and return its leading dimension."""
    stack = [meta]
    while stack:
        node = stack.pop()
        items = None
        if isinstance(node, dict):
            items = node.items()
        elif hasattr(node, "tree") and isinstance(getattr(node, "tree"), dict):
            items = node.tree.items()
        elif dataclasses.is_dataclass(node):
            items = ((f.name, getattr(node, f.name))
                     for f in dataclasses.fields(node))
        if items is None:
            continue
        for k, v in items:
            if k == key_name and hasattr(v, "shape"):
                return v.shape[0]
            stack.append(v)
    raise KeyError(key_name)


def restore_trainer(trainer, mgr: "CheckpointManager",
                    step: Optional[int] = None) -> None:
    """Restore ``trainer.state`` from ``mgr``, growing the template first if
    the checkpoint was saved at a larger progressive capacity (the normal
    case after any densify-driven growth — a fresh Trainer starts small).
    Also restores host-side trainer knobs from the sidecar: an escalated
    truncation-guard k_tile would otherwise silently revert to the config
    cap on resume and train lossy again (r4 review finding)."""
    from touchgs_tpu.train.trainer import grow_state, make_train_step

    cap = mgr.saved_capacity(step)
    if cap is not None and cap > trainer.state.params.capacity:
        trainer.state = grow_state(trainer.state, cap)
    trainer.state = mgr.restore(trainer.state, step)
    if mgr.saved_extra(step).get("densify_units") != "normalized":
        # checkpoint predates the pixel→normalized max_radii unit change
        # (r4): pixel-unit radii fed into the normalized screen-size gates
        # would mass-cull live gaussians on the first refine.  Zeroing the
        # accumulated radii is safe — they rebuild within one refine window.
        trainer.state = dataclasses.replace(
            trainer.state,
            densify=dataclasses.replace(
                trainer.state.densify,
                max_radii=jax.numpy.zeros_like(trainer.state.densify.max_radii),
            ),
        )
    k_tile = mgr.saved_extra(step).get("k_tile")
    if k_tile and k_tile != trainer._k_tile:
        trainer._k_tile = int(k_tile)
        trainer.train_step = make_train_step(
            trainer.cfg, trainer.optimizer, k_tile=trainer._k_tile)


def make_run_dir(output_root: str | Path, scene_name: str) -> Path:
    stamp = datetime.datetime.now().strftime("%Y-%m-%d_%H%M%S")
    run_dir = Path(output_root) / scene_name / METHOD_NAME / stamp
    run_dir.mkdir(parents=True, exist_ok=True)
    return run_dir


def latest_run_dir(output_root: str | Path, scene_name: str,
                   past_n: int = 0) -> Optional[Path]:
    """Newest-first run-dir resolution (run_eval.py:28-37)."""
    base = Path(output_root) / scene_name / METHOD_NAME
    if not base.exists():
        return None
    runs = sorted((d for d in base.iterdir() if d.is_dir()), reverse=True)
    return runs[past_n] if past_n < len(runs) else None


def _config_to_jsonable(cfg) -> dict:
    def enc(o):
        if dataclasses.is_dataclass(o):
            return {k: enc(v) for k, v in dataclasses.asdict(o).items()}
        if isinstance(o, dict):
            return {k: enc(v) for k, v in o.items()}
        if isinstance(o, (list, tuple)):
            return [enc(v) for v in o]
        if hasattr(o, "value"):  # enums
            return o.value
        return o

    return enc(cfg)


class CheckpointManager:
    def __init__(self, run_dir: str | Path, cfg=None, max_to_keep: int = 3):
        self.run_dir = Path(run_dir)
        self.ckpt_dir = self.run_dir / "checkpoints"
        self._mgr = ocp.CheckpointManager(
            self.ckpt_dir.absolute(),
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )
        if cfg is not None:
            (self.run_dir / "config.json").write_text(
                json.dumps(_config_to_jsonable(cfg), indent=2, default=str)
            )

    def save(self, step: int, state, extra: Optional[dict] = None) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()
        # sidecar per-step index: restore() needs a template whose leaves
        # match the SAVED shapes, but progressive capacity growth
        # (trainer.grow_capacity) means a fresh Trainer's arrays are usually
        # smaller than what was saved — record capacity (and host-side
        # trainer knobs like the escalated k_tile) per step so
        # restore_trainer() can rebuild the exact training configuration
        cap = getattr(getattr(state, "params", None), "capacity", None)
        if cap is not None or extra:
            entry = dict(extra or {})
            # stats-unit version marker: restore_trainer zeroes max_radii for
            # checkpoints that predate the normalized-unit densify stats
            entry.setdefault("densify_units", "normalized")
            if cap is not None:
                entry["capacity"] = int(cap)
            idx_path = self.run_dir / "capacities.json"
            idx = {}
            if idx_path.exists():
                try:
                    idx = json.loads(idx_path.read_text())
                except (OSError, json.JSONDecodeError):
                    warnings.warn(
                        f"corrupt sidecar {idx_path}; rebuilding from this "
                        "step (earlier steps lose their k_tile/capacity "
                        "extras)")
                    idx = {}
            idx[str(step)] = entry
            # atomic replace: a crash mid-write must not corrupt the index
            # (saved_extra would silently lose the escalated k_tile and a
            # resumed run would train lossy again)
            tmp = idx_path.with_suffix(".json.tmp")
            tmp.write_text(json.dumps(idx))
            os.replace(tmp, idx_path)

    def _sidecar_entry(self, step: Optional[int]) -> dict:
        step = self._mgr.latest_step() if step is None else step
        if step is None:
            return {}
        idx_path = self.run_dir / "capacities.json"
        if not idx_path.exists():
            return {}
        try:
            entry = json.loads(idx_path.read_text()).get(str(step))
        except (OSError, json.JSONDecodeError):
            warnings.warn(
                f"sidecar {idx_path} exists but failed to parse — restored "
                "run may lose host-side knobs (escalated k_tile)")
            return {}
        if isinstance(entry, dict):
            return entry
        if entry:  # pre-r4.1 format: bare capacity int
            return {"capacity": int(entry)}
        return {}

    def saved_capacity(self, step: Optional[int] = None) -> Optional[int]:
        """Capacity of the Gaussian arrays in the checkpoint at ``step``
        (sidecar index first, orbax array metadata as fallback for runs
        saved before the sidecar existed)."""
        cap = self._sidecar_entry(step).get("capacity")
        if cap:
            return int(cap)
        step = self._mgr.latest_step() if step is None else step
        if step is None:
            return None
        try:
            meta = self._mgr.item_metadata(step)
            return int(_find_leading_dim(meta, "means"))
        except Exception:
            return None

    def saved_extra(self, step: Optional[int] = None) -> dict:
        """Host-side trainer knobs recorded alongside the checkpoint
        (e.g. the truncation-guard's escalated k_tile)."""
        return {k: v for k, v in self._sidecar_entry(step).items()
                if k != "capacity"}

    def restore(self, state_like, step: Optional[int] = None):
        step = self._mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.ckpt_dir}")
        return self._mgr.restore(step, args=ocp.args.StandardRestore(state_like))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def close(self):
        self._mgr.close()
