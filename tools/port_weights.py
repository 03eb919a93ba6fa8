"""Port torch checkpoints → npz param files for the JAX models.

The reference obtains its pretrained nets from torch hub / HF hub at run time
(``/root/reference/vision_utils/zoe_depth.py:3-10``,
``vision_utils/dpt_module.py:22-34``, sensor nets at
``data_collection/ros1/dtv2_tactile_camera/src/img2depthforce.py``); on TPU
there is no torch runtime in the serving path, so checkpoints are converted
offline into flat npz files whose keys are the torch state_dict names with
layouts rewritten to JAX conventions:

- Conv2d weight (O, I, kh, kw)          → (kh, kw, I, O)   [HWIO]
- ConvTranspose2d weight (I, O, kh, kw) → (kh, kw, O, I)   [what
  jax.lax.conv_transpose(transpose_kernel=True) consumes — verified exact
  against torch in tests/test_port_weights.py; same axis permutation as
  Conv2d, so all 4-D kernels share one rule]
- Linear weight (O, I)                  → (I, O)
- everything else                       → copied as-is

Consumers: ``touchgs_tpu.vision.dpt`` (DPT-Large / ZoeDepth trunk),
``touchgs_tpu.eval.lpips_vgg`` (LPIPS), ``touchgs_tpu.touch.sensor_nets``
(DenseTact depth/force nets).

Usage:
    python tools/port_weights.py <model> <checkpoint.pt> <out.npz>
    model ∈ {dpt, zoedepth, depth_anything, lpips, densetact_depth,
             densetact_force}
"""
from __future__ import annotations

import re
import sys
from pathlib import Path

import numpy as np

_SKIP_PATTERNS = [r"num_batches_tracked$"]


def port_state_dict(sd: dict, skip_patterns=_SKIP_PATTERNS) -> dict:
    """Generic torch→JAX layout conversion of a state_dict.

    ``sd`` values may be torch tensors or numpy arrays.  Returns a flat
    {torch_name: np.ndarray} dict ready for np.savez / the JAX models.
    The single (2, 3, 1, 0) rule covers Conv2d AND ConvTranspose2d: torch
    lays them out (O, I, kh, kw) and (I, O, kh, kw) respectively, and the
    consumers want HWIO resp. (kh, kw, O, I) — the same permutation.
    """
    skip_res = [re.compile(p) for p in skip_patterns]
    out = {}
    for name, val in sd.items():
        if any(r.search(name) for r in skip_res):
            continue
        arr = np.asarray(val.detach().cpu().numpy()
                         if hasattr(val, "detach") else val)
        if name.endswith(".weight"):
            if arr.ndim == 4:
                arr = arr.transpose(2, 3, 1, 0)
            elif arr.ndim == 2:
                arr = arr.T                          # (O,I) → (I,O)
        out[name] = arr
    return out


def port_dpt(sd: dict) -> dict:
    """DPTForDepthEstimation state_dict → params for vision.dpt.dpt_forward."""
    return port_state_dict(sd)


def port_lpips(sd: dict) -> dict:
    """lpips.LPIPS(net='vgg') state_dict → params for eval.lpips_vgg."""
    return port_state_dict(sd)


def port_densetact_depth(sd: dict) -> dict:
    return port_state_dict(sd)


def port_densetact_force(sd: dict) -> dict:
    return port_state_dict(sd)


_PORTERS = {
    "dpt": port_dpt,
    "zoedepth": port_state_dict,
    "depth_anything": port_state_dict,
    "lpips": port_lpips,
    "densetact_depth": port_densetact_depth,
    "densetact_force": port_densetact_force,
}


def _load_torch_checkpoint(path: Path) -> dict:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    for key in ("state_dict", "model", "model_state_dict"):
        if isinstance(obj, dict) and key in obj and isinstance(obj[key], dict):
            obj = obj[key]
    # strip DataParallel 'module.' prefixes (cam_ros.py wraps nets in DP)
    return {k.removeprefix("module."): v for k, v in obj.items()}


def main(argv):
    if len(argv) != 4 or argv[1] not in _PORTERS:
        sys.exit(__doc__)
    model, ckpt, out = argv[1], Path(argv[2]), Path(argv[3])
    sd = _load_torch_checkpoint(ckpt)
    ported = _PORTERS[model](sd)
    np.savez(out, **ported)
    print(f"ported {len(ported)} tensors → {out}")


if __name__ == "__main__":
    main(sys.argv)
