"""Eval metric + runner tests, incl. reading our JSON with the reference's
own aggregator as an oracle."""
import json
import sys

import jax.numpy as jnp
import numpy as np

from touchgs_tpu.eval.metrics import eval_metrics, lpips_distance, psnr
from touchgs_tpu.eval.runner import compute_averages, write_eval_json


def test_psnr_identity_and_noise():
    img = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (32, 32, 3)),
                      jnp.float32)
    assert float(psnr(img, img)) >= 99.0
    noisy = jnp.clip(img + 0.1, 0, 1)
    assert 15 < float(psnr(img, noisy)) < 30


def test_lpips_orders_correctly():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (64, 64, 3)), jnp.float32)
    near = jnp.clip(img + 0.02, 0, 1)
    far = jnp.asarray(rng.uniform(0, 1, (64, 64, 3)), jnp.float32)
    d_same = float(lpips_distance(img, img))
    d_near = float(lpips_distance(img, near))
    d_far = float(lpips_distance(img, far))
    assert d_same < 1e-8
    assert d_same < d_near < d_far


def test_eval_metrics_keys():
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.uniform(0, 1, (24, 32, 3)), jnp.float32)
    depth = jnp.asarray(rng.uniform(1, 2, (24, 32)), jnp.float32)
    m = eval_metrics(
        rgb, depth, rgb, supervision_depth=depth, gt_depth=depth,
        object_mask=jnp.ones((24, 32), bool), is_real_world=True,
    )
    assert set(m) == {
        "psnr", "ssim", "lpips", "depth_mse", "supervised_depth_mse",
        "gt_depth_mse", "gt_object_depth_mse",
    }
    assert m["depth_mse"] == 0.0 and m["gt_depth_mse"] == 0.0
    # sim mode drops the gt keys (IS_REAL_WORLD gating, get_results.py:48-52)
    m2 = eval_metrics(rgb, depth, rgb, supervision_depth=depth,
                      gt_depth=depth, is_real_world=False)
    assert "gt_depth_mse" not in m2


def test_json_readable_by_reference_aggregator(tmp_path):
    """The reference's own get_results.compute_averages must parse our files."""
    results = {"psnr": 30.0, "ssim": 0.9, "lpips": 0.1, "depth_mse": 0.01,
               "supervised_depth_mse": 0.01, "gt_depth_mse": 0.02,
               "gt_object_depth_mse": 0.03}
    for i in range(3):
        write_eval_json(results, tmp_path / f"trial_{i}.json")

    sys.path.insert(0, "/root/reference/experiment_utils")
    try:
        import get_results as ref_agg
        ref_agg.compute_averages([str(tmp_path / f"trial_{i}.json")
                                  for i in range(3)])
    finally:
        sys.path.pop(0)

    agg = compute_averages(list(tmp_path.glob("*.json")))
    assert agg["psnr"]["mean"] == 30.0
    assert agg["psnr"]["std"] == 0.0
