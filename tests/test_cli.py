"""End-to-end CLI pipeline test over a synthetic Touch-GS-layout scene dir.

Exercises the full data contract (SURVEY.md §2.10): gpis npy → touch PNGs →
fusion outputs → transforms.json augmentation → seed point cloud → train →
eval JSON — all through the public CLI.
"""
import json
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from touchgs_tpu import cli
from touchgs_tpu.data.depth_io import write_depth_mm


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    return _build_scene_dir(tmp_path_factory.mktemp("bunny_tiny"))


def _build_scene_dir(root):
    h, w = 48, 64
    n = 6
    rng = np.random.default_rng(0)

    (root / "imgs").mkdir()
    (root / "gpis_depth").mkdir()
    (root / "gpis_var").mkdir()
    (root / "realsense_depths").mkdir()
    (root / "zoe_out").mkdir()

    frames = []
    for i in range(n):
        name = f"frame_{i:05d}"
        img = (rng.uniform(0, 255, (h, w, 3))).astype(np.uint8)
        Image.fromarray(img).save(root / "imgs" / f"{name}.png")

        # gpis outputs: a centered disk of depth ~1m, NaN elsewhere
        yy, xx = np.mgrid[0:h, 0:w]
        disk = (yy - h / 2) ** 2 + (xx - w / 2) ** 2 < (h / 3) ** 2
        gd = np.where(disk, 1.0 + 0.01 * i, np.nan).astype(np.float32)
        gv = np.where(disk, 0.01, np.nan).astype(np.float32)
        np.save(root / "gpis_depth" / f"Image{i + 1}.npy", gd)
        np.save(root / "gpis_var" / f"Image{i + 1}.npy", gv)

        # grounded (realsense) + vision (zoe) uint16-mm PNGs
        grounded = rng.uniform(0.8, 2.0, (h, w)).astype(np.float32)
        write_depth_mm(root / "realsense_depths" / f"{name}.png", grounded)
        vision = (grounded * 0.8 + 0.2).astype(np.float32)
        write_depth_mm(root / "zoe_out" / f"{name}.png", vision)

        ang = 2 * np.pi * i / n
        eye = np.array([1.5 * np.cos(ang), 1.5 * np.sin(ang), 0.8])
        fwd = -eye / np.linalg.norm(eye)
        right = np.cross(fwd, [0, 0, 1.0]); right /= np.linalg.norm(right)
        up = np.cross(right, fwd)
        c2w = np.eye(4)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, up, -fwd, eye
        frames.append({
            "file_path": f"imgs/{name}.png",
            "transform_matrix": c2w.tolist(),
        })

    meta = {"fl_x": 50.0, "fl_y": 50.0, "cx": w / 2, "cy": h / 2,
            "w": w, "h": h, "frames": frames}
    (root / "transforms.json").write_text(json.dumps(meta))
    return root


def test_read_touch_depths(scene_dir):
    cli.main(["read-touch-depths", "--root", str(scene_dir)])
    files = sorted((scene_dir / "touch_depth").iterdir())
    assert len(files) == 6
    from touchgs_tpu.data.depth_io import read_depth_mm
    d = read_depth_mm(files[0])
    assert abs(d.max() - 1.0) < 0.01   # NaN→0, disk ≈ 1m
    assert d.min() == 0.0


def test_fuse(scene_dir):
    cli.main([
        "fuse", "--root_dir", str(scene_dir),
        "--aligning_depths", "realsense_depths",
        "--zoe_depth_path", "zoe_out",
        "--touch_depth", "touch_depth", "--touch_var", "touch_var",
        "--vision_output_dir", "vision", "--fused_output_dir", "fused",
        "--use_uncertainty", "--is_sim",
    ])
    assert len(list((scene_dir / "fused").iterdir())) == 6
    assert len(list((scene_dir / "fused_uncertainty").iterdir())) == 6
    assert len(list((scene_dir / "vision_baseline").iterdir())) == 6


def test_add_depth_paths(scene_dir):
    cli.main(["add-depth-paths", "--root_dir", str(scene_dir),
              "--fused_output_dir", "fused"])
    meta = json.loads((scene_dir / "transforms.json").read_text())
    f0 = meta["frames"][0]
    assert f0["depth_file_path"].startswith("fused/")
    assert f0["uncertainty_file_path"].startswith("fused_uncertainty/")


def test_seed(scene_dir):
    cli.main(["seed", "--root_dir", str(scene_dir), "--train_split", "0.5",
              "--percent_take", "50"])
    pts = np.load(scene_dir / "points_touch.npy")
    cols = np.load(scene_dir / "points_colors.npy")
    assert len(pts) == len(cols) > 100
    assert cols.max() > 1.0  # 0-255 convention


def test_train_eval_render(scene_dir, tmp_path):
    out_dir = tmp_path / "outputs"
    cli.main([
        "train", "--data", str(scene_dir), "--preset", "bunny_blender",
        "--max-steps", "25", "--output-dir", str(out_dir), "--is-sim",
    ])
    run_dirs = list(
        (out_dir / scene_dir.name / "depth-gaussian-splatting").iterdir()
    )
    assert len(run_dirs) == 1
    assert (run_dirs[0] / "config.json").exists()

    cli.main([
        "eval", "--data", str(scene_dir), "--preset", "bunny_blender",
        "--output-dir", str(out_dir), "--is-sim",
    ])
    eval_json = json.loads((run_dirs[0] / "eval.json").read_text())
    assert {"psnr", "ssim", "lpips"} <= set(eval_json["results"])

    cli.main([
        "render", "--data", str(scene_dir), "--preset", "bunny_blender",
        "--output-dir", str(out_dir),
    ])
    renders = list((run_dirs[0] / "renders").iterdir())
    assert len(renders) > 0


def test_pipeline_runs_all_stages(tmp_path_factory, tmp_path):
    """`pipeline` chains read-touch-depths → monodepth → fuse →
    add-depth-paths → seed → train → eval (scripts/train_bunny_real.sh)."""
    root = _build_scene_dir(tmp_path_factory.mktemp("pipe_scene"))
    out_dir = tmp_path / "outputs"
    cli.main([
        "pipeline", "--data", str(root), "--preset", "bunny_real",
        "--max-steps", "15", "--output-dir", str(out_dir), "--cpu",
    ])
    # every intermediate stage produced its contract outputs
    assert len(list((root / "touch_depth").iterdir())) == 6
    assert len(list((root / "zoe_depth").iterdir())) == 6
    assert len(list((root / "fused_output_dir").iterdir())) == 6
    assert len(list((root / "fused_output_dir_uncertainty").iterdir())) == 6
    meta = json.loads((root / "transforms.json").read_text())
    assert meta["frames"][0]["depth_file_path"].startswith("fused_output_dir/")
    assert (root / "points_touch.npy").exists()
    run_dirs = list(
        (out_dir / root.name / "depth-gaussian-splatting").iterdir())
    assert len(run_dirs) == 1
    results = json.loads((run_dirs[0] / "eval.json").read_text())["results"]
    assert {"psnr", "ssim", "lpips"} <= set(results)


def test_eval_with_gt_depth(scene_dir, tmp_path):
    """--gt-depth-dir/--object-mask-dir emit gt_depth_mse /
    gt_object_depth_mse (get_results.py:48-52 contract)."""
    out_dir = tmp_path / "outputs"
    cli.main([
        "train", "--data", str(scene_dir), "--preset", "bunny_real",
        "--max-steps", "10", "--output-dir", str(out_dir), "--cpu",
    ])
    # synth GT depth + object masks for every view
    gt_dir = scene_dir / "gt_depth"
    mask_dir = scene_dir / "object_masks"
    gt_dir.mkdir(exist_ok=True)
    mask_dir.mkdir(exist_ok=True)
    h, w = 48, 64
    for i in range(6):
        write_depth_mm(gt_dir / f"frame_{i:05d}.png",
                       np.full((h, w), 1.2, np.float32))
        Image.fromarray(
            (np.arange(h * w).reshape(h, w) % 2 * 255).astype(np.uint8)
        ).save(mask_dir / f"frame_{i:05d}.png")
    cli.main([
        "eval", "--data", str(scene_dir), "--preset", "bunny_real",
        "--output-dir", str(out_dir), "--cpu",
        "--gt-depth-dir", str(gt_dir), "--object-mask-dir", str(mask_dir),
    ])
    run_dirs = sorted(
        (out_dir / scene_dir.name / "depth-gaussian-splatting").iterdir())
    results = json.loads((run_dirs[-1] / "eval.json").read_text())["results"]
    assert "gt_depth_mse" in results
    assert "gt_object_depth_mse" in results
