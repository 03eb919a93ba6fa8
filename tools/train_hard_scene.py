"""Hard-scene A/B: touch-dominant, vision-unreliable (VERDICT r3 item 7).

The mirror scene is the paper's core claim (`scripts/train_mirror.sh:46-49`:
touch supervision where vision fails, uncertainty-weighted fusion, sparse
touch seeding).  This demo builds the synthetic analogue end-to-end through
the REAL pipeline modules:

- mirror-like scene: a TEXTURELESS matte sphere on the usual textured
  checkered plane (mirror_data's shape: the room has texture, the problem
  object does not) — photometric supervision carries almost no geometry
  information on the object;
- "vision" monodepth that fails exactly the way depth nets fail on
  mirrors/glass: on the object it reads the surface BEHIND it (rendered
  plane-only depth), plus a global affine miscalibration off-object;
- "touch": accurate depth in DenseTact-sized contact patches on the sphere
  (GPIS-style mean + small sigma), absent elsewhere;
- the real two-stage alignment + uncertainty synthesis + Bayesian fusion
  (`touch/fusion.py::fuse_view`) produces the fused depth/uncertainty maps;
- the real seeder (`touch/pointcloud.py::seed_point_cloud`) backprojects
  touch patches into seed points (mirror preset: --percent-take 5).

Training A (Touch-GS): fused depth + DEPTH_UNCERTAINTY_WEIGHTED_LOSS
(mult 0.2, weight 1.0 — the mirror preset row of SURVEY §2.1) from touch
seeds.  Training B (vision-only DS-GS baseline): the stage-1-aligned vision
depth with SIMPLE loss, seeded by backprojecting that same vision depth.
Identical capacity/steps/optimizer; the ONLY difference is what the depth
supervision and seeds know.

Run: python tools/train_hard_scene.py            (TPU, ~10 min post-compile)
Writes RESULTS_hard_scene.md.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.train_scale_demo import (  # noqa: E402
    assert_lossless, build_gt_gaussians, lossless_gt_raster, ring_cameras)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--capacity", type=int, default=2 ** 17)
    ap.add_argument("--size", type=int, default=400)
    ap.add_argument("--views", type=int, default=16)
    ap.add_argument("--touch-patches", type=int, default=30)
    ap.add_argument("--patch-radius", type=float, default=0.09)
    ap.add_argument("--sh-degree", type=int, default=2,
                    help="SH degree for both arms (0 = the view-dependence "
                         "ablation row, VERDICT r4 #4)")
    ap.add_argument("--unc-form", default="inv_sq",
                    choices=["inv_sq", "inv", "exp"],
                    help="uncertainty weighting form for arm A "
                         "(DepthLossConfig.uncertainty_form A/B)")
    ap.add_argument("--no-gpis", action="store_true",
                    help="legacy r4 mode: raw patch-only touch depth instead "
                         "of GPIS-interpolated depth+variance")
    ap.add_argument("--gpis-max-points", type=int, default=512)
    ap.add_argument("--skip-baseline", action="store_true",
                    help="run only arm A (ablation rows)")
    ap.add_argument("--out", default="RESULTS_hard_scene.md")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from touchgs_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from touchgs_tpu.config import (DensifyConfig, DepthLossConfig,
                                    DepthLossType, ModelConfig, OptimConfig,
                                    RasterizeConfig, TrainConfig)
    from touchgs_tpu.data.cameras import Cameras
    from touchgs_tpu.data.scene import Scene
    from touchgs_tpu.models.gaussians import GaussianParams
    from touchgs_tpu.models.splatfacto import render, render_lossless
    from touchgs_tpu.ops.sh import rgb_to_sh_dc
    from touchgs_tpu.touch.fusion import fuse_view
    from touchgs_tpu.touch.pointcloud import backproject_depth, seed_point_cloud
    from touchgs_tpu.train.trainer import Trainer

    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    print(f"device: {dev.device_kind}", flush=True)
    W = H = args.size

    # --- GT: TEXTURELESS (mirror-like) sphere on the usual textured
    # checkered plane — the mirror_data analogue: the room around the
    # mirror has texture, the problem object does not
    means, quats, scales, colors, opac = build_gt_gaussians()
    n_sphere = 60_000
    G = means.shape[0]
    flat = np.asarray(colors).copy()
    flat[:n_sphere] = (0.82, 0.82, 0.85)      # uniform matte sphere
    colors = jnp.asarray(flat)
    gt = GaussianParams(
        means=means, quats=quats, log_scales=jnp.log(scales),
        logit_opacities=jnp.log(opac / (1 - opac)),
        sh_dc=rgb_to_sh_dc(colors), sh_rest=jnp.zeros((G, 3, 3)),
        alive=jnp.ones((G,), bool))
    plane_only = dataclasses.replace(
        gt, alive=gt.alive.at[:n_sphere].set(False))
    gt_cfg = ModelConfig(max_gaussians=G, sh_degree=1,
                         rasterize=lossless_gt_raster(on_tpu))
    cams = ring_cameras(args.views, W, H)
    gt_render = jax.jit(lambda g, c: render(g, c, gt_cfg, active_sh_degree=1)[0])

    print("rendering GT + plane-only views...", flush=True)
    images, depths, plane_depths = [], [], []
    for cam in cams:
        out = assert_lossless(gt_render(gt, cam))
        images.append(np.asarray(out.rgb))
        depths.append(np.asarray(out.depth))
        plane_depths.append(np.asarray(gt_render(plane_only, cam).depth))
    images, depths = np.stack(images), np.stack(depths)
    plane_depths = np.stack(plane_depths)

    # --- synthetic sensors -------------------------------------------------
    rng = np.random.default_rng(3)
    # touch contact centers on the sphere surface
    cvec = rng.normal(size=(args.touch_patches, 3))
    cvec /= np.linalg.norm(cvec, axis=1, keepdims=True)
    centers = cvec * 0.5

    bp = jax.jit(backproject_depth, static_argnames=())
    intr = (float(cams[0].fx), float(cams[0].fy),
            float(cams[0].cx), float(cams[0].cy))
    vision, grounded, sphere_masks, in_patches = [], [], [], []
    contact_pts = []
    for v, cam in enumerate(cams):
        gt_d = depths[v]
        pl_d = plane_depths[v]
        sph = (gt_d > 0) & (pl_d - gt_d > 1e-3)     # pixels on the sphere
        # mirror-mode vision: reads THROUGH the object, then a global affine
        # miscalibration a monodepth net would have; no reading where the
        # scene has no geometry (black background)
        vis = np.where(sph, pl_d, gt_d)
        vis = vis / 0.97 - 0.02 + rng.normal(0, 0.01, gt_d.shape)
        vis = np.where(gt_d > 0, np.maximum(vis, 0.0), 0.0)
        # touch contact patches on the sphere (the DenseTact's footprint)
        pts, _, valid = bp(jnp.asarray(gt_d), jnp.asarray(images[v]),
                           intr, jnp.asarray(np.asarray(cam.c2w)))
        pts = np.asarray(pts).reshape(H, W, 3)
        d2 = ((pts[None, :, :, :] - centers[:, None, None, :]) ** 2).sum(-1)
        in_patch = (d2.min(axis=0) < args.patch_radius ** 2) & sph
        contact_pts.append(pts[in_patch])
        # grounded sparse anchor (RealSense-class): GT + noise; fusion
        # sparsifies it to 1% itself
        gnd = np.where(gt_d > 0, gt_d + rng.normal(0, 0.01, gt_d.shape), 0.0)
        vision.append(vis); grounded.append(gnd)
        sphere_masks.append(sph); in_patches.append(in_patch)
    vision, grounded = np.stack(vision), np.stack(grounded)
    sphere_masks = np.stack(sphere_masks)
    in_patches = np.stack(in_patches)

    if args.no_gpis:
        # legacy r4 construction: raw per-pixel touch depth inside patches,
        # constant sigma, nothing between patches
        touch = np.where(in_patches, depths, 0.0)
        touch_sig = np.where(in_patches, 0.05, 0.0)
    else:
        # the REAL reference pipeline (SURVEY §2.8): fit the GPIS to the
        # contact points and ray-march per-view DENSE depth + variance maps
        # (gpis_depth/gpis_var contract) — the GP interpolates BETWEEN
        # contact patches with calibrated, growing variance, which is the
        # paper's core machinery and what the r4 patch-only harness left out
        from touchgs_tpu.touch.gpis import fit_gpis, render_depth_var

        all_contacts = np.concatenate(contact_pts)
        # exact contact normals (sphere at origin): the DenseTact senses the
        # local surface orientation at each press
        t0g = time.time()
        # lengthscale 2×patch radius: the CPU sweep (r5) put inter-patch
        # interpolation error at median 0.9 cm / mean 5.8 cm vs 15 cm at
        # 1.2× — the GP needs reach comparable to the patch GAPS, not the
        # patch size
        g = fit_gpis(all_contacts,
                     normals=all_contacts / np.linalg.norm(
                         all_contacts, axis=1, keepdims=True),
                     lengthscale=2.0 * args.patch_radius,
                     off_surface_eps=0.05,
                     max_points=args.gpis_max_points, seed=0)
        sph_d = depths[sphere_masks]
        near, far = float(sph_d.min()) - 0.15, float(sph_d.max()) + 0.15
        touch, touch_sig = [], []
        for v, cam in enumerate(cams):
            # tight support gate (0.15): the silhouette halo of
            # weak-support crossings supervises phantom depth at off-object
            # pixels, and under the reference's sigma calibration
            # (vision sigma >= 5) even meter-scale touch variance wins the
            # fusion — cutting the halo at the source beats re-weighting it
            dep, var = render_depth_var(g, cam, near=near, far=far,
                                        n_samples=96, pixel_chunk=1024,
                                        support_var_frac=0.15)
            dep = np.nan_to_num(np.asarray(dep), nan=0.0)
            var = np.nan_to_num(np.asarray(var), nan=0.0)
            # gpis_var is consumed as the touch uncertainty map exactly as
            # the reference loads touch_var (sigma-not-sigma^2 quirk kept,
            # utils/fuse_touch_vision.py:116-126)
            touch.append(np.where(dep > 0, dep, 0.0))
            touch_sig.append(np.where(dep > 0, np.maximum(var, 1e-4), 0.0))
        touch, touch_sig = np.stack(touch), np.stack(touch_sig)
        print(f"GPIS: {len(all_contacts)} contacts -> "
              f"{args.gpis_max_points} pts, {args.views} views rendered in "
              f"{time.time() - t0g:.1f}s", flush=True)
    print(f"touch coverage of sphere pixels: "
          f"{(touch[sphere_masks] > 0).sum() / max(sphere_masks.sum(), 1):.1%}",
          flush=True)

    # --- the real fusion pipeline, per view --------------------------------
    print("fusing views (two-stage align + Bayesian fusion)...", flush=True)
    fused_d, fused_u, dsgs_d = [], [], []
    key = jax.random.PRNGKey(0)
    for v in range(args.views):
        key, sub = jax.random.split(key)
        fv = fuse_view(sub, jnp.asarray(grounded[v]), jnp.asarray(touch[v]),
                       jnp.asarray(vision[v]), jnp.asarray(touch_sig[v]),
                       use_uncertainty=True, is_real_world=True)
        fused_d.append(np.asarray(fv.fused_depth))
        fused_u.append(np.asarray(fv.fused_uncertainty))
        dsgs_d.append(np.asarray(fv.ds_gs_depth))
    fused_d, fused_u = np.stack(fused_d), np.stack(fused_u)
    dsgs_d = np.stack(dsgs_d)

    i_all = np.arange(args.views)
    i_train = i_all[i_all % 4 != 3]                 # mirror split 0.8-ish
    i_eval = i_all[i_all % 4 == 3]
    c2ws = np.stack([np.asarray(c.c2w) for c in cams])

    # seeds B (vision-only baseline): backproject the aligned monodepth —
    # right on the plane, WRONG (through-object) on the sphere
    pt_b = 100.0 * 20_000 / max((dsgs_d[i_train] > 0).sum(), 1)
    seeds_b, cols_b = seed_point_cloud(dsgs_d, images, intr, c2ws, i_train,
                                       percent_take=pt_b, seed=0)
    # seeds A (Touch-GS): the SAME scene seeds AUGMENTED by the touch
    # patches (mirror preset --percent_take 5) — the reference adds
    # points_touch.npy to the scene's initialization, it does not discard
    # the rest of the scene
    touch_pts, touch_cols = seed_point_cloud(touch, images, intr, c2ws,
                                             i_train, percent_take=5.0,
                                             seed=0)
    seeds_a = np.concatenate([seeds_b, touch_pts])
    cols_a = np.concatenate([cols_b, touch_cols])
    print(f"seeds: vision={len(seeds_b)} +touch={len(touch_pts)}", flush=True)

    cameras = Cameras(
        fx=np.array([intr[0]] * args.views, np.float32),
        fy=np.array([intr[1]] * args.views, np.float32),
        cx=np.array([intr[2]] * args.views, np.float32),
        cy=np.array([intr[3]] * args.views, np.float32),
        c2w=c2ws, width=W, height=H)

    def run(tag, depth_maps, unc_maps, seeds, seed_cols, loss_cfg):
        scene = Scene(cameras=cameras, images=images, depths=depth_maps,
                      uncertainties=unc_maps, i_train=i_train, i_eval=i_eval,
                      seed_points=seeds, seed_colors=seed_cols / 255.0,
                      scale_factor=1.0, transform=np.eye(4)[:3],
                      name=f"hard_{tag}")
        cfg = TrainConfig(
            max_steps=args.steps,
            model=ModelConfig(max_gaussians=args.capacity,
                              sh_degree=args.sh_degree,
                              rasterize=RasterizeConfig(use_pallas=on_tpu)),
            depth=loss_cfg,
            # periodic opacity reset ON (splatfacto default 3000): it is the
            # mechanism that kills the dark floater blobs the r5 eval
            # renders showed hovering in front of the textureless object
            # (phantom-supervised splats never photometrically contradicted)
            densify=DensifyConfig(warmup_steps=300, refine_every=100,
                                  stop_refine_at=args.steps - 300,
                                  reset_opacity_every=3000),
            optim=OptimConfig(means_lr_max_steps=args.steps),
            sh_degree_interval=max(args.steps // 3, 1),
            grow_capacity=False,
            log_every=250,
        )
        tr = Trainer(scene, cfg)
        t0 = time.time()
        tr.run(log_fn=lambda m: print(f"[{tag}] {m}", flush=True))
        ips = args.steps / (time.time() - t0)

        psnrs, maes, obj_maes = [], [], []
        rdir = Path(f"/tmp/hard_scene_{tag}")
        rdir.mkdir(exist_ok=True)
        from PIL import Image
        for i in i_eval:
            out = render_lossless(tr.state.params, cameras.at(int(i)),
                                  cfg.model, active_sh_degree=args.sh_degree)
            r = np.asarray(out.rgb)
            Image.fromarray((np.concatenate([r, images[i]], axis=1)
                             .clip(0, 1) * 255).astype(np.uint8)).save(
                rdir / f"eval_{i:02d}_pred_vs_gt.png")
            mse = float(((r - images[i]) ** 2).mean())
            psnrs.append(-10 * np.log10(max(mse, 1e-10)))
            d = np.asarray(out.depth)
            m = depths[i] > 0
            maes.append(float(np.abs(d - depths[i])[m].mean()))
            om = sphere_masks[i]
            obj_maes.append(float(np.abs(d - depths[i])[om].mean()))
        res = {"tag": tag, "iters_per_sec": round(ips, 2),
               "alive": int(tr.state.params.num_alive),
               "eval_psnr": round(float(np.mean(psnrs)), 2),
               "depth_mae_cm": round(100 * float(np.mean(maes)), 2),
               "object_depth_mae_cm": round(100 * float(np.mean(obj_maes)), 2)}
        print(json.dumps(res), flush=True)
        return res

    # mirror preset hyperparameters (SURVEY §2.1: 0.2 / UNCERT / 1.0)
    a = run("touchgs", fused_d, fused_u, seeds_a, cols_a,
            DepthLossConfig(0.2, DepthLossType.DEPTH_UNCERTAINTY_WEIGHTED_LOSS,
                            1.0, uncertainty_form=args.unc_form))
    if args.skip_baseline:
        b = dict(a, tag="(baseline skipped)")
    else:
        b = run("vision_only", dsgs_d, np.zeros_like(fused_u), seeds_b, cols_b,
                DepthLossConfig(0.2, DepthLossType.SIMPLE_LOSS, 0.0))

    md = Path(args.out)
    md.write_text(f"""# RESULTS — hard scene (touch-dominant, vision-unreliable)

Mirror-style synthetic A/B (this file is written by
`tools/train_hard_scene.py`; see its docstring for the construction):
textureless sphere+plane, vision depth reads THROUGH the object, touch
readings span {(touch > 0).sum() / max(sphere_masks.sum(), 1):.0%} of the
sphere's pixel area ({(touch[sphere_masks] > 0).sum() / max(sphere_masks.sum(), 1):.0%}
on-sphere; GPIS support extends past the silhouette) from
{args.touch_patches} contact patches, fused end-to-end by
`touch/fusion.py::fuse_view`.  {args.views} views at {W}x{H},
{args.steps} steps, capacity {args.capacity}, on {dev.device_kind}.
Touch mode: {"raw patch-only (legacy)" if args.no_gpis else
             f"GPIS-interpolated depth+variance ({args.gpis_max_points} pts)"};
sh_degree {args.sh_degree}; uncertainty form {args.unc_form}.

| config | depth supervision | seeds | eval PSNR | depth MAE | OBJECT depth MAE |
|---|---|---|---|---|---|
| Touch-GS (UNCERT 0.2/1.0) | fused touch+vision | scene + touch ({len(seeds_a)}) | {a['eval_psnr']:.2f} dB | {a['depth_mae_cm']:.2f} cm | **{a['object_depth_mae_cm']:.2f} cm** |
| vision-only (SIMPLE 0.2) | aligned monodepth | scene only ({len(seeds_b)}) | {b['eval_psnr']:.2f} dB | {b['depth_mae_cm']:.2f} cm | {b['object_depth_mae_cm']:.2f} cm |

The OBJECT depth MAE column is the analogue of the reference's
`gt_object_depth_mse` (`experiment_utils/get_results.py:51-52`): error on
the sphere only, where vision is wrong and touch is the sole accurate
signal.
""")
    print(f"wrote {md}", flush=True)


if __name__ == "__main__":
    main()
