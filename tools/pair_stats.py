"""Tile-list statistics for the bench scene: mean/max entries per tile,
dropped-pair fraction at the consumer cap (VERDICT r2 task 7 groundwork)."""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(k_tile=1024):
    import jax
    import jax.numpy as jnp

    from touchgs_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from touchgs_tpu.config import RasterizeConfig
    from touchgs_tpu.data.cameras import Camera
    from touchgs_tpu.models.gaussians import init_random
    from touchgs_tpu.ops.projection import project_gaussians
    from touchgs_tpu.ops.tiles import bin_gaussians

    WIDTH = HEIGHT = 800
    N, CAP = 100_000, 131_072
    rcfg = RasterizeConfig()
    params = init_random(n=N, capacity=CAP, sh_degree=3)
    cam = Camera(
        fx=jnp.float32(0.9 * WIDTH), fy=jnp.float32(0.9 * WIDTH),
        cx=jnp.float32(WIDTH / 2), cy=jnp.float32(HEIGHT / 2),
        c2w=jnp.asarray([[1.0, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 2.5],
                         [0, 0, 0, 1]], jnp.float32),
        width=WIDTH, height=HEIGHT,
    )

    @jax.jit
    def f(p):
        proj = project_gaussians(
            p.means, p.quats, p.scales(), cam.w2c, cam.fx, cam.fy, cam.cx,
            cam.cy, WIDTH, HEIGHT, rcfg, extra_valid=p.alive,
            opacities=p.opacities())
        bins = bin_gaussians(proj, WIDTH, HEIGHT, rcfg)
        return bins.tile_counts, proj.radii, proj.cull_radii, proj.valid

    counts, radii, cull_radii, valid = jax.device_get(f(params))
    counts = counts.astype(np.int64)
    total = counts.sum()
    kept = np.minimum(counts, k_tile).sum()
    print(f"tiles: {counts.size}  total pairs: {total}  "
          f"mean/tile: {counts.mean():.1f}  max/tile: {counts.max()}")
    print(f"p50/p90/p99 per tile: {np.percentile(counts, [50, 90, 99])}")
    print(f"cap {k_tile}: kept {kept} ({100*kept/max(total,1):.2f}%)  "
          f"dropped {total-kept}")
    print(f"valid gaussians: {valid.sum()}  mean radius: "
          f"{radii[valid].mean():.2f}px  mean cull radius: "
          f"{cull_radii[valid].mean():.2f}px")
    # scanned-chunk accounting at chunk=128, incl. DMA-alignment rem waste
    kc = 128
    # rem is data-dependent (starts % 128); approximate uniform 0..127
    scanned = ((np.minimum(counts, k_tile) + kc - 1) // kc + 1) * kc
    print(f"scanned entries (incl. rem+pad, approx): {scanned.sum()}  "
          f"waste vs real: {scanned.sum()/max(kept,1):.2f}x")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1024)
