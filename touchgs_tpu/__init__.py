"""touchgs_tpu — a TPU-native visual-tactile 3D Gaussian Splatting framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
armlabstanford/Touch-GS (IROS 2024, arXiv 2403.09875): a tile-based Gaussian
splatting trainer with uncertainty-weighted depth supervision, a GPIS touch
pipeline, vision-touch Bayesian depth fusion, and an evaluation harness — all
built TPU-first (static shapes, fixed-capacity primitive arrays, Pallas tile
kernels, `jax.sharding.Mesh` parallelism).

Subpackages
-----------
- ``touchgs_tpu.data``     scene IO: transforms.json, uint16-mm depth maps, splits
- ``touchgs_tpu.ops``      rasterization (jnp oracle + Pallas tiles), SH, SSIM
- ``touchgs_tpu.models``   Gaussian parameter pytrees, splat model, densification
- ``touchgs_tpu.train``    training loop, optimizers, checkpointing
- ``touchgs_tpu.parallel`` device mesh, sharded train step
- ``touchgs_tpu.touch``    GPIS, vision-touch fusion, uncertainty, point-cloud seeding
- ``touchgs_tpu.vision``   monocular depth interface (DPT-style, flax)
- ``touchgs_tpu.eval``     PSNR/SSIM/LPIPS + depth-MSE metrics, eval runner
"""

__version__ = "0.1.0"
