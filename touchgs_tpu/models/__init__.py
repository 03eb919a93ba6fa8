from touchgs_tpu.models.gaussians import (  # noqa: F401
    GaussianParams,
    init_from_points,
    init_random,
)
from touchgs_tpu.models.splatfacto import render, compute_losses  # noqa: F401
from touchgs_tpu.models.densify import DensifyState, update_stats, refine  # noqa: F401
