"""Real-TPU Mosaic compile test (VERDICT r3 #8).

All other tests run the Pallas kernels in interpret mode on the virtual CPU
mesh, so a Mosaic-compile regression would surface only at bench time — the
exact artifact that kept failing.  This test runs the fwd+bwd kernels
COMPILED on the attached TPU when one is present and skips otherwise.

It must run in a subprocess: conftest.py pins this process's jax backend to
the virtual CPU mesh before any test imports, so the TPU is not reachable
in-process.  The child process inherits the environment's default backend
registration (the remote TPU), enables the persistent compile cache, and
compares compiled vs interpret-mode outputs and gradients on a small scene.
"""
import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SNIPPET = r"""
import sys
sys.path.insert(0, %(repo)r)
import jax
if jax.default_backend() != "tpu":
    print("NO_TPU")
    sys.exit(0)
import jax.numpy as jnp
import numpy as np
from touchgs_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from touchgs_tpu.config import RasterizeConfig
from touchgs_tpu.ops.projection import project_gaussians
from touchgs_tpu.ops.rasterize_pallas import rasterize_pallas
from tests.synthetic import look_at_camera, random_gaussians

means, quats, scales, colors, opac = random_gaussians(2000, seed=0)
cam = look_at_camera(eye=(0.9, 0.9, 0.9), width=128, height=128, focal=110.0)
cfg = RasterizeConfig(k_tile=256)

def render(mns, interpret):
    proj = project_gaussians(mns, quats, scales, cam.w2c, cam.fx, cam.fy,
                             cam.cx, cam.cy, cam.width, cam.height, cfg)
    out = rasterize_pallas(proj, colors, opac, cam.width, cam.height, cfg,
                           interpret=interpret)
    return out

@jax.jit
def compiled_loss_and_grad(mns):
    def loss(m):
        out = render(m, interpret=False)
        return jnp.sum(out.rgb) + jnp.sum(out.depth), out.rgb
    (l, rgb), g = jax.value_and_grad(loss, has_aux=True)(mns)
    return l, rgb, g

l, rgb_c, g_c = compiled_loss_and_grad(means)
jax.block_until_ready(g_c)

def interp_loss(m):
    out = render(m, interpret=True)
    return jnp.sum(out.rgb) + jnp.sum(out.depth), out.rgb
(li, rgb_i), g_i = jax.value_and_grad(interp_loss, has_aux=True)(means)

rgb_d = float(jnp.abs(rgb_c - rgb_i).max())
g_d = float(jnp.abs(g_c - g_i).max())
g_norm = float(jnp.abs(g_i).max())
assert np.isfinite(float(l)), f"non-finite loss {l}"
assert rgb_d < 1e-4, f"compiled vs interpret rgb maxdiff {rgb_d}"
assert g_d < 1e-3 * max(g_norm, 1.0), f"grad maxdiff {g_d} (scale {g_norm})"
print(f"OK rgb_maxdiff={rgb_d:.2e} grad_maxdiff={g_d:.2e}")
""" % {"repo": _REPO}


def test_pallas_kernels_compile_on_real_tpu():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # let the default TPU registration win
    env.pop("XLA_FLAGS", None)
    env.pop("TGS_TEST_PLATFORM", None)
    proc = subprocess.run(
        [sys.executable, "-c", _SNIPPET], capture_output=True, text=True,
        env=env, cwd=_REPO, timeout=1500,
    )
    if "NO_TPU" in proc.stdout:
        pytest.skip("no TPU attached to this host")
    assert proc.returncode == 0, (
        f"compiled-kernel subprocess failed:\n{proc.stderr[-3000:]}")
    assert "OK" in proc.stdout, proc.stdout
