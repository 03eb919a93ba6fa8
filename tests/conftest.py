"""Test configuration: force an 8-device virtual CPU mesh (SURVEY.md §4).

The dev image pre-imports jax and registers a remote TPU backend
(`JAX_PLATFORMS=axon`) via sitecustomize in every Python process, so env vars
alone are read too late — we must override through jax.config before any
backend initializes.  All tests run on 8 virtual CPU devices so they are
hermetic and exercise the same sharding code paths the driver validates via
`dryrun_multichip`.  Set TGS_TEST_PLATFORM=axon to test on real TPU hardware.
"""
import os

_platform = os.environ.get("TGS_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (already imported by sitecustomize; reconfigure)

jax.config.update("jax_platforms", _platform)
jax.config.update("jax_enable_x64", False)


def pytest_report_header(config):
    return f"jax backend: {jax.default_backend()}, devices: {jax.device_count()}"
