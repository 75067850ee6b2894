# -*- coding: utf-8 -*-
"""Test configuration: force the CPU backend with 8 virtual devices so
sharding/pjit paths are exercised without TPU hardware. Must run before the
first ``import jax`` anywhere in the test session."""
import os

# force, not setdefault: the ambient environment may pin JAX_PLATFORMS to a
# real accelerator; tests must be hermetic and run on the virtual CPU mesh
_platform = os.environ.get("FFS_TPU_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform

# a sitecustomize may have imported jax before this file runs, latching the
# ambient platform; override through the config API as well
try:
    import jax

    jax.config.update("jax_platforms", _platform)
except Exception:
    pass
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
