"""Test configuration: force an 8-device virtual CPU platform so sharding
tests exercise real multi-device code paths without TPU hardware."""

import os

# Hard-set (not setdefault): the environment presets JAX_PLATFORMS=axon
# (the TPU tunnel); unit tests must run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The axon site hook imports jax before conftest runs, so the env var
# alone is not enough — update the live config too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
