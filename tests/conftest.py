import os

# Tests always run on CPU with a virtual 8-device mesh so multi-chip sharding
# paths can be exercised without TPU hardware. Must be set before jax import.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The container's sitecustomize imports jax before conftest runs, latching
# JAX_PLATFORMS from the environment — override via config instead.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
