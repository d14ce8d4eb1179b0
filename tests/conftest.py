import os

# Run the test suite on a virtual 8-device CPU mesh so multi-chip sharding
# logic is exercised without TPU hardware. The ambient environment pins
# JAX_PLATFORMS=axon (TPU) via sitecustomize before conftest runs, so the
# platform must be overridden through jax.config, and XLA_FLAGS before the
# first backend initialization.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
