import os
import sys

# Tests always run on a virtual 8-device CPU mesh so sharding logic is
# exercised without TPU hardware. XLA_FLAGS must be set before backend init;
# JAX_PLATFORMS is baked into jax.config at import time by the environment's
# sitecustomize (axon), so it must be overridden via config.update, not env.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
