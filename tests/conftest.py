import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware. Must be set before jax import.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent compilation cache makes repeat test runs fast.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

# The environment ships a TPU plugin that force-prepends its platform to
# jax_platforms at import time; the env var alone does not win. Override
# programmatically so tests always run on the virtual CPU mesh.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
