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

# XLA's optimization passes dominate test wall time (every integrator
# variant is a fresh ~10-60 s CPU compile); disabling them roughly
# halves compile time and only perturbs float results at the 1e-6
# level, far inside every test tolerance. GDPT_TEST_OPT=1 restores
# full optimization (e.g. to chase a suspected XLA-pass miscompile).
if os.environ.get("GDPT_TEST_OPT", "0") != "1":
    jax.config.update("jax_disable_most_optimizations", True)
