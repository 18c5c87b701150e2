"""Test configuration: force a clean 8-device virtual CPU platform.

The session environment registers the axon TPU PJRT plugin in every Python
process via sitecustomize (PALLAS_AXON_POOL_IPS) and exports
JAX_PLATFORMS=axon. The registered plugin deadlocks Pallas interpreter-mode
value fetches even when the CPU platform is selected, so we deregister its
backend factory before any backend initializes and pin jax to CPU.

Multi-chip sharding logic is validated on the virtual CPU mesh (the driver
separately dry-runs the real multi-chip path); numerics tests run fp32.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
# 8 virtual device threads may share very few host cores; XLA CPU
# collectives hard-abort when rendezvous participants skew past the default
# 40 s termination timeout. Raise both timeouts.
for _f in (
    "--xla_cpu_collective_call_warn_stuck_timeout_seconds=300",
    "--xla_cpu_collective_call_terminate_timeout_seconds=3000",
):
    if _f.split("=")[0] not in flags:
        flags += " " + _f
os.environ["XLA_FLAGS"] = flags.strip()

from jax._src import xla_bridge  # noqa: E402

xla_bridge._backend_factories.pop("axon", None)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compile cache keeps repeat test runs fast.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
