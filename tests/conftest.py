"""Test configuration: force an 8-device virtual CPU mesh before JAX is used.

Multi-chip hardware is not available in CI; sharding tests run on a virtual
8-device CPU mesh, mirroring how the driver dry-runs the multi-chip path.

Note: this environment's sitecustomize forces jax_platforms="axon,cpu"
(tunneled TPU first), overriding the JAX_PLATFORMS env var — so the platform
must be pinned via jax.config after import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# persistent compilation cache: makes repeated test runs cheap
_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_repo, "build", "jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

if os.environ.get("DCS_TEST_PLATFORM", "cpu") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")
