import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware, and in float64 so the reference test-suite
# tolerances (atol/rtol 1e-4..1e-6; see SURVEY.md section 4) are meaningful.
#
# NB: this environment pre-sets JAX_PLATFORMS=axon (a TPU tunnel) and the
# plugin ignores the env-var override, so the platform must be forced through
# jax.config *before* any backend is initialised.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# The suite is XLA-compile-dominated on the 1-core box (tiny f64 arrays,
# dozens of distinct shapes).  A persistent compilation cache cuts repeat
# runs by an order of magnitude; the cache directory survives across pytest
# invocations but lives in /tmp so a cold run is always reproducible by
# deleting it.
_CACHE_DIR = os.environ.get("TORCHCDE_TPU_TEST_CACHE",
                            "/tmp/torchcde_tpu_jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
except Exception:  # pragma: no cover - cache flags unavailable
    pass
