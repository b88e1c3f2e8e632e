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
