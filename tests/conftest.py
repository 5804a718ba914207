"""Test harness: force an 8-device virtual CPU platform so mesh/sharding
tests run anywhere (SURVEY.md section 4 — the reference has no test suite;
this pyramid is ours).

Note: the axon TPU plugin overrides the JAX_PLATFORMS env var at import, so
the platform must be forced through jax.config *after* import.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
