"""Test bootstrap: force CPU with 8 virtual devices so sharding tests
exercise multi-chip layouts without TPU hardware (SURVEY.md §4e).

Note: the env var alone is not enough under the axon TPU plugin; the
explicit config.update is what actually pins the platform.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
