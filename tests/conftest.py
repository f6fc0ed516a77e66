"""Test config: run on CPU with 8 virtual devices so mesh/sharding tests work
without TPU hardware (SURVEY.md §4).

Note: this environment's axon sitecustomize imports jax at interpreter start
and forces jax_platforms="axon,cpu"; the env var JAX_PLATFORMS is therefore
not enough — override the config after import, before any backend init.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
