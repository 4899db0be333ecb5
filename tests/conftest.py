"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Real TPU hardware is single-chip in CI; multi-chip sharding is validated on a
virtual CPU mesh per the framework's testing strategy (SURVEY.md section 7).

Note: the environment's sitecustomize registers the TPU backend and force-sets
``jax_platforms`` via ``jax.config.update``, so the JAX_PLATFORMS env var alone
is not sufficient — we must override the config value before any backend
initialization.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
