"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding paths are validated on
host-platform virtual devices instead (the analog of the reference's
"tests pass without a cluster" posture, SURVEY.md §4).

The environment may pre-register a TPU backend via sitecustomize and set
``JAX_PLATFORMS`` before we run, so the platform is forced to CPU both via
the environment *and* the live jax config.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
