"""Test configuration: run everything on a virtual 8-device CPU mesh.

This mirrors how the reference's multi-GPU behavior must be testable without
a cluster (SURVEY.md §4): JAX's host-platform device-count flag simulates a
mesh so sharding/collective code paths compile and execute in CI.
"""

import os

# The image's sitecustomize registers the "axon" TPU plugin and programmatically
# sets jax_platforms to "axon,cpu" in every process, so the env var alone is not
# enough — override the config after import, before any backend initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
