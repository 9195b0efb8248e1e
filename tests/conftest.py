"""Test configuration: force an 8-device virtual CPU mesh.

Distributed correctness (z-slab sharding, halo exchange, psum'd metrics —
SURVEY.md §4) is validated on a host-platform device mesh, so the suite
runs anywhere without TPU hardware. Must run before any JAX backend is
initialized; `jax.config.update` wins even if a sitecustomize hook already
imported jax and selected another platform.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
