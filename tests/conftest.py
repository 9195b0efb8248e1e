"""Test configuration: force an 8-device virtual CPU mesh.

Distributed correctness (z-slab sharding, halo exchange, psum'd metrics —
SURVEY.md §4) is validated on a host-platform device mesh, so the suite
runs anywhere without TPU hardware. Must run before any JAX backend is
initialized; `jax.config.update` wins even if a sitecustomize hook already
imported jax and selected another platform.
"""

import os

if os.environ.get("TOMOJAX_TEST_TPU") == "1":
    # Opt-in real-hardware mode: leave the backend alone so the
    # TPU-gated golden-trace tests (test_golden_traces.py) run on the
    # chip:  TOMOJAX_TEST_TPU=1 pytest tests/test_golden_traces.py
    import jax  # noqa: F401
else:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )

    import jax

    jax.config.update("jax_platforms", "cpu")
