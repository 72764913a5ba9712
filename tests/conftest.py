"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding paths can be
exercised without TPU hardware (the reference's analogue of running the same
SPMD program on simulated devices; see SURVEY.md §4).

The image's sitecustomize imports jax and exports JAX_PLATFORMS=axon (a TPU
tunnel) before any user code runs, so env vars alone are latched too late —
``jax.config.update`` is required, plus XLA_FLAGS before backend init.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
