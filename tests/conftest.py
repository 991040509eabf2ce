"""Test configuration.

Tests run on CPU with 8 virtual devices (multi-chip sharding paths validated
without TPU hardware — SURVEY.md §4 note on forced host-platform device count)
and float64 enabled for the reference's high-accuracy tolerances (the C core
is float64; test/basic.jl uses eps 1e-9).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
