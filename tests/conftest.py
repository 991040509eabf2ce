"""Test configuration.

Tests run on CPU with 8 virtual devices (multi-chip sharding paths validated
without TPU hardware — SURVEY.md §4 note on forced host-platform device count)
and float64 enabled for the reference's high-accuracy tolerances (the C core
is float64; test/basic.jl uses eps 1e-9).

The host environment pins JAX_PLATFORMS to the TPU plugin, and jax may already
be imported by a pytest plugin before this file runs — so the override uses
jax.config.update (effective until first backend initialization), not env vars.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    pass  # older jax: XLA_FLAGS above covers it
jax.config.update("jax_enable_x64", True)

assert not jax.config.jax_platforms or "cpu" in jax.config.jax_platforms
