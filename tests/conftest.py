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

#: Set TPUQP_TEST_PLATFORM=tpu (or axon) to run the suite on the real chip —
#: the float64 hardware-conformance configuration. Default: 8-device CPU.
_platform = os.environ.get("TPUQP_TEST_PLATFORM", "cpu")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if _platform == "cpu":
    # NOTE: the env var JAX_PLATFORMS is overridden by the TPU plugin on this
    # host; jax.config.update is the only reliable override.
    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_num_cpu_devices", 8)
    except Exception:
        pass  # older jax: XLA_FLAGS above covers it
    assert not jax.config.jax_platforms or "cpu" in jax.config.jax_platforms
jax.config.update("jax_enable_x64", True)


import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """XLA's CPU compiler segfaults/aborts nondeterministically deep into
    the full suite (reproducibly at ~the 160th test, inside
    backend_compile_and_load, only when enough prior modules' executables
    accumulate — every subset of modules passes). Bounding the live
    compile state between modules sidesteps the crash at the cost of some
    recompilation."""
    yield
    import jax
    jax.clear_caches()
