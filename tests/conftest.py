"""Test configuration.

Tests default to the CPU backend with 8 virtual devices so multi-chip sharding
paths (mesh/pjit) can be exercised without TPU hardware.  These env vars must
be set before jax initializes; if jax was already imported with a different
platform (e.g. a site hook that registers a TPU backend), tests still run —
mesh tests then skip themselves when fewer than 8 devices are available.
"""
import os
import sys

if "jax" not in sys.modules:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    import jax

    if jax.device_count() < 8:
        pytest.skip("needs 8 devices (run with JAX_PLATFORMS=cpu "
                    "XLA_FLAGS=--xla_force_host_platform_device_count=8)")
    return jax.devices()[:8]


def tpu_atol(cpu_atol: float, tpu_atol_val: float = 2e-3) -> float:
    """Platform-aware tolerance: Mosaic dots and XLA einsums round f32 MXU
    multiplies differently on real TPUs (measured <= ~1.1e-3 per attention
    output; CLAUDE.md measured facts); CPU/interpret matches exactly."""
    import jax

    return cpu_atol if jax.devices()[0].platform != "tpu" else tpu_atol_val
