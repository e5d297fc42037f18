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


import contextlib  # noqa: E402


@contextlib.contextmanager
def serve_in_thread(engine, **serve_kw):
    """Run runtime.server.serve on a background event-loop thread; yields
    the TCP port once it accepts connections.  The shared harness for
    wire-protocol tests (test_server / test_capi / test_sparse grew three
    hand-rolled copies of this dance)."""
    import asyncio
    import socket
    import threading
    import time

    from embedding_cpp_tpu.runtime.server import serve

    sock = socket.socket()
    sock.bind(("127.0.0.1", 0))
    port = sock.getsockname()[1]
    sock.close()
    loop = asyncio.new_event_loop()
    holder = {}

    def thread_main():
        asyncio.set_event_loop(loop)
        holder["task"] = loop.create_task(
            serve(engine, "127.0.0.1", port, **serve_kw)
        )
        try:
            loop.run_until_complete(holder["task"])
        except asyncio.CancelledError:
            pass
        finally:
            loop.close()

    t = threading.Thread(target=thread_main, daemon=True)
    t.start()
    wait_port = serve_kw.get("http_port") or port
    for _ in range(100):
        try:
            s = socket.create_connection(("127.0.0.1", wait_port), 0.2)
            s.close()
            break
        except OSError:
            time.sleep(0.05)
    try:
        yield port
    finally:
        loop.call_soon_threadsafe(holder["task"].cancel)
        t.join(timeout=5)
