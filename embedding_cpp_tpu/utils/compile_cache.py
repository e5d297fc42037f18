"""Persistent XLA compilation cache.

The reference pays no compile cost (ggml interprets its graph); this engine
pays XLA compilation per (batch, seq) bucket shape, and on remote-compile
TPU attachments (e.g. the axon relay) a cold compile is 20-60 s per shape.
JAX's persistent cache writes each compiled executable to disk keyed by the
HLO fingerprint, so every process after the first — server restarts, CLI
runs, eval harnesses — skips straight to execution.

Enabled by Engine construction on real local TPU backends; elsewhere it is
opt-in via TPUEMBED_COMPILE_CACHE=<dir> (and TPUEMBED_COMPILE_CACHE=0 opts
out everywhere).  Why the narrow default: CPU AOT cache entries embed exact
machine-feature lists and reload with SIGILL-risk warnings on even slightly
different hosts, and the axon RELAY compiles on the remote server — its
executables don't serialize through the local cache (second-process cold
start measured unchanged), only the relay's own in-process cache applies.
"""
from __future__ import annotations

import os

_DEFAULT_DIR = "~/.cache/embedding_cpp_tpu/xla"
_enabled = False


def enable(cache_dir: str | None = None) -> str | None:
    """Idempotently enable the persistent compilation cache.

    Returns the cache directory in effect, or None when disabled (env
    TPUEMBED_COMPILE_CACHE=0) or when jax already has a different cache dir
    configured (never overrides an explicit user setting).
    """
    global _enabled
    import jax

    env = os.environ.get("TPUEMBED_COMPILE_CACHE", "")
    if env == "0":
        return None
    existing = jax.config.jax_compilation_cache_dir
    if _enabled or existing:
        return existing
    if not env and not cache_dir:
        # default-on only for real local TPU backends.  CPU's AOT cache
        # entries embed exact machine-feature lists and reload with
        # SIGILL-risk warnings on even slightly different hosts; axon-relay
        # compiles happen server-side and never hit this cache.  Explicit
        # TPUEMBED_COMPILE_CACHE=<dir> still enables anywhere.
        try:
            if jax.devices()[0].platform != "tpu":
                return None
        except Exception:
            return None
    path = os.path.expanduser(cache_dir or env or _DEFAULT_DIR)
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # bucket-shape forwards are exactly the executables worth keeping;
        # the 1s default would skip small-model/CPU compiles that tests rely
        # on for cache-hit assertions
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        return None  # unwritable cache dir must never block the engine
    _enabled = True
    return path
