"""Profiling helpers: jax.profiler traces + roofline arithmetic.

Replaces the reference's compile-time GGML_PERF per-op dumps
(CMakeLists.txt:25, bert.cpp:1090-1094) with on-demand XLA/TPU traces
viewable in TensorBoard/Perfetto, plus simple roofline estimators for the
kernels we own.
"""
from __future__ import annotations

from contextlib import contextmanager
from dataclasses import dataclass


@contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (TensorBoard 'profile' plugin format)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


# v5e per-chip peaks (public figures)
V5E_BF16_FLOPS = 197e12
V5E_HBM_BW = 819e9


@dataclass
class Roofline:
    flops: float
    bytes: float

    def time_bound_s(self, peak_flops: float = V5E_BF16_FLOPS,
                     peak_bw: float = V5E_HBM_BW) -> float:
        return max(self.flops / peak_flops, self.bytes / peak_bw)

    def intensity(self) -> float:
        return self.flops / max(self.bytes, 1.0)


def q4_matmul_roofline(m: int, k: int, n: int, act_bytes: int = 2) -> Roofline:
    """Fused Q4 matmul: activations in/out + 4.5-bit weights."""
    return Roofline(
        flops=2.0 * m * k * n,
        bytes=m * k * act_bytes + m * n * act_bytes + k * n * 9 / 16,
    )


def attention_roofline(b: int, s: int, h: int, d: int, act_bytes: int = 2) -> Roofline:
    """Fused attention: q/k/v in + out; scores stay in VMEM."""
    return Roofline(
        flops=4.0 * b * h * s * s * d,
        bytes=4.0 * b * s * h * d * act_bytes,
    )


def report(name: str, measured_s: float, roof: Roofline) -> str:
    bound = roof.time_bound_s()
    return (
        f"{name}: measured {measured_s*1e6:.1f}us, roofline {bound*1e6:.1f}us "
        f"({bound/measured_s*100:.0f}% of speed-of-light, "
        f"intensity {roof.intensity():.1f} flop/B)"
    )
