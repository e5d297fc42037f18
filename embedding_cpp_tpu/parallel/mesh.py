"""Device mesh construction.

The scaling model (SURVEY.md §2.4): per-host batch streams are data-parallel
("dp" axis — embarrassingly parallel, no collectives on the data plane), and
weights can optionally be tensor-sharded over "tp" (Megatron-style column/row
splits; GSPMD inserts the all-reduce after row-parallel matmuls over ICI).
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh

DP_AXIS = "dp"
TP_AXIS = "tp"


def make_mesh(
    dp: int | None = None, tp: int = 1, devices=None
) -> Mesh:
    """Build a (dp, tp) mesh.  dp defaults to n_devices // tp."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if dp is None:
        if n % tp:
            raise ValueError(f"{n} devices not divisible by tp={tp}")
        dp = n // tp
    if dp < 1 or tp < 1:
        raise ValueError(f"mesh sizes must be >= 1, got dp={dp} tp={tp}")
    if dp * tp > n:
        raise ValueError(f"mesh {dp}x{tp} needs {dp*tp} devices, have {n}")
    arr = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(arr, (DP_AXIS, TP_AXIS))


def single_device_mesh() -> Mesh:
    return make_mesh(dp=1, tp=1)
