"""Metrics, logging, and server stats/health endpoints."""
import json
import logging

import numpy as np
import pytest

from embedding_cpp_tpu.utils.metrics import Metrics
from embedding_cpp_tpu.utils.profiling import (
    Roofline,
    attention_roofline,
    q4_matmul_roofline,
    report,
)


def test_metrics_counters_and_timers():
    m = Metrics()
    m.inc("sentences", 10)
    m.inc("tokens", 100)
    m.inc("padded_slots", 200)
    with m.timer("eval"):
        pass
    snap = m.snapshot()
    assert snap["counters"]["sentences"] == 10
    assert snap["batch_occupancy"] == 0.5
    assert "sentences_per_sec" in snap
    m.reset()
    assert m.snapshot()["counters"] == {}


def test_json_logging(capsys):
    import embedding_cpp_tpu.utils.logging as L

    logger = logging.getLogger("tpuembed.test")
    handler_root = logging.getLogger("tpuembed")
    handler_root.handlers.clear()
    import os

    os.environ["TPUEMBED_LOG_JSON"] = "1"
    try:
        logger2 = L.get_logger("test")
        L.log_event(logger2, "batch done", sentences=4, tokens=37)
    finally:
        os.environ.pop("TPUEMBED_LOG_JSON")
        handler_root.handlers.clear()
    err = capsys.readouterr().err.strip()
    entry = json.loads(err.splitlines()[-1])
    assert entry["msg"] == "batch done"
    assert entry["sentences"] == 4


def test_roofline_math():
    r = q4_matmul_roofline(4096, 384, 1536)
    assert r.flops == 2 * 4096 * 384 * 1536
    # 4.5 bits/weight
    assert abs(r.bytes - (4096 * 384 * 2 + 4096 * 1536 * 2 + 384 * 1536 * 9 / 16)) < 1
    assert r.time_bound_s() > 0
    a = attention_roofline(32, 512, 12, 32)
    assert a.intensity() > 100  # attention at S=512 is compute-bound
    assert "speed-of-light" in report("x", 1e-3, Roofline(1e9, 1e6))


def test_engine_publishes_metrics():
    pytest.importorskip("tokenizers")
    from embedding_cpp_tpu.models import BertConfig, ComputeOptions
    from embedding_cpp_tpu.runtime.engine import Engine
    from embedding_cpp_tpu.utils.metrics import GLOBAL

    GLOBAL.reset()
    cfg = BertConfig(n_vocab=1000, n_ctx=64, n_embd=64, n_layer=1, n_head=4, n_ff=128)
    eng = Engine.synthetic(cfg, opts=ComputeOptions(dtype="float32"))
    eng.encode(["hello world", "test sentence"])
    snap = GLOBAL.snapshot()
    assert snap["counters"]["sentences"] == 2
    assert 0 < snap["batch_occupancy"] <= 1.0
    assert snap["sentences_per_sec"] > 0
