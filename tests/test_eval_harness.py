"""Evaluation-harness smoke tests on a tiny synthetic setup."""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "benchmarks"))
import tasks  # noqa: E402


def _bag_of_words_encoder(texts):
    """Deterministic toy encoder: hashed bag-of-words."""
    out = np.zeros((len(texts), 64), np.float32)
    for i, t in enumerate(texts):
        for w in t.split():
            out[i, hash(w) % 64] += 1.0
    return out


def test_synthetic_sts_correlates():
    data = tasks.synthetic_sts(n=256, seed=0)
    res = tasks.eval_sts(_bag_of_words_encoder, data)
    assert res["test"]["cos_sim"]["spearman"] > 0.5
    assert res["mteb_dataset_name"] == "STSBenchmark"


def test_synthetic_classification_separable():
    data = tasks.synthetic_classification(seed=0)
    res = tasks.eval_classification(_bag_of_words_encoder, data)
    assert res["test"]["accuracy"] > 0.5  # distinct vocab per class
    assert res["test"]["main_score"] == res["test"]["accuracy"]


def test_sts_local_roundtrip(tmp_path):
    import json

    rows = [
        {"sentence1": "a b", "sentence2": "a b", "score": 5.0},
        {"sentence1": "a b", "sentence2": "c d", "score": 0.0},
    ]
    p = tmp_path / "sts.json"
    p.write_text(json.dumps(rows))
    data = tasks.load_sts_local(p)
    assert data.scores == [5.0, 0.0]
    res = tasks.eval_sts(_bag_of_words_encoder, data)
    assert res["test"]["cos_sim"]["spearman"] > 0.99
