"""Length-bucketed batch assembly.

Replaces the reference's sort-by-length + fixed chunking front-end
(bert_encode_batch, bert.cpp:1163-1196 — which then still evaluated one
sentence per graph): sentences are grouped into a small set of static
(batch, seq) shapes so every shape hits a cached XLA executable, padded rows
are masked, and results are scattered back to input order.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import numpy as np

DEFAULT_SEQ_BUCKETS = (16, 32, 64, 128, 256, 512)
# Large top bucket: one device dispatch per shape class dominates throughput
# (dispatch latency amortizes over rows; occupancy is tracked in metrics).
DEFAULT_BATCH_BUCKETS = (1, 8, 64, 512, 2048)


def bucket_for(value: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if value <= b:
            return b
    return buckets[-1]


@dataclass
class PackedBatch:
    ids: np.ndarray  # [B, S] int32, padded with pad_id
    mask: np.ndarray  # [B, S] int32, 1 = valid
    positions: list[int]  # original index of each row (len = n_real rows)


def pack_batches(
    token_lists: Sequence[Sequence[int]],
    pad_id: int,
    *,
    seq_buckets: Sequence[int] = DEFAULT_SEQ_BUCKETS,
    batch_buckets: Sequence[int] = DEFAULT_BATCH_BUCKETS,
    max_batch: int | None = None,
    max_seq: int | None = None,
) -> list[PackedBatch]:
    """Group tokenized sentences into padded static-shape batches."""
    if max_seq is not None:
        seq_buckets = [b for b in seq_buckets if b <= max_seq] or [max_seq]
    if max_batch is not None:
        batch_buckets = [b for b in batch_buckets if b <= max_batch] or [max_batch]

    by_bucket: dict[int, list[int]] = {}
    for idx, toks in enumerate(token_lists):
        s = bucket_for(len(toks), seq_buckets)
        by_bucket.setdefault(s, []).append(idx)

    batches: list[PackedBatch] = []
    cap = batch_buckets[-1]
    for s, indices in sorted(by_bucket.items()):
        for start in range(0, len(indices), cap):
            chunk = indices[start : start + cap]
            b = bucket_for(len(chunk), batch_buckets)
            ids = np.full((b, s), pad_id, dtype=np.int32)
            mask = np.zeros((b, s), dtype=np.int32)
            for row, idx in enumerate(chunk):
                toks = list(token_lists[idx])[:s]
                ids[row, : len(toks)] = toks
                mask[row, : len(toks)] = 1
            batches.append(PackedBatch(ids=ids, mask=mask, positions=chunk))
    return batches
