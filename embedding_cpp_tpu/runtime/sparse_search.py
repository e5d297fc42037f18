"""Sparse (SPLADE) retrieval: a host-side CSR index over the
(term-id, weight) vectors Engine.encode_sparse produces.

Design: sparse dot products are memory-bound gather/scatter over ~100-300
active terms per document — the opposite of the MXU-shaped dense problem
(runtime/search.py keeps THAT corpus on device).  Densifying a 30k-vocab
corpus to feed the MXU would cost ~120 KB/doc against ~2 KB/doc CSR, a 60x
HBM and PCIe/relay inflation for matmuls that are >99% zeros — so scoring
runs on the host: one O(nnz_corpus) pass per query batch
(values * q_dense[indices], np.bincount-reduced per doc; reduceat is
avoided because it silently mis-reduces empty segments).  Scores are exact
dot products, the standard SPLADE relevance.

The reference has no retrieval surface at all (bert.h:41-92 is embeddings
only); this mirrors the dense VectorIndex contract (k results per query,
id -1 + -inf padding past the corpus size, .npz persistence).
"""
from __future__ import annotations

import threading
from typing import Sequence

import numpy as np


def rrf_fuse(rankings: Sequence[np.ndarray], k: int, c: float = 60.0):
    """Reciprocal-rank fusion (Cormack et al. 2009) of per-query rankings:
    fused_score(d) = sum over rankings of 1 / (c + rank_d), rank 1-based,
    absent docs contribute 0.  `rankings` are [Q, k_i] int id arrays with
    -1 marking empty slots (the search padding contract) — the standard
    way to combine dense-cosine and sparse-SPLADE retrieval without score
    calibration.  Returns (ids [Q, k] int32, scores [Q, k] f32), -1 / 0.0
    past the fused candidate count."""
    if not rankings:
        raise ValueError("no rankings to fuse")
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    q = rankings[0].shape[0]
    if any(r.shape[0] != q for r in rankings):
        raise ValueError("rankings disagree on query count")
    out_i = np.full((q, k), -1, np.int32)
    out_s = np.zeros((q, k), np.float32)
    for qi in range(q):
        scores: dict[int, float] = {}
        for r in rankings:
            for rank, doc in enumerate(r[qi], start=1):
                if doc >= 0:
                    scores[int(doc)] = scores.get(int(doc), 0.0) + 1.0 / (
                        c + rank
                    )
        top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        for j, (doc, sc) in enumerate(top):
            out_i[qi, j] = doc
            out_s[qi, j] = sc
    return out_i, out_s


class SparseIndex:
    """Append-only sparse corpus + exact dot-product top-k search.

    Thread-safe for concurrent add/search (one lock; the batcher calls
    from executor threads).  Single-host: the corpus lives in host memory
    (multi-host serving replicates requests, which would duplicate adds
    — construct it only on a single-process runtime)."""

    def __init__(self, engine=None, *, k_encode: int = 256):
        self.engine = engine
        if engine is not None and not engine.config.mlm_head:
            raise ValueError(
                "model has no MLM head (not a SPLADE checkpoint)"
            )
        self.k_encode = int(k_encode)
        self.n_vocab = int(engine.config.n_vocab) if engine is not None else 0
        self._lock = threading.Lock()
        self._indices: list[np.ndarray] = []  # per-doc int32 term ids
        self._values: list[np.ndarray] = []  # per-doc f32 weights
        # flattened scoring arrays, rebuilt lazily on first search after add
        self._flat: tuple[np.ndarray, np.ndarray, np.ndarray] | None = None

    def __len__(self) -> int:
        return len(self._indices)

    # --- building -----------------------------------------------------------

    def add(self, texts: Sequence[str]) -> int:
        """Encode + append documents; returns the new corpus size."""
        if self.engine is None:
            raise RuntimeError("index was loaded without an engine")
        pairs = self.engine.encode_sparse(texts, k=self.k_encode)
        return self.add_vectors(pairs)

    def add_vectors(
        self, pairs: Sequence[tuple[np.ndarray, np.ndarray]]
    ) -> int:
        """Append pre-encoded (term ids, weights) pairs."""
        with self._lock:
            for idx, val in pairs:
                idx = np.ascontiguousarray(idx, np.int32)
                val = np.ascontiguousarray(val, np.float32)
                if idx.shape != val.shape or idx.ndim != 1:
                    raise ValueError(
                        f"sparse vector must be two aligned 1-D arrays, got "
                        f"{idx.shape} / {val.shape}"
                    )
                if idx.size and int(idx.min()) < 0:
                    # -1 is the wire/C-ABI PAD marker, not a term — storing
                    # it would alias qd[-1] onto the last vocab term and
                    # silently corrupt scores; callers must trim pad slots
                    raise ValueError(
                        "negative term id in sparse vector (trim the "
                        "-1 pad slots before add_vectors)"
                    )
                if idx.size:
                    self.n_vocab = max(self.n_vocab, int(idx.max()) + 1)
                self._indices.append(idx)
                self._values.append(val)
            self._flat = None
            return len(self._indices)

    def _flattened(self):
        """(indices, values, doc_ids) concatenated over the corpus."""
        if self._flat is None:
            if not self._indices:
                raise RuntimeError("empty index")
            counts = np.array([len(i) for i in self._indices], np.int64)
            self._flat = (
                np.concatenate(self._indices) if counts.sum() else
                np.zeros(0, np.int32),
                np.concatenate(self._values) if counts.sum() else
                np.zeros(0, np.float32),
                np.repeat(
                    np.arange(len(self._indices), dtype=np.int64), counts
                ),
            )
        return self._flat

    # --- search ---------------------------------------------------------------

    def search(self, texts: Sequence[str], k: int = 10):
        """Encode queries + search: -> (ids [Q, k] int32, scores [Q, k]
        f32), rows sorted by descending score, id -1 / -inf past the
        corpus (the dense VectorIndex padding contract)."""
        if self.engine is None:
            raise RuntimeError("index was loaded without an engine")
        pairs = self.engine.encode_sparse(texts, k=self.k_encode)
        return self.search_vectors(pairs, k)

    def search_vectors(
        self, pairs: Sequence[tuple[np.ndarray, np.ndarray]], k: int = 10
    ):
        if k <= 0:
            raise ValueError(f"k must be positive, got {k}")
        with self._lock:
            n = len(self._indices)
            if n == 0:
                raise RuntimeError("empty index")
            flat_idx, flat_val, doc_ids = self._flattened()
            # snapshot under the lock: a concurrent add_vectors may grow
            # n_vocab past the scratch buffer allocated below
            n_vocab = self.n_vocab
        q = len(pairs)
        out_i = np.full((q, k), -1, np.int32)
        out_s = np.full((q, k), -np.inf, np.float32)
        kk = min(k, n)
        qd = np.zeros(n_vocab, np.float32)
        for qi, (idx, val) in enumerate(pairs):
            idx = np.asarray(idx, np.int64)
            val = np.asarray(val, np.float32)
            # drop query terms outside [0, n_vocab): ids past the corpus
            # vocab can't match any document (engine-less indexes size
            # n_vocab from the corpus alone), and negative ids are wire
            # pad slots (-1), not terms — neither may touch qd
            keep = (idx >= 0) & (idx < n_vocab)
            idx, val = idx[keep], val[keep]
            qd[idx] = val
            per_nnz = flat_val * qd[flat_idx]
            scores = np.bincount(
                doc_ids, weights=per_nnz, minlength=n
            ).astype(np.float32)
            qd[idx] = 0.0  # reset the scratch buffer
            top = np.argpartition(-scores, kk - 1)[:kk]
            top = top[np.argsort(-scores[top], kind="stable")]
            out_i[qi, :kk] = top
            out_s[qi, :kk] = scores[top]
        return out_i, out_s

    # --- persistence ------------------------------------------------------------

    def save(self, path: str) -> None:
        """Persist the corpus as one compressed .npz (CSR triple)."""
        with self._lock:
            counts = np.array([len(i) for i in self._indices], np.int64)
            indptr = np.zeros(len(counts) + 1, np.int64)
            np.cumsum(counts, out=indptr[1:])
            np.savez_compressed(
                path,
                indices=(np.concatenate(self._indices) if counts.sum()
                         else np.zeros(0, np.int32)),
                values=(np.concatenate(self._values) if counts.sum()
                        else np.zeros(0, np.float32)),
                indptr=indptr,
                n_vocab=np.int64(self.n_vocab),
            )

    def load(self, path: str) -> int:
        """Append documents previously saved with save(); returns the new
        corpus size."""
        with np.load(path) as data:
            indices = np.asarray(data["indices"], np.int32)
            values = np.asarray(data["values"], np.float32)
            indptr = np.asarray(data["indptr"], np.int64)
            n_vocab = int(data["n_vocab"])
        pairs = [
            (indices[a:b], values[a:b])
            for a, b in zip(indptr[:-1], indptr[1:])
        ]
        total = self.add_vectors(pairs)
        with self._lock:
            self.n_vocab = max(self.n_vocab, n_vocab)
        return total
