"""On-device vector index: corpus embeddings live in HBM, queries return
only top-k (index, score) pairs.

The reference's retrieval story is examples/sample_client.py:40-69 — it
pulls EVERY corpus embedding over the socket and ranks on the client with
numpy.  Here ranking happens where the vectors already are: the similarity
matmul ([Q, E] x [E, N] — MXU work) and `lax.top_k` run on device, and only
k ids + scores per query cross the device->host link.  On thin host links
(~30 MB/s relay) that is the difference between fetching 4 bytes x E x N
and fetching 8 x k bytes.

Embeddings are L2-normalized (engine output), so dot product == cosine.
"""
from __future__ import annotations

import threading
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

_CAPACITY_STEP = 4096  # corpus padded to multiples of this: stable jit shapes
_QUERY_BUCKETS = (8, 64, 512)


@partial(jax.jit, static_argnums=(3,))
def _search_kernel(corpus, qvecs, n_real, k):
    """corpus [N, E] (padded), qvecs [Qb, E] -> (scores [Qb, k], idx [Qb, k]).
    Padded corpus rows are masked to -inf before top_k."""
    scores = jnp.matmul(
        qvecs, corpus.T, preferred_element_type=jnp.float32
    )
    valid = jnp.arange(corpus.shape[0]) < n_real
    scores = jnp.where(valid[None, :], scores, -jnp.inf)
    return jax.lax.top_k(scores, k)


class VectorIndex:
    """Brute-force exact top-k over engine embeddings, resident in HBM.

    `dtype="bfloat16"` halves HBM residency and doubles matmul throughput;
    scores still accumulate in f32 (cosine shifts ~1e-3, ranking-stable for
    retrieval).  Exact search is the right baseline at encoder scale: 1M
    vectors x 384 dims is one [Q, 384] x [384, 1M] matmul — microseconds of
    MXU time per query batch.
    """

    def __init__(self, engine, dtype: str = "bfloat16"):
        self.engine = engine
        self.dtype = jnp.dtype(dtype)
        self._corpus = None  # [capacity, n_embd] device array
        self._n = 0
        self._lock = threading.Lock()

    def __len__(self) -> int:
        return self._n

    # --- building -----------------------------------------------------------
    def add(self, texts: Sequence[str]) -> int:
        """Embed and append texts; returns the total indexed count."""
        vecs = self.engine.encode(list(texts))
        return self.add_vectors(vecs)

    def add_vectors(self, vecs: np.ndarray) -> int:
        """Append precomputed (normalized) vectors [n, n_embd]."""
        vecs = np.asarray(vecs, dtype=np.float32)
        if vecs.ndim != 2 or vecs.shape[1] != self.engine.n_embd:
            raise ValueError(
                f"expected [n, {self.engine.n_embd}] vectors, got {vecs.shape}"
            )
        with self._lock:
            need = self._n + len(vecs)
            cap = 0 if self._corpus is None else self._corpus.shape[0]
            if need > cap:
                new_cap = -(-need // _CAPACITY_STEP) * _CAPACITY_STEP
                grown = jnp.zeros(
                    (new_cap, self.engine.n_embd), dtype=self.dtype
                )
                if self._corpus is not None:
                    grown = jax.lax.dynamic_update_slice(
                        grown, self._corpus, (0, 0)
                    )
                self._corpus = grown
            self._corpus = jax.lax.dynamic_update_slice(
                self._corpus, jnp.asarray(vecs, dtype=self.dtype), (self._n, 0)
            )
            self._n = need
            return self._n

    # --- persistence ----------------------------------------------------------
    def save(self, path: str) -> None:
        """Persist the indexed vectors (.npz).  GGUF is the model checkpoint
        format; the index is derived state, stored separately."""
        with self._lock:
            vecs = (
                np.zeros((0, self.engine.n_embd), np.float32)
                if self._n == 0
                else np.asarray(self._corpus[: self._n], dtype=np.float32)
            )
        np.savez_compressed(path, vectors=vecs)

    def load(self, path: str) -> int:
        """Append vectors previously saved with save(); returns the total."""
        with np.load(path) as data:
            return self.add_vectors(data["vectors"])

    # --- querying ------------------------------------------------------------
    def search(self, queries: Sequence[str], k: int = 10):
        """Texts -> (indices [n, k] int32, scores [n, k] f32)."""
        qvecs = self.engine.encode(list(queries))
        return self.search_vectors(qvecs, k)

    def search_vectors(self, qvecs: np.ndarray, k: int = 10):
        with self._lock:
            if self._n == 0:
                raise ValueError("index is empty")
            k = min(k, self._n)
            q = np.asarray(qvecs, dtype=np.float32)
            nq = q.shape[0]
            # pad the query batch to a bucket (stable compiled shapes)
            qb = next((b for b in _QUERY_BUCKETS if nq <= b), None)
            if qb is None:
                qb = -(-nq // _QUERY_BUCKETS[-1]) * _QUERY_BUCKETS[-1]
            if qb != nq:
                q = np.concatenate(
                    [q, np.zeros((qb - nq, q.shape[1]), np.float32)]
                )
            scores, idx = _search_kernel(
                self._corpus, jnp.asarray(q, dtype=self.dtype), self._n, k
            )
            # only [nq, k] ids + scores cross the link
            return (
                np.asarray(idx)[:nq].astype(np.int32),
                np.asarray(scores)[:nq].astype(np.float32),
            )
