"""On-device late-interaction (MaxSim) retrieval index.

`Engine.maxsim` re-encodes every document per query — the right shape for
reranking a handful of candidates, the wrong one for retrieval.  This index
keeps the corpus TOKEN states resident in HBM (dp-shardable over a mesh,
like the dense `VectorIndex`) and scores whole query batches in one
dispatch:

    score(q, d) = sum over real query tokens of
                  max over real doc tokens of cosine(q_i, d_j)

(the MaxSim operator of ColBERT, Khattab & Zaharia 2020).  Per-token vectors
are L2-normalized at ingest, so the [Sq, Sd] token-similarity tile is pure
MXU work; the reduction runs blocked over the corpus inside one jit — the
[Q*Sq, N*Sd]-class similarity tensor never materializes, only a [Q, N]
score matrix and the final top-k do.  Only k ids + scores per query cross
the device->host link (one packed fetch, runtime/search.py helpers).

Layout: documents are padded/truncated to a fixed `doc_maxlen` token budget
([N, Sd, E] bf16 + [N, Sd] validity mask) — zero-waste CSR-style layouts
beat this on HBM bytes but lose the dense MXU contraction; fixed doc tiles
are the standard ColBERT serving layout.  The reference has no retrieval
surface at all (bert.h:41-92 is embeddings only).
"""
from __future__ import annotations

import threading
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .search import (
    MAX_INDEX_ROWS,
    _pack_result,
    _select_topk,
    _unpack_result,
)

_CAPACITY_STEP = 1024  # corpus padded to multiples of this: stable jit shapes
_QUERY_BUCKETS = (4, 16, 64)
# per-step [Qb, Sq, NB, Sd] f32 similarity-tile budget (bytes); the scan
# block NB derives from it so one step's tile stays far below HBM pressure
_SIM_TILE_BUDGET = 256 << 20


def _doc_block(qb: int, sq: int, sd: int, cap: int) -> int:
    """Largest power-of-two doc-block divisor of `cap` whose f32 sim tile
    fits the budget (>= 1)."""
    nb = max(1, _SIM_TILE_BUDGET // max(1, qb * sq * sd * 4))
    nb = 1 << (nb.bit_length() - 1)
    while cap % nb:
        nb //= 2
    return max(nb, 1)


def _block_scores(c_blk, m_blk, qn, qm):
    """One corpus block: tokens [NB, Sd, E] + mask [NB, Sd] against
    normalized query tokens [Qb, Sq, E] + mask [Qb, Sq] -> [Qb, NB] f32.
    All-padding doc rows come out -inf (sorted last, sanitized to id -1)."""
    sim = jnp.einsum(
        "qte,nse->qtns", qn, c_blk, preferred_element_type=jnp.float32
    )  # [Qb, Sq, NB, Sd]
    sim = jnp.where(m_blk[None, None], sim, -jnp.inf)
    best = jnp.max(sim, axis=-1)  # [Qb, Sq, NB]
    best = jnp.where(qm[:, :, None] > 0, best, 0.0)
    return jnp.sum(best, axis=1)  # [Qb, NB]


@partial(jax.jit, static_argnums=(5, 6))
def _maxsim_search_kernel(corpus, cmask, q_states, q_mask, n_real, k, nb):
    """corpus [N, Sd, E] + cmask [N, Sd] bool; q_states [Qb, Sq, E] f32;
    q_mask [Qb, Sq] -> packed f32 [Qb, 2k] (scores | bitcast idx)."""
    n = corpus.shape[0]
    qb = q_states.shape[0]
    qn = _unit(q_states)

    def body(i, scores):
        c_blk = jax.lax.dynamic_slice_in_dim(corpus, i * nb, nb, axis=0)
        m_blk = jax.lax.dynamic_slice_in_dim(cmask, i * nb, nb, axis=0)
        s = _block_scores(c_blk.astype(qn.dtype), m_blk, qn, q_mask)
        return jax.lax.dynamic_update_slice(scores, s, (0, i * nb))

    scores = jax.lax.fori_loop(
        0, n // nb, body, jnp.zeros((qb, n), jnp.float32)
    )
    valid = jnp.arange(n) < n_real
    scores = jnp.where(valid[None, :], scores, -jnp.inf)
    s, i = _select_topk(scores, k, exact=True)
    i = jnp.where(jnp.isfinite(s), i, -1)
    return _pack_result(s, i)


def _unit(x):
    xf = x.astype(jnp.float32)
    n = jnp.sqrt(jnp.sum(jnp.square(xf), axis=-1, keepdims=True))
    return xf / jnp.maximum(n, 1e-12)


@partial(jax.jit, static_argnums=(5,))
def _commit_kernel(corpus, cmask, states, mask, base, sd):
    """Scatter one forward chunk's token states [B, S, E] (+ validity mask)
    into the corpus at rows [base, base+B): L2-normalize per token, pad or
    truncate S -> Sd, zero masked slots.  `base` is a traced scalar, so
    successive chunks reuse one executable per (chunk shape, Sd)."""
    b, s, e = states.shape
    sn = _unit(states) * (mask[..., None] > 0)
    if s < sd:
        sn = jnp.pad(sn, ((0, 0), (0, sd - s), (0, 0)))
        m = jnp.pad(mask > 0, ((0, 0), (0, sd - s)))
    else:
        sn = sn[:, :sd]
        m = mask[:, :sd] > 0
    corpus = jax.lax.dynamic_update_slice(
        corpus, sn.astype(corpus.dtype), (base, 0, 0)
    )
    cmask = jax.lax.dynamic_update_slice(cmask, m, (base, 0))
    return corpus, cmask


def _make_sharded_maxsim(mesh):
    """Distributed MaxSim top-k over a dp-sharded corpus: each shard scores
    its local rows (blocked scan, local top-k), the k*dp candidates
    concatenate over dp, and a tiny final top_k merges them — the
    runtime/search.py _make_sharded_search pattern over token states."""
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import DP_AXIS

    @partial(jax.jit, static_argnums=(5, 6))
    def search(corpus, cmask, q_states, q_mask, n_real, k, nb):
        qn = _unit(q_states)

        def body_shard(c_local, m_local, q, qm):
            n_local = c_local.shape[0]
            base = jax.lax.axis_index(DP_AXIS) * n_local

            def body(i, scores):
                c_blk = jax.lax.dynamic_slice_in_dim(
                    c_local, i * nb, nb, axis=0
                )
                m_blk = jax.lax.dynamic_slice_in_dim(
                    m_local, i * nb, nb, axis=0
                )
                s = _block_scores(c_blk.astype(q.dtype), m_blk, q, qm)
                return jax.lax.dynamic_update_slice(scores, s, (0, i * nb))

            scores = jax.lax.fori_loop(
                0, n_local // nb, body,
                jnp.zeros((q.shape[0], n_local), jnp.float32),
            )
            valid = (jnp.arange(n_local) + base) < n_real
            scores = jnp.where(valid[None, :], scores, -jnp.inf)
            s, i = _select_topk(scores, k, exact=True)
            return s, (i + base).astype(jnp.int32)

        s, i = jax.shard_map(
            body_shard,
            mesh=mesh,
            in_specs=(P(DP_AXIS, None, None), P(DP_AXIS, None), P(), P()),
            out_specs=(P(None, DP_AXIS), P(None, DP_AXIS)),
            check_vma=False,
        )(corpus, cmask, qn, q_mask)
        sf, pos = jax.lax.top_k(s, k)
        idxf = jnp.take_along_axis(i, pos, axis=1)
        idxf = jnp.where(jnp.isfinite(sf), idxf, -1)
        return _pack_result(sf, idxf)

    return search


class MaxSimIndex:
    """Token-level late-interaction corpus + batched MaxSim top-k search.

    doc_maxlen: per-document token budget Sd (documents truncate to it —
    the standard ColBERT doc_maxlen contract; default 256 covers the
    published 180/220 settings).  dtype="bfloat16" halves HBM residency;
    similarities accumulate in f32.  `mesh` dp-shards the corpus rows.

    Thread-safe like VectorIndex (one lock; the server drives adds and
    searches from executor threads).  Single-process or single-controller
    mesh; multi-host serving raises at construction (the followers would
    each re-add every replicated request).
    """

    def __init__(self, engine, *, doc_maxlen: int = 256,
                 dtype: str = "bfloat16", mesh=None):
        if jax.process_count() > 1:
            raise RuntimeError("MaxSimIndex is single-controller only")
        self.engine = engine
        self.doc_maxlen = int(doc_maxlen)
        if self.doc_maxlen < 1:
            raise ValueError(f"doc_maxlen must be positive, got {doc_maxlen}")
        self.dtype = jnp.dtype(dtype)
        self.mesh = mesh
        self._dp = 1
        self._sharding = None
        self._msharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.mesh import DP_AXIS

            self._dp = mesh.shape.get(DP_AXIS, 1)
            self._sharding = NamedSharding(mesh, P(DP_AXIS, None, None))
            self._msharding = NamedSharding(mesh, P(DP_AXIS, None))
            self._sharded_search = _make_sharded_maxsim(mesh)
        self._corpus = None  # [capacity, Sd, E] device
        self._cmask = None  # [capacity, Sd] bool
        self._n = 0
        self._lock = threading.Lock()

    def __len__(self) -> int:
        return self._n

    @property
    def n_embd(self) -> int:
        # token vectors are encoder-width (no Dense head on token states)
        # except for ColBERT checkpoints, whose per-token projection sets
        # the width (engine token-states forwards apply it)
        return (self.engine.config.colbert_dim
                or self.engine.config.n_embd)

    # --- building -----------------------------------------------------------
    def add(self, texts: Sequence[str]) -> int:
        """Encode + append documents' token states; returns the corpus size.

        Single-device engines ingest on-device (states never cross the
        link); mesh engines fetch to host once and device_put with the
        corpus sharding.  ColBERT checkpoints use the checkpoint's doc
        semantics: [D] marker framing, pre-forward doc_maxlen truncation,
        per-token projection, punctuation filtered from scoring."""
        texts = list(texts)
        colbert = self.engine.config.colbert_dim > 0
        if colbert:
            token_lists = self.engine.colbert_doc_tokens(
                texts, cap=self.doc_maxlen
            )
            skip = self.engine.colbert_skiplist()
        else:
            prefix = self.engine.document_prompt_prefix()
            if prefix:
                texts = [prefix + t for t in texts]
            token_lists = self.engine.tokenize_batch(texts)
            skip = frozenset()
        skip_arr = np.asarray(sorted(skip), np.int32)
        keep_rows = [
            np.asarray([t not in skip for t in toks], bool)
            for toks in token_lists
        ]
        with self._lock:
            base = self._n
            self._ensure_capacity(base + len(texts))
            if self.mesh is None and self.engine.mesh is None:
                for positions, dev, mask, lens in \
                        self.engine.token_states_device(token_lists):
                    keep = np.zeros_like(mask)
                    for r, p in enumerate(positions):
                        keep[r, : lens[r]] = keep_rows[p]
                    self._corpus, self._cmask = _commit_kernel(
                        self._corpus, self._cmask, dev, jnp.asarray(keep),
                        base + positions[0], self.doc_maxlen,
                    )
            else:
                states = self.engine.token_states_tokens(token_lists)
                if skip_arr.size:
                    states = [s[k] for s, k in zip(states, keep_rows)]
                    if any(len(s) == 0 for s in states):
                        raise ValueError(
                            "a document has no scorable (non-punctuation) "
                            "tokens"
                        )
                self._host_commit(states, base)
            self._n = base + len(texts)
            return self._n

    def add_token_vectors(
        self, states: Sequence[np.ndarray]
    ) -> int:
        """Append precomputed per-document token matrices ([len_i, E] each,
        un- or pre-normalized — rows re-normalize here)."""
        states = [np.asarray(s, np.float32) for s in states]
        for i, s in enumerate(states):
            if s.ndim != 2 or s.shape[1] != self.n_embd:
                raise ValueError(
                    f"document {i}: expected [tokens, {self.n_embd}], "
                    f"got {s.shape}"
                )
            if s.shape[0] == 0:
                raise ValueError(f"document {i} has no token vectors")
        with self._lock:
            base = self._n
            self._ensure_capacity(base + len(states))
            self._host_commit(states, base)
            self._n = base + len(states)
            return self._n

    def _host_commit(self, states: Sequence[np.ndarray], base: int) -> None:
        """Normalize/pad/truncate host-side and device_put one block."""
        sd, e = self.doc_maxlen, self.n_embd
        blk = np.zeros((len(states), sd, e), np.float32)
        msk = np.zeros((len(states), sd), bool)
        for i, s in enumerate(states):
            s = np.asarray(s, np.float32)[:sd]
            norm = np.linalg.norm(s, axis=-1, keepdims=True)
            blk[i, : len(s)] = s / np.maximum(norm, 1e-12)
            msk[i, : len(s)] = True
        corpus = self._corpus.at[base : base + len(states)].set(
            jnp.asarray(blk, self.dtype)
        )
        cmask = self._cmask.at[base : base + len(states)].set(
            jnp.asarray(msk)
        )
        if self._sharding is not None:
            corpus = jax.device_put(corpus, self._sharding)
            cmask = jax.device_put(cmask, self._msharding)
        self._corpus, self._cmask = corpus, cmask

    def _ensure_capacity(self, need: int) -> None:
        if need > MAX_INDEX_ROWS:
            raise ValueError(
                f"index would exceed {MAX_INDEX_ROWS} rows (ids ride the "
                "packed f32 result and must stay exactly representable)"
            )
        cap = 0 if self._corpus is None else self._corpus.shape[0]
        if need <= cap:
            return
        step = _CAPACITY_STEP * self._dp
        new_cap = -(-need // step) * step
        grown = jnp.zeros((new_cap, self.doc_maxlen, self.n_embd),
                          dtype=self.dtype)
        gmask = jnp.zeros((new_cap, self.doc_maxlen), dtype=bool)
        if self._sharding is not None:
            grown = jax.device_put(grown, self._sharding)
            gmask = jax.device_put(gmask, self._msharding)
        if self._corpus is not None:
            grown = jax.lax.dynamic_update_slice(
                grown, self._corpus, (0, 0, 0)
            )
            gmask = jax.lax.dynamic_update_slice(gmask, self._cmask, (0, 0))
            if self._sharding is not None:
                grown = jax.device_put(grown, self._sharding)
                gmask = jax.device_put(gmask, self._msharding)
        self._corpus, self._cmask = grown, gmask

    # --- persistence ---------------------------------------------------------
    def save(self, path: str) -> None:
        """Persist indexed token states (.npz: f16 states + packed masks)."""
        with self._lock:
            if self._n == 0:
                states = np.zeros((0, self.doc_maxlen, self.n_embd),
                                  np.float16)
                masks = np.zeros((0, self.doc_maxlen), bool)
            else:
                states = np.asarray(
                    self._corpus[: self._n], dtype=np.float32
                ).astype(np.float16)
                masks = np.asarray(self._cmask[: self._n])
        np.savez_compressed(path, token_states=states, token_masks=masks)

    def load(self, path: str) -> int:
        """Append documents previously saved with save(); returns the new
        corpus size.  doc_maxlen may differ: rows re-pad/truncate."""
        with np.load(path) as data:
            states = np.asarray(data["token_states"], np.float32)
            masks = np.asarray(data["token_masks"], bool)
        docs = [s[m] for s, m in zip(states, masks)]
        if any(len(d) == 0 for d in docs):
            raise ValueError("saved index contains an empty document")
        return self.add_token_vectors(docs)

    # --- querying ------------------------------------------------------------
    def search(self, queries: Sequence[str], k: int = 10):
        """Texts -> (indices [n, k] int32, scores [n, k] f32), id -1 /
        score -inf past the corpus (the VectorIndex padding contract).
        Query token states encode with the model's query prompt prefix;
        ColBERT checkpoints use [Q]-marker framing with [MASK] augmentation
        (all query_maxlen vectors score)."""
        queries = list(queries)
        if self.engine.config.colbert_dim:
            states = self.engine.colbert_query_vectors(queries)
            return self.search_token_vectors(states, k)
        prefix = self.engine.query_prompt_prefix()
        if prefix:
            queries = [prefix + t for t in queries]
        token_lists = self.engine.tokenize_batch(queries)
        states = self.engine.token_states_tokens(token_lists)
        return self.search_token_vectors(states, k)

    def search_token_vectors(
        self, states: Sequence[np.ndarray], k: int = 10
    ):
        """Precomputed query token matrices [len_i, E] -> (ids, scores)."""
        if k <= 0:
            raise ValueError(f"k must be positive, got {k}")
        states = [np.asarray(s, np.float32) for s in states]
        for i, s in enumerate(states):
            if s.ndim != 2 or s.shape[1] != self.n_embd or not len(s):
                raise ValueError(
                    f"query {i}: expected [tokens>0, {self.n_embd}], "
                    f"got {s.shape}"
                )
        k_req = k
        nq = len(states)
        with self._lock:
            if self._n == 0:
                raise ValueError("index is empty")
            k = min(k, self._n)
            if self._sharding is not None:
                k = min(k, self._corpus.shape[0] // self._dp)
            # pad the query batch (rows AND tokens) to stable jit shapes
            qb = next((b for b in _QUERY_BUCKETS if nq <= b), None)
            if qb is None:
                qb = -(-nq // _QUERY_BUCKETS[-1]) * _QUERY_BUCKETS[-1]
            sq = max(len(s) for s in states)
            sq = -(-sq // 32) * 32
            q = np.zeros((qb, sq, self.n_embd), np.float32)
            qm = np.zeros((qb, sq), np.int32)
            for i, s in enumerate(states):
                q[i, : len(s)] = s[:sq]
                qm[i, : len(s)] = 1
            cap = self._corpus.shape[0]
            nb = _doc_block(qb, sq, self.doc_maxlen, cap // self._dp)
            if self._sharding is not None:
                packed = self._sharded_search(
                    self._corpus, self._cmask, jnp.asarray(q),
                    jnp.asarray(qm), self._n, k, nb,
                )
            else:
                packed = _maxsim_search_kernel(
                    self._corpus, self._cmask, jnp.asarray(q),
                    jnp.asarray(qm), self._n, k, nb,
                )
            scores, idx = _unpack_result(np.asarray(packed)[:nq], k)
            if k < k_req:
                idx = np.concatenate(
                    [idx, np.full((nq, k_req - k), -1, np.int32)], axis=1
                )
                scores = np.concatenate(
                    [scores, np.full((nq, k_req - k), -np.inf, np.float32)],
                    axis=1,
                )
            return idx, scores
