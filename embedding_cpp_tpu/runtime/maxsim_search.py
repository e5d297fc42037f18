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


@partial(jax.jit, static_argnums=(6,), donate_argnums=(0, 1, 2))
def _commit_kernel(corpus, cmask, pooled, states, mask, base, sd):
    """Scatter one forward chunk's token states [B, S, E] (+ validity mask)
    into the corpus at rows [base, base+B): L2-normalize per token, pad or
    truncate S -> Sd, zero masked slots, and refresh the pooled prefilter
    row (unit mean of the doc's unit token vectors — the approx-mode
    stage-1 representation).  `base` is a traced scalar, so successive
    chunks reuse one executable per (chunk shape, Sd); corpus/cmask/pooled
    are DONATED, so the update is in-place — without donation XLA copies
    the whole corpus buffer per chunk, which dominated ingest (r4: 516
    docs/s; maxsim_search_v5e.json)."""
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
    pooled = jax.lax.dynamic_update_slice(
        pooled, _unit(jnp.sum(sn, axis=1)).astype(pooled.dtype), (base, 0)
    )
    return corpus, cmask, pooled


# host-block row buckets: pad add_token_vectors blocks up so the donated
# commit compiles O(log N) shapes instead of one per add() size.  Padded
# rows land in [base+len, base+bucket) — beyond _n, overwritten by the next
# append — so zero-filling them is safe.
_HOST_BLOCK_BUCKETS = (64, 256, 1024, 4096)


@partial(jax.jit, donate_argnums=(0, 1, 2))
def _host_commit_kernel(corpus, cmask, pooled, blk, msk, base):
    """Donated scatter of one pre-normalized host block ([Nb, Sd, E] +
    [Nb, Sd] mask) into the resident buffers — the add_token_vectors path.
    (`.at[].set` outside jit copies the whole corpus; donation makes the
    update in-place.)"""
    corpus = jax.lax.dynamic_update_slice(
        corpus, blk.astype(corpus.dtype), (base, 0, 0)
    )
    cmask = jax.lax.dynamic_update_slice(cmask, msk, (base, 0))
    pooled = jax.lax.dynamic_update_slice(
        pooled,
        _unit(jnp.sum(blk * msk[..., None], axis=1)).astype(pooled.dtype),
        (base, 0),
    )
    return corpus, cmask, pooled


@partial(jax.jit, static_argnums=(6, 7, 8))
def _maxsim_approx_kernel(corpus, cmask, pooled, q_states, q_mask, n_real,
                          k, c, qc):
    """Two-stage candidate search (the late-interaction analog of the dense
    index's approx path): stage 1 ranks the corpus by pooled-vector cosine
    ([Qb, N] matmul against the resident [N, E] prefilter — the mean token
    vector per doc) and keeps the top-C candidate ids; stage 2 gathers the
    C candidates' token states per query chunk and scores them with EXACT
    MaxSim; final top-k maps back to global ids.  FLOPs scale with C
    instead of N: Qb*E*N + Qb*Sq*E*C*Sd vs the exact kernel's
    Qb*Sq*E*N*Sd."""
    n = corpus.shape[0]
    qb = q_states.shape[0]
    qn = _unit(q_states)  # [Qb, Sq, E]
    qpool = _unit(jnp.sum(qn * (q_mask[..., None] > 0), axis=1))  # [Qb, E]
    s1 = jnp.matmul(qpool, pooled.T, preferred_element_type=jnp.float32)
    valid = jnp.arange(n) < n_real
    s1 = jnp.where(valid[None, :], s1, -jnp.inf)
    # approximate candidate selection: exact lax.top_k over a wide [Qb, N]
    # row is a full sort-network pass and can cost as much as the exact
    # MaxSim scan it is meant to avoid; approx_max_k (the TPU bucketed
    # selector, Chern et al. 2022 — the dense index's approx path uses the
    # same primitive) keeps ~C candidates with high recall, and stage 2
    # re-scores them EXACTLY, so stage-1 approximation only affects which
    # borderline candidates are considered, not any returned score
    _, cidx = jax.lax.approx_max_k(s1, c)  # [Qb, C] candidate ids
    cidx = cidx.astype(jnp.int32)

    def body(i, scores):
        qs = jax.lax.dynamic_slice_in_dim(qn, i * qc, qc, axis=0)
        qm = jax.lax.dynamic_slice_in_dim(q_mask, i * qc, qc, axis=0)
        ci = jax.lax.dynamic_slice_in_dim(cidx, i * qc, qc, axis=0)
        cand = corpus[ci]  # [qc, C, Sd, E] gather
        cm = cmask[ci]  # [qc, C, Sd]
        sim = jnp.einsum(
            "qte,qcse->qtcs", qs, cand.astype(qs.dtype),
            preferred_element_type=jnp.float32,
        )
        sim = jnp.where(cm[:, None], sim, -jnp.inf)
        best = jnp.max(sim, axis=-1)  # [qc, Sq, C]
        best = jnp.where(qm[:, :, None] > 0, best, 0.0)
        return jax.lax.dynamic_update_slice(
            scores, jnp.sum(best, axis=1), (i * qc, 0)
        )

    scores = jax.lax.fori_loop(
        0, qb // qc, body, jnp.zeros((qb, c), jnp.float32)
    )
    # all-padding candidate slots (beyond n_real) carry -inf stage-1
    # scores but real gathered rows; re-mask by candidate validity
    scores = jnp.where(
        jnp.take_along_axis(
            jnp.broadcast_to(valid[None, :], s1.shape), cidx, axis=1
        ),
        scores, -jnp.inf,
    )
    s, j = jax.lax.top_k(scores, k)  # j indexes the candidate axis
    ids = jnp.take_along_axis(cidx, j, axis=1)
    ids = jnp.where(jnp.isfinite(s), ids, -1)
    return _pack_result(s, ids)


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
                 dtype: str = "bfloat16", mesh=None, capacity: int = 0):
        if jax.process_count() > 1:
            raise RuntimeError("MaxSimIndex is single-controller only")
        self.engine = engine
        self.doc_maxlen = int(doc_maxlen)
        if self.doc_maxlen < 1:
            raise ValueError(f"doc_maxlen must be positive, got {doc_maxlen}")
        self.dtype = jnp.dtype(dtype)
        self.mesh = mesh
        self._capacity_hint = int(capacity)  # pre-size: no growth re-pads
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
        self._pooled = None  # [capacity, E] f32 — approx-mode prefilter
        self._n = 0
        self._lock = threading.Lock()
        if self._capacity_hint:
            with self._lock:
                self._ensure_capacity(self._capacity_hint)

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
                    self._corpus, self._cmask, self._pooled = _commit_kernel(
                        self._corpus, self._cmask, self._pooled, dev,
                        jnp.asarray(keep), base + positions[0],
                        self.doc_maxlen,
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
        """Normalize/pad/truncate host-side, then commit on device.

        Single-device: bucketed DONATED scatters (one executable per bucket
        size, in-place update — the `.at[].set`-outside-jit form copied the
        whole corpus per add and capped ingest at ~516 docs/s, r4).  Mesh:
        one `.at[].set` + re-shard (the dp path; adds are rare relative to
        searches there and donation across shardings is not worth the
        complexity)."""
        sd, e = self.doc_maxlen, self.n_embd

        def block(chunk):
            blk = np.zeros((len(chunk), sd, e), np.float32)
            msk = np.zeros((len(chunk), sd), bool)
            for i, s in enumerate(chunk):
                s = np.asarray(s, np.float32)[:sd]
                norm = np.linalg.norm(s, axis=-1, keepdims=True)
                blk[i, : len(s)] = s / np.maximum(norm, 1e-12)
                msk[i, : len(s)] = True
            return blk, msk

        if self._sharding is not None:
            blk, msk = block(states)
            corpus = self._corpus.at[base : base + len(states)].set(
                jnp.asarray(blk, self.dtype)
            )
            cmask = self._cmask.at[base : base + len(states)].set(
                jnp.asarray(msk)
            )
            self._corpus = jax.device_put(corpus, self._sharding)
            self._cmask = jax.device_put(cmask, self._msharding)
            return
        cap = _HOST_BLOCK_BUCKETS[-1]
        for lo in range(0, len(states), cap):
            chunk = states[lo : lo + cap]
            nb = next(b for b in _HOST_BLOCK_BUCKETS if len(chunk) <= b)
            if base + lo + nb > MAX_INDEX_ROWS:
                # near the id ceiling the pad rows would spuriously trip
                # the MAX_INDEX_ROWS check (the REAL need fits; the bucket
                # doesn't) — commit this block unpadded instead
                nb = len(chunk)
            blk, msk = block(chunk)
            if nb != len(chunk):  # pad rows land beyond _n: safe (see above)
                blk = np.concatenate(
                    [blk, np.zeros((nb - len(chunk), sd, e), np.float32)]
                )
                msk = np.concatenate(
                    [msk, np.zeros((nb - len(chunk), sd), bool)]
                )
            self._ensure_capacity(base + lo + nb)
            self._corpus, self._cmask, self._pooled = _host_commit_kernel(
                self._corpus, self._cmask, self._pooled,
                jnp.asarray(blk, self.dtype), jnp.asarray(msk), base + lo,
            )

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
        gpool = jnp.zeros((new_cap, self.n_embd), dtype=jnp.float32)
        if self._sharding is not None:
            grown = jax.device_put(grown, self._sharding)
            gmask = jax.device_put(gmask, self._msharding)
            gpool = jax.device_put(gpool, self._msharding)
        if self._corpus is not None:
            grown = jax.lax.dynamic_update_slice(
                grown, self._corpus, (0, 0, 0)
            )
            gmask = jax.lax.dynamic_update_slice(gmask, self._cmask, (0, 0))
            gpool = jax.lax.dynamic_update_slice(gpool, self._pooled, (0, 0))
            if self._sharding is not None:
                grown = jax.device_put(grown, self._sharding)
                gmask = jax.device_put(gmask, self._msharding)
                gpool = jax.device_put(gpool, self._msharding)
        self._corpus, self._cmask, self._pooled = grown, gmask, gpool

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
    def search(self, queries: Sequence[str], k: int = 10,
               candidates: int | None = None):
        """Texts -> (indices [n, k] int32, scores [n, k] f32), id -1 /
        score -inf past the corpus (the VectorIndex padding contract).
        Query token states encode with the model's query prompt prefix;
        ColBERT checkpoints use [Q]-marker framing with [MASK] augmentation
        (all query_maxlen vectors score).  `candidates` enables the
        two-stage mode (see search_token_vectors)."""
        queries = list(queries)
        if self.engine.config.colbert_dim:
            states = self.engine.colbert_query_vectors(queries)
            return self.search_token_vectors(states, k,
                                             candidates=candidates)
        prefix = self.engine.query_prompt_prefix()
        if prefix:
            queries = [prefix + t for t in queries]
        token_lists = self.engine.tokenize_batch(queries)
        states = self.engine.token_states_tokens(token_lists)
        return self.search_token_vectors(states, k, candidates=candidates)

    def search_token_vectors(
        self, states: Sequence[np.ndarray], k: int = 10,
        candidates: int | None = None,
    ):
        """Precomputed query token matrices [len_i, E] -> (ids, scores).

        `candidates=C` switches to the two-stage mode: a pooled-vector
        cosine prefilter picks the top-C documents per query, exact MaxSim
        re-scores only those (the dense index's approx-path analog —
        search FLOPs scale with C, not the corpus).  Single-device only;
        exact mode is the default and the mesh path."""
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
            if candidates is not None:
                if self._sharding is not None:
                    raise ValueError(
                        "two-stage candidates mode is single-device; use "
                        "exact search on a mesh"
                    )
                c = max(k, min(int(candidates), self._n, cap))
                # query-chunk size bounds the [qc, C, Sd, E] gather tile
                qc = max(1, _SIM_TILE_BUDGET
                         // max(1, c * self.doc_maxlen * self.n_embd * 4))
                qc = 1 << (qc.bit_length() - 1)
                while qb % qc:
                    qc //= 2
                packed = _maxsim_approx_kernel(
                    self._corpus, self._cmask, self._pooled,
                    jnp.asarray(q), jnp.asarray(qm), self._n, k, c,
                    max(qc, 1),
                )
            elif self._sharding is not None:
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
