"""Sparse (SPLADE) retrieval over the (term-id, weight) vectors
Engine.encode_sparse produces.

Two scoring backends behind one index:

- **device** (the default with an engine): documents live in HBM as
  fixed-width padded COO — ids [N, Kd] int32 + weights [N, Kd] f32 (pad
  slots id 0 / weight 0, so they contribute nothing).  Scoring densifies
  the QUERY batch on device (a tiny [Qb, V] scatter from the sparse query
  terms — never the corpus: densifying a 30k-vocab corpus would be a ~60x
  HBM inflation) and runs a blocked gather-weighted-sum over corpus tiles:
  scores[q, n] = sum_j val[n, j] * qdense[q, idx[n, j]].  VPU
  gather-bound, ~N*Kd*Qb*4 bytes of traffic per pass — three orders of
  magnitude beyond a single-core host at 1M-doc scale (benchmarks/
  sparse.py).  The corpus dp-shards over a mesh exactly like the dense
  VectorIndex (two-stage candidate top-k), and multi-host serving replays
  adds/searches leader-follower (parallel/distributed.py).
- **host** (device=False, or no engine): one O(nnz_corpus) numpy pass per
  query (values * q_dense[indices], np.bincount-reduced per doc; reduceat
  is avoided because it silently mis-reduces empty segments).

Scores are exact dot products in both backends, the standard SPLADE
relevance.  The reference has no retrieval surface at all (bert.h:41-92 is
embeddings only); this mirrors the dense VectorIndex contract (k results
per query, id -1 + -inf padding past the corpus size, .npz persistence).
"""
from __future__ import annotations

import threading
from functools import partial
from typing import Sequence

import numpy as np

_CAPACITY_STEP = 4096  # device corpus padded to multiples of this
_QUERY_BUCKETS = (8, 64, 512)
# per-step [NB, Kd, Qb] f32 gather-tile budget (bytes) for the blocked scan
_GATHER_TILE_BUDGET = 256 << 20


def _doc_block(qb: int, kd: int, cap: int) -> int:
    """Largest power-of-two doc-block divisor of `cap` whose gather tile
    fits the budget (>= 1)."""
    nb = max(1, _GATHER_TILE_BUDGET // max(1, qb * kd * 4))
    nb = 1 << (nb.bit_length() - 1)
    while cap % nb:
        nb //= 2
    return max(nb, 1)


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


def _densify_queries(q_idx, q_val, n_vocab: int):
    """Padded sparse queries (idx [Qb, Kq] int32, -1 = pad; val [Qb, Kq])
    -> dense [Qb, n_vocab] f32, built ON DEVICE from the tiny sparse form
    (the dense matrix itself never crosses the host link)."""
    import jax.numpy as jnp

    qb, kq = q_idx.shape
    rows = jnp.repeat(jnp.arange(qb), kq)
    idx = jnp.clip(q_idx.reshape(-1), 0, n_vocab - 1)
    val = jnp.where(q_idx.reshape(-1) >= 0, q_val.reshape(-1), 0.0)
    return (
        jnp.zeros((qb, n_vocab), jnp.float32).at[rows, idx].add(val)
    )


def _make_sparse_search_kernel():
    import jax
    import jax.numpy as jnp

    from .search import _pack_result, _select_topk

    @partial(jax.jit, static_argnums=(5, 6, 7))
    def kernel(didx, dval, q_idx, q_val, n_real, k, nb, n_vocab):
        """didx/dval [N, Kd]; q_idx/q_val [Qb, Kq] (-1 pad) ->
        packed f32 [Qb, 2k] (scores | bitcast ids)."""
        n = didx.shape[0]
        qd = _densify_queries(q_idx, q_val, n_vocab)  # [Qb, V]
        qdT = qd.T  # [V, Qb]

        def body(i, scores):
            ib = jax.lax.dynamic_slice_in_dim(didx, i * nb, nb, axis=0)
            vb = jax.lax.dynamic_slice_in_dim(dval, i * nb, nb, axis=0)
            g = qdT[ib]  # [NB, Kd, Qb] gather
            s = jnp.einsum("nk,nkq->qn", vb, g,
                           preferred_element_type=jnp.float32)
            return jax.lax.dynamic_update_slice(scores, s, (0, i * nb))

        scores = jax.lax.fori_loop(
            0, n // nb, body, jnp.zeros((q_idx.shape[0], n), jnp.float32)
        )
        valid = jnp.arange(n) < n_real
        scores = jnp.where(valid[None, :], scores, -jnp.inf)
        s, i = _select_topk(scores, k, exact=True)
        i = jnp.where(jnp.isfinite(s), i, -1)
        return _pack_result(s, i)

    return kernel


def _make_sparse_approx_kernel():
    """Two-stage candidates search (the sparse analog of the dense approx
    path and MaxSim's candidates mode): stage 1 scores EVERY document with
    only its P heaviest terms (rows are impact-sorted at ingest, so
    didx[:, :P] is the document's weight prefix — gather traffic drops by
    Kd/P) and keeps ~C candidates via approx_max_k; stage 2 re-scores the
    candidates with their FULL term rows (exact), so returned scores are
    exact sparse dot products — the prefix approximation only affects which
    borderline documents are considered."""
    import jax
    import jax.numpy as jnp

    from .search import _pack_result

    @partial(jax.jit, static_argnums=(5, 6, 7, 8))
    def kernel(didx, dval, q_idx, q_val, n_real, k, c, p, n_vocab):
        n, kd = didx.shape
        qb = q_idx.shape[0]
        qd = _densify_queries(q_idx, q_val, n_vocab)  # [Qb, V]
        qdT = qd.T  # [V, Qb]
        nb = _doc_block(qb, p, n)

        def body(i, scores):
            ib = jax.lax.dynamic_slice_in_dim(didx, i * nb, nb, axis=0)
            vb = jax.lax.dynamic_slice_in_dim(dval, i * nb, nb, axis=0)
            g = qdT[ib[:, :p]]  # [NB, P, Qb] gather — P of Kd terms
            s = jnp.einsum("np,npq->qn", vb[:, :p], g,
                           preferred_element_type=jnp.float32)
            return jax.lax.dynamic_update_slice(scores, s, (0, i * nb))

        s1 = jax.lax.fori_loop(
            0, n // nb, body, jnp.zeros((qb, n), jnp.float32)
        )
        valid = jnp.arange(n) < n_real
        s1 = jnp.where(valid[None, :], s1, -jnp.inf)
        _, cidx = jax.lax.approx_max_k(s1, c)
        cidx = cidx.astype(jnp.int32)

        # stage 2: exact rescore of the C candidates' full rows
        di = didx[cidx]  # [Qb, C, Kd]
        dv = dval[cidx]
        g = jnp.take_along_axis(
            qd, di.reshape(qb, c * kd).astype(jnp.int32), axis=1
        ).reshape(qb, c, kd)
        scores = jnp.sum(dv * g, axis=-1)  # [Qb, C] exact dots
        cand_ok = jnp.take_along_axis(
            jnp.broadcast_to(valid[None, :], s1.shape), cidx, axis=1
        )
        scores = jnp.where(cand_ok, scores, -jnp.inf)
        s, j = jax.lax.top_k(scores, k)
        ids = jnp.take_along_axis(cidx, j, axis=1)
        ids = jnp.where(jnp.isfinite(s), ids, -1)
        return _pack_result(s, ids)

    return kernel


def _make_sharded_sparse_search(mesh):
    """Distributed sparse top-k over a dp-sharded padded-COO corpus:
    per-shard blocked scoring + local top-k, then the k*dp candidate merge
    (the runtime/search.py _make_sharded_search pattern)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import DP_AXIS
    from .search import _pack_result, _select_topk

    @partial(jax.jit, static_argnums=(5, 6, 7))
    def search(didx, dval, q_idx, q_val, n_real, k, nb, n_vocab):
        qd = _densify_queries(q_idx, q_val, n_vocab)

        def body_shard(di, dv, qdl):
            qdT = qdl.T
            n_local = di.shape[0]
            base = jax.lax.axis_index(DP_AXIS) * n_local

            def body(i, scores):
                ib = jax.lax.dynamic_slice_in_dim(di, i * nb, nb, axis=0)
                vb = jax.lax.dynamic_slice_in_dim(dv, i * nb, nb, axis=0)
                g = qdT[ib]
                s = jnp.einsum("nk,nkq->qn", vb, g,
                               preferred_element_type=jnp.float32)
                return jax.lax.dynamic_update_slice(scores, s, (0, i * nb))

            scores = jax.lax.fori_loop(
                0, n_local // nb, body,
                jnp.zeros((qdl.shape[0], n_local), jnp.float32),
            )
            valid = (jnp.arange(n_local) + base) < n_real
            scores = jnp.where(valid[None, :], scores, -jnp.inf)
            s, i = _select_topk(scores, k, exact=True)
            return s, (i + base).astype(jnp.int32)

        s, i = jax.shard_map(
            body_shard,
            mesh=mesh,
            in_specs=(P(DP_AXIS, None), P(DP_AXIS, None), P()),
            out_specs=(P(None, DP_AXIS), P(None, DP_AXIS)),
            check_vma=False,
        )(didx, dval, qd)
        sf, pos = jax.lax.top_k(s, k)
        idxf = jnp.take_along_axis(i, pos, axis=1)
        idxf = jnp.where(jnp.isfinite(sf), idxf, -1)
        return _pack_result(sf, idxf)

    return search


class SparseIndex:
    """Append-only sparse corpus + exact dot-product top-k search.

    Thread-safe for concurrent add/search (one lock; the batcher calls
    from executor threads).

    device: True keeps a padded-COO mirror of the corpus in device HBM and
    scores there (the production path; see module docstring); False scores
    on the host.  None = device when an engine is attached.  `nnz_width`
    caps the stored active terms per document on the device path (extra
    terms beyond it are dropped LOWEST-WEIGHT-first; defaults to k_encode).
    `mesh` dp-shards the device corpus rows.  Multi-host serving wraps this
    in the leader-follower control plane (parallel/distributed.py)."""

    def __init__(self, engine=None, *, k_encode: int = 256,
                 device: bool | None = None, nnz_width: int | None = None,
                 mesh=None):
        self.engine = engine
        if engine is not None and not engine.config.mlm_head:
            raise ValueError(
                "model has no MLM head (not a SPLADE checkpoint)"
            )
        self.k_encode = int(k_encode)
        self.n_vocab = int(engine.config.n_vocab) if engine is not None else 0
        self.device = engine is not None if device is None else bool(device)
        if mesh is not None and not self.device:
            raise ValueError("mesh sharding requires device=True")
        self.mesh = mesh
        self.nnz_width = int(nnz_width or self.k_encode)
        self._dp = 1
        self._sharding = None
        if self.device:
            self._kernel = _make_sparse_search_kernel()
            self._approx_kernel = _make_sparse_approx_kernel()
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.mesh import DP_AXIS

            self._dp = mesh.shape.get(DP_AXIS, 1)
            self._sharding = NamedSharding(mesh, P(DP_AXIS, None))
            self._sharded_search = _make_sharded_sparse_search(mesh)
        self._didx = None  # [capacity, Kd] int32 device
        self._dval = None  # [capacity, Kd] f32 device
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
        clean = []
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
            clean.append((idx, val))
        with self._lock:
            base = len(self._indices)
            for idx, val in clean:
                if idx.size:
                    self.n_vocab = max(self.n_vocab, int(idx.max()) + 1)
                self._indices.append(idx)
                self._values.append(val)
            self._flat = None
            if self.device:
                self._commit_device(self._pad_pairs(clean), base)
            return len(self._indices)

    # --- device mirror --------------------------------------------------------
    def _pad_pairs(self, pairs) -> tuple[np.ndarray, np.ndarray]:
        """(ids, weights) pairs -> padded [n, Kd] matrices, rows ALWAYS
        impact-sorted (weight-descending; order is invariant for exact
        dot-product scoring, and the two-stage candidates mode scores a
        weight-prefix per document — see search_vectors).  Documents with
        more than Kd active terms keep their Kd heaviest."""
        kd = self.nnz_width
        di = np.zeros((len(pairs), kd), np.int32)
        dv = np.zeros((len(pairs), kd), np.float32)
        for i, (idx, val) in enumerate(pairs):
            order = np.argsort(-val, kind="stable")[:kd]
            idx, val = idx[order], val[order]
            di[i, : len(idx)] = idx
            dv[i, : len(val)] = val
        return di, dv

    def _vocab_pad(self) -> int:
        """Static densify width: the engine's vocab, or the corpus max
        rounded up in 1024 steps (bounds recompiles under growth)."""
        if self.engine is not None:
            return int(self.engine.config.n_vocab)
        return max(1024, -(-self.n_vocab // 1024) * 1024)

    def _ensure_device_capacity(self, need: int) -> None:
        import jax
        import jax.numpy as jnp

        from .search import MAX_INDEX_ROWS

        if need > MAX_INDEX_ROWS:
            raise ValueError(
                f"index would exceed {MAX_INDEX_ROWS} rows (ids ride the "
                "packed f32 result and must stay exactly representable)"
            )

        cap = 0 if self._didx is None else self._didx.shape[0]
        if need <= cap:
            return
        step = _CAPACITY_STEP * self._dp
        new_cap = -(-need // step) * step
        gi = jnp.zeros((new_cap, self.nnz_width), jnp.int32)
        gv = jnp.zeros((new_cap, self.nnz_width), jnp.float32)
        if self._sharding is not None:
            gi = jax.device_put(gi, self._sharding)
            gv = jax.device_put(gv, self._sharding)
        if self._didx is not None:
            gi = jax.lax.dynamic_update_slice(gi, self._didx, (0, 0))
            gv = jax.lax.dynamic_update_slice(gv, self._dval, (0, 0))
            if self._sharding is not None:
                gi = jax.device_put(gi, self._sharding)
                gv = jax.device_put(gv, self._sharding)
        self._didx, self._dval = gi, gv

    def _commit_device(self, padded, base: int) -> None:
        """Scatter padded [n, Kd] doc rows into the device corpus at
        `base` (caller holds _lock).  The multi-host leader overrides this
        to broadcast first — followers replay with identical inputs."""
        import jax
        import jax.numpy as jnp

        di, dv = padded
        self._ensure_device_capacity(base + len(di))
        self._didx = jax.lax.dynamic_update_slice(
            self._didx, jnp.asarray(di), (base, 0)
        )
        self._dval = jax.lax.dynamic_update_slice(
            self._dval, jnp.asarray(dv), (base, 0)
        )
        if self._sharding is not None:
            self._didx = jax.device_put(self._didx, self._sharding)
            self._dval = jax.device_put(self._dval, self._sharding)

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

    def search(self, texts: Sequence[str], k: int = 10,
               candidates: int | None = None):
        """Encode queries + search: -> (ids [Q, k] int32, scores [Q, k]
        f32), rows sorted by descending score, id -1 / -inf past the
        corpus (the dense VectorIndex padding contract).  `candidates`
        enables the two-stage mode (see search_vectors)."""
        if self.engine is None:
            raise RuntimeError("index was loaded without an engine")
        pairs = self.engine.encode_sparse(texts, k=self.k_encode)
        return self.search_vectors(pairs, k, candidates=candidates)

    def search_vectors(
        self, pairs: Sequence[tuple[np.ndarray, np.ndarray]], k: int = 10,
        candidates: int | None = None, prefix: int = 8,
    ):
        """`candidates=C` switches to the two-stage mode: every document is
        scored by its `prefix` heaviest terms only (the impact prefix of
        the sorted rows), ~C survivors re-score EXACTLY — the dense/maxsim
        approx-path analog for the sparse plane.  Prefix quality tracks
        weight concentration: SPLADE's log1p(relu) mass lives in a few
        dominant terms, so prefix=8 recovers the exact ranking there
        (benchmarks/sparse.py); near-uniform weight profiles need a wider
        prefix (or exact search).  Single-device path only; exact is the
        default and the mesh/host path."""
        if k <= 0:
            raise ValueError(f"k must be positive, got {k}")
        if candidates is not None:
            if not self.device:
                raise ValueError(
                    "two-stage candidates mode needs the device index"
                )
            if self._sharding is not None:
                raise ValueError(
                    "two-stage candidates mode is single-device; use exact "
                    "search on a mesh"
                )
        if self.device:
            return self._search_device(pairs, k, candidates=candidates,
                                       prefix=prefix)
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

    def _search_device(self, pairs, k: int, candidates: int | None = None,
                       prefix: int = 8):
        from .search import _unpack_result

        k_req = k
        nq = len(pairs)
        # pad queries to (row bucket, term width): stable compiled shapes
        kq = max((len(i) for i, _ in pairs), default=1)
        kq = max(64, -(-kq // 64) * 64)
        qb = next((b for b in _QUERY_BUCKETS if nq <= b), None)
        if qb is None:
            qb = -(-nq // _QUERY_BUCKETS[-1]) * _QUERY_BUCKETS[-1]
        q_idx = np.full((qb, kq), -1, np.int32)
        q_val = np.zeros((qb, kq), np.float32)
        vocab_pad = None
        with self._lock:
            n = len(self._indices)
            if n == 0:
                raise RuntimeError("empty index")
            vocab_pad = self._vocab_pad()
            for qi, (idx, val) in enumerate(pairs):
                idx = np.asarray(idx, np.int64)
                val = np.asarray(val, np.float32)
                keep = (idx >= 0) & (idx < vocab_pad)
                idx, val = idx[keep][:kq], val[keep][:kq]
                q_idx[qi, : len(idx)] = idx
                q_val[qi, : len(val)] = val
            k = min(k, n)
            if self._sharding is not None:
                k = min(k, self._didx.shape[0] // self._dp)
            nb = _doc_block(qb, self.nnz_width,
                            self._didx.shape[0] // self._dp)
            if candidates is not None:
                c = max(k, min(int(candidates), n, self._didx.shape[0]))
                p = max(1, min(int(prefix), self.nnz_width))
                packed = self._approx_kernel(
                    self._didx, self._dval, q_idx, q_val, n, k, c, p,
                    vocab_pad,
                )
            else:
                packed = self._run_device_search(q_idx, q_val, n, k, nb,
                                                 vocab_pad)
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

    def _run_device_search(self, q_idx, q_val, n_real, k, nb, vocab_pad):
        """Dispatch the device search (caller holds _lock).  Overridden by
        the multi-host leader to broadcast the query payload first."""
        if self._sharding is not None:
            return self._sharded_search(
                self._didx, self._dval, q_idx, q_val, n_real, k, nb,
                vocab_pad,
            )
        return self._kernel(
            self._didx, self._dval, q_idx, q_val, n_real, k, nb, vocab_pad
        )

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
