"""Embedding TCP server.

Two wire protocols on one port:

1. **ggml-compat** (the reference's examples/server.cpp): on connect the
   server sends `n_embd` as a raw little-endian int32; each client message is
   raw UTF-8 text (<= 32 KiB, one read == one message), each reply is
   `n_embd` raw f32.  Drop-in for reference clients (sample_client.py,
   run_mteb_server.py).
2. **TPE2 framed** (fixes the reference's missing length framing, a real bug
   under TCP segmentation — SURVEY.md §3.4): any message starting with magic
   b"TPE2" is `magic | u32 count | count * (u32 len | utf8 bytes)`; the reply
   is `u32 count | count * n_embd * f32`.  Supports batched requests and
   large texts (per-text/aggregate caps: MAX_TEXT_BYTES / MAX_REQUEST_BYTES).

Unlike the reference (`listen(fd, 1)`, one client at a time), the server
accepts many clients concurrently and feeds one **continuous batcher**: all
pending requests across connections are merged into device batches
(micro-batching window), so throughput scales with concurrency instead of
degrading.
"""
from __future__ import annotations

import argparse
import asyncio
import json
import struct
import sys
import threading
import time
from dataclasses import dataclass, field

import numpy as np

MAGIC = b"TPE2"
MAGIC_STATS = b"TPES"  # -> u32 len | JSON metrics snapshot
MAGIC_HEALTH = b"TPEH"  # -> u32 len | b"ok"
# bert.h surface over the wire (bert_tokenize :64, bert_eval_batch :79,
# bert_n_max_tokens :88, bert_vocab_id_to_token :90).  These magics start
# with a control byte so they can never collide with a ggml-compat raw-mode
# client's UTF-8 text (TPE2/TPES/TPEH predate this and stay printable for
# compatibility — a raw text starting "TPE2" was already ambiguous).
MAGIC_TOKENIZE = b"\x01TPT"  # u32 n | n*(u32 len | utf8) -> u32 n | n*(u32 k | k*i32)
MAGIC_EVAL = b"\x01TPI"  # u32 n | n*(u32 k | k*i32) -> u32 n | n*n_embd f32
MAGIC_META = b"\x01TPM"  # -> u32 len | JSON {n_embd, n_max_tokens, name, ...}
MAGIC_VOCAB = b"\x01TPV"  # u32 id -> u32 len | utf8 token
# int8-compressed encode: same request body as TPE2, reply
# u32 n | n * f32 scale | n * n_embd * i8 — a quarter of the f32 reply bytes
# (vec = codes * scale; cosine scores move ~1e-4 on normalized embeddings)
MAGIC_ENCODE_I8 = b"\x01TP8"
# on-device vector search (runtime/search.py — embeddings never leave HBM;
# the reference's sample_client pulls the whole corpus over the socket):
# index:  u32 n | n*(u32 len | utf8)          -> u32 total_indexed
# search: u32 k | u32 n | n*(u32 len | utf8)  -> u32 n | u32 k |
#                                                n*k i32 idx | n*k f32 score
#   (reply k == requested k; no-result slots carry idx -1 / score -inf —
#    e.g. k beyond the corpus size, or unfilled approximate-mode bins)
MAGIC_INDEX = b"\x01TPB"
MAGIC_SEARCH = b"\x01TPS"
# cross-encoder rerank (needs a classification-head model; runtime/engine
# .rerank): u32 top_n (0 = all) | u32 len | query utf8 |
#           u32 n | n*(u32 len | utf8 doc)
#        -> u32 m | m i32 idx | m f32 sigmoid score (descending)
MAGIC_RERANK = b"\x01TPR"
# SPLADE sparse encode (needs an MLM-head model; runtime/engine
# .encode_sparse): u32 k | u32 n | n*(u32 len | utf8)
#        -> u32 n | n*(u32 nnz | nnz i32 term ids | nnz f32 weights)
MAGIC_SPARSE = b"\x01TPW"
# late-interaction MaxSim rerank (any model; runtime/engine.maxsim_rerank):
# same request/reply layout as MAGIC_RERANK (scores are raw MaxSim sums,
# not sigmoid)
MAGIC_MAXSIM = b"\x01TPX"
MAX_SPARSE_K = 4096  # device top-k width cap (matches /v1/sparse_embeddings)
# sparse corpus building/search (device-backed SparseIndex): the \x01TPB /
# \x01TPS layouts verbatim — index: texts -> u32 total; search: u32 k |
# texts -> u32 n | u32 k | n*k i32 ids | n*k f32 scores (-1/-inf padding)
MAGIC_SPARSE_INDEX = b"\x01TPY"
MAGIC_SPARSE_SEARCH = b"\x01TPZ"
# hybrid retrieval (dense+sparse RRF): same layouts again; index adds to
# BOTH indexes atomically (hybrid_index_texts), search fuses k-from-each
MAGIC_HYBRID_INDEX = b"\x01TPF"
MAGIC_HYBRID_SEARCH = b"\x01TPG"
# late-interaction retrieval over the on-device token-state corpus
# (runtime/maxsim_search.MaxSimIndex): the \x01TPB / \x01TPS layouts
# verbatim — index: texts -> u32 total; search: u32 k | texts ->
# u32 n | u32 k | n*k i32 ids | n*k f32 MaxSim scores (-1/-inf padding)
MAGIC_MAXSIM_INDEX = b"\x01TPJ"
MAGIC_MAXSIM_SEARCH = b"\x01TPK"
RAW_CHUNK = 1 << 15  # reference message cap (server.cpp:27)
# protocol sanity caps: a malformed/hostile frame must not drive unbounded
# reads or allocations (the reference has no framing at all to validate)
MAX_ITEMS = 1 << 16  # texts or id-lists per request
MAX_TEXT_BYTES = 16 << 20  # per text
MAX_REQUEST_BYTES = 64 << 20  # aggregate text payload per request
MAX_IDS = 1 << 20  # per id list
MAX_REQUEST_IDS = 1 << 22  # aggregate ids per request
MAX_TOPK = 1 << 12  # search k cap


class ProtocolError(Exception):
    pass


class OverloadedError(RuntimeError):
    """Backpressure: the batcher's pending-sentence budget is exhausted."""


def _check(cond: bool, what: str) -> None:
    if not cond:
        raise ProtocolError(f"malformed frame: {what}")


@dataclass
class ServerStats:
    connections: int = 0
    requests: int = 0
    sentences: int = 0
    batches: int = 0
    errors: int = 0
    rejected: int = 0  # backpressure rejections (queue saturated)
    # ring buffer of recent request latencies (seconds) -> percentiles
    latencies: list = field(default_factory=list, repr=False)
    _lat_idx: int = 0
    LAT_WINDOW = 1024

    def record_latency(self, seconds: float) -> None:
        if len(self.latencies) < self.LAT_WINDOW:
            self.latencies.append(seconds)
        else:
            self.latencies[self._lat_idx] = seconds
            self._lat_idx = (self._lat_idx + 1) % self.LAT_WINDOW

    def as_dict(self) -> dict:
        d = {k: v for k, v in self.__dict__.items()
             if not k.startswith("_") and k != "latencies"}
        if self.latencies:
            lat = np.sort(np.asarray(self.latencies))
            d["latency_ms"] = {
                "p50": round(float(lat[len(lat) // 2]) * 1e3, 2),
                "p95": round(float(lat[int(len(lat) * 0.95)]) * 1e3, 2),
                "p99": round(float(lat[min(int(len(lat) * 0.99),
                                           len(lat) - 1)]) * 1e3, 2),
                "window": len(lat),
            }
        return d


class ContinuousBatcher:
    """Merge pending encode requests across connections into device batches."""

    def __init__(self, engine, max_batch: int = 256, window_ms: float = 2.0,
                 max_pending: int = 16384):
        self.engine = engine
        self.max_batch = max_batch
        self.window = window_ms / 1000.0
        # backpressure: cap admitted-but-unserved sentences so a flood of
        # requests degrades into error frames instead of unbounded memory
        # (the reference has no limit — and no concurrency either)
        self.max_pending = max_pending
        self._pending = 0
        self.queue: asyncio.Queue = asyncio.Queue()
        self.stats = ServerStats()
        self._task: asyncio.Task | None = None
        self.index = None  # lazy on-device VectorIndex (shared, thread-safe)
        self.sparse_index = None  # lazy host-side SparseIndex (SPLADE)
        self.maxsim_index = None  # lazy on-device MaxSimIndex (token states)
        self._index_init_lock = threading.Lock()
        # spans BOTH adds of hybrid_index_texts: executor threads must not
        # interleave dense/sparse appends into different doc-id assignments
        self._hybrid_lock = threading.Lock()

    def try_reserve(self, n: int) -> None:
        """Admission control for index/search work, which runs on executor
        threads via index_texts/search_texts and therefore bypasses
        encode()'s queue: reserve `n` sentences against the same
        --max-pending budget so a flood of index frames degrades into
        error frames instead of unbounded executor queueing.  Call from the
        event loop only (single-threaded counter updates), release() in a
        finally."""
        if n > self.max_pending:
            self.stats.rejected += 1
            raise OverloadedError(
                f"request too large: {n} sentences exceed the "
                f"--max-pending cap {self.max_pending}; split the request"
            )
        if self._pending + n > self.max_pending:
            self.stats.rejected += 1
            raise OverloadedError(
                f"server overloaded: {self._pending} sentences pending "
                f"(cap {self.max_pending})"
            )
        self._pending += n

    def release(self, n: int) -> None:
        self._pending -= n

    def index_texts(self, texts: list[str]) -> int:
        if self.index is None:
            # double-checked under a lock: two concurrent first index frames
            # run on separate executor threads, and the loser's documents
            # must not land in an orphaned index
            with self._index_init_lock:
                if self.index is None:
                    import jax

                    from .search import VectorIndex

                    if jax.process_count() > 1:
                        # multi-host: corpus shards across every host's
                        # devices; index ops broadcast so followers replay
                        from ..parallel import distributed as dist

                        self.index = dist.make_leader_index(self.engine)
                    else:
                        # dp-shard the corpus over the serving mesh
                        self.index = VectorIndex(
                            self.engine, mesh=self.engine.mesh
                        )
        return self.index.add(texts)

    def search_texts(self, texts: list[str], k: int):
        if self.index is None:
            raise RuntimeError("no index built (send an index frame first)")
        return self.index.search(texts, k)

    def _make_sparse_index(self):
        """Device-backed SparseIndex over the serving mesh; on a multi-host
        runtime the leader variant broadcasts every device op so followers
        replay in SPMD lockstep (parallel/distributed.py)."""
        import jax

        from .sparse_search import SparseIndex

        if jax.process_count() > 1:
            from ..parallel import distributed as dist

            return dist.make_leader_sparse_index(self.engine)
        return SparseIndex(self.engine, mesh=self.engine.mesh)

    def sparse_index_texts(self, texts: list[str]) -> int:
        if self.sparse_index is None:
            with self._index_init_lock:
                if self.sparse_index is None:
                    self.sparse_index = self._make_sparse_index()
        return self.sparse_index.add(texts)

    def sparse_search_texts(self, texts: list[str], k: int,
                            candidates: int | None = None):
        if self.sparse_index is None:
            raise RuntimeError(
                "no sparse index built (POST /v1/sparse_index first)"
            )
        if candidates is not None and (
            self.engine.mesh is not None or not self.sparse_index.device
        ):
            candidates = None  # two-stage mode is single-device; exact
        return self.sparse_index.search(texts, k, candidates=candidates)

    def maxsim_index_texts(self, texts: list[str]) -> int:
        if self.maxsim_index is None:
            with self._index_init_lock:
                if self.maxsim_index is None:
                    from .maxsim_search import MaxSimIndex

                    # MaxSimIndex itself rejects multi-host processes; the
                    # corpus dp-shards over a single-controller mesh
                    self.maxsim_index = MaxSimIndex(
                        self.engine, mesh=self.engine.mesh
                    )
        return self.maxsim_index.add(texts)

    def maxsim_search_texts(self, texts: list[str], k: int,
                            candidates: int | None = None):
        if self.maxsim_index is None:
            raise RuntimeError(
                "no MaxSim index built (send a maxsim_index frame first)"
            )
        if candidates is not None and self.engine.mesh is not None:
            candidates = None  # two-stage mode is single-device; exact
        return self.maxsim_index.search(texts, k, candidates=candidates)

    def hybrid_index_texts(self, texts: list[str]) -> int:
        """Add the same documents to BOTH the dense and the sparse index
        (the hybrid-search corpus contract: identical doc ids).

        Serialized under _hybrid_lock so concurrent calls cannot interleave
        the two adds into different id assignments, and ordered
        fallible-first: the sparse ENCODE (MLM-head check, the likely
        failure) runs before either index mutates, and the sparse APPEND
        (infallible) runs last — a failure leaves both indexes unchanged."""
        with self._hybrid_lock:
            if self.sparse_index is None:
                with self._index_init_lock:
                    if self.sparse_index is None:
                        self.sparse_index = self._make_sparse_index()
            if self.index is not None and (
                len(self.index) != len(self.sparse_index)
            ):
                raise RuntimeError(
                    f"hybrid corpus desync: dense {len(self.index)} != "
                    f"sparse {len(self.sparse_index)} docs (mixed "
                    "/v1/index|/v1/sparse_index and /v1/hybrid_index "
                    "calls?)"
                )
            pairs = self.sparse_index.engine.encode_sparse(
                texts, k=self.sparse_index.k_encode
            )
            total = self.index_texts(texts)
            self.sparse_index.add_vectors(pairs)
            return total

    def hybrid_search_texts(self, texts: list[str], k: int):
        """Dense + sparse retrieval fused by reciprocal rank (rrf_fuse):
        retrieve k candidates from each index, fuse, return the top k."""
        from .sparse_search import rrf_fuse

        if self.index is None or self.sparse_index is None:
            raise RuntimeError(
                "hybrid search needs both indexes (POST /v1/hybrid_index "
                "first)"
            )
        if len(self.index) != len(self.sparse_index):
            raise RuntimeError(
                f"hybrid corpus desync: dense {len(self.index)} != sparse "
                f"{len(self.sparse_index)} docs"
            )
        d_idx, _ = self.index.search(texts, k)
        s_idx, _ = self.sparse_index.search(texts, k)
        return rrf_fuse([np.asarray(d_idx), np.asarray(s_idx)], k)

    async def start(self) -> None:
        self._task = asyncio.create_task(self._run())

    async def stop(self) -> None:
        if self._task:
            self._task.cancel()
            try:
                await self._task
            except asyncio.CancelledError:
                pass

    async def encode(
        self, texts: list[str], prefix: str | None = None
    ) -> np.ndarray:
        return (await self.encode_with_counts(texts, prefix))[0]

    async def encode_with_counts(
        self, texts: list[str], prefix: str | None = None,
        truncate: bool = True,
    ) -> tuple[np.ndarray, list[int]]:
        """encode() plus per-text token counts from the same tokenization
        pass (lets /v1/embeddings fill its usage field without
        re-tokenizing the request).

        prefix: resolved prompt prefix for THIS request (None = the
        engine's default prompt).  Applied here, before micro-batching,
        because one merged batch can carry requests with different
        prompts; _run_batch then encodes with the prompt disabled."""
        if prefix is None:
            prefix = self.engine.resolve_prompt()
        if prefix:
            texts = [prefix + t for t in texts]
        if not truncate:
            # strict mode: surface over-length inputs as THIS request's
            # error before the texts merge into a shared device batch
            # (double tokenization, but only on explicit truncate=false)
            await asyncio.get_running_loop().run_in_executor(
                None,
                lambda: self.engine.tokenize_batch(texts, truncate=False),
            )
        self.try_reserve(len(texts))
        try:
            fut = asyncio.get_running_loop().create_future()
            await self.queue.put((texts, fut))
            return await fut
        finally:
            self.release(len(texts))

    async def _run(self) -> None:
        # pipeline depth 2: the engine holds its lock only through
        # planning/dispatch (fetches drain outside it — engine.embed_tokens),
        # so batch N+1's dispatch overlaps batch N's device->host fetch.
        # Depth beyond 2 only adds queueing: the device serializes compute
        # and the link serializes fetches.
        sem = asyncio.Semaphore(2)
        inflight: set[asyncio.Task] = set()
        try:
            while True:
                texts, fut = await self.queue.get()
                jobs = [(texts, fut)]
                total = len(texts)
                # micro-batching window: gather more work while waiting on
                # the pipeline slot (the device is busy anyway)
                deadline = asyncio.get_running_loop().time() + self.window
                while total < self.max_batch:
                    timeout = deadline - asyncio.get_running_loop().time()
                    if timeout <= 0:
                        break
                    try:
                        t, f = await asyncio.wait_for(
                            self.queue.get(), timeout
                        )
                        jobs.append((t, f))
                        total += len(t)
                    except asyncio.TimeoutError:
                        break
                await sem.acquire()
                task = asyncio.create_task(self._run_batch(jobs, total, sem))
                inflight.add(task)
                task.add_done_callback(inflight.discard)
        finally:
            for task in inflight:
                task.cancel()

    async def _run_batch(self, jobs, total: int, sem: asyncio.Semaphore):
        flat: list[str] = []
        for t, _ in jobs:
            flat.extend(t)
        try:
            vecs, counts = await asyncio.get_running_loop().run_in_executor(
                None,
                # prompts were applied per-request at enqueue time
                # (encode_with_counts prefix) — prompt="" stops the
                # engine's default from being applied a second time
                lambda: self.engine.encode_with_counts(flat, prompt=""),
            )
            off = 0
            for t, f in jobs:
                if not f.cancelled():
                    f.set_result(
                        (vecs[off : off + len(t)], counts[off : off + len(t)])
                    )
                off += len(t)
            self.stats.batches += 1
            self.stats.sentences += total
        except Exception as e:  # propagate to all waiters
            self.stats.errors += 1
            for _, f in jobs:
                if not f.cancelled():
                    f.set_exception(e)
        finally:
            sem.release()


async def _read_exactly(reader: asyncio.StreamReader, n: int) -> bytes:
    return await reader.readexactly(n)


_MAGICS = (MAGIC, MAGIC_STATS, MAGIC_HEALTH, MAGIC_TOKENIZE, MAGIC_EVAL,
           MAGIC_META, MAGIC_VOCAB, MAGIC_ENCODE_I8, MAGIC_INDEX,
           MAGIC_SEARCH, MAGIC_RERANK, MAGIC_SPARSE, MAGIC_MAXSIM,
           MAGIC_SPARSE_INDEX, MAGIC_SPARSE_SEARCH, MAGIC_HYBRID_INDEX,
           MAGIC_HYBRID_SEARCH, MAGIC_MAXSIM_INDEX, MAGIC_MAXSIM_SEARCH)


def _quantize_i8_np(vecs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-vector symmetric int8 for the wire (codes, scales) — the host
    analog of models.bert.quantize_output_i8."""
    amax = np.max(np.abs(vecs), axis=-1)
    scale = (amax / 127.0).astype(np.float32)
    q = np.round(vecs / np.maximum(scale, 1e-20)[:, None]).astype(np.int8)
    return q, scale


async def _read_head(reader: asyncio.StreamReader) -> bytes:
    """Accumulate the 4-byte frame head across TCP segment boundaries.

    A bare `read(4)` may legally return 1-3 bytes, so a framed client whose
    magic straddles segments would be misparsed as raw-mode text — the exact
    framing-bug class the reference's protocol suffers from (one read == one
    message, server.cpp:26-34).  Keep reading while the bytes so far are
    still a prefix of some magic; return early the moment they cannot be one,
    so raw-mode texts are served without waiting for a 4th byte.  (A raw text
    of 1-3 bytes that IS a magic prefix — "T", "TP", "TPE" — blocks until
    more bytes arrive: unavoidable ambiguity of the unframed legacy mode,
    same as before this accumulation existed.)
    """
    head = b""
    while len(head) < 4:
        chunk = await reader.read(4 - len(head))
        if not chunk:
            return head  # EOF (possibly mid-head)
        head += chunk
        if not any(m.startswith(head) for m in _MAGICS):
            return head  # cannot be a frame head: raw mode
    return head


async def _read_texts(reader) -> list[str]:
    (count,) = struct.unpack("<I", await _read_exactly(reader, 4))
    _check(count <= MAX_ITEMS, f"count {count}")
    texts = []
    total = 0
    for _ in range(count):
        (ln,) = struct.unpack("<I", await _read_exactly(reader, 4))
        _check(ln <= MAX_TEXT_BYTES, f"text length {ln}")
        total += ln
        _check(total <= MAX_REQUEST_BYTES, f"request payload {total}")
        texts.append((await _read_exactly(reader, ln)).decode("utf-8"))
    return texts


def _error_frame(writer, e: Exception) -> None:
    # request-level failure isolation (count=0xFFFFFFFF | u32 len | message);
    # the connection stays usable — unlike the reference, which dies with
    # the socket (SURVEY §5 failure handling)
    msg = f"{type(e).__name__}: {e}".encode("utf-8")[:4096]
    writer.write(struct.pack("<I", 0xFFFFFFFF))
    writer.write(struct.pack("<I", len(msg)) + msg)


async def handle_client(
    reader: asyncio.StreamReader,
    writer: asyncio.StreamWriter,
    batcher: ContinuousBatcher,
    n_embd: int,
) -> None:
    batcher.stats.connections += 1

    async def _request_failed(e: Exception) -> None:
        # per-request failure isolation: error frame, connection stays up
        _error_frame(writer, e)
        await writer.drain()
        batcher.stats.requests += 1

    try:
        # handshake: n_embd as raw int32 (server.cpp:107)
        writer.write(struct.pack("<i", n_embd))
        await writer.drain()
        while True:
            head = await _read_head(reader)
            if not head:
                break
            t_req = time.perf_counter()
            if head == MAGIC_STATS:
                from ..utils.metrics import GLOBAL as metrics

                snap = metrics.snapshot()
                snap["server"] = batcher.stats.as_dict()
                payload = json.dumps(snap).encode("utf-8")
                writer.write(struct.pack("<I", len(payload)) + payload)
            elif head == MAGIC_HEALTH:
                writer.write(struct.pack("<I", 2) + b"ok")
            elif head == MAGIC_META:
                engine = batcher.engine
                meta = {
                    "n_embd": n_embd,
                    "n_max_tokens": getattr(engine, "n_max_tokens", 0),
                    "name": getattr(
                        getattr(engine, "config", None), "name", ""
                    ),
                }
                payload = json.dumps(meta).encode("utf-8")
                writer.write(struct.pack("<I", len(payload)) + payload)
            elif head == MAGIC_VOCAB:
                (tok_id,) = struct.unpack("<I", await _read_exactly(reader, 4))
                try:
                    tok = batcher.engine.id_to_token(int(tok_id)).encode("utf-8")
                except (KeyError, IndexError, OverflowError):
                    tok = b""  # unknown id — empty token, like the reference
                except Exception as e:
                    # real engine failure: visible in stats + error frame,
                    # not silently an empty token
                    batcher.stats.errors += 1
                    await _request_failed(e)
                    continue
                writer.write(struct.pack("<I", len(tok)) + tok)
            elif head == MAGIC_TOKENIZE:
                texts = await _read_texts(reader)
                loop = asyncio.get_running_loop()
                try:
                    id_lists = await loop.run_in_executor(
                        None, batcher.engine.tokenize_batch, texts
                    )
                except Exception as e:
                    await _request_failed(e)
                    continue
                writer.write(struct.pack("<I", len(id_lists)))
                for ids in id_lists:
                    writer.write(struct.pack("<I", len(ids)))
                    writer.write(
                        np.asarray(ids, dtype=np.int32).tobytes()
                    )
            elif head == MAGIC_EVAL:
                (count,) = struct.unpack("<I", await _read_exactly(reader, 4))
                _check(count <= MAX_ITEMS, f"count {count}")
                id_lists = []
                total = 0
                for _ in range(count):
                    (k,) = struct.unpack("<I", await _read_exactly(reader, 4))
                    _check(k <= MAX_IDS, f"id count {k}")
                    total += k
                    _check(total <= MAX_REQUEST_IDS, f"request ids {total}")
                    raw = await _read_exactly(reader, 4 * k)
                    id_lists.append(np.frombuffer(raw, np.int32).tolist())
                loop = asyncio.get_running_loop()
                try:
                    vecs = await loop.run_in_executor(
                        None, batcher.engine.embed_tokens, id_lists
                    )
                except Exception as e:
                    await _request_failed(e)
                    continue
                writer.write(struct.pack("<I", len(vecs)))
                writer.write(np.ascontiguousarray(vecs, np.float32).tobytes())
            elif head == MAGIC_INDEX:
                texts = await _read_texts(reader)
                loop = asyncio.get_running_loop()
                try:
                    # index embedding runs on an executor thread, bypassing
                    # encode()'s queue — apply the same admission control
                    batcher.try_reserve(len(texts))
                    try:
                        total = await loop.run_in_executor(
                            None, batcher.index_texts, texts
                        )
                    finally:
                        batcher.release(len(texts))
                except Exception as e:
                    await _request_failed(e)
                    continue
                writer.write(struct.pack("<I", total))
            elif head == MAGIC_SEARCH:
                (k,) = struct.unpack("<I", await _read_exactly(reader, 4))
                _check(0 < k <= MAX_TOPK, f"top-k {k}")
                texts = await _read_texts(reader)
                loop = asyncio.get_running_loop()
                try:
                    batcher.try_reserve(len(texts))
                    try:
                        idx, scores = await loop.run_in_executor(
                            None, batcher.search_texts, texts, int(k)
                        )
                    finally:
                        batcher.release(len(texts))
                except Exception as e:
                    await _request_failed(e)
                    continue
                writer.write(struct.pack("<II", idx.shape[0], idx.shape[1]))
                writer.write(np.ascontiguousarray(idx, np.int32).tobytes())
                writer.write(
                    np.ascontiguousarray(scores, np.float32).tobytes()
                )
            elif head == MAGIC_RERANK:
                (top_n,) = struct.unpack("<I", await _read_exactly(reader, 4))
                _check(top_n <= MAX_ITEMS, f"top_n {top_n}")
                (qlen,) = struct.unpack("<I", await _read_exactly(reader, 4))
                _check(0 < qlen <= MAX_TEXT_BYTES, f"query length {qlen}")
                query = (await _read_exactly(reader, qlen)).decode("utf-8")
                docs = await _read_texts(reader)
                loop = asyncio.get_running_loop()
                try:
                    _check(len(docs) > 0, "no documents")
                    # scoring runs on an executor thread, bypassing
                    # encode()'s queue — same admission control as index
                    batcher.try_reserve(len(docs))
                    try:
                        ranked = await loop.run_in_executor(
                            None,
                            lambda: batcher.engine.rerank(
                                query, docs,
                                top_n=int(top_n) if top_n else None,
                            ),
                        )
                    finally:
                        batcher.release(len(docs))
                except Exception as e:
                    await _request_failed(e)
                    continue
                writer.write(struct.pack("<I", len(ranked)))
                writer.write(np.asarray(
                    [r["index"] for r in ranked], np.int32).tobytes())
                writer.write(np.asarray(
                    [r["relevance_score"] for r in ranked],
                    np.float32).tobytes())
            elif head in (MAGIC_SPARSE_INDEX, MAGIC_HYBRID_INDEX,
                          MAGIC_MAXSIM_INDEX):
                texts = await _read_texts(reader)
                fn = {MAGIC_SPARSE_INDEX: batcher.sparse_index_texts,
                      MAGIC_HYBRID_INDEX: batcher.hybrid_index_texts,
                      MAGIC_MAXSIM_INDEX: batcher.maxsim_index_texts}[head]
                loop = asyncio.get_running_loop()
                try:
                    batcher.try_reserve(len(texts))
                    try:
                        total = await loop.run_in_executor(None, fn, texts)
                    finally:
                        batcher.release(len(texts))
                except Exception as e:
                    await _request_failed(e)
                    continue
                writer.write(struct.pack("<I", total))
            elif head in (MAGIC_SPARSE_SEARCH, MAGIC_HYBRID_SEARCH,
                          MAGIC_MAXSIM_SEARCH):
                (k,) = struct.unpack("<I", await _read_exactly(reader, 4))
                _check(0 < k <= MAX_TOPK, f"top-k {k}")
                texts = await _read_texts(reader)
                fn = {MAGIC_SPARSE_SEARCH: batcher.sparse_search_texts,
                      MAGIC_HYBRID_SEARCH: batcher.hybrid_search_texts,
                      MAGIC_MAXSIM_SEARCH: batcher.maxsim_search_texts}[head]
                loop = asyncio.get_running_loop()
                try:
                    batcher.try_reserve(len(texts))
                    try:
                        idx, scores = await loop.run_in_executor(
                            None, fn, texts, int(k)
                        )
                    finally:
                        batcher.release(len(texts))
                except Exception as e:
                    await _request_failed(e)
                    continue
                writer.write(struct.pack("<II", idx.shape[0], idx.shape[1]))
                writer.write(np.ascontiguousarray(idx, np.int32).tobytes())
                writer.write(
                    np.ascontiguousarray(scores, np.float32).tobytes()
                )
            elif head == MAGIC_SPARSE:
                (k,) = struct.unpack("<I", await _read_exactly(reader, 4))
                _check(0 < k <= MAX_SPARSE_K, f"sparse k {k}")
                texts = await _read_texts(reader)
                loop = asyncio.get_running_loop()
                try:
                    batcher.try_reserve(len(texts))
                    try:
                        pairs = await loop.run_in_executor(
                            None,
                            lambda: batcher.engine.encode_sparse(
                                texts, k=int(k)
                            ),
                        )
                    finally:
                        batcher.release(len(texts))
                except Exception as e:
                    await _request_failed(e)
                    continue
                writer.write(struct.pack("<I", len(pairs)))
                for idx, val in pairs:
                    writer.write(struct.pack("<I", len(idx)))
                    writer.write(np.ascontiguousarray(idx, np.int32).tobytes())
                    writer.write(
                        np.ascontiguousarray(val, np.float32).tobytes()
                    )
            elif head == MAGIC_MAXSIM:
                (top_n,) = struct.unpack("<I", await _read_exactly(reader, 4))
                _check(top_n <= MAX_ITEMS, f"top_n {top_n}")
                (qlen,) = struct.unpack("<I", await _read_exactly(reader, 4))
                _check(0 < qlen <= MAX_TEXT_BYTES, f"query length {qlen}")
                query = (await _read_exactly(reader, qlen)).decode("utf-8")
                docs = await _read_texts(reader)
                loop = asyncio.get_running_loop()
                try:
                    _check(len(docs) > 0, "no documents")
                    batcher.try_reserve(len(docs))
                    try:
                        ranked = await loop.run_in_executor(
                            None,
                            lambda: batcher.engine.maxsim_rerank(
                                query, docs,
                                top_n=int(top_n) if top_n else None,
                            ),
                        )
                    finally:
                        batcher.release(len(docs))
                except Exception as e:
                    await _request_failed(e)
                    continue
                writer.write(struct.pack("<I", len(ranked)))
                writer.write(np.asarray(
                    [r["index"] for r in ranked], np.int32).tobytes())
                writer.write(np.asarray(
                    [r["relevance_score"] for r in ranked],
                    np.float32).tobytes())
            elif head == MAGIC or head == MAGIC_ENCODE_I8:
                texts = await _read_texts(reader)
                try:
                    vecs = await batcher.encode(texts)
                except Exception as e:
                    await _request_failed(e)
                    continue
                writer.write(struct.pack("<I", len(vecs)))
                if head == MAGIC_ENCODE_I8:
                    q, scale = _quantize_i8_np(np.asarray(vecs, np.float32))
                    writer.write(scale.tobytes())
                    writer.write(q.tobytes())
                else:
                    writer.write(
                        np.ascontiguousarray(vecs, np.float32).tobytes()
                    )
            else:
                # raw mode: one read == one message (reference semantics).
                # The unframed protocol has no error representation — on
                # failure (incl. backpressure) the connection drops, exactly
                # how the reference's server dies on any error
                rest = await reader.read(RAW_CHUNK - len(head))
                text = (head + rest).decode("utf-8", errors="replace")
                try:
                    vecs = await batcher.encode([text])
                except Exception:
                    batcher.stats.errors += 1
                    break
                writer.write(np.ascontiguousarray(vecs[0], np.float32).tobytes())
            batcher.stats.requests += 1
            batcher.stats.record_latency(time.perf_counter() - t_req)
            await writer.drain()
    except ProtocolError as e:
        # stream is desynchronized: report once, then drop the connection
        try:
            _error_frame(writer, e)
            await writer.drain()
        except Exception:
            pass
        batcher.stats.errors += 1
    except (asyncio.IncompleteReadError, ConnectionResetError):
        pass
    finally:
        writer.close()
        try:
            await writer.wait_closed()
        except Exception:
            pass


async def serve(engine, host: str = "0.0.0.0", port: int = 8080,
                max_batch: int = 256, window_ms: float = 2.0,
                ready_event: asyncio.Event | None = None,
                max_pending: int = 16384, http_port: int | None = None,
                extra_engines: dict | None = None,
                model_name: str | None = None):
    """`extra_engines` ({name: Engine}) serves additional models over the
    HTTP surface (requests route by their `model` field); the TCP protocol
    always speaks to the default `engine`.  `model_name` overrides the
    default model's advertised name (else the GGUF config name)."""
    batcher = ContinuousBatcher(engine, max_batch, window_ms,
                                max_pending=max_pending)
    await batcher.start()
    registry: dict = {}
    for name, eng in (extra_engines or {}).items():
        registry[name] = ContinuousBatcher(eng, max_batch, window_ms,
                                           max_pending=max_pending)
        await registry[name].start()
    server = await asyncio.start_server(
        lambda r, w: handle_client(r, w, batcher, engine.n_embd), host, port
    )
    http_server = None
    if http_port is not None:
        # HTTP/JSON surface over the SAME batcher: TCP and HTTP requests
        # merge into shared device batches (runtime/http_server.py)
        from .http_server import _model_name, handle_http

        served_name = model_name or _model_name(engine)
        http_server = await asyncio.start_server(
            lambda r, w: handle_http(r, w, batcher, served_name,
                                     registry=registry),
            host, http_port,
        )
        print(f"http server listening on {host}:{http_port} "
              f"(POST /v1/embeddings)", file=sys.stderr)
    if ready_event is not None:
        ready_event.set()
    print(f"server listening on {host}:{port} (n_embd={engine.n_embd})",
          file=sys.stderr)
    try:
        async with server:
            if http_server is not None:
                async with http_server:
                    await asyncio.gather(server.serve_forever(),
                                         http_server.serve_forever())
            else:
                await server.serve_forever()
    finally:
        await batcher.stop()
        for b in registry.values():
            await b.stop()


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-m", "--model", required=True, action="append",
                   help="GGUF path, or NAME=PATH; repeat to serve several "
                        "models (the first is the default and the only one "
                        "on the TCP protocol; HTTP requests route by their "
                        "'model' field)")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--dtype", choices=["float32", "bfloat16"], default="bfloat16")
    p.add_argument("--output-dtype",
                   choices=["float32", "float16", "bfloat16", "int8"],
                   default="int8",
                   help="embedding transfer dtype off the device; int8 "
                        "(packed codes+scale, default) measured 1.47x f32 "
                        "throughput at cosine-vs-f32 ~0.9999 "
                        "(benchmarks/results/transfer_ab_v5e.json).  Wire "
                        "replies stay f32 regardless (unpacked host-side; "
                        "clients opt into int8 WIRE compression via "
                        "\\x01TP8); --output-dtype float32 restores "
                        "bit-exact f32 transfer")
    p.add_argument("--packing", choices=["auto", "always", "never"],
                   default="auto", help="sequence packing policy")
    p.add_argument("--max-batch", type=int, default=256)
    p.add_argument("--window-ms", type=float, default=2.0)
    p.add_argument("--max-pending", type=int, default=16384,
                   help="backpressure cap on admitted-but-unserved sentences "
                        "(overload requests get error frames)")
    p.add_argument("--http-port", type=int, default=None,
                   help="also serve HTTP/JSON (OpenAI-compatible "
                        "POST /v1/embeddings) on this port, sharing the "
                        "same continuous batcher")
    p.add_argument("--dp", type=int, default=0,
                   help="data-parallel mesh size (0 = single device)")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel mesh size (Megatron sharding)")
    from ..parallel import distributed as dist

    dist.add_args(p)
    args = p.parse_args()

    # multi-host: join the JAX distributed system before any device work;
    # jax.devices() then spans every process (SURVEY §2.4 comm backend)
    multihost = dist.init_from_args(args)

    from ..models.bert import ComputeOptions
    from .engine import Engine

    mesh = None
    if args.dp or args.tp > 1 or multihost:
        import jax

        from ..parallel.mesh import make_mesh

        n_dev = len(jax.devices())
        if args.tp > n_dev:
            p.error(f"--tp {args.tp} exceeds the {n_dev} available device(s)")
        dp = args.dp or (n_dev // args.tp)
        if dp < 1 or dp * args.tp > n_dev:
            p.error(f"mesh dp={dp} x tp={args.tp} needs {dp * args.tp} "
                    f"devices, have {n_dev}")
        mesh = make_mesh(dp=dp, tp=args.tp,
                         devices=jax.devices()[: dp * args.tp])
    # -m may repeat (NAME=PATH); the first is the default/TCP model, the
    # rest serve over HTTP only (single-process: the leader-follower plane
    # only replays the default engine's dispatches)
    specs = []
    for item in args.model:
        name, sep, path = item.partition("=")
        specs.append((name if sep else None, path if sep else item))
    if multihost and len(specs) > 1:
        p.error("multi-model serving is single-process only")
    if len(specs) > 1 and args.http_port is None:
        p.error("serving several models requires --http-port "
                "(extra models are HTTP-routed by their 'model' field)")
    opts = ComputeOptions(dtype=args.dtype, output_dtype=args.output_dtype)
    engine = Engine.from_gguf(
        specs[0][1], opts=opts, packing=args.packing, mesh=mesh,
    )
    engine.warmup()  # all processes warm identically (SPMD lockstep)
    extra_engines = {}
    for name, path in specs[1:]:
        eng = Engine.from_gguf(path, opts=opts, packing=args.packing)
        eng.warmup()
        key = name or getattr(eng.config, "name", "") or path
        extra_engines[key] = eng
    if multihost:
        import jax

        if jax.process_index() == 0:
            # leader: owns the client sockets; every device dispatch is
            # broadcast to the followers first (see parallel/distributed.py).
            # SIGTERM must unwind (not kill) so the finally releases the
            # followers from their blocking broadcast.
            import signal

            def _terminate(signum, frame):
                raise SystemExit(0)

            signal.signal(signal.SIGTERM, _terminate)
            dist.make_leader(engine)
            try:
                asyncio.run(serve(engine, args.host, args.port,
                                  args.max_batch, args.window_ms,
                                  max_pending=args.max_pending,
                                  http_port=args.http_port))
            finally:
                dist.broadcast_stop()
        else:
            print(f"follower process {jax.process_index()} "
                  f"of {jax.process_count()} ready", file=sys.stderr)
            dist.follower_loop(engine)
        return
    asyncio.run(serve(engine, args.host, args.port, args.max_batch,
                      args.window_ms, max_pending=args.max_pending,
                      http_port=args.http_port,
                      extra_engines=extra_engines,
                      model_name=specs[0][0]))


if __name__ == "__main__":
    # `python -m ...runtime.server` executes this file as `__main__`, which
    # would otherwise define a SECOND OverloadedError/ContinuousBatcher class
    # distinct from the ones http_server imports via `.server` — isinstance
    # checks across the two copies silently fail (observed: overload 429s
    # surfacing as 500s).  Run the canonical module's main instead.
    from embedding_cpp_tpu.runtime.server import main as _canonical_main

    _canonical_main()
