"""Minimal HTTP/1.1 embedding endpoint over the continuous batcher.

The reference serves raw TCP only (examples/server.cpp).  This module adds
the serving surface modern clients expect — an OpenAI-compatible
`POST /v1/embeddings` — without any new dependencies: a small hand-rolled
asyncio HTTP server that shares the SAME ContinuousBatcher (and therefore
the same device batches) as the TCP protocol.

    POST /v1/embeddings   {"input": "text" | ["texts"...],
                           "encoding_format": "float" (default) | "base64",
                           "dimensions": N (optional: truncate to the first
                           N components and re-L2-normalize, OpenAI
                           Matryoshka semantics),
                           "prompt_name": name | "prompt": "prefix "
                           (optional: sentence-transformers prompt prefix —
                           named from the model's converted prompts, or a
                           literal; absent = the model's default prompt),
                           "truncate": true (default; false = 400 on inputs
                           past the model context instead of silent cut)}
      -> {"object": "list", "data": [{"object": "embedding", "index": i,
          "embedding": [...]}], "model": ..., "usage": {...}}
    POST /v1/tokenize     {"input": "text" | ["texts"...]}
                          -> {"ids": [[...]], "tokens": [[...]]}
    POST /v1/token_embeddings {"input": ...}
      -> {"data": [{"index": i, "embeddings": [[...] per token]}]}
                          (per-token final hidden states — the
                          late-interaction surface; no pooling/prompts)
    POST /v1/index        {"input": ["texts"...]} -> {"total": N}
                          (embed into the on-device vector index; applies
                          the model's document/passage prompt if declared)
    POST /v1/search       {"input": ["queries"...], "k": 10}
      -> {"results": [[{"index": id, "score": s}, ...k], ...]}
                          (top-k over the index; vectors never leave HBM;
                          applies the model's query prompt if declared)
    POST /v1/rerank       {"query": "...", "documents": ["texts"...],
                           "top_n": N, "return_documents": false}
      -> {"results": [{"index": i, "relevance_score": s}, ...]}
                          (cross-encoder scoring; needs a model converted
                          from a *ForSequenceClassification checkpoint)
    POST /v1/maxsim       same payload/response as /v1/rerank
                          (late-interaction MaxSim over token states —
                          works with any encoder, no head required)
    POST /v1/maxsim_index  {"input": ["texts"...]} -> {"total": N}
                          (documents' token states into the on-device
                          late-interaction index)
    POST /v1/maxsim_search {"input": ["queries"...], "k": 10,
                            "candidates": 256}  # optional two-stage mode
      -> {"results": [[{"index": id, "score": s}, ...k], ...]}
                          (batched MaxSim top-k over resident token states)
    POST /v1/sparse_embeddings {"input": ..., "k": 256,
                                "return_tokens": false}
      -> {"data": [{"index": i, "indices": [...], "values": [...]}]}
                          (SPLADE sparse lexical vectors; needs an
                          MLM-head model, e.g. naver/splade-*)
    POST /v1/sparse_index  {"input": ["texts"...]} -> {"total": N}
    POST /v1/sparse_search {"input": ["queries"...], "k": 10,
                            "candidates": 256}  # optional two-stage mode
      -> {"results": [[{"index": id, "score": s}, ...k], ...]}
                          (exact sparse dot-product top-k, on-device padded COO)
    POST /v1/hybrid_index  {"input": ["texts"...]} -> {"total": N}
                          (adds to BOTH the dense and sparse indexes)
    POST /v1/hybrid_search {"input": ["queries"...], "k": 10}
      -> dense + sparse retrieval fused by reciprocal rank (RRF c=60)
    GET  /healthz         -> 200 "ok"
    GET  /metrics         -> JSON metrics snapshot (same payload as TPES)
    GET  /v1/models       -> model listing

Run standalone (`python -m embedding_cpp_tpu.runtime.http_server -m m.gguf`)
or alongside the TCP server (`runtime.server --http-port 8081`).
"""
from __future__ import annotations

import asyncio
import base64
import json
import sys

import numpy as np

MAX_HEADER = 64 << 10


def _caps():
    """The TCP protocol's request caps, shared so the two surfaces can
    never drift apart (imported lazily to avoid a circular import)."""
    from . import server as _srv

    return _srv.MAX_REQUEST_BYTES, _srv.MAX_ITEMS, _srv.MAX_TOPK


def _model_name(engine) -> str:
    return getattr(getattr(engine, "config", None), "name", "") or \
        "embedding-model"


class HttpError(Exception):
    def __init__(self, status: int, message: str):
        super().__init__(message)
        self.status = status


_STATUS_TEXT = {200: "OK", 400: "Bad Request", 404: "Not Found",
                405: "Method Not Allowed", 413: "Payload Too Large",
                429: "Too Many Requests", 500: "Internal Server Error"}


def _response(status: int, body: bytes, content_type: str = "application/json",
              keep_alive: bool = True) -> bytes:
    head = (
        f"HTTP/1.1 {status} {_STATUS_TEXT.get(status, 'OK')}\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n"
        f"Connection: {'keep-alive' if keep_alive else 'close'}\r\n"
        "\r\n"
    )
    return head.encode("ascii") + body


def _json_response(status: int, obj) -> bytes:
    return _response(status, json.dumps(obj).encode("utf-8"))


def _error_response(status: int, message: str) -> bytes:
    return _json_response(
        status, {"error": {"message": message, "type": "invalid_request_error"
                           if status < 500 else "server_error"}}
    )


async def _read_request(reader: asyncio.StreamReader):
    """-> (method, path, headers, body) or None on clean EOF."""
    try:
        request_line = await reader.readline()
    except (asyncio.LimitOverrunError, ValueError):
        raise HttpError(400, "request line too long")
    if not request_line:
        return None
    parts = request_line.decode("latin-1").strip().split()
    if len(parts) != 3:
        raise HttpError(400, "malformed request line")
    method, path, _version = parts
    headers = {}
    total = 0
    while True:
        try:
            line = await reader.readline()
        except (asyncio.LimitOverrunError, ValueError):
            raise HttpError(400, "header line too long")
        total += len(line)
        if total > MAX_HEADER:
            raise HttpError(400, "headers too large")
        if line in (b"\r\n", b"\n", b""):
            break
        if b":" in line:
            k, _, v = line.decode("latin-1").partition(":")
            k = k.strip().lower()
            if k == "content-length" and k in headers:
                # RFC 7230 §3.3.2: conflicting Content-Length values must be
                # rejected — last-wins parsing behind a first-wins proxy is a
                # request-smuggling vector
                raise HttpError(400, "duplicate content-length header")
            headers[k] = v.strip()
    if "chunked" in headers.get("transfer-encoding", "").lower():
        raise HttpError(400, "chunked transfer encoding not supported")
    try:
        length = int(headers.get("content-length", "0") or "0")
    except ValueError:
        raise HttpError(400, "malformed content-length")
    if length < 0:
        raise HttpError(400, "malformed content-length")
    max_body = _caps()[0]
    if length > max_body:
        raise HttpError(413, f"body too large ({length} bytes)")
    body = await reader.readexactly(length) if length else b""
    return method, path, headers, body


def _parse_embed_request(body: bytes):
    """-> (texts, encoding_format, payload dict); enforces the same
    per-request caps as the TCP frames (item count, body bytes)."""
    try:
        payload = json.loads(body or b"{}")
    except json.JSONDecodeError as e:
        raise HttpError(400, f"invalid JSON: {e}")
    if not isinstance(payload, dict):
        raise HttpError(400, "body must be a JSON object")
    texts = payload.get("input")
    if isinstance(texts, str):
        texts = [texts]
    if (
        not isinstance(texts, list)
        or not texts
        or not all(isinstance(t, str) for t in texts)
    ):
        raise HttpError(400, "'input' must be a string or list of strings")
    max_items = _caps()[1]
    if len(texts) > max_items:
        raise HttpError(413, f"too many inputs ({len(texts)} > {max_items})")
    fmt = payload.get("encoding_format", "float")
    if fmt not in ("float", "base64"):
        raise HttpError(400, "encoding_format must be 'float' or 'base64'")
    return texts, fmt, payload


def _parse_dimensions(payload, n_embd: int) -> int | None:
    """OpenAI `dimensions`: truncate + re-L2-normalize.  None if absent."""
    dims = payload.get("dimensions")
    if dims is None:
        return None
    if not isinstance(dims, int) or isinstance(dims, bool) \
            or not 1 <= dims <= n_embd:
        raise HttpError(400, f"dimensions must be an integer in 1..{n_embd}")
    return dims


def _parse_rerank_request(body) -> tuple[str, list, int | None, dict]:
    """Shared /v1/rerank + /v1/maxsim payload validation ->
    (query, documents, top_n, payload)."""
    try:
        payload = json.loads(body or b"{}")
    except json.JSONDecodeError as e:
        raise HttpError(400, f"invalid JSON: {e}")
    if not isinstance(payload, dict):
        raise HttpError(400, "body must be a JSON object")
    query = payload.get("query")
    docs = payload.get("documents")
    if not isinstance(query, str) or not query:
        raise HttpError(400, "'query' must be a string")
    if (
        not isinstance(docs, list)
        or not docs
        or not all(isinstance(d, str) for d in docs)
    ):
        raise HttpError(400, "'documents' must be a list of strings")
    max_items = _caps()[1]
    if len(docs) > max_items:
        raise HttpError(
            413, f"too many documents ({len(docs)} > {max_items})"
        )
    top_n = payload.get("top_n")
    if top_n is not None and (
        not isinstance(top_n, int) or isinstance(top_n, bool) or top_n < 1
    ):
        raise HttpError(400, "top_n must be a positive integer")
    return query, docs, top_n, payload


def _parse_k(payload, default: int = 10, cap: int | None = None) -> int:
    cap = _caps()[2] if cap is None else cap
    k = payload.get("k", default)
    if not isinstance(k, int) or isinstance(k, bool) or not 0 < k <= cap:
        raise HttpError(400, f"k must be an integer in 1..{cap}")
    return k


async def handle_http(reader, writer, batcher, model_name: str,
                      registry: dict | None = None) -> None:
    """`registry` maps model name -> ContinuousBatcher for multi-model
    serving; the `model` field of a request routes to its batcher (absent or
    unknown-with-single-model falls back to the default `batcher`)."""
    import time

    from .server import OverloadedError

    registry = registry or {}

    def pick(payload) -> tuple:
        """-> (batcher, model_name) for this request's `model` field.
        Any non-matching name is a 404 even with a single model configured —
        silently serving the default would hand a client embeddings from the
        wrong model."""
        want = payload.get("model")
        if want is None or want == model_name:
            return batcher, model_name
        if want in registry:
            return registry[want], want
        known = ", ".join(sorted({model_name, *registry}))
        raise HttpError(404, f"unknown model {want!r} (serving: {known})")

    batcher.stats.connections += 1
    try:
        while True:
            try:
                req = await _read_request(reader)
            except HttpError as e:
                # closing after this response: say so in the header
                writer.write(_error_response(e.status, str(e))
                             .replace(b"keep-alive", b"close", 1))
                await writer.drain()
                break
            except (asyncio.IncompleteReadError, ConnectionResetError):
                break
            if req is None:
                break
            method, path, headers, body = req
            t_req = time.perf_counter()
            req_batcher = batcher  # model routes reassign to their batcher
            try:
                if path == "/healthz":
                    out = _response(200, b"ok", "text/plain")
                elif path == "/metrics":
                    from ..utils.metrics import GLOBAL as metrics

                    snap = metrics.snapshot()
                    snap["server"] = batcher.stats.as_dict()
                    if registry:
                        snap["models"] = {
                            name: b.stats.as_dict()
                            for name, b in registry.items()
                        }
                    out = _json_response(200, snap)
                elif path == "/v1/models":
                    names = sorted({model_name, *registry})
                    out = _json_response(200, {
                        "object": "list",
                        "data": [{"id": n, "object": "model"}
                                 for n in names],
                    })
                elif path == "/v1/tokenize":
                    # HTTP face of the TCP tokenize frame (bert.h:64 over
                    # the wire): framed ids + token strings, no embedding
                    if method != "POST":
                        raise HttpError(405, "POST required")
                    texts, _, payload = _parse_embed_request(body)
                    b, _name = pick(payload)
                    req_batcher = b
                    loop = asyncio.get_running_loop()
                    # tokenization runs on an executor thread — same
                    # --max-pending admission control as index/search/rerank
                    try:
                        b.try_reserve(len(texts))
                    except OverloadedError as e:
                        raise HttpError(429, str(e))
                    try:
                        id_lists = await loop.run_in_executor(
                            None, b.engine.tokenize_batch, texts
                        )
                    finally:
                        b.release(len(texts))
                    out = _json_response(200, {
                        "object": "tokenize",
                        "ids": [[int(i) for i in ids_] for ids_ in id_lists],
                        "tokens": [
                            [b.engine.id_to_token(int(i)) for i in ids_]
                            for ids_ in id_lists
                        ],
                    })
                    b.stats.requests += 1
                elif path == "/v1/token_embeddings":
                    # per-token final hidden states (HF last_hidden_state)
                    # — the late-interaction surface (TEI's /embed_all
                    # analog).  No pooling/normalization/prompts; the
                    # response is ~seq_len times an embedding, so the
                    # request caps do the heavy limiting.
                    if method != "POST":
                        raise HttpError(405, "POST required")
                    texts, _, payload = _parse_embed_request(body)
                    if "dimensions" in payload:
                        raise HttpError(
                            400,
                            "dimensions is not supported on "
                            "/v1/token_embeddings",
                        )
                    b, _name = pick(payload)
                    req_batcher = b
                    loop = asyncio.get_running_loop()
                    try:
                        b.try_reserve(len(texts))
                    except OverloadedError as e:
                        raise HttpError(429, str(e))
                    try:
                        states = await loop.run_in_executor(
                            None, b.engine.encode_token_states, texts
                        )
                    finally:
                        b.release(len(texts))
                    out = _json_response(200, {
                        "object": "token_embeddings",
                        "data": [
                            {
                                "index": i,
                                "object": "token_embedding",
                                "embeddings": s.tolist(),
                            }
                            for i, s in enumerate(states)
                        ],
                        "model": _name,
                    })
                    b.stats.requests += 1
                elif path == "/v1/sparse_embeddings":
                    # SPLADE sparse lexical vectors (Engine.encode_sparse):
                    # {indices, values} pairs per input, optionally with the
                    # vocab terms resolved ("return_tokens": true).  Needs
                    # an MLM-head checkpoint; dense models get a clean 400.
                    if method != "POST":
                        raise HttpError(405, "POST required")
                    texts, _, payload = _parse_embed_request(body)
                    if "dimensions" in payload:
                        raise HttpError(
                            400,
                            "dimensions is not supported on "
                            "/v1/sparse_embeddings",
                        )
                    k = _parse_k(payload, default=256, cap=4096)
                    want_tokens = payload.get("return_tokens", False)
                    if not isinstance(want_tokens, bool):
                        raise HttpError(400, "return_tokens must be boolean")
                    b, _name = pick(payload)
                    req_batcher = b
                    if not b.engine.config.mlm_head:
                        raise HttpError(
                            400,
                            f"model {_name!r} has no MLM head (not a SPLADE "
                            "sparse encoder)",
                        )
                    loop = asyncio.get_running_loop()
                    try:
                        b.try_reserve(len(texts))
                    except OverloadedError as e:
                        raise HttpError(429, str(e))
                    try:
                        pairs = await loop.run_in_executor(
                            None, lambda: b.engine.encode_sparse(texts, k=k)
                        )
                    finally:
                        b.release(len(texts))
                    data = []
                    for i, (idx, val) in enumerate(pairs):
                        row = {
                            "object": "sparse_embedding",
                            "index": i,
                            "indices": [int(j) for j in idx],
                            "values": [float(v) for v in val],
                        }
                        if want_tokens:
                            row["tokens"] = [
                                b.engine.id_to_token(int(j)) for j in idx
                            ]
                        data.append(row)
                    out = _json_response(200, {
                        "object": "list",
                        "data": data,
                        "model": _name,
                    })
                    b.stats.requests += 1
                elif path == "/v1/hybrid_index":
                    # add to BOTH the dense and sparse indexes (identical
                    # doc ids — the hybrid-search corpus contract)
                    if method != "POST":
                        raise HttpError(405, "POST required")
                    texts, _, payload = _parse_embed_request(body)
                    b, _name = pick(payload)
                    req_batcher = b
                    if not b.engine.config.mlm_head:
                        raise HttpError(
                            400,
                            f"model {_name!r} has no MLM head (hybrid "
                            "search needs a SPLADE sparse encoder)",
                        )
                    loop = asyncio.get_running_loop()
                    try:
                        b.try_reserve(len(texts))
                    except OverloadedError as e:
                        raise HttpError(429, str(e))
                    try:
                        total = await loop.run_in_executor(
                            None, b.hybrid_index_texts, texts
                        )
                    except RuntimeError as e:
                        raise HttpError(400, str(e))
                    finally:
                        b.release(len(texts))
                    out = _json_response(200, {"object": "hybrid_index",
                                               "total": total})
                    b.stats.requests += 1
                elif path == "/v1/hybrid_search":
                    # dense + sparse retrieval fused by reciprocal rank
                    if method != "POST":
                        raise HttpError(405, "POST required")
                    texts, _, payload = _parse_embed_request(body)
                    k = _parse_k(payload)
                    b, _name = pick(payload)
                    req_batcher = b
                    loop = asyncio.get_running_loop()
                    try:
                        b.try_reserve(len(texts))
                    except OverloadedError as e:
                        raise HttpError(429, str(e))
                    try:
                        idx, scores = await loop.run_in_executor(
                            None, b.hybrid_search_texts, texts, k
                        )
                    except RuntimeError as e:
                        raise HttpError(400, str(e))
                    finally:
                        b.release(len(texts))
                    out = _json_response(200, {
                        "object": "hybrid_search",
                        "results": [
                            [{"index": int(i), "score": float(sc)}
                             for i, sc in zip(row_i, row_s) if i >= 0]
                            for row_i, row_s in zip(idx, scores)
                        ],
                    })
                    b.stats.requests += 1
                elif path == "/v1/sparse_index":
                    # SPLADE corpus building (on-device sparse index,
                    # runtime/sparse_search.py) — the sparse sibling of
                    # /v1/index, same admission control
                    if method != "POST":
                        raise HttpError(405, "POST required")
                    texts, _, payload = _parse_embed_request(body)
                    b, _name = pick(payload)
                    req_batcher = b
                    if not b.engine.config.mlm_head:
                        raise HttpError(
                            400,
                            f"model {_name!r} has no MLM head (not a SPLADE "
                            "sparse encoder)",
                        )
                    loop = asyncio.get_running_loop()
                    try:
                        b.try_reserve(len(texts))
                    except OverloadedError as e:
                        raise HttpError(429, str(e))
                    try:
                        total = await loop.run_in_executor(
                            None, b.sparse_index_texts, texts
                        )
                    except RuntimeError as e:
                        raise HttpError(400, str(e))
                    finally:
                        b.release(len(texts))
                    out = _json_response(200, {"object": "sparse_index",
                                               "total": total})
                    b.stats.requests += 1
                elif path == "/v1/sparse_search":
                    if method != "POST":
                        raise HttpError(405, "POST required")
                    texts, _, payload = _parse_embed_request(body)
                    k = _parse_k(payload)
                    b, _name = pick(payload)
                    req_batcher = b
                    if b.sparse_index is None or len(b.sparse_index) == 0:
                        raise HttpError(
                            400,
                            "no sparse index built (POST /v1/sparse_index "
                            "first)",
                        )
                    loop = asyncio.get_running_loop()
                    try:
                        b.try_reserve(len(texts))
                    except OverloadedError as e:
                        raise HttpError(429, str(e))
                    cand = payload.get("candidates")
                    if cand is not None and (
                        isinstance(cand, bool)
                        or not isinstance(cand, int) or cand < 1
                    ):
                        raise HttpError(400,
                                        "candidates must be a positive int")
                    try:
                        idx, scores = await loop.run_in_executor(
                            None, b.sparse_search_texts, texts, k, cand
                        )
                    finally:
                        b.release(len(texts))
                    # same padding contract as /v1/search: id -1 slots mark
                    # "no result here" (k past the corpus) and are dropped
                    out = _json_response(200, {
                        "object": "sparse_search",
                        "results": [
                            [{"index": int(i), "score": float(sc)}
                             for i, sc in zip(row_i, row_s) if i >= 0]
                            for row_i, row_s in zip(idx, scores)
                        ],
                    })
                    b.stats.requests += 1
                elif path == "/v1/index":
                    if method != "POST":
                        raise HttpError(405, "POST required")
                    texts, _, payload = _parse_embed_request(body)
                    if "dimensions" in payload:
                        # the index stores full-width vectors; silently
                        # ignoring the field would skew every later search
                        raise HttpError(
                            400, "dimensions is not supported on /v1/index"
                        )
                    b, _name = pick(payload)
                    req_batcher = b
                    loop = asyncio.get_running_loop()
                    # index embedding runs on an executor thread, bypassing
                    # ContinuousBatcher.encode — reserve against the same
                    # --max-pending budget (OverloadedError -> 429)
                    try:
                        b.try_reserve(len(texts))
                    except OverloadedError as e:
                        raise HttpError(429, str(e))
                    try:
                        total = await loop.run_in_executor(
                            None, b.index_texts, texts
                        )
                    finally:
                        b.release(len(texts))
                    out = _json_response(200, {"object": "index",
                                               "total": total})
                    b.stats.requests += 1
                elif path == "/v1/search":
                    if method != "POST":
                        raise HttpError(405, "POST required")
                    texts, _, payload = _parse_embed_request(body)
                    if "dimensions" in payload:
                        raise HttpError(
                            400, "dimensions is not supported on /v1/search"
                        )
                    k = _parse_k(payload)
                    b, _name = pick(payload)
                    req_batcher = b
                    if b.index is None or len(b.index) == 0:
                        # client-state error, checked explicitly so genuine
                        # engine failures still surface as 500s
                        raise HttpError(
                            400, "no index built (POST /v1/index first)"
                        )
                    loop = asyncio.get_running_loop()
                    try:
                        b.try_reserve(len(texts))
                    except OverloadedError as e:
                        raise HttpError(429, str(e))
                    try:
                        idx, scores = await loop.run_in_executor(
                            None, b.search_texts, texts, k
                        )
                    finally:
                        b.release(len(texts))
                    # id -1 slots are explicit "no result here" markers (k
                    # clamped past the corpus size, or unfilled approx-mode
                    # bins); their -inf scores are also invalid JSON, so the
                    # row simply carries fewer than k entries
                    out = _json_response(200, {
                        "object": "search",
                        "results": [
                            [{"index": int(i), "score": float(sc)}
                             for i, sc in zip(row_i, row_s) if i >= 0]
                            for row_i, row_s in zip(idx, scores)
                        ],
                    })
                    b.stats.requests += 1
                elif path == "/v1/maxsim_index":
                    # late-interaction corpus building: documents' TOKEN
                    # states into the on-device MaxSimIndex
                    # (runtime/maxsim_search.py) — /v1/index's contract
                    if method != "POST":
                        raise HttpError(405, "POST required")
                    texts, _, payload = _parse_embed_request(body)
                    b, _name = pick(payload)
                    req_batcher = b
                    loop = asyncio.get_running_loop()
                    try:
                        b.try_reserve(len(texts))
                    except OverloadedError as e:
                        raise HttpError(429, str(e))
                    try:
                        total = await loop.run_in_executor(
                            None, b.maxsim_index_texts, texts
                        )
                    except RuntimeError as e:
                        raise HttpError(400, str(e))
                    finally:
                        b.release(len(texts))
                    out = _json_response(200, {"object": "maxsim_index",
                                               "total": total})
                    b.stats.requests += 1
                elif path == "/v1/maxsim_search":
                    if method != "POST":
                        raise HttpError(405, "POST required")
                    texts, _, payload = _parse_embed_request(body)
                    k = _parse_k(payload)
                    b, _name = pick(payload)
                    req_batcher = b
                    if b.maxsim_index is None or len(b.maxsim_index) == 0:
                        raise HttpError(
                            400,
                            "no MaxSim index built (POST /v1/maxsim_index "
                            "first)",
                        )
                    loop = asyncio.get_running_loop()
                    try:
                        b.try_reserve(len(texts))
                    except OverloadedError as e:
                        raise HttpError(429, str(e))
                    cand = payload.get("candidates")
                    if cand is not None and (
                        isinstance(cand, bool)  # bool IS an int in JSON land
                        or not isinstance(cand, int) or cand < 1
                    ):
                        raise HttpError(400,
                                        "candidates must be a positive int")
                    try:
                        idx, scores = await loop.run_in_executor(
                            None, b.maxsim_search_texts, texts, k, cand
                        )
                    finally:
                        b.release(len(texts))
                    # /v1/search's padding contract: id -1 slots drop
                    out = _json_response(200, {
                        "object": "maxsim_search",
                        "results": [
                            [{"index": int(i), "score": float(sc)}
                             for i, sc in zip(row_i, row_s) if i >= 0]
                            for row_i, row_s in zip(idx, scores)
                        ],
                    })
                    b.stats.requests += 1
                elif path == "/v1/maxsim":
                    # late-interaction (ColBERT-style) MaxSim reranking over
                    # token states (Engine.maxsim_rerank) — same payload and
                    # response shape as /v1/rerank, but works with ANY
                    # encoder (no classification head required)
                    if method != "POST":
                        raise HttpError(405, "POST required")
                    query, docs, top_n, payload = _parse_rerank_request(body)
                    b, req_model = pick(payload)
                    req_batcher = b
                    loop = asyncio.get_running_loop()
                    try:
                        b.try_reserve(len(docs))
                    except OverloadedError as e:
                        raise HttpError(429, str(e))
                    try:
                        ranked = await loop.run_in_executor(
                            None,
                            lambda: b.engine.maxsim_rerank(
                                query, docs, top_n=top_n
                            ),
                        )
                    finally:
                        b.release(len(docs))
                    if payload.get("return_documents"):
                        for r in ranked:
                            r["document"] = {"text": docs[r["index"]]}
                    out = _json_response(200, {
                        "object": "maxsim",
                        "model": req_model,
                        "results": ranked,
                    })
                    b.stats.requests += 1
                elif path == "/v1/rerank":
                    # cross-encoder reranking (Jina/Cohere-style API); the
                    # engine refuses cleanly when the model has no
                    # classification head (-> 400, a client-config error)
                    if method != "POST":
                        raise HttpError(405, "POST required")
                    query, docs, top_n, payload = _parse_rerank_request(body)
                    b, req_model = pick(payload)
                    req_batcher = b
                    if b.engine.config.n_labels == 0:
                        raise HttpError(
                            400,
                            f"model {req_model!r} has no classification head "
                            "(embedding model); /v1/rerank needs a reranker",
                        )
                    if b.engine.config.n_labels != 1:
                        # a model-configuration error, not a server failure
                        # (Engine.rerank raises RuntimeError for it)
                        raise HttpError(
                            400,
                            f"model {req_model!r} has a "
                            f"{b.engine.config.n_labels}-label head; "
                            "/v1/rerank needs a single-label reranker",
                        )
                    loop = asyncio.get_running_loop()
                    # scoring runs on an executor thread, bypassing
                    # ContinuousBatcher.encode — reserve against the same
                    # --max-pending budget as index/search
                    try:
                        b.try_reserve(len(docs))
                    except OverloadedError as e:
                        raise HttpError(429, str(e))
                    try:
                        ranked = await loop.run_in_executor(
                            None,
                            lambda: b.engine.rerank(query, docs, top_n=top_n),
                        )
                    finally:
                        b.release(len(docs))
                    if payload.get("return_documents"):
                        for r in ranked:
                            r["document"] = {"text": docs[r["index"]]}
                    out = _json_response(200, {
                        "object": "rerank",
                        "model": req_model,
                        "results": ranked,
                    })
                    b.stats.requests += 1
                elif path == "/v1/embeddings":
                    if method != "POST":
                        raise HttpError(405, "POST required")
                    texts, fmt, payload = _parse_embed_request(body)
                    b, req_model = pick(payload)
                    req_batcher = b
                    dims = _parse_dimensions(payload, b.engine.n_embd)
                    # prompt_name / prompt (sentence-transformers prompt
                    # semantics; our extension over the OpenAI schema):
                    # resolve per request, before micro-batch merging
                    try:
                        prefix = b.engine.resolve_prompt(
                            payload.get("prompt_name"),
                            payload.get("prompt"),
                        )
                    except ValueError as e:
                        raise HttpError(400, str(e))
                    truncate = payload.get("truncate", True)
                    if not isinstance(truncate, bool):
                        raise HttpError(400, "truncate must be a boolean")
                    try:
                        vecs, counts = await b.encode_with_counts(
                            texts, prefix, truncate
                        )
                    except ValueError as e:
                        # truncate=false over-length rejection
                        raise HttpError(400, str(e))
                    except OverloadedError as e:
                        raise HttpError(429, str(e))
                    vecs = np.ascontiguousarray(vecs, np.float32)
                    if dims is not None:
                        from .engine import truncate_normalize

                        vecs = truncate_normalize(vecs, dims)
                    loop = asyncio.get_running_loop()
                    if fmt == "base64":
                        data_json = json.dumps([
                            {"object": "embedding", "index": i,
                             "embedding": base64.b64encode(
                                 v.tobytes()).decode("ascii")}
                            for i, v in enumerate(vecs)
                        ], separators=(",", ":")).encode("utf-8")
                    else:
                        # float mode (the OpenAI default): the native
                        # std::to_chars renderer — Python float repr was the
                        # measured 5x bottleneck (utils/jsonfmt.py); big
                        # batches render in the executor off the event loop
                        from ..utils import jsonfmt

                        if len(vecs) >= 64:
                            data_json = await loop.run_in_executor(
                                None, jsonfmt.embedding_data_json, vecs
                            )
                        else:
                            data_json = jsonfmt.embedding_data_json(vecs)
                    # usage comes from the tokenization that fed the forward
                    # pass (encode_with_counts) — re-tokenizing here cost
                    # ~11 ms per 1024-text request on the 1-core host
                    n_tokens = int(sum(counts))
                    # splice the pre-rendered data array into the envelope
                    body_out = (
                        b'{"object":"list","data":' + data_json
                        + b',"model":' + json.dumps(req_model).encode("utf-8")
                        + b',"usage":{"prompt_tokens":%d,"total_tokens":%d}}'
                        % (n_tokens, n_tokens)
                    )
                    out = _response(200, body_out)
                    b.stats.requests += 1
                else:
                    raise HttpError(404, f"no route for {path}")
            except HttpError as e:
                out = _error_response(e.status, str(e))
                if e.status >= 500:
                    req_batcher.stats.errors += 1
            except Exception as e:  # engine failures -> 500, connection lives
                req_batcher.stats.errors += 1
                out = _error_response(500, f"{type(e).__name__}: {e}")
            client_done = headers.get("connection", "").lower() == "close"
            if client_done:
                # first occurrence is always the Connection header (it
                # precedes the body), so replace-first is safe
                out = out.replace(b"keep-alive", b"close", 1)
            req_batcher.stats.record_latency(time.perf_counter() - t_req)
            try:
                writer.write(out)
                await writer.drain()
            except (ConnectionResetError, BrokenPipeError):
                break  # client left mid-response
            if client_done:
                break
    finally:
        writer.close()
        try:
            await writer.wait_closed()
        except Exception:
            pass


async def serve_http(engine, host: str = "0.0.0.0", port: int = 8081,
                     batcher=None, max_batch: int = 256,
                     window_ms: float = 2.0,
                     ready_event: asyncio.Event | None = None):
    """Serve HTTP; pass an existing batcher to share device batches with the
    TCP protocol (runtime.server --http-port does exactly that)."""
    from .server import ContinuousBatcher

    own_batcher = batcher is None
    if own_batcher:
        batcher = ContinuousBatcher(engine, max_batch, window_ms)
        await batcher.start()
    server = await asyncio.start_server(
        lambda r, w: handle_http(r, w, batcher, _model_name(engine)),
        host, port,
    )
    if ready_event is not None:
        ready_event.set()
    print(f"http server listening on {host}:{port} "
          f"(POST /v1/embeddings)", file=sys.stderr)
    try:
        async with server:
            await server.serve_forever()
    finally:
        if own_batcher:
            await batcher.stop()


def main() -> None:
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-m", "--model", required=True)
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8081)
    p.add_argument("--dtype", choices=["float32", "bfloat16"],
                   default="bfloat16")
    p.add_argument("--output-dtype",
                   choices=["float32", "float16", "bfloat16", "int8"],
                   default="int8",
                   help="device->host transfer dtype (int8 = packed "
                        "codes+scale, 1.47x f32 throughput at cosine "
                        "~0.9999; float32 restores bit-exact transfer)")
    p.add_argument("--packing", choices=["auto", "always", "never"],
                   default="auto")
    args = p.parse_args()

    from ..models.bert import ComputeOptions
    from .engine import Engine

    engine = Engine.from_gguf(
        args.model,
        opts=ComputeOptions(dtype=args.dtype, output_dtype=args.output_dtype),
        packing=args.packing,
    )
    engine.warmup()
    asyncio.run(serve_http(engine, args.host, args.port))


if __name__ == "__main__":
    # run the canonical module, not the `__main__` copy (same dual-class
    # trap as runtime/server.py: exception types must be shared)
    from embedding_cpp_tpu.runtime.http_server import main as _canonical_main

    _canonical_main()
