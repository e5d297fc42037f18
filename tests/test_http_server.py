"""HTTP/JSON serving surface (runtime/http_server.py): OpenAI-compatible
/v1/embeddings over the shared continuous batcher, health/metrics routes,
error handling.  The reference serves raw TCP only."""
import asyncio
import base64
import http.client
import json
import socket
import threading

import numpy as np
import pytest

from embedding_cpp_tpu.models import BertConfig, ComputeOptions
from embedding_cpp_tpu.runtime.engine import Engine
from embedding_cpp_tpu.runtime.server import serve

CFG = BertConfig(
    n_vocab=1000, n_ctx=64, n_embd=64, n_layer=1, n_head=4, n_ff=128,
    name="http-test-model",
)


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def http_server():
    """TCP + HTTP on one process, shared batcher."""
    pytest.importorskip("tokenizers")
    engine = Engine.synthetic(CFG, opts=ComputeOptions(dtype="float32"))
    engine.warmup()
    tcp_port, http_port = _free_port(), _free_port()
    loop = asyncio.new_event_loop()
    holder = {}

    def thread_main():
        asyncio.set_event_loop(loop)
        task = loop.create_task(
            serve(engine, "127.0.0.1", tcp_port, window_ms=2.0,
                  http_port=http_port)
        )
        holder["task"] = task
        try:
            loop.run_until_complete(task)
        except asyncio.CancelledError:
            pass
        finally:
            loop.close()

    t = threading.Thread(target=thread_main, daemon=True)
    t.start()
    import time

    for _ in range(100):
        try:
            s = socket.create_connection(("127.0.0.1", http_port), 0.2)
            s.close()
            break
        except OSError:
            time.sleep(0.05)
    yield http_port, tcp_port, engine
    loop.call_soon_threadsafe(holder["task"].cancel)
    t.join(timeout=5)


def _post(port, path, payload):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("POST", path, json.dumps(payload),
                 {"Content-Type": "application/json"})
    r = conn.getresponse()
    body = json.loads(r.read())
    conn.close()
    return r.status, body


def _get(port, path):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("GET", path)
    r = conn.getresponse()
    raw = r.read()
    conn.close()
    return r.status, raw


def test_embeddings_endpoint(http_server):
    port, _, engine = http_server
    status, body = _post(port, "/v1/embeddings",
                         {"input": ["hello world", "the quick brown fox"]})
    assert status == 200
    assert body["object"] == "list" and body["model"] == "http-test-model"
    vecs = np.array([d["embedding"] for d in body["data"]], np.float32)
    expected = engine.encode(["hello world", "the quick brown fox"])
    np.testing.assert_allclose(vecs, expected, atol=1e-5)
    assert body["usage"]["prompt_tokens"] > 0
    assert [d["index"] for d in body["data"]] == [0, 1]


def test_embeddings_single_string_and_base64(http_server):
    port, _, engine = http_server
    status, body = _post(port, "/v1/embeddings",
                         {"input": "hello world",
                          "encoding_format": "base64"})
    assert status == 200
    raw = base64.b64decode(body["data"][0]["embedding"])
    vec = np.frombuffer(raw, np.float32)
    np.testing.assert_allclose(vec, engine.encode(["hello world"])[0],
                               atol=1e-5)


def test_embeddings_dimensions(http_server):
    """OpenAI `dimensions`: truncate + re-L2-normalize, both formats."""
    port, _, engine = http_server
    status, body = _post(port, "/v1/embeddings",
                         {"input": ["hello world"], "dimensions": 16})
    assert status == 200
    vec = np.array(body["data"][0]["embedding"], np.float32)
    assert vec.shape == (16,)
    np.testing.assert_allclose(np.linalg.norm(vec), 1.0, atol=1e-5)
    full = engine.encode(["hello world"])[0][:16]
    np.testing.assert_allclose(vec, full / np.linalg.norm(full), atol=1e-5)

    status, body = _post(port, "/v1/embeddings",
                         {"input": "hello world",
                          "encoding_format": "base64", "dimensions": 16})
    assert status == 200
    raw = np.frombuffer(base64.b64decode(body["data"][0]["embedding"]),
                        np.float32)
    assert raw.shape == (16,)
    np.testing.assert_allclose(raw, vec, atol=1e-5)

    # full-width request is a no-op
    status, body = _post(port, "/v1/embeddings",
                         {"input": "hello world",
                          "dimensions": CFG.n_embd})
    assert status == 200
    assert len(body["data"][0]["embedding"]) == CFG.n_embd


def test_embeddings_dimensions_validation(http_server):
    port, _, _ = http_server
    for bad in (0, -3, CFG.n_embd + 1, "16", 3.5, True):
        status, body = _post(port, "/v1/embeddings",
                             {"input": "x", "dimensions": bad})
        assert status == 400, bad
    # index/search reject the field instead of silently ignoring it
    status, body = _post(port, "/v1/index",
                         {"input": ["x"], "dimensions": 16})
    assert status == 400
    status, body = _post(port, "/v1/search",
                         {"input": ["x"], "dimensions": 16})
    assert status == 400


def test_health_metrics_models(http_server):
    port, _, _ = http_server
    status, raw = _get(port, "/healthz")
    assert status == 200 and raw == b"ok"
    status, raw = _get(port, "/metrics")
    snap = json.loads(raw)
    assert status == 200 and "server" in snap
    status, raw = _get(port, "/v1/models")
    assert status == 200
    assert json.loads(raw)["data"][0]["id"] == "http-test-model"


def test_http_error_handling(http_server):
    port, _, _ = http_server
    status, body = _post(port, "/v1/embeddings", {"input": []})
    assert status == 400 and "input" in body["error"]["message"]
    status, body = _post(port, "/v1/embeddings", {"input": 42})
    assert status == 400
    status, raw = _get(port, "/nope")
    assert status == 404
    # malformed JSON
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("POST", "/v1/embeddings", "{not json",
                 {"Content-Type": "application/json"})
    r = conn.getresponse()
    assert r.status == 400
    conn.close()


def test_http_keepalive_multiple_requests(http_server):
    port, _, engine = http_server
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    for i in range(3):
        conn.request("POST", "/v1/embeddings",
                     json.dumps({"input": f"request {i}"}),
                     {"Content-Type": "application/json"})
        r = conn.getresponse()
        assert r.status == 200
        body = json.loads(r.read())
        vec = np.array(body["data"][0]["embedding"], np.float32)
        np.testing.assert_allclose(
            vec, engine.encode([f"request {i}"])[0], atol=1e-5
        )
    conn.close()


def test_tcp_and_http_share_batcher(http_server):
    """Both protocols serve from one process and agree numerically."""
    from embedding_cpp_tpu.runtime.client import EmbeddingClient

    http_port, tcp_port, _ = http_server
    with EmbeddingClient("127.0.0.1", tcp_port) as c:
        tcp_vec = c.embed(["shared batcher"])[0]
    _, body = _post(http_port, "/v1/embeddings", {"input": "shared batcher"})
    http_vec = np.array(body["data"][0]["embedding"], np.float32)
    np.testing.assert_allclose(tcp_vec, http_vec, atol=1e-6)


def test_http_index_and_search(http_server):
    """/v1/index + /v1/search: on-device vector search over HTTP."""
    port, _, _ = http_server
    corpus = [f"http document about topic {i}" for i in range(8)]
    status, body = _post(port, "/v1/index", {"input": corpus})
    assert status == 200 and body["total"] >= 8
    total = body["total"]
    status, body = _post(port, "/v1/search",
                         {"input": [corpus[3]], "k": 2})
    assert status == 200
    hits = body["results"][0]
    assert len(hits) == 2 and hits[0]["score"] >= hits[1]["score"]
    # search before any index on a FRESH server is covered by the TCP test;
    # here assert bad k is rejected
    status, body = _post(port, "/v1/search", {"input": ["q"], "k": 0})
    assert status == 400
    # k beyond the corpus: rows explicitly carry only the real results
    # (no-result slots are filtered, never phantom ids or -Infinity JSON)
    status, body = _post(port, "/v1/search", {"input": [corpus[0]], "k": 100})
    assert status == 200
    hits = body["results"][0]
    assert len(hits) == total
    assert all(h["index"] >= 0 and np.isfinite(h["score"]) for h in hits)


def test_http_hostile_headers(http_server):
    """Malformed content-length and chunked encoding get clean 400s, not a
    silently dropped connection or a misread body."""
    port, _, _ = http_server

    def raw_request(payload: bytes) -> int:
        s = socket.create_connection(("127.0.0.1", port), 10)
        s.sendall(payload)
        data = b""
        while b"\r\n\r\n" not in data:
            chunk = s.recv(4096)
            if not chunk:
                break
            data += chunk
        s.close()
        return int(data.split(b" ", 2)[1]) if data else 0

    assert raw_request(
        b"POST /v1/embeddings HTTP/1.1\r\nContent-Length: abc\r\n\r\n"
    ) == 400
    assert raw_request(
        b"POST /v1/embeddings HTTP/1.1\r\nTransfer-Encoding: chunked\r\n\r\n"
    ) == 400
    assert raw_request(
        b"POST /v1/embeddings HTTP/1.1\r\nContent-Length: 999999999999\r\n\r\n"
    ) == 413
    # conflicting Content-Length values: reject (request-smuggling hygiene,
    # RFC 7230 §3.3.2) instead of silently taking the last one
    assert raw_request(
        b"POST /v1/embeddings HTTP/1.1\r\n"
        b"Content-Length: 2\r\nContent-Length: 4\r\n\r\n{}"
    ) == 400


def test_http_search_k_validation_and_item_cap(http_server):
    port, _, _ = http_server
    status, body = _post(port, "/v1/search", {"input": ["q"], "k": "ten"})
    assert status == 400 and "k must be" in body["error"]["message"]
    status, body = _post(port, "/v1/search", {"input": ["q"], "k": 99999})
    assert status == 400


def test_http_unknown_model_404_single_model(http_server):
    """A wrong 'model' value is a 404 even with one model configured —
    never silently served by the default model (ADVICE r2)."""
    port, _, _ = http_server
    status, body = _post(port, "/v1/embeddings",
                         {"input": "hello", "model": "not-this-model"})
    assert status == 404 and "serving" in body["error"]["message"]
    # the configured name still routes
    status, body = _post(port, "/v1/embeddings",
                         {"input": "hello", "model": "http-test-model"})
    assert status == 200


def test_batcher_reserve_admission():
    """try_reserve/release: the index/search admission path shares the
    encode() backpressure budget."""
    from embedding_cpp_tpu.runtime.server import (
        ContinuousBatcher, OverloadedError,
    )

    b = ContinuousBatcher(engine=None, max_pending=4)
    b.try_reserve(3)
    with pytest.raises(OverloadedError):
        b.try_reserve(2)  # 3 + 2 > 4
    b.release(3)
    b.try_reserve(4)
    b.release(4)
    with pytest.raises(OverloadedError):
        b.try_reserve(5)  # > cap outright
    assert b.stats.rejected == 2


def test_http_connection_close_honored(http_server):
    """A request with Connection: close gets a close-advertising response
    and the server actually closes."""
    port, _, _ = http_server
    s = socket.create_connection(("127.0.0.1", port), 10)
    s.sendall(b"GET /healthz HTTP/1.1\r\nConnection: close\r\n\r\n")
    data = b""
    while True:
        chunk = s.recv(4096)
        if not chunk:
            break
        data += chunk
    assert b"Connection: close" in data and data.endswith(b"ok")
    s.close()


def test_multi_model_routing(tmp_path):
    """Two engines behind one HTTP port: requests route by their 'model'
    field, /v1/models lists both, unknown models get 404."""
    pytest.importorskip("tokenizers")
    import dataclasses

    cfg_b = dataclasses.replace(CFG, n_embd=32, n_head=2, name="tiny-b")
    engine_a = Engine.synthetic(CFG, opts=ComputeOptions(dtype="float32"))
    engine_b = Engine.synthetic(cfg_b, opts=ComputeOptions(dtype="float32"))
    port = _free_port()
    http_port = _free_port()
    loop = asyncio.new_event_loop()
    holder = {}

    def thread_main():
        asyncio.set_event_loop(loop)
        task = loop.create_task(
            serve(engine_a, "127.0.0.1", port, window_ms=1.0,
                  http_port=http_port,
                  extra_engines={"tiny-b": engine_b},
                  model_name="named-default")
        )
        holder["task"] = task
        try:
            loop.run_until_complete(task)
        except asyncio.CancelledError:
            pass
        finally:
            loop.close()

    t = threading.Thread(target=thread_main, daemon=True)
    t.start()
    import time

    for _ in range(100):
        try:
            s = socket.create_connection(("127.0.0.1", http_port), 0.2)
            s.close()
            break
        except OSError:
            time.sleep(0.05)

    status, body = _get(http_port, "/v1/models")
    ids = {m["id"] for m in json.loads(body)["data"]}
    # the -m NAME=PATH default name is honored (not the GGUF config name)
    assert ids == {"tiny-b", "named-default"}

    # default model (64-dim)
    status, body = _post(http_port, "/v1/embeddings", {"input": "hello"})
    assert status == 200 and len(body["data"][0]["embedding"]) == 64
    # routed model (32-dim)
    status, body = _post(http_port, "/v1/embeddings",
                         {"input": "hello", "model": "tiny-b"})
    assert status == 200 and len(body["data"][0]["embedding"]) == 32
    assert body["model"] == "tiny-b"
    # explicit default-name routing works too
    status, body = _post(http_port, "/v1/embeddings",
                         {"input": "hello", "model": "named-default"})
    assert status == 200 and len(body["data"][0]["embedding"]) == 64
    # per-model stats: tiny-b's requests counted on ITS batcher
    status, raw = _get(http_port, "/metrics")
    snap = json.loads(raw)
    assert snap["models"]["tiny-b"]["requests"] >= 1
    # unknown model
    status, body = _post(http_port, "/v1/embeddings",
                         {"input": "hello", "model": "nope"})
    assert status == 404 and "serving" in body["error"]["message"]
    # index/search route to the selected model's own index
    status, body = _post(http_port, "/v1/index",
                         {"input": ["b doc one", "b doc two"],
                          "model": "tiny-b"})
    assert status == 200 and body["total"] == 2
    status, body = _post(http_port, "/v1/search",
                         {"input": ["b doc two"], "k": 1, "model": "tiny-b"})
    assert status == 200 and body["results"][0][0]["index"] == 1
    # the default model has no index yet -> client-state 400
    status, body = _post(http_port, "/v1/search", {"input": ["q"], "k": 1})
    assert status == 400 and "no index" in body["error"]["message"]
    loop.call_soon_threadsafe(holder["task"].cancel)
    t.join(timeout=5)


def test_http_tokenize(http_server):
    """POST /v1/tokenize: framed ids + token strings, no embedding (the
    HTTP face of the TCP tokenize frame / bert_tokenize, bert.h:64)."""
    port, _, engine = http_server
    status, body = _post(port, "/v1/tokenize",
                         {"input": ["hello world", "a"]})
    assert status == 200
    assert body["object"] == "tokenize"
    assert body["ids"] == [
        [int(i) for i in engine.tokenize("hello world")],
        [int(i) for i in engine.tokenize("a")],
    ]
    # framed: CLS ... SEP, and tokens mirror ids through the vocab
    for ids, toks in zip(body["ids"], body["tokens"]):
        assert ids[0] == engine.special_ids.cls
        assert ids[-1] == engine.special_ids.sep
        assert len(ids) == len(toks)
        assert toks == [engine.id_to_token(i) for i in ids]
    # single string form
    status, body = _post(port, "/v1/tokenize", {"input": "hello"})
    assert status == 200 and len(body["ids"]) == 1


def test_http_rerank(http_server):
    """POST /v1/rerank: a cross-encoder reranker behind the same port (via
    the model registry) returns a descending ranking; the embedding-only
    default model is refused with a clear 400."""
    port, _, engine = http_server
    # the fixture's default model has no head -> client-config error
    status, body = _post(port, "/v1/rerank",
                         {"query": "q", "documents": ["a", "b"]})
    assert status == 400
    assert "no classification head" in body["error"]["message"]

    # validation errors
    status, body = _post(port, "/v1/rerank", {"documents": ["a"]})
    assert status == 400 and "query" in body["error"]["message"]
    status, body = _post(port, "/v1/rerank", {"query": "q", "documents": []})
    assert status == 400 and "documents" in body["error"]["message"]
    status, body = _post(port, "/v1/rerank",
                         {"query": "q", "documents": ["a"], "top_n": 0})
    assert status == 400 and "top_n" in body["error"]["message"]


def test_http_rerank_end_to_end():
    """A reranker engine (classification head) served over HTTP: scores
    match Engine.rerank, ordering is descending, top_n/return_documents
    honored."""
    pytest.importorskip("tokenizers")
    import dataclasses

    cfg = dataclasses.replace(CFG, n_labels=1, name="tiny-reranker")
    engine = Engine.synthetic(cfg, opts=ComputeOptions(dtype="float32"))
    tcp_port, http_port = _free_port(), _free_port()
    loop = asyncio.new_event_loop()
    holder = {}

    def thread_main():
        asyncio.set_event_loop(loop)
        task = loop.create_task(
            serve(engine, "127.0.0.1", tcp_port, window_ms=1.0,
                  http_port=http_port)
        )
        holder["task"] = task
        try:
            loop.run_until_complete(task)
        except asyncio.CancelledError:
            pass
        finally:
            loop.close()

    t = threading.Thread(target=thread_main, daemon=True)
    t.start()
    import time

    for _ in range(100):
        try:
            s = socket.create_connection(("127.0.0.1", http_port), 0.2)
            s.close()
            break
        except OSError:
            time.sleep(0.05)
    try:
        docs = ["the dog sat on the mat", "cats drink milk", "dogs run far"]
        status, body = _post(http_port, "/v1/rerank", {
            "query": "where is the dog", "documents": docs,
            "top_n": 2, "return_documents": True,
        })
        assert status == 200
        assert body["object"] == "rerank"
        assert len(body["results"]) == 2
        scores = [r["relevance_score"] for r in body["results"]]
        assert scores == sorted(scores, reverse=True)
        assert all(0.0 < s < 1.0 for s in scores)
        for r in body["results"]:
            assert r["document"]["text"] == docs[r["index"]]
        want = engine.rerank("where is the dog", docs, top_n=2)
        assert [r["index"] for r in body["results"]] == \
            [w["index"] for w in want]
        np.testing.assert_allclose(
            scores, [w["relevance_score"] for w in want], rtol=1e-6
        )
    finally:
        loop.call_soon_threadsafe(holder["task"].cancel)
        t.join(timeout=5)


def test_http_truncate_false(http_server):
    """truncate:false turns silent over-length cutting into a 400; the
    default (true) keeps the reference's cut-at-context behavior."""
    port, _, _ = http_server
    long_text = " ".join(["tokenizers"] * 200)  # >> n_ctx=64
    status, body = _post(port, "/v1/embeddings", {"input": long_text})
    assert status == 200  # default truncates
    status, body = _post(port, "/v1/embeddings",
                         {"input": long_text, "truncate": False})
    assert status == 400
    assert "over the model's" in body["error"]["message"]
    status, body = _post(port, "/v1/embeddings",
                         {"input": "short", "truncate": False})
    assert status == 200
    status, body = _post(port, "/v1/embeddings",
                         {"input": "x", "truncate": "no"})
    assert status == 400 and "boolean" in body["error"]["message"]


def test_http_rerank_multilabel_400():
    """A multi-label classification model is a 400 on /v1/rerank (model
    misconfiguration), not a 500 server failure."""
    pytest.importorskip("tokenizers")
    import dataclasses

    cfg = dataclasses.replace(CFG, n_labels=3, name="tiny-3label")
    engine = Engine.synthetic(cfg, opts=ComputeOptions(dtype="float32"))
    tcp_port, http_port = _free_port(), _free_port()
    loop = asyncio.new_event_loop()
    holder = {}

    def thread_main():
        asyncio.set_event_loop(loop)
        task = loop.create_task(
            serve(engine, "127.0.0.1", tcp_port, window_ms=1.0,
                  http_port=http_port)
        )
        holder["task"] = task
        try:
            loop.run_until_complete(task)
        except asyncio.CancelledError:
            pass
        finally:
            loop.close()

    t = threading.Thread(target=thread_main, daemon=True)
    t.start()
    import time

    for _ in range(100):
        try:
            s = socket.create_connection(("127.0.0.1", http_port), 0.2)
            s.close()
            break
        except OSError:
            time.sleep(0.05)
    try:
        status, body = _post(http_port, "/v1/rerank", {
            "query": "q", "documents": ["a", "b"],
        })
        assert status == 400
        assert "3-label" in body["error"]["message"]
    finally:
        loop.call_soon_threadsafe(holder["task"].cancel)
        t.join(timeout=5)


def test_token_embeddings_endpoint(http_server):
    """POST /v1/token_embeddings: per-token final hidden states — one
    [len, E] matrix per input, consistent with the engine's
    encode_token_states and with the framed token count."""
    port, _, engine = http_server
    texts = ["hello world", "the quick brown fox"]
    status, body = _post(port, "/v1/token_embeddings", {"input": texts})
    assert status == 200
    assert body["object"] == "token_embeddings"
    framed = engine.tokenize_batch(texts)
    direct = engine.encode_token_states(texts)
    assert len(body["data"]) == 2
    for i, row in enumerate(body["data"]):
        got = np.asarray(row["embeddings"], dtype=np.float32)
        assert got.shape == (len(framed[i]), engine.config.n_embd)
        np.testing.assert_allclose(got, direct[i], atol=1e-5)
    # dimensions is meaningless here (no Matryoshka truncation on raw
    # states) — reject loudly
    status, body = _post(port, "/v1/token_embeddings",
                         {"input": "x", "dimensions": 8})
    assert status == 400


def test_maxsim_route(http_server):
    """POST /v1/maxsim: late-interaction reranking on any encoder (no
    classification head needed), same payload shape as /v1/rerank."""
    port, _, engine = http_server
    docs = ["the dog sat on the mat", "hello world", "hello world again"]
    status, body = _post(port, "/v1/maxsim",
                         {"query": "hello world", "documents": docs,
                          "return_documents": True})
    assert status == 200, body
    assert body["object"] == "maxsim"
    results = body["results"]
    assert len(results) == 3
    scores = [r["relevance_score"] for r in results]
    assert scores == sorted(scores, reverse=True)
    assert results[0]["document"]["text"] == docs[results[0]["index"]]
    # engine-surface agreement
    expected = engine.maxsim("hello world", docs)
    for r in results:
        np.testing.assert_allclose(
            r["relevance_score"], expected[r["index"]], rtol=1e-5
        )

    status, body = _post(port, "/v1/maxsim", {"documents": ["x"]})
    assert status == 400
    status, body = _post(port, "/v1/maxsim",
                         {"query": "q", "documents": []})
    assert status == 400
    status, body = _post(port, "/v1/maxsim",
                         {"query": "q", "documents": ["x"], "top_n": 0})
    assert status == 400


def test_http_maxsim_index_and_search(http_server):
    """/v1/maxsim_index + /v1/maxsim_search: on-device late-interaction
    retrieval over HTTP (token-state corpus, batched MaxSim top-k)."""
    port, _, _ = http_server
    corpus = [f"late interaction doc {i} about theme {i}" for i in range(6)]
    status, body = _post(port, "/v1/maxsim_search",
                         {"input": ["q"], "k": 2})
    assert status == 400 and "no MaxSim index" in body["error"]["message"]
    status, body = _post(port, "/v1/maxsim_index", {"input": corpus})
    assert status == 200 and body["total"] == 6
    status, body = _post(port, "/v1/maxsim_search",
                         {"input": [corpus[2], corpus[5]], "k": 3})
    assert status == 200
    res = body["results"]
    assert len(res) == 2
    assert res[0][0]["index"] == 2 and res[1][0]["index"] == 5
    assert res[0][0]["score"] >= res[0][1]["score"]
    # k past the corpus: no-result slots filtered, no -Infinity JSON
    status, body = _post(port, "/v1/maxsim_search",
                         {"input": [corpus[0]], "k": 50})
    assert status == 200
    hits = body["results"][0]
    assert len(hits) == 6
    assert all(h["index"] >= 0 and np.isfinite(h["score"]) for h in hits)
    status, body = _post(port, "/v1/maxsim_search", {"input": ["q"], "k": 0})
    assert status == 400
