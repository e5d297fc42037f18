"""Server protocol tests: ggml-compat raw mode, TPE2 framed mode, concurrent
clients through the continuous batcher."""
import asyncio
import socket
import struct
import threading

import numpy as np
import pytest

from embedding_cpp_tpu.models import BertConfig, ComputeOptions
from embedding_cpp_tpu.runtime.client import EmbeddingClient
from embedding_cpp_tpu.runtime.engine import Engine
from embedding_cpp_tpu.runtime.server import serve

CFG = BertConfig(
    n_vocab=1000, n_ctx=64, n_embd=64, n_layer=1, n_head=4, n_ff=128
)


@pytest.fixture(scope="module")
def server():
    pytest.importorskip("tokenizers")
    engine = Engine.synthetic(CFG, opts=ComputeOptions(dtype="float32"))
    engine.warmup()

    loop = asyncio.new_event_loop()
    port_holder = {}

    sock = socket.socket()
    sock.bind(("127.0.0.1", 0))
    port_holder["port"] = sock.getsockname()[1]
    sock.close()

    async def run():
        try:
            await serve(
                engine, "127.0.0.1", port_holder["port"],
                max_batch=32, window_ms=5.0,
            )
        except asyncio.CancelledError:
            pass

    def thread_main():
        asyncio.set_event_loop(loop)
        task = loop.create_task(run())
        port_holder["task"] = task
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
            s = socket.create_connection(("127.0.0.1", port_holder["port"]), 0.2)
            s.close()
            break
        except OSError:
            time.sleep(0.05)
    yield port_holder["port"], engine
    loop.call_soon_threadsafe(port_holder["task"].cancel)
    t.join(timeout=5)


def test_handshake_and_raw_mode(server):
    port, engine = server
    s = socket.create_connection(("127.0.0.1", port))
    (n_embd,) = struct.unpack("<i", s.recv(4))
    assert n_embd == CFG.n_embd
    s.sendall(b"hello world")
    data = b""
    while len(data) < n_embd * 4:
        data += s.recv(n_embd * 4 - len(data))
    vec = np.frombuffer(data, np.float32)
    expected = engine.encode(["hello world"])[0]
    np.testing.assert_allclose(vec, expected, atol=1e-5)
    s.close()


def test_framed_batch(server):
    port, engine = server
    with EmbeddingClient("127.0.0.1", port) as c:
        assert c.n_embd == CFG.n_embd
        texts = ["hello world", "the quick brown fox", "a"]
        vecs = c.embed(texts)
        assert vecs.shape == (3, CFG.n_embd)
        expected = engine.encode(texts)
        np.testing.assert_allclose(vecs, expected, atol=1e-5)


def test_mixed_modes_same_connection(server):
    port, engine = server
    with EmbeddingClient("127.0.0.1", port) as c:
        a = c.embed(["hello world"])[0]
        b = c.embed_raw("hello world")
        np.testing.assert_allclose(a, b, atol=1e-6)


def test_large_text_framed(server):
    port, _ = server
    with EmbeddingClient("127.0.0.1", port) as c:
        big = "word " * 20000  # ~100 KB, would break the raw 32 KiB protocol
        vecs = c.embed([big])
        assert vecs.shape == (1, CFG.n_embd)
        assert np.isfinite(vecs).all()


def test_concurrent_clients_batched(server):
    port, engine = server
    results = {}

    def worker(i):
        with EmbeddingClient("127.0.0.1", port) as c:
            results[i] = c.embed([f"hello world {i}", "test sentence"])

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(results) == 8
    for i, vecs in results.items():
        expected = engine.encode([f"hello world {i}", "test sentence"])
        np.testing.assert_allclose(vecs, expected, atol=1e-5)


def test_unicode_roundtrip(server):
    port, engine = server
    with EmbeddingClient("127.0.0.1", port) as c:
        vecs = c.embed(["Québec 日本語 emoji 😀"])
        expected = engine.encode(["Québec 日本語 emoji 😀"])
        np.testing.assert_allclose(vecs, expected, atol=1e-5)


def test_stats_and_health(server):
    port, _ = server
    with EmbeddingClient("127.0.0.1", port) as c:
        assert c.health()
        c.embed(["hello world"])
        snap = c.stats()
        assert snap["counters"]["sentences"] >= 1
        assert snap["server"]["requests"] >= 1


def test_error_frame_isolates_request():
    """Engine failures produce an error frame; the connection survives."""
    pytest.importorskip("tokenizers")
    engine = Engine.synthetic(CFG, opts=ComputeOptions(dtype="float32"))
    engine.warmup()
    real_encode = engine.encode_with_counts

    def flaky_encode(texts, **kw):
        if any("BOOM" in t for t in texts):
            raise ValueError("injected failure")
        return real_encode(texts, **kw)

    # the batcher drives encode_with_counts (the usage-count path)
    engine.encode_with_counts = flaky_encode

    loop = asyncio.new_event_loop()
    sock = socket.socket()
    sock.bind(("127.0.0.1", 0))
    port = sock.getsockname()[1]
    sock.close()
    holder = {}

    def thread_main():
        asyncio.set_event_loop(loop)
        task = loop.create_task(serve(engine, "127.0.0.1", port, window_ms=1.0))
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
            s = socket.create_connection(("127.0.0.1", port), 0.2)
            s.close()
            break
        except OSError:
            time.sleep(0.05)

    with EmbeddingClient("127.0.0.1", port) as c:
        with pytest.raises(RuntimeError, match="injected failure"):
            c.embed(["BOOM"])
        # connection still works afterwards
        vecs = c.embed(["hello world"])
        assert vecs.shape == (1, CFG.n_embd)
    loop.call_soon_threadsafe(holder["task"].cancel)
    t.join(timeout=5)


def test_segmented_framed_request(server):
    """A TPE2 frame whose bytes arrive one TCP segment at a time must still
    parse as a framed request (the 4-byte magic may straddle segments —
    VERDICT r1 weak #2; the head read accumulates while the bytes remain a
    magic prefix)."""
    port, engine = server
    s = socket.create_connection(("127.0.0.1", port), 10)
    s.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
    (n_embd,) = struct.unpack("<i", s.recv(4))
    text = b"hello world"
    frame = b"TPE2" + struct.pack("<I", 1) + struct.pack("<I", len(text)) + text
    import time

    for b in frame:  # one byte per segment
        s.sendall(bytes([b]))
        time.sleep(0.002)
    data = b""
    want = 4 + n_embd * 4
    while len(data) < want:
        chunk = s.recv(want - len(data))
        assert chunk, "server closed mid-reply"
        data += chunk
    (count,) = struct.unpack("<I", data[:4])
    assert count == 1  # framed reply, not a raw-mode f32 blob
    vec = np.frombuffer(data[4:], np.float32)
    expected = engine.encode(["hello world"])[0]
    np.testing.assert_allclose(vec, expected, atol=1e-5)
    s.close()


def test_vocab_frame(server):
    """\\x01TPV id -> token string; unknown ids get an empty token."""
    port, engine = server
    s = socket.create_connection(("127.0.0.1", port), 10)
    s.recv(4)  # handshake

    def lookup(tok_id):
        s.sendall(b"\x01TPV" + struct.pack("<I", tok_id))
        (ln,) = struct.unpack("<I", s.recv(4))
        buf = b""
        while len(buf) < ln:
            buf += s.recv(ln - len(buf))
        return buf.decode()

    assert lookup(5) == engine.id_to_token(5)
    assert lookup(0xFFFFFF00) == ""  # out of range -> empty, not an error
    s.close()


def test_malformed_frame_rejected(server):
    """A hostile length field gets an error frame and a dropped connection,
    not an unbounded allocation."""
    import struct as _struct

    port, engine = server
    s = socket.create_connection(("127.0.0.1", port), 5)
    s.recv(4)  # handshake
    s.sendall(b"TPE2" + _struct.pack("<I", 0xFFFFFFF0))  # absurd count
    head = s.recv(4)
    (code,) = _struct.unpack("<I", head)
    assert code == 0xFFFFFFFF  # error frame
    (ln,) = _struct.unpack("<I", s.recv(4))
    msg = s.recv(ln).decode()
    assert "malformed" in msg
    s.close()
    # server still serves new connections
    s2 = socket.create_connection(("127.0.0.1", port), 5)
    assert len(s2.recv(4)) == 4
    s2.close()


def test_int8_wire_compression(server):
    """\\x01TP8 framed encode: quarter-size reply decodes to within int8
    quantization tolerance of the f32 reply."""
    port, engine = server
    with EmbeddingClient("127.0.0.1", port) as c:
        texts = ["hello world", "the quick brown fox"]
        f32 = c.embed(texts)
        i8 = c.embed(texts, wire="int8")
        amax = np.abs(f32).max(axis=1, keepdims=True)
        assert np.all(np.abs(f32 - i8) <= amax / 254 + 1e-7)


def test_index_and_search_frames(server):
    """\\x01TPB / \\x01TPS: build the on-device index and search it — only
    ids + scores cross the wire."""
    port, engine = server
    with EmbeddingClient("127.0.0.1", port) as c:
        corpus = [f"document about topic {i}" for i in range(12)]
        assert c.index(corpus) == 12
        idx, scores = c.search([corpus[5], corpus[9]], k=3)
        assert idx.shape == (2, 3) and scores.shape == (2, 3)
        assert idx[0, 0] == 5 and idx[1, 0] == 9
        assert np.all(scores[:, 0] >= scores[:, 1])
    # search before index on a fresh server errors per-request: covered by
    # the error frame (connection survives) — exercised via a new connection
    # in test_error_frame_isolates_request's pattern


def test_search_without_index_errors():
    pytest.importorskip("tokenizers")
    engine = Engine.synthetic(CFG, opts=ComputeOptions(dtype="float32"))
    engine.warmup()
    loop = asyncio.new_event_loop()
    sock = socket.socket()
    sock.bind(("127.0.0.1", 0))
    port = sock.getsockname()[1]
    sock.close()
    holder = {}

    def thread_main():
        asyncio.set_event_loop(loop)
        task = loop.create_task(serve(engine, "127.0.0.1", port, window_ms=1.0))
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
            s = socket.create_connection(("127.0.0.1", port), 0.2)
            s.close()
            break
        except OSError:
            time.sleep(0.05)
    with EmbeddingClient("127.0.0.1", port) as c:
        with pytest.raises(RuntimeError, match="no index"):
            c.search(["query"], k=1)
        # connection survives the error frame
        assert c.index(["doc"]) == 1
        idx, _ = c.search(["doc"], k=1)
        assert idx[0, 0] == 0
    loop.call_soon_threadsafe(holder["task"].cancel)
    t.join(timeout=5)


def test_pipelined_requests_one_connection(server):
    """The framed protocol is pipelineable: a client may send N requests
    back-to-back and read the N replies afterwards (the reference's
    unframed protocol cannot do this at all — replies would be
    indistinguishable).  Overlapping fills the batcher window, so pipelined
    requests may also share one device batch."""
    port, engine = server
    s = socket.create_connection(("127.0.0.1", port), 10)
    (n_embd,) = struct.unpack("<i", s.recv(4))
    texts = [f"pipelined request {i}" for i in range(5)]
    frames = []
    for t in texts:
        raw = t.encode()
        frames.append(b"TPE2" + struct.pack("<I", 1)
                      + struct.pack("<I", len(raw)) + raw)
    s.sendall(b"".join(frames))  # all five requests before any reply read

    def read_exactly(n):
        buf = b""
        while len(buf) < n:
            chunk = s.recv(n - len(buf))
            assert chunk
            buf += chunk
        return buf

    got = []
    for _ in texts:
        (count,) = struct.unpack("<I", read_exactly(4))
        assert count == 1
        got.append(np.frombuffer(read_exactly(n_embd * 4), np.float32))
    expected = engine.encode(texts)
    np.testing.assert_allclose(np.stack(got), expected, atol=1e-5)
    s.close()


def test_latency_percentiles_in_stats(server):
    port, _ = server
    with EmbeddingClient("127.0.0.1", port) as c:
        for _ in range(5):
            c.embed(["latency probe"])
        snap = c.stats()
        lat = snap["server"].get("latency_ms")
        assert lat and lat["window"] >= 5
        assert 0 <= lat["p50"] <= lat["p95"] <= lat["p99"]


def test_backpressure_error_frame():
    """A request exceeding the pending-sentence cap gets an overload error
    frame (framed mode); the connection survives and later requests work."""
    pytest.importorskip("tokenizers")
    from embedding_cpp_tpu.runtime.server import serve as _serve

    engine = Engine.synthetic(CFG, opts=ComputeOptions(dtype="float32"))
    engine.warmup()
    loop = asyncio.new_event_loop()
    sock = socket.socket()
    sock.bind(("127.0.0.1", 0))
    port = sock.getsockname()[1]
    sock.close()
    holder = {}

    def thread_main():
        asyncio.set_event_loop(loop)
        task = loop.create_task(
            _serve(engine, "127.0.0.1", port, window_ms=1.0, max_pending=2)
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
            s = socket.create_connection(("127.0.0.1", port), 0.2)
            s.close()
            break
        except OSError:
            time.sleep(0.05)

    with EmbeddingClient("127.0.0.1", port) as c:
        # a single request over the cap is a permanent "too large" error
        # (retrying could never clear it), distinct from transient overload
        with pytest.raises(RuntimeError, match="request too large"):
            c.embed(["one", "two", "three"])  # 3 > cap 2
        vecs = c.embed(["fits"])  # under the cap: still served
        assert vecs.shape == (1, CFG.n_embd)
        assert c.stats()["server"]["rejected"] >= 1
    loop.call_soon_threadsafe(holder["task"].cancel)
    t.join(timeout=5)


def test_hostile_search_frames(server):
    """Hostile/invalid index+search frames produce error frames, not hangs
    or unbounded allocations."""
    port, _ = server
    s = socket.create_connection(("127.0.0.1", port), 10)
    s.recv(4)  # handshake

    def read_u32():
        buf = b""
        while len(buf) < 4:
            buf += s.recv(4 - len(buf))
        return struct.unpack("<I", buf)[0]

    # k = 0 violates the frame contract -> malformed error, connection drops
    s.sendall(b"\x01TPS" + struct.pack("<I", 0) + struct.pack("<I", 1)
              + struct.pack("<I", 1) + b"x")
    assert read_u32() == 0xFFFFFFFF
    ln = read_u32()
    assert b"malformed" in s.recv(ln)
    s.close()

    # absurd item count on the index frame
    s2 = socket.create_connection(("127.0.0.1", port), 10)
    s2.recv(4)
    s2.sendall(b"\x01TPB" + struct.pack("<I", 0xFFFFFFF0))
    head = b""
    while len(head) < 4:
        head += s2.recv(4 - len(head))
    assert struct.unpack("<I", head)[0] == 0xFFFFFFFF
    s2.close()


def test_raw_text_with_magic_prefix(server):
    """A raw-mode text that shares a prefix with a magic but diverges
    ('TPEncoding...') must still be served as raw text — the head
    accumulator bails to raw mode the moment the bytes cannot be a magic."""
    port, engine = server
    s = socket.create_connection(("127.0.0.1", port), 10)
    (n_embd,) = struct.unpack("<i", s.recv(4))
    s.sendall(b"TPEncoding is fun")
    data = b""
    while len(data) < n_embd * 4:
        data += s.recv(n_embd * 4 - len(data))
    vec = np.frombuffer(data, np.float32)
    expected = engine.encode(["TPEncoding is fun"])[0]
    np.testing.assert_allclose(vec, expected, atol=1e-5)
    s.close()


def test_rerank_frame():
    """\\x01TPR: cross-encoder rerank over the wire — (idx, sigmoid scores)
    descending, top_n honored, matching Engine.rerank; an embedding-only
    model gets an error frame and the connection survives."""
    pytest.importorskip("tokenizers")
    import dataclasses

    cfg = dataclasses.replace(CFG, n_labels=1, name="tcp-reranker")
    engine = Engine.synthetic(cfg, opts=ComputeOptions(dtype="float32"))
    loop = asyncio.new_event_loop()
    sock = socket.socket()
    sock.bind(("127.0.0.1", 0))
    port = sock.getsockname()[1]
    sock.close()
    holder = {}

    def thread_main():
        asyncio.set_event_loop(loop)
        task = loop.create_task(serve(engine, "127.0.0.1", port, window_ms=1.0))
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
            s = socket.create_connection(("127.0.0.1", port), 0.2)
            s.close()
            break
        except OSError:
            time.sleep(0.05)
    docs = ["the dog sat on the mat", "cats drink milk", "dogs run far",
            "quantum chromodynamics"]
    with EmbeddingClient("127.0.0.1", port) as c:
        idx, scores = c.rerank("where is the dog", docs)
        assert idx.shape == (4,) and scores.shape == (4,)
        assert np.all(np.diff(scores) <= 0)  # descending
        assert np.all((scores > 0) & (scores < 1))  # sigmoid
        want = engine.rerank("where is the dog", docs)
        assert idx.tolist() == [w["index"] for w in want]
        np.testing.assert_allclose(
            scores, [w["relevance_score"] for w in want], rtol=1e-6
        )
        # top_n truncates
        idx2, scores2 = c.rerank("where is the dog", docs, top_n=2)
        assert idx2.tolist() == idx[:2].tolist()
        np.testing.assert_allclose(scores2, scores[:2], rtol=1e-6)
    loop.call_soon_threadsafe(holder["task"].cancel)
    t.join(timeout=5)


def test_rerank_frame_no_head_error(server):
    """The module fixture's embedding model: rerank gets a per-request error
    frame and the connection stays usable."""
    port, _engine = server
    with EmbeddingClient("127.0.0.1", port) as c:
        with pytest.raises(RuntimeError, match="no classification head"):
            c.rerank("q", ["a", "b"])
        # connection survives the error frame
        vecs = c.embed(["still alive"])
        assert vecs.shape[0] == 1


def test_server_t5_no_cls_family(tmp_path):
    """The wire paths over a no-CLS family (T5): raw-mode encode returns
    L2-normed vectors and the tokenize frame returns ids framed as
    ids + [</s>] with no leading CLS."""
    pytest.importorskip("tokenizers")
    t5_cfg = BertConfig(
        n_vocab=1000, n_ctx=64, n_embd=64, n_layer=1, n_head=4, n_ff=128,
        n_token_types=0, arch="t5", layer_norm_eps=1e-6, rel_attn_buckets=32,
        n_head_dim=16, ffn_act="relu", name="server-t5",
    )
    engine = Engine.synthetic(t5_cfg, opts=ComputeOptions(dtype="float32"))
    engine.warmup()

    loop = asyncio.new_event_loop()
    holder = {}
    sock = socket.socket()
    sock.bind(("127.0.0.1", 0))
    port = sock.getsockname()[1]
    sock.close()

    async def run():
        try:
            await serve(engine, "127.0.0.1", port, max_batch=8,
                        window_ms=2.0)
        except asyncio.CancelledError:
            pass

    def thread_main():
        asyncio.set_event_loop(loop)
        holder["task"] = loop.create_task(run())
        try:
            loop.run_until_complete(holder["task"])
        except asyncio.CancelledError:
            pass
        finally:
            loop.close()

    t = threading.Thread(target=thread_main, daemon=True)
    t.start()
    import time

    for _ in range(100):
        try:
            s = socket.create_connection(("127.0.0.1", port), 0.2)
            s.close()
            break
        except OSError:
            time.sleep(0.05)
    try:
        with EmbeddingClient("127.0.0.1", port) as c:
            vecs = c.embed(["hello world", "the quick brown fox"])
            assert vecs.shape == (2, t5_cfg.n_embd)
            np.testing.assert_allclose(
                np.linalg.norm(vecs, axis=-1), 1.0, atol=1e-5
            )
            # parity with the in-process engine
            direct = engine.encode(["hello world", "the quick brown fox"])
            np.testing.assert_allclose(vecs, direct, atol=2e-5)
        # framing is engine-side and applied on the server path too:
        # ids + [</s>], no leading CLS
        ids = engine.tokenize("hello world")
        assert ids[-1] == engine.special_ids.sep
        assert ids[0] != engine.special_ids.cls
    finally:
        loop.call_soon_threadsafe(holder["task"].cancel)
        t.join(timeout=5)


def test_maxsim_frame(server):
    """\\x01TPX: late-interaction MaxSim over the wire — works on the
    module fixture's plain embedding model (no head needed)."""
    port, engine = server
    docs = ["the dog sat on the mat", "hello world", "hello world again"]
    with EmbeddingClient("127.0.0.1", port) as c:
        idx, scores = c.maxsim("hello world", docs)
        assert idx.shape == (3,) and np.all(np.diff(scores) <= 1e-6)
        want = engine.maxsim_rerank("hello world", docs)
        assert idx.tolist() == [w["index"] for w in want]
        np.testing.assert_allclose(
            scores, [w["relevance_score"] for w in want], rtol=1e-6
        )
        idx2, scores2 = c.maxsim("hello world", docs, top_n=2)
        assert idx2.tolist() == idx[:2].tolist()
        np.testing.assert_allclose(scores2, scores[:2], rtol=1e-6)


def test_sparse_frame():
    """\\x01TPW: SPLADE sparse encode over the wire against an MLM-head
    model, matching Engine.encode_sparse exactly."""
    pytest.importorskip("tokenizers")
    import dataclasses

    from conftest import serve_in_thread

    cfg = dataclasses.replace(CFG, mlm_head=True, name="tcp-splade")
    engine = Engine.synthetic(cfg, opts=ComputeOptions(dtype="float32"))
    texts = ["hello world", "a longer sentence with more words"]
    with serve_in_thread(engine, window_ms=1.0) as port:
        with EmbeddingClient("127.0.0.1", port) as c:
            pairs = c.encode_sparse(texts, k=24)
            want = engine.encode_sparse(texts, k=24)
            assert len(pairs) == 2
            for (gi, gv), (wi, wv) in zip(pairs, want):
                np.testing.assert_array_equal(gi, wi)
                np.testing.assert_allclose(gv, wv, rtol=1e-6)


def test_sparse_frame_dense_model_error(server):
    """Dense fixture model: the sparse frame gets a per-request error frame
    and the connection stays usable."""
    port, _engine = server
    with EmbeddingClient("127.0.0.1", port) as c:
        with pytest.raises(RuntimeError, match="MLM head"):
            c.encode_sparse(["a"])
        vecs = c.embed(["still alive"])
        assert vecs.shape[0] == 1


def test_hostile_sparse_maxsim_frames(server):
    """Hostile TPW/TPX frames produce error frames, not hangs or unbounded
    allocations."""
    port, _ = server

    def read_u32(s):
        buf = b""
        while len(buf) < 4:
            buf += s.recv(4 - len(buf))
        return struct.unpack("<I", buf)[0]

    # sparse k = 0 violates the frame contract
    s = socket.create_connection(("127.0.0.1", port), 10)
    s.recv(4)
    s.sendall(b"\x01TPW" + struct.pack("<I", 0) + struct.pack("<I", 1)
              + struct.pack("<I", 1) + b"x")
    assert read_u32(s) == 0xFFFFFFFF
    assert b"malformed" in s.recv(read_u32(s))
    s.close()

    # sparse k over the cap
    s = socket.create_connection(("127.0.0.1", port), 10)
    s.recv(4)
    s.sendall(b"\x01TPW" + struct.pack("<I", 1 << 20))
    assert read_u32(s) == 0xFFFFFFFF
    s.close()

    # maxsim with a zero-length query
    s = socket.create_connection(("127.0.0.1", port), 10)
    s.recv(4)
    s.sendall(b"\x01TPX" + struct.pack("<II", 0, 0))
    assert read_u32(s) == 0xFFFFFFFF
    s.close()

    # maxsim with zero documents -> per-request error, connection SURVIVES
    s = socket.create_connection(("127.0.0.1", port), 10)
    s.recv(4)
    q = b"hi"
    s.sendall(b"\x01TPX" + struct.pack("<II", 0, len(q)) + q
              + struct.pack("<I", 0))
    assert read_u32(s) == 0xFFFFFFFF
    assert b"no documents" in s.recv(read_u32(s))
    s.sendall(b"\x01TPM")  # meta frame still answers on the same socket
    ln = read_u32(s)
    assert ln > 0 and b"n_embd" in s.recv(ln)
    s.close()


def test_sparse_and_hybrid_index_search_frames():
    """\\x01TPY/\\x01TPZ/\\x01TPF/\\x01TPG: sparse and hybrid corpus
    build/search over the wire, matching the batcher-level results."""
    pytest.importorskip("tokenizers")
    import dataclasses

    from conftest import serve_in_thread

    cfg = dataclasses.replace(CFG, mlm_head=True, name="tcp-splade-idx")
    engine = Engine.synthetic(cfg, opts=ComputeOptions(dtype="float32"))
    docs = ["the dog sat on the mat", "hello world", "partly cloudy skies"]
    with serve_in_thread(engine, window_ms=1.0) as port:
        with EmbeddingClient("127.0.0.1", port) as c:
            # search before indexing -> per-request error, connection lives
            with pytest.raises(RuntimeError, match="no sparse index"):
                c.sparse_search(["q"], k=2)
            assert c.hybrid_index(docs) == 3
            # hybrid_index populated BOTH indexes: all four surfaces answer
            assert c.sparse_index(["extra doc"]) == 4
            idx, scores = c.sparse_search(["hello world"], k=2)
            assert idx.shape == (1, 2) and scores[0, 0] >= scores[0, 1]
            d_idx, _ = c.search(["hello world"], k=2)
            assert d_idx.shape == (1, 2)
            # hybrid now desyncs (sparse has one extra doc) -> clean error
            with pytest.raises(RuntimeError, match="desync"):
                c.hybrid_search(["hello world"], k=2)


def test_maxsim_index_search_frames(server):
    """\\x01TPJ / \\x01TPK: on-device token-state corpus build + batched
    MaxSim top-k over the wire; scores match the engine-side index."""
    port, engine = server
    from embedding_cpp_tpu.runtime.maxsim_search import MaxSimIndex

    corpus = [f"document number {i} about topic {i}" for i in range(9)]
    with EmbeddingClient("127.0.0.1", port) as c:
        with pytest.raises(RuntimeError, match="no MaxSim index"):
            c.maxsim_search(["q"], k=2)
        assert c.maxsim_index(corpus) == 9
        idx, scores = c.maxsim_search([corpus[4], corpus[7]], k=3)
        assert idx.shape == (2, 3) and scores.shape == (2, 3)
        assert idx[0, 0] == 4 and idx[1, 0] == 7
        # padding contract: k past the corpus -> -1 ids, -inf scores
        idx2, scores2 = c.maxsim_search([corpus[0]], k=12)
        assert np.all(idx2[0, 9:] == -1) and np.all(np.isneginf(scores2[0, 9:]))
        # engine-side reference
        local = MaxSimIndex(engine)
        local.add(corpus)
        li, ls = local.search([corpus[4]], k=3)
        np.testing.assert_array_equal(idx[0], li[0])
        np.testing.assert_allclose(scores[0], ls[0], rtol=1e-3, atol=1e-3)
