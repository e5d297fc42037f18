"""Native C ABI (native/capi, the bert.h analog): ctypes client over
libtpuembed_capi.so, both attach (tpe_connect) and spawn
(tpe_load_from_file) paths, checked against direct Engine output."""
import asyncio
import os
import socket
import sys
import threading

import numpy as np
import pytest

LIB = os.path.join(os.path.dirname(__file__), "..", "native", "build",
                   "libtpuembed_capi.so")

pytestmark = pytest.mark.skipif(
    not os.path.exists(LIB), reason="libtpuembed_capi.so not built "
    "(make -C native)")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    pytest.importorskip("tokenizers")
    from embedding_cpp_tpu.cli.make_test_model import make_test_model

    path = tmp_path_factory.mktemp("capi") / "tiny.gguf"
    make_test_model(str(path), "tiny", "f32")
    return str(path)


@pytest.fixture(scope="module")
def running_server(model_path):
    """In-process asyncio server on a background thread."""
    from embedding_cpp_tpu.runtime.engine import Engine
    from embedding_cpp_tpu.runtime.server import serve

    engine = Engine.from_gguf(model_path)
    port = _free_port()
    loop = asyncio.new_event_loop()
    holder = {}

    async def run():
        try:
            await serve(engine, "127.0.0.1", port)
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
            s = socket.create_connection(("127.0.0.1", port), timeout=0.2)
            s.close()
            break
        except OSError:
            time.sleep(0.1)
    yield engine, port
    loop.call_soon_threadsafe(holder["task"].cancel)
    t.join(timeout=5)


def test_ctypes_connect_matches_engine(running_server):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from examples.sample_dylib import TpuEmbedModel

    engine, port = running_server
    model = TpuEmbedModel(host="127.0.0.1", port=port, lib_path=LIB)
    try:
        assert model.n_embd == engine.n_embd
        texts = ["hello world", "a second test sentence", "third"]
        via_capi = model.encode(texts)
        direct = engine.encode(texts)
        np.testing.assert_allclose(via_capi, direct, atol=1e-6)
        # single-text variant
        one = model.encode("hello world")
        np.testing.assert_allclose(one, direct[0], atol=1e-6)
    finally:
        model.close()


def test_spawn_load_from_file(model_path):
    """tpe_load_from_file forks the engine server like bert_load_from_file
    loads a model: one call, then encode."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from examples.sample_dylib import TpuEmbedModel

    os.environ.setdefault("TPE_PYTHON", sys.executable)
    model = TpuEmbedModel(model_path=model_path, lib_path=LIB)
    try:
        assert model.n_embd > 0
        vecs = model.encode(["spawned server roundtrip", "second"])
        assert vecs.shape == (2, model.n_embd)
        norms = np.linalg.norm(vecs, axis=1)
        # the spawned server's default transfer is packed int8 (unpacked to
        # f32 on the wire): unit norm within quantization error (~1e-3)
        np.testing.assert_allclose(norms, 1.0, atol=5e-3)
    finally:
        model.close()


def test_eval_batch_rejects_bad_lens(running_server):
    """A negative length must fail fast with last_error set, not wrap to a
    ~4 GiB read past the ids buffer (ADVICE r1); the connection stays usable
    because nothing was sent."""
    import ctypes

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from examples.sample_dylib import TpuEmbedModel

    engine, port = running_server
    model = TpuEmbedModel(host="127.0.0.1", port=port, lib_path=LIB)
    try:
        lens = (ctypes.c_int32 * 2)(3, -7)
        ids = (ctypes.c_int32 * 6)(*([1] * 6))
        out = (ctypes.c_float * (2 * model.n_embd))()
        rc = model.lib.tpe_eval_batch(model.ctx, 2, lens, ids, out)
        assert rc == -1
        err = model.lib.tpe_last_error(model.ctx).decode()
        assert "lens" in err
        # nothing hit the wire: the context still works
        vecs = model.encode(["still alive"])
        assert vecs.shape == (1, model.n_embd)
    finally:
        model.close()


def test_protocol_mismatch_kills_connection(model_path):
    """After a reply-side protocol mismatch the context is marked dead
    (fd closed) instead of leaving the stream mid-reply and desynchronizing
    every later call (ADVICE r1).  A fake server sends a wrong-count reply."""
    import ctypes
    import struct

    lib = ctypes.CDLL(LIB)
    lib.tpe_connect.restype = ctypes.c_void_p
    lib.tpe_connect.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.tpe_encode_batch.restype = ctypes.c_int
    lib.tpe_encode_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_float),
    ]
    lib.tpe_last_error.restype = ctypes.c_char_p
    lib.tpe_last_error.argtypes = [ctypes.c_void_p]
    lib.tpe_free.argtypes = [ctypes.c_void_p]

    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    n_embd = 8

    def fake_server():
        conn, _ = srv.accept()
        conn.sendall(struct.pack("<i", n_embd))  # handshake
        conn.recv(1 << 16)  # swallow the request
        # reply claims 2 vectors for a 1-text request, then only 1 vector
        conn.sendall(struct.pack("<I", 2) + b"\x00" * (n_embd * 4))
        # hold the socket open: a desynced client would mis-read from here
        threading.Event().wait(5)

    t = threading.Thread(target=fake_server, daemon=True)
    t.start()

    ctx = lib.tpe_connect(b"127.0.0.1", port)
    assert ctx
    texts = (ctypes.c_char_p * 1)(b"x")
    out = (ctypes.c_float * n_embd)()
    rc = lib.tpe_encode_batch(ctx, 1, texts, out)
    assert rc == -1
    assert b"wrong count" in lib.tpe_last_error(ctx)
    # the context is dead now: the next call fails immediately rather than
    # parsing the stale half-reply still buffered in the socket
    rc2 = lib.tpe_encode_batch(ctx, 1, texts, out)
    assert rc2 == -1
    lib.tpe_free(ctx)
    srv.close()


def test_ctypes_full_bert_h_surface(running_server):
    """tokenize / eval / n_max_tokens / id_to_token over the C ABI — the
    remaining bert.h entry points (bert.h:64,79,88,90)."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from examples.sample_dylib import TpuEmbedModel

    engine, port = running_server
    model = TpuEmbedModel(host="127.0.0.1", port=port, lib_path=LIB)
    try:
        assert model.n_max_tokens == engine.n_max_tokens
        text = "hello tokenized world"
        ids = model.tokenize(text)
        assert ids == engine.tokenize(text)
        # eval pre-tokenized == encode of the text
        via_eval = model.eval_tokens([ids, engine.tokenize("second")])
        direct = engine.embed_tokens([ids, engine.tokenize("second")])
        np.testing.assert_allclose(via_eval, direct, atol=1e-6)
        assert model.id_to_token(ids[0]) == engine.id_to_token(ids[0])
    finally:
        model.close()


def test_index_and_search_via_capi(running_server):
    """tpe_index / tpe_search: on-device vector search through the C ABI."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from examples.sample_dylib import TpuEmbedModel

    engine, port = running_server
    model = TpuEmbedModel(host="127.0.0.1", port=port, lib_path=LIB)
    try:
        corpus = [f"document number {i} about subject {i % 5}"
                  for i in range(8)]
        assert model.index(corpus) >= 8  # index is server-global, may grow
        idx, scores = model.search([corpus[2], corpus[6]], k=3)
        assert idx.shape == (2, 3) and scores.shape == (2, 3)
        assert np.all(scores[:, 0] >= scores[:, 1])
        # k clamps to the corpus size when oversized
        idx2, _ = model.search([corpus[0]], k=4096)
        assert idx2.shape[1] <= 4096
    finally:
        model.close()


def test_model_quantize_via_capi(model_path, tmp_path):
    """tpe_model_quantize (bert_model_quantize parity, bert.h:92): numeric
    codes 2/3 (reference) and 7 (our q8_0 extension)."""
    import ctypes

    from embedding_cpp_tpu.gguf import GGMLType, GGUFReader

    lib = ctypes.CDLL(LIB)
    lib.tpe_model_quantize.restype = ctypes.c_int
    lib.tpe_model_quantize.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                       ctypes.c_int]
    os.environ.setdefault("TPE_PYTHON", sys.executable)
    for code, gtype in ((2, GGMLType.Q4_0), (7, GGMLType.Q8_0)):
        out = str(tmp_path / f"quant-{code}.gguf")
        rc = lib.tpe_model_quantize(model_path.encode(), out.encode(), code)
        assert rc == 0
        with GGUFReader(out) as r:
            wq = r.tensors["encoder.layer.0.attention.self.query.weight"]
            assert wq.ggml_type == gtype
    # bad inputs fail cleanly
    assert lib.tpe_model_quantize(b"/nonexistent.gguf", b"/tmp/x.gguf", 2) == -1
    assert lib.tpe_model_quantize(None, b"/tmp/x.gguf", 2) == -1


def test_rerank_via_capi(tmp_path):
    """tpe_rerank against a reranker GGUF (classification head): descending
    sigmoid scores matching Engine.rerank; top_n honored."""
    pytest.importorskip("tokenizers")
    from embedding_cpp_tpu.cli.make_test_model import make_test_model
    from embedding_cpp_tpu.runtime.engine import Engine
    from embedding_cpp_tpu.runtime.server import serve

    path = tmp_path / "tiny-reranker.gguf"
    make_test_model(str(path), "tiny-reranker", "f32")
    engine = Engine.from_gguf(str(path))
    port = _free_port()
    loop = asyncio.new_event_loop()
    holder = {}

    def thread_main():
        asyncio.set_event_loop(loop)
        holder["task"] = loop.create_task(
            serve(engine, "127.0.0.1", port))
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
            s = socket.create_connection(("127.0.0.1", port), timeout=0.2)
            s.close()
            break
        except OSError:
            time.sleep(0.1)
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from examples.sample_dylib import TpuEmbedModel

    model = TpuEmbedModel(host="127.0.0.1", port=port, lib_path=LIB)
    try:
        docs = ["the dog sat on the mat", "cats drink milk", "dogs run"]
        idx, scores = model.rerank("where is the dog", docs)
        assert idx.shape == (3,) and np.all(np.diff(scores) <= 0)
        want = engine.rerank("where is the dog", docs)
        assert idx.tolist() == [w["index"] for w in want]
        np.testing.assert_allclose(
            scores, [w["relevance_score"] for w in want], rtol=1e-6
        )
        idx2, scores2 = model.rerank("where is the dog", docs, top_n=2)
        assert idx2.tolist() == idx[:2].tolist()
    finally:
        model.close()
        loop.call_soon_threadsafe(holder["task"].cancel)
        t.join(timeout=5)


def test_rerank_via_capi_no_head(running_server):
    """tpe_rerank against an embedding-only model: -1 with the error in
    tpe_last_error, and the connection stays usable."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from examples.sample_dylib import TpuEmbedModel

    engine, port = running_server
    model = TpuEmbedModel(host="127.0.0.1", port=port, lib_path=LIB)
    try:
        with pytest.raises(RuntimeError, match="no classification head"):
            model.rerank("q", ["a", "b"])
        out = model.encode("still alive")  # error frame isolated the request
        assert out.shape == (engine.n_embd,)
    finally:
        model.close()


def test_maxsim_via_capi(running_server):
    """tpe_maxsim against the plain embedding model (no head needed):
    matches Engine.maxsim_rerank; top_n honored."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from examples.sample_dylib import TpuEmbedModel

    engine, port = running_server
    docs = ["the dog sat on the mat", "hello world", "hello world again"]
    model = TpuEmbedModel(host="127.0.0.1", port=port, lib_path=LIB)
    try:
        idx, scores = model.maxsim("hello world", docs)
        want = engine.maxsim_rerank("hello world", docs)
        assert idx.tolist() == [w["index"] for w in want]
        np.testing.assert_allclose(
            scores, [w["relevance_score"] for w in want], rtol=1e-6
        )
        idx2, _ = model.maxsim("hello world", docs, top_n=1)
        assert idx2.tolist() == idx[:1].tolist()
    finally:
        model.close()


def test_encode_sparse_via_capi(tmp_path):
    """tpe_encode_sparse against a SPLADE GGUF: pairs match
    Engine.encode_sparse; a dense model fails with last_error set."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from embedding_cpp_tpu.cli.make_test_model import make_test_model
    from embedding_cpp_tpu.runtime.engine import Engine
    from examples.sample_dylib import TpuEmbedModel

    from conftest import serve_in_thread

    path = tmp_path / "tiny-splade.gguf"
    make_test_model(str(path), "tiny-splade", "f32")
    engine = Engine.from_gguf(str(path))
    with serve_in_thread(engine) as port:
        model = TpuEmbedModel(host="127.0.0.1", port=port, lib_path=LIB)
        try:
            texts = ["hello world", "another test"]
            pairs = model.encode_sparse(texts, k=16)
            want = engine.encode_sparse(texts, k=16)
            for (gi, gv), (wi, wv) in zip(pairs, want):
                np.testing.assert_array_equal(gi, wi)
                np.testing.assert_allclose(gv, wv, rtol=1e-6)
        finally:
            model.close()


def test_encode_sparse_via_capi_dense_model(running_server):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from examples.sample_dylib import TpuEmbedModel

    _engine, port = running_server
    model = TpuEmbedModel(host="127.0.0.1", port=port, lib_path=LIB)
    try:
        with pytest.raises(RuntimeError, match="MLM head"):
            model.encode_sparse(["a"])
        # connection survives the error frame
        assert model.encode("still alive").shape == (model.n_embd,)
    finally:
        model.close()


def test_sparse_hybrid_index_search_via_capi(tmp_path):
    """tpe_sparse_index/search + tpe_hybrid_index/search against a SPLADE
    server: totals and rankings match the wire client."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from conftest import serve_in_thread
    from embedding_cpp_tpu.cli.make_test_model import make_test_model
    from embedding_cpp_tpu.runtime.engine import Engine
    from examples.sample_dylib import TpuEmbedModel

    path = tmp_path / "tiny-splade-idx.gguf"
    make_test_model(str(path), "tiny-splade", "f32")
    engine = Engine.from_gguf(str(path))
    docs = ["the dog sat", "hello world", "partly cloudy"]
    with serve_in_thread(engine) as port:
        model = TpuEmbedModel(host="127.0.0.1", port=port, lib_path=LIB)
        try:
            assert model.hybrid_index(docs) == 3
            idx, scores = model.hybrid_search(["hello world"], k=3)
            assert idx.shape == (1, 3)
            s_idx, s_scores = model.sparse_search(["hello world"], k=3)
            assert s_idx.shape == (1, 3)
            assert np.all(np.diff(s_scores[0]) <= 1e-6)
            assert model.sparse_index(["extra"]) == 4
            # desync -> -1 with the message in last_error, stream intact
            with pytest.raises(RuntimeError, match="desync"):
                model.hybrid_search(["q"], k=1)
            assert model.encode("still alive").shape == (model.n_embd,)
        finally:
            model.close()


def test_maxsim_index_search_via_capi(running_server):
    """tpe_maxsim_index/tpe_maxsim_search: late-interaction retrieval
    through the C ABI — totals, ranking, and the -1/-inf padding."""
    engine, port = running_server
    from examples.sample_dylib import TpuEmbedModel

    docs = [f"capi doc {i} about subject {i}" for i in range(5)]
    model = TpuEmbedModel(host="127.0.0.1", port=port, lib_path=LIB)
    try:
        with pytest.raises(RuntimeError, match="no MaxSim index"):
            model.maxsim_search(["q"], k=2)
        assert model.maxsim_index(docs) == 5
        idx, scores = model.maxsim_search([docs[3]], k=2)
        assert idx.shape == (1, 2) and idx[0, 0] == 3
        assert scores[0, 0] >= scores[0, 1]
        idx, scores = model.maxsim_search([docs[0]], k=8)
        assert np.all(idx[0, 5:] == -1)
        assert model.encode("still alive").shape == (model.n_embd,)
    finally:
        model.close()
