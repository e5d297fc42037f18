"""Named prompt prefixes (sentence-transformers semantics): e5-style
"query: "/"passage: " and instruction prompts, carried from
config_sentence_transformers.json through the GGUF kv into the engine and
every text-accepting surface (encode, index/search, /v1/embeddings).

The reference has no prompt concept at all — its converter reads only
config.json/tokenizer.json (models/convert-to-gguf.py), so prefix models
silently degrade through it.
"""
import asyncio
import http.client
import json
import socket
import threading

import numpy as np
import pytest

from embedding_cpp_tpu.models import BertConfig, ComputeOptions
from embedding_cpp_tpu.runtime.engine import Engine

F32 = ComputeOptions(dtype="float32")
CFG = BertConfig(
    n_vocab=1000, n_ctx=64, n_embd=64, n_layer=1, n_head=4, n_ff=128,
    name="prompt-test-model",
)
PROMPTS = {"query": "q: ", "passage": "p: "}


@pytest.fixture(scope="module")
def engine():
    pytest.importorskip("tokenizers")
    eng = Engine.synthetic(CFG, opts=F32, prompts=dict(PROMPTS))
    return eng


# --- resolution ---------------------------------------------------------------

def test_resolve_prompt(engine):
    assert engine.resolve_prompt("query") == "q: "
    assert engine.resolve_prompt("passage") == "p: "
    assert engine.resolve_prompt() == ""  # no default configured
    assert engine.resolve_prompt("") == ""
    assert engine.resolve_prompt(prompt="literal ") == "literal "
    assert engine.resolve_prompt("query", prompt="wins ") == "wins "
    with pytest.raises(ValueError, match="unknown prompt_name"):
        engine.resolve_prompt("nope")
    with pytest.raises(ValueError, match="prompt must be a string"):
        engine.resolve_prompt(prompt=3)


def test_default_prompt_applied_and_disabled():
    pytest.importorskip("tokenizers")
    eng = Engine.synthetic(
        CFG, opts=F32, prompts={"inst": "Represent: "},
        default_prompt_name="inst",
    )
    assert eng.resolve_prompt() == "Represent: "
    assert eng.resolve_prompt("") == ""  # explicit opt-out
    auto = eng.encode(["hello world"])
    manual = eng.encode(["Represent: hello world"], prompt="")
    np.testing.assert_allclose(auto, manual, atol=1e-6)
    # and it actually changes the embedding vs the bare text
    bare = eng.encode(["hello world"], prompt="")
    assert not np.allclose(auto, bare, atol=1e-4)


def test_bad_default_prompt_name_rejected():
    with pytest.raises(ValueError, match="default_prompt_name"):
        Engine.synthetic(CFG, opts=F32, default_prompt_name="missing")


def test_query_document_prefix_fallbacks(engine):
    assert engine.query_prompt_prefix() == "q: "
    assert engine.document_prompt_prefix() == "p: "  # passage fallback
    eng2 = Engine.synthetic(
        CFG, opts=F32, prompts={"document": "d: ", "passage": "p: "}
    )
    assert eng2.document_prompt_prefix() == "d: "  # document preferred
    assert eng2.query_prompt_prefix() == ""  # no query prompt, no default
    eng3 = Engine.synthetic(CFG, opts=F32)
    assert eng3.query_prompt_prefix() == ""
    assert eng3.document_prompt_prefix() == ""


# --- encode surfaces ----------------------------------------------------------

def test_encode_prompt_equals_manual_prefix(engine):
    want = engine.encode(["q: where is x", "q: what is y"], prompt="")
    got = engine.encode(["where is x", "what is y"], prompt_name="query")
    np.testing.assert_allclose(got, want, atol=1e-6)
    got_q = engine.encode_queries(["where is x", "what is y"])
    np.testing.assert_allclose(got_q, want, atol=1e-6)
    got_d = engine.encode_documents(["doc a"])
    np.testing.assert_allclose(
        got_d, engine.encode(["p: doc a"], prompt=""), atol=1e-6
    )


def test_encode_counts_include_prefix_tokens(engine):
    _, bare = engine.encode_with_counts(["hello"], prompt="")
    _, prefixed = engine.encode_with_counts(["hello"], prompt_name="query")
    assert prefixed[0] > bare[0]


def test_index_and_search_apply_prompts(engine):
    from embedding_cpp_tpu.runtime.search import VectorIndex

    docs = ["the dog sat", "milk is white", "a dog runs"]
    idx = VectorIndex(engine)
    idx.add(docs)
    # corpus rows must equal passage-prefixed embeddings (loose: the
    # device-ingest path is a different jit program than host encode, and
    # their reduction orders differ) — and must NOT match the bare texts
    want = engine.encode([f"p: {d}" for d in docs], prompt="")
    bare = engine.encode(docs, prompt="")
    rows = np.asarray(idx._snapshot_rows())[: len(docs)]
    np.testing.assert_allclose(rows, want, atol=5e-3)
    assert np.abs(rows - bare).max() > 5e-2
    # query path must equal query-prefixed search_vectors
    ids, scores = idx.search(["dog"], k=2)
    qv = engine.encode(["q: dog"], prompt="")
    ids2, scores2 = idx.search_vectors(qv, k=2)
    np.testing.assert_array_equal(ids, ids2)
    np.testing.assert_allclose(scores, scores2, atol=1e-5)


# --- converter + GGUF kv ------------------------------------------------------

def test_hf_dir_prompts_roundtrip(tmp_path):
    """config_sentence_transformers.json prompts -> GGUF kv -> Engine."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    pytest.importorskip("tokenizers")

    from embedding_cpp_tpu.models.convert import convert_hf_dir
    from embedding_cpp_tpu.tokenizer.testvocab import build_tokenizer_json

    hf_config = transformers.BertConfig(
        vocab_size=256, hidden_size=64, num_hidden_layers=1,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=64, type_vocab_size=2, hidden_act="gelu",
        architectures=["BertModel"],
    )
    torch.manual_seed(3)
    model = transformers.BertModel(hf_config)
    src = tmp_path / "hf-e5ish"
    src.mkdir()
    (src / "config.json").write_text(hf_config.to_json_string())
    torch.save(model.state_dict(), src / "pytorch_model.bin")
    (src / "tokenizer.json").write_bytes(build_tokenizer_json(256))
    (src / "config_sentence_transformers.json").write_text(json.dumps({
        "prompts": {"query": "query: ", "passage": "passage: ",
                    "empty": "", "bogus": 7},
        "default_prompt_name": "query",
    }))

    out = tmp_path / "e5ish.gguf"
    convert_hf_dir(src, out)
    eng = Engine.from_gguf(str(out), opts=F32)
    # empty/non-string prefixes are dropped at conversion
    assert eng.prompts == {"query": "query: ", "passage": "passage: "}
    assert eng.default_prompt_name == "query"
    np.testing.assert_allclose(
        eng.encode(["abc"]), eng.encode(["query: abc"], prompt=""),
        atol=1e-6,
    )


def test_dangling_default_prompt_dropped(tmp_path):
    from embedding_cpp_tpu.models.convert import _read_st_prompts

    d = tmp_path / "m"
    d.mkdir()
    (d / "config_sentence_transformers.json").write_text(json.dumps({
        "prompts": {"query": "query: "}, "default_prompt_name": "gone",
    }))
    assert _read_st_prompts(d) == ({"query": "query: "}, "")
    (d / "config_sentence_transformers.json").write_text("{}")
    assert _read_st_prompts(d) == ({}, "")


# --- HTTP surface -------------------------------------------------------------

def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def http_server(engine):
    from embedding_cpp_tpu.runtime.server import serve

    http_port = _free_port()
    tcp_port = _free_port()
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
    yield http_port
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


def test_http_prompt_name(http_server, engine):
    status, body = _post(http_server, "/v1/embeddings",
                         {"input": "where is x", "prompt_name": "query"})
    assert status == 200
    got = np.array(body["data"][0]["embedding"], np.float32)
    want = engine.encode(["q: where is x"], prompt="")[0]
    np.testing.assert_allclose(got, want, atol=1e-5)
    # literal prompt
    status, body = _post(http_server, "/v1/embeddings",
                         {"input": "x", "prompt": "LIT "})
    assert status == 200
    got = np.array(body["data"][0]["embedding"], np.float32)
    np.testing.assert_allclose(
        got, engine.encode(["LIT x"], prompt="")[0], atol=1e-5
    )
    # prompt tokens count toward usage
    s1, b1 = _post(http_server, "/v1/embeddings", {"input": "x"})
    s2, b2 = _post(http_server, "/v1/embeddings",
                   {"input": "x", "prompt_name": "query"})
    assert b2["usage"]["prompt_tokens"] > b1["usage"]["prompt_tokens"]


def test_http_unknown_prompt_name_400(http_server):
    status, body = _post(http_server, "/v1/embeddings",
                         {"input": "x", "prompt_name": "nope"})
    assert status == 400
    assert "unknown prompt_name" in body["error"]["message"]


def test_http_index_search_prompts(http_server, engine):
    docs = ["the dog sat", "milk is white"]
    status, body = _post(http_server, "/v1/index", {"input": docs})
    assert status == 200
    status, body = _post(http_server, "/v1/search",
                         {"input": ["dog"], "k": 1})
    assert status == 200
    # the search ran query-prefixed against passage-prefixed docs
    qv = engine.encode(["q: dog"], prompt="")
    dv = engine.encode([f"p: {d}" for d in docs], prompt="")
    want = int(np.argmax(dv @ qv[0]))
    assert body["results"][0][0]["index"] == want


def test_from_gguf_caller_default_prompt_wins(tmp_path):
    """A caller-passed default_prompt_name overrides the file's."""
    from embedding_cpp_tpu.models import random_state_dict
    from embedding_cpp_tpu.models.convert import write_bert_gguf
    from embedding_cpp_tpu.tokenizer.testvocab import build_tokenizer_json

    cfg = BertConfig(n_vocab=256, n_ctx=32, n_embd=32, n_layer=1, n_head=2,
                     n_ff=64, name="tiny-prompted")
    path = tmp_path / "p.gguf"
    write_bert_gguf(
        path, cfg, random_state_dict(cfg, seed=1), build_tokenizer_json(256),
        prompts={"query": "q: ", "passage": "p: "},
        default_prompt_name="query",
    )
    eng = Engine.from_gguf(str(path), opts=F32)
    assert eng.default_prompt_name == "query"  # file's default
    eng2 = Engine.from_gguf(str(path), opts=F32,
                            default_prompt_name="passage")
    assert eng2.default_prompt_name == "passage"  # caller wins
    eng3 = Engine.from_gguf(str(path), opts=F32, default_prompt_name="")
    assert eng3.resolve_prompt() == ""  # caller disables the default
