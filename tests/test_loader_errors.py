"""Loader robustness: typed errors for malformed/incomplete model files
(the reference fprintf's and returns nullptr; we raise with context)."""
import struct

import numpy as np
import pytest

from embedding_cpp_tpu.gguf import GGMLType, GGUFReader, GGUFWriter, Keys
from embedding_cpp_tpu.models import BertConfig
from embedding_cpp_tpu.models.params import load_params, source_from_arrays, build_params

CFG = BertConfig(n_vocab=64, n_ctx=32, n_embd=32, n_layer=1, n_head=4, n_ff=64)


def test_bad_magic(tmp_path):
    p = tmp_path / "x.gguf"
    p.write_bytes(b"NOPE" + b"\0" * 100)
    with pytest.raises(ValueError, match="not a GGUF"):
        GGUFReader(p)


def test_bad_version(tmp_path):
    p = tmp_path / "x.gguf"
    p.write_bytes(b"GGUF" + struct.pack("<I", 99) + b"\0" * 100)
    with pytest.raises(ValueError, match="unsupported GGUF version"):
        GGUFReader(p)


def test_missing_tensor(tmp_path):
    """A GGUF with kv metadata but no weights must fail with the tensor name."""
    p = tmp_path / "x.gguf"
    w = GGUFWriter()
    w.add_string(Keys.ARCHITECTURE, "bert")
    w.write(str(p))
    with GGUFReader(p) as r:
        with pytest.raises(KeyError):
            build_params(
                _source_from_reader(r), CFG
            )


def _source_from_reader(r):
    from embedding_cpp_tpu.models.params import source_from_gguf

    return source_from_gguf(r)


def test_shape_mismatch():
    """Wrong tensor shape raises with name + both shapes (cf. the
    reference's create_tensor checks, bert.cpp:366-396)."""
    from embedding_cpp_tpu.models.params import random_state_dict

    sd = random_state_dict(CFG, 0)
    sd["embeddings.word_embeddings.weight"] = np.zeros((10, 10), np.float32)
    with pytest.raises(ValueError, match="word_embeddings"):
        build_params(source_from_arrays(sd), CFG)


def test_config_requires_divisible_heads():
    with pytest.raises(ValueError, match="divisible"):
        BertConfig(n_vocab=10, n_ctx=8, n_embd=30, n_layer=1, n_head=4, n_ff=8)


def test_missing_required_kv(tmp_path):
    p = tmp_path / "x.gguf"
    w = GGUFWriter()
    w.add_string(Keys.ARCHITECTURE, "bert")
    w.add_array(Keys.TOKENIZER_LIST, ["a"], __import__(
        "embedding_cpp_tpu.gguf.constants", fromlist=["GGUFValueType"]
    ).GGUFValueType.STRING)
    w.write(str(p))
    with GGUFReader(p) as r:
        with pytest.raises(KeyError):
            BertConfig.from_gguf_kv(r.kv)


@pytest.fixture(scope="module")
def valid_gguf_bytes(tmp_path_factory):
    pytest.importorskip("tokenizers")
    from embedding_cpp_tpu.cli.make_test_model import make_test_model

    p = tmp_path_factory.mktemp("fuzz") / "tiny.gguf"
    make_test_model(str(p), "tiny", "f32")
    return p.read_bytes()


def test_truncation_fuzz(tmp_path, valid_gguf_bytes):
    """Truncating a valid file at any prefix must raise a clean error (or
    succeed for truncations past the metadata that don't cut a mapped
    tensor), never hang or crash the process."""
    data = valid_gguf_bytes
    p = tmp_path / "trunc.gguf"
    offsets = [0, 1, 3, 4, 7, 8, 12, 20, 100, 1000, len(data) // 2,
               len(data) - 1]
    for off in offsets:
        p.write_bytes(data[:off])
        try:
            with GGUFReader(p) as r:
                for name in list(r.tensors)[:3]:
                    r.tensor_raw(name)
        except Exception as e:
            assert not isinstance(e, (MemoryError, SystemError)), (off, e)


def test_mutation_fuzz(tmp_path, valid_gguf_bytes):
    """Random byte flips in the header/metadata region: every mutant must
    either load or raise a clean Python exception — bounded memory, no
    crash.  (Counts read from the file must be validated against the file
    size before allocation.)"""
    rng = np.random.default_rng(0)
    data = bytearray(valid_gguf_bytes)
    meta_span = min(len(data), 4096)
    p = tmp_path / "mut.gguf"
    for _ in range(200):
        mutant = bytearray(data)
        for _ in range(rng.integers(1, 4)):
            pos = int(rng.integers(0, meta_span))
            mutant[pos] = int(rng.integers(0, 256))
        p.write_bytes(bytes(mutant))
        try:
            with GGUFReader(p) as r:
                _ = r.kv
                for name in list(r.tensors)[:2]:
                    r.tensor_raw(name)
        except Exception as e:
            assert not isinstance(e, (MemoryError, SystemError)), e


def test_hostile_family_kv_rejected_cleanly():
    """Hostile/nonsense family kv combinations must raise clean ValueErrors
    at config construction, never load garbage: factorized embeddings on a
    family without a projection; unknown head activation."""
    from embedding_cpp_tpu.gguf.constants import Keys as K

    base = {
        K.TOKENIZER_LIST: [b"x"] * 64,
        K.CONTEXT_LENGTH: 32,
        K.EMBEDDING_LENGTH: 32,
        K.BLOCK_COUNT: 1,
        K.HEAD_COUNT: 4,
        K.FEED_FORWARD_LENGTH: 64,
    }
    # bert.embedding_width on a plain bert file: no emb_proj tensors exist
    # for the family — reject rather than silently mis-shape the tables
    with pytest.raises(ValueError, match="factorized"):
        BertConfig.from_gguf_kv({**base, K.EMB_WIDTH: 16})
    with pytest.raises(ValueError, match="head_activation"):
        BertConfig.from_gguf_kv(
            {**base, K.N_LABELS: 1, K.HEAD_ACTIVATION: "exp"}
        )
    # unknown architectures fall back to the bert schema (reference files
    # carry no architecture kv at all)
    c = BertConfig.from_gguf_kv(
        {**base, Keys.ARCHITECTURE: "some-future-arch"}
    )
    assert c.arch == "bert"
