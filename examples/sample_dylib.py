"""ctypes client over the native C ABI (libtpuembed_capi.so) — the
reference's examples/sample_dylib.py, re-targeted at the TPU engine.

The reference dlopens libbert.so and runs the whole CPU engine in-process;
here the C ABI spawns (or attaches to) the JAX engine server and streams
embeddings over the framed protocol, so the same ctypes surface fronts TPU
compute.

Usage:
    python examples/sample_dylib.py <model.gguf>              # spawn engine
    python examples/sample_dylib.py --connect HOST:PORT       # attach
"""
import ctypes
import os
import sys

import numpy as np

_LIB = os.path.join(os.path.dirname(__file__), "..", "native", "build",
                    "libtpuembed_capi.so")


class TpuEmbedModel:
    """The reference's BertModel ctypes wrapper (sample_dylib.py:16-41),
    over tpuembed.h instead of bert.h."""

    def __init__(self, model_path=None, host=None, port=None, lib_path=_LIB):
        self.lib = ctypes.cdll.LoadLibrary(lib_path)
        self.lib.tpe_load_from_file.restype = ctypes.c_void_p
        self.lib.tpe_load_from_file.argtypes = [ctypes.c_char_p]
        self.lib.tpe_connect.restype = ctypes.c_void_p
        self.lib.tpe_connect.argtypes = [ctypes.c_char_p, ctypes.c_int]
        self.lib.tpe_free.argtypes = [ctypes.c_void_p]
        self.lib.tpe_n_embd.restype = ctypes.c_int32
        self.lib.tpe_n_embd.argtypes = [ctypes.c_void_p]
        self.lib.tpe_encode_batch.restype = ctypes.c_int
        self.lib.tpe_encode_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_float),
        ]
        self.lib.tpe_last_error.restype = ctypes.c_char_p
        self.lib.tpe_last_error.argtypes = [ctypes.c_void_p]
        self.lib.tpe_n_max_tokens.restype = ctypes.c_int32
        self.lib.tpe_n_max_tokens.argtypes = [ctypes.c_void_p]
        self.lib.tpe_tokenize.restype = ctypes.c_int32
        self.lib.tpe_tokenize.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ]
        self.lib.tpe_eval_batch.restype = ctypes.c_int
        self.lib.tpe_eval_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
        ]
        self.lib.tpe_vocab_id_to_token.restype = ctypes.c_int32
        self.lib.tpe_vocab_id_to_token.argtypes = [
            ctypes.c_void_p, ctypes.c_int32, ctypes.c_char_p, ctypes.c_int32,
        ]
        self.lib.tpe_index.restype = ctypes.c_int32
        self.lib.tpe_index.argtypes = [
            ctypes.c_void_p, ctypes.c_int32, ctypes.POINTER(ctypes.c_char_p),
        ]
        self.lib.tpe_search.restype = ctypes.c_int32
        self.lib.tpe_search.argtypes = [
            ctypes.c_void_p, ctypes.c_int32, ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
        ]
        self.lib.tpe_rerank.restype = ctypes.c_int32
        self.lib.tpe_rerank.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
        ]
        self.lib.tpe_maxsim.restype = ctypes.c_int32
        self.lib.tpe_maxsim.argtypes = self.lib.tpe_rerank.argtypes
        for fn in (self.lib.tpe_sparse_index, self.lib.tpe_hybrid_index,
                   self.lib.tpe_maxsim_index):
            fn.restype = ctypes.c_int32
            fn.argtypes = self.lib.tpe_index.argtypes
        for fn in (self.lib.tpe_sparse_search, self.lib.tpe_hybrid_search,
                   self.lib.tpe_maxsim_search):
            fn.restype = ctypes.c_int32
            fn.argtypes = self.lib.tpe_search.argtypes
        self.lib.tpe_encode_sparse.restype = ctypes.c_int32
        self.lib.tpe_encode_sparse.argtypes = [
            ctypes.c_void_p, ctypes.c_int32, ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ]

        if model_path is not None:
            self.ctx = self.lib.tpe_load_from_file(model_path.encode())
        else:
            self.ctx = self.lib.tpe_connect(host.encode(), port)
        if not self.ctx:
            raise RuntimeError("tpe load/connect failed")
        self.n_embd = self.lib.tpe_n_embd(self.ctx)

    def close(self):
        if getattr(self, "ctx", None):
            self.lib.tpe_free(self.ctx)
            self.ctx = None

    def __del__(self):
        self.close()

    @property
    def n_max_tokens(self):
        return self.lib.tpe_n_max_tokens(self.ctx)

    def tokenize(self, text):
        """bert_tokenize equivalent: framed token ids."""
        cap = max(16, self.n_max_tokens or 512)
        out = (ctypes.c_int32 * cap)()
        n = self.lib.tpe_tokenize(self.ctx, text.encode(), out, cap)
        if n < 0:
            raise RuntimeError(self.lib.tpe_last_error(self.ctx).decode())
        return list(out[: min(n, cap)])

    def eval_tokens(self, id_lists):
        """bert_eval_batch equivalent: pre-tokenized ids -> embeddings."""
        n = len(id_lists)
        lens = (ctypes.c_int32 * n)(*[len(t) for t in id_lists])
        flat = [i for t in id_lists for i in t]
        ids = (ctypes.c_int32 * len(flat))(*flat)
        out = np.zeros((n, self.n_embd), dtype=np.float32)
        rc = self.lib.tpe_eval_batch(
            self.ctx, n, lens, ids,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if rc != 0:
            raise RuntimeError(self.lib.tpe_last_error(self.ctx).decode())
        return out

    def id_to_token(self, token_id):
        buf = ctypes.create_string_buffer(256)
        n = self.lib.tpe_vocab_id_to_token(self.ctx, token_id, buf, 256)
        if n < 0:
            raise RuntimeError(self.lib.tpe_last_error(self.ctx).decode())
        return buf.value.decode()

    def index(self, sentences):
        """Embed sentences into the server's on-device vector index;
        returns the total indexed count (tpe_index)."""
        n = len(sentences)
        texts = (ctypes.c_char_p * n)(*[s.encode() for s in sentences])
        total = self.lib.tpe_index(self.ctx, n, texts)
        if total < 0:
            raise RuntimeError(self.lib.tpe_last_error(self.ctx).decode())
        return total

    def _index_like(self, fn, sentences):
        n = len(sentences)
        texts = (ctypes.c_char_p * n)(*[s.encode() for s in sentences])
        total = fn(self.ctx, n, texts)
        if total < 0:
            raise RuntimeError(self.lib.tpe_last_error(self.ctx).decode())
        return total

    def _search_like(self, fn, queries, k):
        n = len(queries)
        texts = (ctypes.c_char_p * n)(*[q.encode() for q in queries])
        idx = np.zeros((n, k), dtype=np.int32)
        scores = np.zeros((n, k), dtype=np.float32)
        kr = fn(self.ctx, n, texts, k,
                idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        if kr < 0:
            raise RuntimeError(self.lib.tpe_last_error(self.ctx).decode())
        return (idx.reshape(-1)[: n * kr].reshape(n, kr),
                scores.reshape(-1)[: n * kr].reshape(n, kr))

    def sparse_index(self, sentences):
        """SPLADE-encode into the server's sparse index (tpe_sparse_index)."""
        return self._index_like(self.lib.tpe_sparse_index, sentences)

    def sparse_search(self, queries, k=5):
        """Exact sparse dot-product top-k (tpe_sparse_search)."""
        return self._search_like(self.lib.tpe_sparse_search, queries, k)

    def hybrid_index(self, sentences):
        """Add to BOTH the dense and sparse indexes (tpe_hybrid_index)."""
        return self._index_like(self.lib.tpe_hybrid_index, sentences)

    def hybrid_search(self, queries, k=5):
        """Dense + sparse RRF-fused top-k (tpe_hybrid_search)."""
        return self._search_like(self.lib.tpe_hybrid_search, queries, k)

    def maxsim_index(self, sentences):
        """Token states into the on-device late-interaction index
        (tpe_maxsim_index)."""
        return self._index_like(self.lib.tpe_maxsim_index, sentences)

    def maxsim_search(self, queries, k=5):
        """Batched MaxSim top-k over resident token states
        (tpe_maxsim_search)."""
        return self._search_like(self.lib.tpe_maxsim_search, queries, k)

    def search(self, queries, k=5):
        """Top-k over the on-device index (tpe_search): returns
        (indices [n, k'], scores [n, k']) — only ids + scores crossed the
        wire."""
        n = len(queries)
        texts = (ctypes.c_char_p * n)(*[q.encode() for q in queries])
        idx = np.zeros((n, k), dtype=np.int32)
        scores = np.zeros((n, k), dtype=np.float32)
        kr = self.lib.tpe_search(
            self.ctx, n, texts, k,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if kr < 0:
            raise RuntimeError(self.lib.tpe_last_error(self.ctx).decode())
        # entries are packed for k' columns; reshape accordingly
        return (idx.reshape(-1)[: n * kr].reshape(n, kr),
                scores.reshape(-1)[: n * kr].reshape(n, kr))

    def rerank(self, query, documents, top_n=None):
        """Cross-encoder rerank (tpe_rerank; needs a classification-head
        model): returns (indices [m], sigmoid scores [m]) descending."""
        n = len(documents)
        texts = (ctypes.c_char_p * n)(*[d.encode() for d in documents])
        cap = min(top_n, n) if top_n else n
        idx = np.zeros(cap, dtype=np.int32)
        scores = np.zeros(cap, dtype=np.float32)
        m = self.lib.tpe_rerank(
            self.ctx, query.encode(), n, texts, top_n or 0,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if m < 0:
            raise RuntimeError(self.lib.tpe_last_error(self.ctx).decode())
        return idx[:m], scores[:m]

    def maxsim(self, query, documents, top_n=None):
        """Late-interaction MaxSim rerank (tpe_maxsim; any model):
        returns (indices [m], raw MaxSim scores [m]) descending."""
        n = len(documents)
        texts = (ctypes.c_char_p * n)(*[d.encode() for d in documents])
        cap = min(top_n, n) if top_n else n
        idx = np.zeros(cap, dtype=np.int32)
        scores = np.zeros(cap, dtype=np.float32)
        m = self.lib.tpe_maxsim(
            self.ctx, query.encode(), n, texts, top_n or 0,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if m < 0:
            raise RuntimeError(self.lib.tpe_last_error(self.ctx).decode())
        return idx[:m], scores[:m]

    def encode_sparse(self, sentences, k=256):
        """SPLADE sparse vectors (tpe_encode_sparse; needs an MLM-head
        model): one (term ids, weights) pair per sentence, descending."""
        n = len(sentences)
        texts = (ctypes.c_char_p * n)(*[s.encode() for s in sentences])
        ids = np.zeros((n, k), dtype=np.int32)
        ws = np.zeros((n, k), dtype=np.float32)
        nnz = np.zeros(n, dtype=np.int32)
        rc = self.lib.tpe_encode_sparse(
            self.ctx, n, texts, k,
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            ws.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            nnz.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        if rc != 0:
            raise RuntimeError(self.lib.tpe_last_error(self.ctx).decode())
        return [(ids[i, : nnz[i]].copy(), ws[i, : nnz[i]].copy())
                for i in range(n)]

    def encode(self, sentences):
        one = isinstance(sentences, str)
        if one:
            sentences = [sentences]
        n = len(sentences)
        out = np.zeros((n, self.n_embd), dtype=np.float32)
        texts = (ctypes.c_char_p * n)(*[s.encode() for s in sentences])
        rc = self.lib.tpe_encode_batch(
            self.ctx, n, texts,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if rc != 0:
            raise RuntimeError(self.lib.tpe_last_error(self.ctx).decode())
        return out[0] if one else out


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        return 1
    if sys.argv[1] == "--connect":
        host, port = sys.argv[2].rsplit(":", 1)
        model = TpuEmbedModel(host=host, port=int(port))
    else:
        model = TpuEmbedModel(model_path=sys.argv[1])

    sentences = [
        "The quick brown fox jumps over the lazy dog.",
        "A fast auburn fox leaps above the sleepy hound.",
        "Quantum entanglement cannot transmit information.",
    ]
    vecs = model.encode(sentences)
    print(f"n_embd = {model.n_embd}")
    sims = vecs @ vecs.T
    for i, s in enumerate(sentences):
        print(f"[{i}] {s}")
    print("cosine similarity matrix:")
    print(np.array_str(sims, precision=4))
    model.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
