"""The embedding engine: model + tokenizer + batched jitted forward.

The TPU-native replacement for the reference's `bert_ctx` + C ABI surface
(bert.h:41-92): one object owning the loaded parameters, the tokenizer, and a
cache of compiled forwards per static (batch, seq) shape.  Unlike the
reference (batching force-disabled, bert.cpp:1127-1128), `encode` really
batches: tokenize -> length-bucket -> padded static shapes -> jitted masked
forward -> scatter back to input order.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.constants import Keys
from ..gguf.reader import GGUFReader
from ..models.bert import ComputeOptions, bert_embed_batch
from ..models.config import BertConfig
from ..models.params import load_params, random_params
from ..tokenizer import SpecialIds, frame_ids, load_tokenizer
from .batching import DEFAULT_BATCH_BUCKETS, DEFAULT_SEQ_BUCKETS, pack_batches


class Engine:
    """Text -> L2-normalized embedding vectors."""

    def __init__(
        self,
        params,
        config: BertConfig,
        tokenizer=None,
        special_ids: SpecialIds | None = None,
        *,
        opts: ComputeOptions | None = None,
        mesh=None,
        seq_buckets: Sequence[int] = DEFAULT_SEQ_BUCKETS,
        batch_buckets: Sequence[int] = DEFAULT_BATCH_BUCKETS,
    ):
        self.config = config
        self.opts = opts or ComputeOptions()
        self.tokenizer = tokenizer
        self.special_ids = special_ids or SpecialIds(cls=101, sep=102, pad=0, unk=100)
        self.mesh = mesh
        self.seq_buckets = tuple(b for b in seq_buckets if b <= config.n_ctx) or (
            config.n_ctx,
        )
        self.batch_buckets = tuple(batch_buckets)
        self._fwd_cache: dict[tuple[int, int], object] = {}
        self.stats = {"sentences": 0, "tokens": 0, "batches": 0, "eval_time": 0.0}

        if mesh is not None:
            from ..parallel.sharding import shard_params_and_make_forward

            self.params, self._sharded_forward = shard_params_and_make_forward(
                params, config, self.opts, mesh
            )
        else:
            self.params = jax.device_put(params)
            self._sharded_forward = None

    # --- constructors -------------------------------------------------------
    @classmethod
    def from_gguf(
        cls,
        path: str,
        *,
        weight_mode: str = "auto",
        opts: ComputeOptions | None = None,
        tokenizer_backend: str = "auto",
        mesh=None,
        **kw,
    ) -> "Engine":
        opts = opts or ComputeOptions()
        dense_dtype = jnp.dtype(opts.dtype)
        with GGUFReader(path) as r:
            params, config = load_params(
                r, weight_mode=weight_mode, dense_dtype=dense_dtype
            )
            blob = r.kv.get(Keys.TOKENIZER_JSON_BLOB)
            tokenizer = (
                load_tokenizer(blob, tokenizer_backend) if blob else None
            )
            special = SpecialIds.from_gguf_kv(r.kv)
        return cls(
            params, config, tokenizer, special, opts=opts, mesh=mesh, **kw
        )

    @classmethod
    def from_hf_dir(
        cls,
        model_dir: str,
        *,
        ftype: str = "f32",
        opts: ComputeOptions | None = None,
        **kw,
    ) -> "Engine":
        """Load a local HF BERT checkpoint directly (converts to GGUF in a
        temp file, then loads — one call instead of convert + from_gguf)."""
        import tempfile

        from ..models.convert import convert_hf_dir

        with tempfile.NamedTemporaryFile(suffix=".gguf") as f:
            convert_hf_dir(model_dir, f.name, ftype)
            return cls.from_gguf(f.name, opts=opts, **kw)

    @classmethod
    def synthetic(
        cls,
        config: BertConfig,
        ftype="f32",
        *,
        seed: int = 0,
        opts: ComputeOptions | None = None,
        mesh=None,
        **kw,
    ) -> "Engine":
        """Random-weight engine (benchmarks / tests; no tokenizer unless
        `tokenizers` is available)."""
        from ..models.convert import FTYPE_NAMES

        opts = opts or ComputeOptions()
        if isinstance(ftype, str):
            ftype = FTYPE_NAMES[ftype]
        params = random_params(
            config, ftype, seed=seed, dense_dtype=jnp.dtype(opts.dtype)
        )
        tokenizer = None
        special = None
        try:
            from ..tokenizer.testvocab import build_tokenizer_json

            blob = build_tokenizer_json(config.n_vocab)
            tokenizer = load_tokenizer(blob)
            special = SpecialIds(cls=2, sep=3, pad=0, unk=1)
        except Exception:
            pass
        return cls(params, config, tokenizer, special, opts=opts, mesh=mesh, **kw)

    # --- tokenize -----------------------------------------------------------
    def tokenize(self, text: str) -> list[int]:
        """Framed token ids ([CLS]...[SEP]), the reference's bert_tokenize."""
        if self.tokenizer is None:
            raise RuntimeError("engine has no tokenizer (model without blob kv)")
        return frame_ids(
            self.tokenizer.encode(text), self.special_ids, self.config.n_ctx
        )

    def tokenize_batch(self, texts: Sequence[str]) -> list[list[int]]:
        if self.tokenizer is None:
            raise RuntimeError("engine has no tokenizer (model without blob kv)")
        raw = self.tokenizer.encode_batch(list(texts))
        return [
            frame_ids(ids, self.special_ids, self.config.n_ctx) for ids in raw
        ]

    # --- forward ------------------------------------------------------------
    def _forward(self, shape: tuple[int, int]):
        fwd = self._fwd_cache.get(shape)
        if fwd is None:
            if self._sharded_forward is not None:
                fwd = self._sharded_forward
            else:
                config, opts = self.config, self.opts

                @jax.jit
                def fwd(params, ids, mask):
                    return bert_embed_batch(params, ids, mask, config, opts)

            self._fwd_cache[shape] = fwd
        return fwd

    def embed_tokens(self, token_lists: Sequence[Sequence[int]]) -> np.ndarray:
        """Token-id lists -> [n, n_embd] f32 (the reference's
        bert_eval_batch, but actually batched)."""
        n = len(token_lists)
        out = np.empty((n, self.config.n_embd), dtype=np.float32)
        batches = pack_batches(
            token_lists,
            self.special_ids.pad,
            seq_buckets=self.seq_buckets,
            batch_buckets=self.batch_buckets,
            max_seq=self.config.n_ctx,
        )
        from ..utils.metrics import GLOBAL as metrics

        t0 = time.perf_counter()
        padded_slots = 0
        with metrics.timer("eval"):
            # dispatch everything first (jax dispatch is async), then fetch —
            # the device pipeline stays fed while the host packs/copies
            pending = []
            for batch in batches:
                fwd = self._forward(batch.ids.shape)
                pending.append((batch, fwd(self.params, batch.ids, batch.mask)))
                padded_slots += batch.ids.size
            for batch, vecs in pending:
                out[batch.positions] = np.asarray(vecs)[: len(batch.positions)]
        n_tokens = int(sum(len(t) for t in token_lists))
        self.stats["eval_time"] += time.perf_counter() - t0
        self.stats["sentences"] += n
        self.stats["tokens"] += n_tokens
        self.stats["batches"] += len(batches)
        metrics.inc("sentences", n)
        metrics.inc("tokens", n_tokens)
        metrics.inc("batches", len(batches))
        metrics.inc("padded_slots", padded_slots)
        return out

    def encode(self, texts: str | Sequence[str]) -> np.ndarray:
        """Texts -> [n, n_embd] L2-normalized f32 embeddings
        (the reference's bert_encode_batch, bert.h:54-62)."""
        if isinstance(texts, str):
            texts = [texts]
        return self.embed_tokens(self.tokenize_batch(texts))

    # --- introspection (bert.h:87-90 equivalents) ---------------------------
    @property
    def n_embd(self) -> int:
        return self.config.n_embd

    @property
    def n_max_tokens(self) -> int:
        return self.config.n_ctx

    def id_to_token(self, token_id: int) -> str:
        if self.tokenizer is None:
            return ""
        return self.tokenizer.id_to_token(token_id)

    def warmup(self, shapes: Sequence[tuple[int, int]] | None = None) -> None:
        """Pre-compile the forward for the given (or smallest) shapes."""
        if shapes is None:
            shapes = [(self.batch_buckets[0], self.seq_buckets[0])]
        for b, s in shapes:
            ids = np.full((b, s), self.special_ids.pad, dtype=np.int32)
            mask = np.zeros((b, s), dtype=np.int32)
            mask[:, 0] = 1
            np.asarray(self._forward((b, s))(self.params, ids, mask))
