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
import threading
import time
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..gguf.constants import Keys
from ..gguf.reader import GGUFReader
from ..models.bert import ComputeOptions, bert_embed_batch, bert_score_batch
from ..models.config import BertConfig
from ..models.params import load_params, random_params
from ..tokenizer import SpecialIds, frame_ids, frame_pair_ids, load_tokenizer
from .batching import (
    DEFAULT_BATCH_BUCKETS,
    DEFAULT_PACK_SEQ,
    DEFAULT_SEQ_BUCKETS,
    PackedSegBatch,
    pack_batches,
    pack_segments,
)


def truncate_normalize(vecs: np.ndarray, dimensions: int) -> np.ndarray:
    """Matryoshka-style reduction: keep the first `dimensions` components and
    re-L2-normalize each row (OpenAI embeddings-API `dimensions` semantics)."""
    n_embd = vecs.shape[-1]
    if not isinstance(dimensions, int) or isinstance(dimensions, bool):
        raise ValueError("dimensions must be an integer")
    if not 1 <= dimensions <= n_embd:
        raise ValueError(f"dimensions must be in 1..{n_embd}")
    if dimensions == n_embd:
        return vecs
    v = np.ascontiguousarray(vecs[..., :dimensions], dtype=np.float32)
    norms = np.linalg.norm(v, axis=-1, keepdims=True)
    return v / np.maximum(norms, 1e-12)


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
        packing: str = "auto",
        pack_seq: int | None = None,
        prompts: dict[str, str] | None = None,
        default_prompt_name: str = "",
    ):
        from ..utils import compile_cache

        # persistent XLA compilation cache: server restarts / CLI runs skip
        # the 20-60 s/shape remote compiles (opt out: TPUEMBED_COMPILE_CACHE=0)
        compile_cache.enable()
        self.config = config
        self.opts = opts or ComputeOptions()
        self.tokenizer = tokenizer
        # named prompt prefixes (sentence-transformers semantics: e5-style
        # "query: "/"passage: ", instruction prompts).  Resolved once per
        # encode call (resolve_prompt); embed_tokens never re-applies them.
        self.prompts = dict(prompts or {})
        if default_prompt_name and default_prompt_name not in self.prompts:
            raise ValueError(
                f"default_prompt_name {default_prompt_name!r} is not in "
                f"prompts {sorted(self.prompts)}"
            )
        self.default_prompt_name = default_prompt_name or ""
        self.special_ids = special_ids or SpecialIds(cls=101, sep=102, pad=0, unk=100)
        self.mesh = mesh
        self.seq_buckets = tuple(b for b in seq_buckets if b <= config.n_ctx) or (
            config.n_ctx,
        )
        if seq_buckets is DEFAULT_SEQ_BUCKETS and config.n_ctx > self.seq_buckets[-1]:
            # long-context encoders (ModernBERT: n_ctx 8192): extend the
            # default buckets in power-of-two steps so texts past 512 tokens
            # are batched at full length instead of truncated to the top
            # default bucket.  Custom seq_buckets are respected as passed.
            ext, b = [], self.seq_buckets[-1]
            while b < config.n_ctx:
                b = min(b * 2, config.n_ctx)
                ext.append(b)
            self.seq_buckets += tuple(ext)
        # per-dispatch token budget: at the default buckets the historical
        # cap (2048 rows x 512 tokens) is unchanged; longer sequence buckets
        # scale the row cap down so one dispatch's activation memory stays
        # bounded (8192-token rows batch 128 at a time, not 2048).  Derived
        # from the CALLER's top bucket so explicit larger buckets are
        # actually reachable (at s=512 the row cap equals that bucket);
        # floored at the default so small-bucket configs keep the
        # historical budget.
        self.max_batch_tokens = max(
            max(batch_buckets), DEFAULT_BATCH_BUCKETS[-1]
        ) * 512
        self.batch_buckets = tuple(batch_buckets)
        if mesh is not None:
            from ..parallel.mesh import DP_AXIS

            dp = mesh.shape.get(DP_AXIS, 1)
            # every dispatched batch must shard evenly over dp
            self.batch_buckets = tuple(
                b for b in self.batch_buckets if b % dp == 0
            ) or (dp,)
        if packing not in ("auto", "always", "never"):
            raise ValueError(f"packing must be auto/always/never, got {packing!r}")
        self.packing = packing
        # pack_seq > 512 routes long rows through the windowed segment-
        # attention kernel (ops/attention.py); the default suits <=512-ctx
        # BERT encoders
        self.pack_seq = min(pack_seq or DEFAULT_PACK_SEQ, config.n_ctx)
        self.pack_segs = max(8, self.pack_seq // 8)
        self._fwd_cache: dict[tuple, object] = {}
        # single-fetch concat executables are keyed by the full tuple of
        # pending batch shapes — combinatorial over bucket multisets, and
        # every new shape combo is a fresh (slow, remote) compile.  Cap the
        # distinct combos; past the cap, fall back to per-batch fetches.
        self._concat_combos: set[tuple] = set()
        # serializes device dispatch + the compile cache across threads (the
        # server drives encode via its batcher AND eval/tokenize frames via
        # executor threads; unlocked, a shared new shape would compile twice
        # and stats read-modify-writes would interleave)
        self._lock = threading.Lock()
        self.stats = {"sentences": 0, "tokens": 0, "batches": 0, "eval_time": 0.0}

        if mesh is not None:
            from ..parallel.sharding import shard_params_and_make_forward

            self.params, self._sharded_forward = shard_params_and_make_forward(
                params, config, self.opts, mesh
            )
        else:
            self.params = jax.device_put(params)
            self._sharded_forward = None
        # multi-host mesh (jax.distributed): plain dp-sharded outputs span
        # non-addressable devices, so every plain batch routes through the
        # compact gather (replicated output, locally fetchable) — see
        # parallel/distributed.py for the serving control plane
        self._multiprocess = mesh is not None and jax.process_count() > 1

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
            prompts_kv = r.kv.get(Keys.PROMPTS)
            if prompts_kv and "prompts" not in kw:
                import json as _json

                kw["prompts"] = _json.loads(prompts_kv)
                # a caller-passed default still wins over the file's
                kw.setdefault(
                    "default_prompt_name",
                    str(r.kv.get(Keys.DEFAULT_PROMPT, "")),
                )
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
    def from_legacy_bin(
        cls,
        path: str,
        *,
        opts: ComputeOptions | None = None,
        **kw,
    ) -> "Engine":
        """Load a legacy pre-GGUF ggml-model*.bin (magic 'ggml') directly —
        the reference engine itself cannot (GGUF only, bert.cpp:181); old
        files needed the original bert.cpp build.  Upgrades in-memory via a
        temp GGUF so every downstream path (schema checks, Q4 layouts,
        sharding) is identical to from_gguf."""
        import tempfile

        from ..gguf.legacy import upgrade_legacy_bin

        with tempfile.NamedTemporaryFile(suffix=".gguf") as f:
            upgrade_legacy_bin(path, f.name)
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
            self.tokenizer.encode(text), self.special_ids, self.config.n_ctx,
            add_cls=self.config.arch != "t5",
        )

    def tokenize_batch(
        self, texts: Sequence[str], *, truncate: bool = True
    ) -> list[list[int]]:
        """Tokenize + frame each text ([CLS]..[SEP], capped at n_ctx).

        truncate=True (default) silently cuts over-length inputs — the
        reference's behavior (bert.cpp:756-780).  truncate=False raises
        instead, naming the first offending text, for callers that must
        not embed a silently-amputated document."""
        if self.tokenizer is None:
            raise RuntimeError("engine has no tokenizer (model without blob kv)")
        raw = self.tokenizer.encode_batch(list(texts))
        # T5 frames ids + [</s>] with no CLS (tokenizer/base.frame_ids)
        add_cls = self.config.arch != "t5"
        if not truncate:
            from ..tokenizer.base import _strip_pad

            cap = self.config.n_ctx
            for i, ids in enumerate(raw):
                need = len(_strip_pad(ids, self.special_ids.pad)) + 1 + add_cls
                if need > cap:
                    raise ValueError(
                        f"input {i} is {need} tokens framed, over the "
                        f"model's {cap}-token context (set truncate=true "
                        f"to cut, or split the text)"
                    )
        return [
            frame_ids(ids, self.special_ids, self.config.n_ctx,
                      add_cls=add_cls)
            for ids in raw
        ]

    def tokenize_pairs(
        self, pairs: Sequence[tuple[str, str]]
    ) -> tuple[list[list[int]], list[list[int]]]:
        """Cross-encoder pair framing: [(text_a, text_b), ...] ->
        (framed id lists, parallel token-type-id lists).  BERT/DistilBERT
        frame [CLS] a [SEP] b [SEP] with segments 0/1; the BPE families
        (RoBERTa/XLM-R/MPNet) use the <s> a </s></s> b </s> template with a
        single segment (tokenizer/base.frame_pair_ids)."""
        if self.tokenizer is None:
            raise RuntimeError("engine has no tokenizer (model without blob kv)")
        flat = [t for pair in pairs for t in pair]
        raw = self.tokenizer.encode_batch(flat)
        double_sep = self.config.arch in ("roberta", "mpnet")
        ids, types = [], []
        for i in range(0, len(raw), 2):
            fi, ft = frame_pair_ids(
                raw[i], raw[i + 1], self.special_ids, self.config.n_ctx,
                double_sep=double_sep,
            )
            ids.append(fi)
            types.append(ft)
        return ids, types

    # --- forward ------------------------------------------------------------
    def _opts_for(self, float_out: bool) -> ComputeOptions:
        """float_out=True forces a float32 result encoding — the device-
        resident path (embed_tokens_device) must not get transfer-packed
        int8 output, and should keep full fidelity regardless of the
        engine's transfer dtype."""
        if float_out and self.opts.output_dtype != "float32":
            return dataclasses.replace(self.opts, output_dtype="float32")
        return self.opts

    def _forward(self, shape: tuple[int, int], gather: bool = False,
                 float_out: bool = False):
        float_out = float_out and self.opts.output_dtype != "float32"
        key = (shape, gather, float_out)
        fwd = self._fwd_cache.get(key)
        if fwd is None:
            if self._sharded_forward is not None:
                fwd = (
                    self._sharded_forward.gather
                    if gather
                    else self._sharded_forward
                )
            else:
                config, opts = self.config, self._opts_for(float_out)

                if gather:

                    @jax.jit
                    def fwd(params, ids, mask, gather_idx):
                        return bert_embed_batch(
                            params, ids, mask, config, opts,
                            gather_idx=gather_idx,
                        )
                else:

                    @jax.jit
                    def fwd(params, ids, mask):
                        return bert_embed_batch(params, ids, mask, config, opts)

            self._fwd_cache[key] = fwd
        return fwd

    def _packed_forward(self, shape: tuple[int, int], n_seg: int,
                        float_out: bool = False):
        float_out = float_out and self.opts.output_dtype != "float32"
        key = ("packed", shape, n_seg, float_out)
        fwd = self._fwd_cache.get(key)
        if fwd is None:
            if self.mesh is not None:
                from ..parallel.sharding import make_packed_forward

                fwd = make_packed_forward(self.mesh, self.config, self.opts)
            else:
                from ..models.bert import bert_embed_packed

                config, opts = self.config, self._opts_for(float_out)

                @partial(jax.jit, static_argnums=(5, 6))
                def fwd(params, ids, seg, pos, gather_idx, n_seg,
                        max_seg_len=None):
                    return bert_embed_packed(
                        params, ids, seg, pos, config, opts, n_seg=n_seg,
                        gather_idx=gather_idx, max_seg_len=max_seg_len,
                    )

            self._fwd_cache[key] = fwd
        return fwd

    @property
    def _dp(self) -> int:
        from ..parallel.mesh import DP_AXIS

        return self.mesh.shape.get(DP_AXIS, 1) if self.mesh is not None else 1

    @staticmethod
    def _gather_idx(values) -> np.ndarray:
        """Compact-gather index vector, padded to a coarse bucket (64/512
        granularity bounds both pad waste and the compiled-shape count)."""
        n = len(values)
        step = 64 if n <= 512 else 512
        out = np.zeros(-(-n // step) * step, dtype=np.int32)
        out[:n] = values
        return out

    def _pack_plan(self, token_lists: Sequence[Sequence[int]]) -> list[int]:
        """Indices of sentences to route through the sequence-packed path
        (the rest go through plain length-bucketed batching)."""
        if self.packing == "never":
            return []
        packable = [
            i for i, t in enumerate(token_lists) if len(t) <= self.pack_seq
        ]
        if self.packing == "always":
            return packable
        # auto: packing pays off when many short sentences would otherwise
        # spread over several dispatches; long sentences already fill rows
        short = [i for i in packable if len(token_lists[i]) <= self.pack_seq // 4]
        return short if len(short) >= 32 else []

    @staticmethod
    def _to_host(arr) -> np.ndarray:
        """One device array -> numpy, tolerating multi-host shardings (a
        dp-sharded output spanning other hosts' devices all-gathers; all
        processes reach this in the same order — SPMD lockstep)."""
        if (
            isinstance(arr, jax.Array)
            and not arr.sharding.is_fully_addressable
            and not arr.sharding.is_fully_replicated
        ):
            from jax.experimental import multihost_utils

            return np.asarray(multihost_utils.process_allgather(arr, tiled=True))
        return np.asarray(arr)

    @classmethod
    def _fetch(cls, res) -> np.ndarray:
        """Device result -> host f32 matrix.  int8 output mode returns one
        packed uint8 array (codes + scale bytes, models.bert.pack_output_i8)
        — a quarter the transfer bytes of f32 in a single fetch (the
        device->host fetch dominates the q4_0 MiniLM pipeline; see
        ComputeOptions.output_dtype)."""
        host = cls._to_host(res)
        if host.dtype == np.uint8:
            from ..models.bert import unpack_output_i8

            return unpack_output_i8(host)
        return host

    def _dispatch(self, token_lists: Sequence[Sequence[int]],
                  float_out: bool = False):
        """Plan + dispatch every batch (async); returns the pending list of
        (batch, device_result) pairs.  Caller must hold self._lock.
        float_out: force float32 results (the device-resident path)."""
        n = len(token_lists)
        pack_idx = self._pack_plan(token_lists)  # sorted
        pack_set = set(pack_idx)
        rest = [i for i in range(n) if i not in pack_set]
        packed_batches = (
            pack_segments(
                [token_lists[i] for i in pack_idx],
                pack_idx,
                self.special_ids.pad,
                seq_len=self.pack_seq,
                n_seg=self.pack_segs,
                row_multiple=self._dp,
            )
            if pack_idx
            else []
        )
        batches = pack_batches(
            [token_lists[i] for i in rest],
            self.special_ids.pad,
            seq_buckets=self.seq_buckets,
            batch_buckets=self.batch_buckets,
            max_seq=self.config.n_ctx,
            max_tokens=self.max_batch_tokens,
        )
        for batch in batches:
            batch.positions = [rest[i] for i in batch.positions]

        padded_slots = 0
        # dispatch everything first (jax dispatch is async), then fetch —
        # the device pipeline stays fed while the host packs/copies
        pending = []
        for pb in packed_batches:
            fwd = self._packed_forward(pb.ids.shape, pb.n_seg,
                                       float_out=float_out)
            gidx = self._gather_idx(pb.slots)
            if self.mesh is not None:
                args = (self.params, pb.ids, pb.seg, pb.pos, gidx, pb.n_seg)
            else:
                # windowed-attention bound: next power of two >= the
                # longest packed sentence (bounds compiled shapes).  Only
                # passed for long rows — the windowed kernel pays off at
                # S >= 1024 (ops/attention.py routing); below that it
                # would just fragment the jit cache.
                w = None
                if pb.ids.shape[1] >= 1024:
                    w = 1 << max(5, (max(pb.max_len, 1) - 1).bit_length())
                args = (self.params, pb.ids, pb.seg, pb.pos, gidx,
                        pb.n_seg, w)
            pending.append((pb, fwd(*args)))
            padded_slots += pb.ids.size
        for batch in batches:
            n_real = len(batch.positions)
            pad_rows = batch.ids.shape[0] - n_real
            if pad_rows > 64 or self._multiprocess:
                # compact gather: padded rows cost FLOPs, not transfer
                gidx = self._gather_idx(np.arange(n_real, dtype=np.int32))
                fwd = self._forward(batch.ids.shape, gather=True,
                                    float_out=float_out)
                pending.append(
                    (batch, fwd(self.params, batch.ids, batch.mask, gidx))
                )
            else:
                fwd = self._forward(batch.ids.shape, float_out=float_out)
                pending.append(
                    (batch, fwd(self.params, batch.ids, batch.mask))
                )
            padded_slots += batch.ids.size
        from ..utils.metrics import GLOBAL as metrics

        metrics.inc("padded_slots", padded_slots)
        return pending

    def _count_stats(self, token_lists, n_batches: int, t0: float) -> None:
        from ..utils.metrics import GLOBAL as metrics

        n = len(token_lists)
        n_tokens = int(sum(len(t) for t in token_lists))
        with self._lock:
            self.stats["eval_time"] += time.perf_counter() - t0
            self.stats["sentences"] += n
            self.stats["tokens"] += n_tokens
            self.stats["batches"] += n_batches
        metrics.inc("sentences", n)
        metrics.inc("tokens", n_tokens)
        metrics.inc("batches", n_batches)

    def _concat_combo_ok(self, combo: tuple, cap: int = 16) -> bool:
        """Admit a batch-shape combo for the single-fetch device concat only
        while the set of distinct combos (== compiled concat executables)
        stays bounded; afterwards unseen combos take per-batch fetches."""
        if combo in self._concat_combos:
            return True
        if len(self._concat_combos) >= cap:
            return False
        self._concat_combos.add(combo)
        return True

    def _token_states_forward(self, shape: tuple[int, int]):
        key = ("tokens", shape)
        fwd = self._fwd_cache.get(key)
        if fwd is None:
            from ..models.bert import bert_embed_batch, project_token_states

            config, opts = self.config, self.opts

            @jax.jit
            def fwd(params, ids, mask):
                x = bert_embed_batch(params, ids, mask, config, opts,
                                     token_states=True)
                # ColBERT checkpoints emit PROJECTED token vectors
                # ([.., colbert_dim]); identity otherwise
                return project_token_states(params, x)

            self._fwd_cache[key] = fwd
        return fwd

    def _padded_chunks(self, token_lists, cap: int):
        """Yield (ids, mask, lens) bucket-padded batches of at most `cap`
        rows — the shared batching loop of the token-states and sparse
        surfaces (the throughput path has its own planner in
        runtime/batching.py)."""
        from .batching import bucket_for

        for lo in range(0, len(token_lists), cap):
            chunk = [list(t) for t in token_lists[lo : lo + cap]]
            lens = [len(t) for t in chunk]
            s = bucket_for(max(lens), self.seq_buckets)
            b = bucket_for(len(chunk), self.batch_buckets)
            ids = np.zeros((b, s), np.int32)
            mask = np.zeros((b, s), np.int32)
            for i, toks in enumerate(chunk):
                ids[i, : len(toks)] = toks
                mask[i, : len(toks)] = 1
            yield ids, mask, lens

    def encode_token_states(self, texts: Sequence[str]) -> list[np.ndarray]:
        """Per-token final hidden states (HF last_hidden_state): one
        [len_i, n_embd] f32 array per text, covering exactly the framed
        tokens (specials included, padding excluded).

        The late-interaction / feature-extraction surface (ColBERT-style
        scoring, token-level diagnostics).  Unlike encode() there is no
        pooling, normalization, Dense head, prompt prefixing, packing or
        transfer compression — and the fetch is ~seq_len times a sentence
        embedding, so this is a tool, not a throughput path.  The reference
        has no analog (bert.h returns pooled vectors only)."""
        return self.token_states_tokens(self.tokenize_batch(texts))

    def token_states_tokens(
        self, token_lists: Sequence[Sequence[int]]
    ) -> list[np.ndarray]:
        """Token-id lists -> per-list [len, n_embd] f32 final hidden
        states (see encode_token_states)."""
        out: list[np.ndarray] = []
        cap = max(self.batch_buckets)
        for ids, mask, lens in self._padded_chunks(token_lists, cap):
            with self._lock:  # dispatch/compile under the lock, fetch outside
                fwd = self._token_states_forward(ids.shape)
                dev = fwd(self.params, ids, mask)
            arr = np.asarray(dev)
            out.extend(arr[i, :n] for i, n in enumerate(lens))
        return out

    def token_states_device(self, token_lists: Sequence[Sequence[int]]):
        """Like token_states_tokens, but the per-token states never leave
        the device: yields (positions, device [B, S, E] f32 states,
        mask [B, S] np.int32, lens) per dispatched chunk.  The token-level
        MaxSimIndex ingests through this — at Sd x E floats per document a
        host round trip would dominate indexing the way the embedding fetch
        dominates encode (CLAUDE.md relay numbers), so corpus token states
        go straight from the forward pass into index HBM."""
        pos = 0
        cap = max(self.batch_buckets)
        for ids, mask, lens in self._padded_chunks(token_lists, cap):
            with self._lock:  # dispatch/compile under the lock
                fwd = self._token_states_forward(ids.shape)
                dev = fwd(self.params, ids, mask)
            positions = list(range(pos, pos + len(lens)))
            pos += len(lens)
            yield positions, dev, mask, lens

    # --- ColBERT late-interaction framing ------------------------------------
    def colbert_skiplist(self) -> frozenset[int]:
        """Punctuation token ids filtered from DOCUMENT scoring (the
        ColBERT skiplist: first sub-token id of each string.punctuation
        symbol; colbert-ai ColBERT.__init__).  Empty when the checkpoint
        sets mask_punctuation=False."""
        if not self.config.mask_punctuation:
            return frozenset()
        if getattr(self, "_skiplist", None) is None:
            import string

            ids = set()
            for ch in string.punctuation:
                enc = self.tokenizer.encode(ch)
                if enc:
                    ids.add(int(enc[0]))
            self._skiplist = frozenset(ids)
        return self._skiplist

    def _colbert_frame(self, texts: Sequence[str], marker: int,
                       maxlen: int) -> list[list[int]]:
        """[CLS] <marker> tokens [SEP], truncated to maxlen keeping [SEP]
        last — equivalent to colbert-ai's '. '+text tokenization with the
        position-1 marker substitution."""
        if self.config.colbert_dim <= 0:
            raise RuntimeError("not a ColBERT checkpoint (colbert_dim == 0)")
        framed = self.tokenize_batch(list(texts))
        sep = self.special_ids.sep
        out = []
        for ids in framed:
            ids = [ids[0], marker] + list(ids[1:])
            if len(ids) > maxlen:
                ids = ids[: maxlen - 1] + [sep]
            out.append(ids)
        return out

    def colbert_doc_tokens(self, texts: Sequence[str],
                           cap: int | None = None) -> list[list[int]]:
        """Document framing: [CLS] [D] tokens [SEP], truncated to
        min(cap, n_ctx) — truncation happens BEFORE the forward (ColBERT's
        doc_maxlen semantics: dropped tokens never participate in
        attention)."""
        maxlen = min(cap or self.config.n_ctx, self.config.n_ctx)
        return self._colbert_frame(texts, self.config.d_marker_id, maxlen)

    def colbert_query_ids(self, texts: Sequence[str]):
        """Query framing: [CLS] [Q] tokens [SEP] padded with [MASK] to
        query_maxlen.  Returns (ids [B, query_maxlen] int32, attention
        mask [B, query_maxlen] int32 — 0 on the MASK positions, which are
        not attended to but DO emit vectors: query augmentation)."""
        maxlen = min(self.config.query_maxlen, self.config.n_ctx)
        framed = self._colbert_frame(texts, self.config.q_marker_id, maxlen)
        ids = np.full((len(framed), maxlen), self.config.mask_id, np.int32)
        mask = np.zeros((len(framed), maxlen), np.int32)
        for i, row in enumerate(framed):
            ids[i, : len(row)] = row
            mask[i, : len(row)] = 1
        return ids, mask

    def colbert_query_vectors(self, texts: Sequence[str]) -> list[np.ndarray]:
        """Queries -> one [query_maxlen, colbert_dim] f32 token matrix per
        text (every slot, MASK augmentation included; un-normalized — the
        MaxSim consumers L2-normalize per token)."""
        from .batching import bucket_for

        q_ids, q_attn = self.colbert_query_ids(texts)
        n = q_ids.shape[0]
        b = bucket_for(n, self.batch_buckets)
        if b > n:
            q_ids = np.pad(q_ids, ((0, b - n), (0, 0)))
            q_attn = np.pad(q_attn, ((0, b - n), (0, 0)))
        with self._lock:
            fwd = self._token_states_forward(q_ids.shape)
            dev = fwd(self.params, q_ids, q_attn)
        arr = np.asarray(dev)
        return [arr[i].copy() for i in range(n)]

    def _sparse_forward(self, shape: tuple[int, int], k: int):
        key = ("sparse", shape, k)
        fwd = self._fwd_cache.get(key)
        if fwd is None:
            from ..models.bert import bert_sparse_batch

            config, opts = self.config, self.opts

            @jax.jit
            def fwd(params, ids, mask):
                return bert_sparse_batch(params, ids, mask, config, opts, k)

            self._fwd_cache[key] = fwd
        return fwd

    def encode_sparse(
        self, texts: Sequence[str], k: int = 256
    ) -> list[tuple[np.ndarray, np.ndarray]]:
        """SPLADE sparse encoding: one (int32 term ids, f32 weights) pair
        per text, entries sorted by descending weight, zero-weight slots
        trimmed.  `k` caps the active terms per sentence (the device top-k
        width; published SPLADE checkpoints average ~50-300 active terms).

        Requires an MLM-head checkpoint (config.mlm_head — SPLADE /
        opensearch neural-sparse models; see models/bert.bert_sparse_batch
        for the math).  The reference is dense-only (bert.h:41-92)."""
        return self.sparse_tokens(self.tokenize_batch(texts), k=k)

    def sparse_tokens(
        self, token_lists: Sequence[Sequence[int]], k: int = 256
    ) -> list[tuple[np.ndarray, np.ndarray]]:
        """Token-id lists -> per-list (term ids, weights) sparse vectors
        (see encode_sparse)."""
        from ..models.bert import _SPARSE_TILE_BUDGET, unpack_sparse_topk

        if not self.config.mlm_head:
            raise ValueError(
                "model has no MLM head (not a SPLADE checkpoint)"
            )
        k = min(int(k), self.config.n_vocab)
        if k <= 0:
            raise ValueError(f"k must be positive, got {k}")
        # run the device top-k at a bucketed width and trim host-side: one
        # compiled executable per (shape, k-bucket) instead of per client k
        # (each compile is 20-60 s under the relay and cached forever)
        k_run = next(
            (kb for kb in (16, 32, 64, 128, 256, 512, 1024, 2048, 4096)
             if kb >= k), k
        )
        k_run = min(k_run, self.config.n_vocab)
        # cap the batch bucket so a [b, chunk>=8, V] f32 logits tile of the
        # chunked MLM scan stays inside the tile budget (models/bert.py
        # _sparse_chunk bounds the chunk; this bounds b — a 2048-row bucket
        # at 30k vocab would otherwise be a 16 GB more-than-HBM tile)
        row_cap = max(1, _SPARSE_TILE_BUDGET // (8 * self.config.n_vocab * 4))
        allowed = [b for b in self.batch_buckets if b <= row_cap]
        cap = max(allowed) if allowed else min(self.batch_buckets)
        out: list[tuple[np.ndarray, np.ndarray]] = []
        for ids, mask, lens in self._padded_chunks(token_lists, cap):
            with self._lock:  # dispatch/compile under the lock, fetch outside
                fwd = self._sparse_forward(ids.shape, k_run)
                dev = fwd(self.params, ids, mask)
            idx, val = unpack_sparse_topk(np.asarray(dev))
            for i in range(len(lens)):
                n = int(np.count_nonzero(val[i, :k] > 0.0))
                out.append((idx[i, :n].copy(), val[i, :n].copy()))
        return out

    def _maxsim_forward(self, q_shape: tuple, d_shape: tuple[int, int]):
        key = ("maxsim", q_shape, d_shape)
        fwd = self._fwd_cache.get(key)
        if fwd is None:
            from ..models.bert import maxsim_scores

            config, opts = self.config, self.opts

            @jax.jit
            def fwd(params, q, qm, ids, mask, keep):
                return maxsim_scores(params, q, qm, ids, mask, config, opts,
                                     d_keep=keep)

            self._fwd_cache[key] = fwd
        return fwd

    def maxsim(self, query: str, documents: Sequence[str]) -> np.ndarray:
        """Late-interaction (ColBERT-style) MaxSim relevance of each
        document to the query, over final-hidden-state token vectors
        (models/bert.maxsim_scores).  Works with any encoder family — no
        classification head needed (contrast Engine.rerank's cross-encoder
        path: one joint forward per pair there vs one document forward +
        a cheap on-device MaxSim here, so this scales to many documents).

        ColBERT checkpoints (config.colbert_dim > 0) automatically use the
        checkpoint's semantics: [Q]/[D] markers, [MASK] query augmentation
        to query_maxlen, per-token projection, punctuation filtering."""
        if self.config.colbert_dim:
            q_ids, q_attn = self.colbert_query_ids([query])
            return self.maxsim_tokens(
                None, self.colbert_doc_tokens(documents),
                _q_frame=(q_ids, q_attn),
            )
        return self.maxsim_tokens(
            self.tokenize(query), self.tokenize_batch(documents)
        )

    def maxsim_tokens(
        self,
        q_tokens: Sequence[int] | None,
        doc_token_lists: Sequence[Sequence[int]],
        *,
        _q_frame: tuple[np.ndarray, np.ndarray] | None = None,
    ) -> np.ndarray:
        """Token-id variant of maxsim(): -> [n_docs] f32 scores.

        `_q_frame` (internal, the ColBERT path): pre-framed query
        (ids [1, Lq], attention mask [1, Lq]); scoring then uses ALL Lq
        query slots (MASK augmentation) and filters punctuation doc tokens
        via the skiplist."""
        from .batching import bucket_for

        colbert = _q_frame is not None
        if colbert:
            q_ids, q_attn = _q_frame
            q_score = np.ones_like(q_attn)
        else:
            if not q_tokens:
                raise ValueError("empty query")
            sq = bucket_for(len(q_tokens), self.seq_buckets)
            q_ids = np.zeros((1, sq), np.int32)
            q_ids[0, : len(q_tokens)] = q_tokens
            q_attn = np.zeros((1, sq), np.int32)
            q_attn[0, : len(q_tokens)] = 1
            q_score = q_attn
        skip = self.colbert_skiplist() if colbert else frozenset()
        skip_arr = np.asarray(sorted(skip), np.int32)
        out = np.empty(len(doc_token_lists), np.float32)
        pos = 0
        cap = max(self.batch_buckets)
        first = True
        for ids, mask, lens in self._padded_chunks(doc_token_lists, cap):
            keep = mask
            if skip_arr.size:
                keep = mask * (~np.isin(ids, skip_arr)).astype(mask.dtype)
            with self._lock:
                if first:
                    # query token states once, kept on device for every chunk
                    q_fwd = self._token_states_forward(q_ids.shape)
                    q_dev = q_fwd(self.params, q_ids, q_attn)[0]
                    first = False
                fwd = self._maxsim_forward(tuple(q_dev.shape), ids.shape)
                dev = fwd(self.params, q_dev, q_score[0], ids, mask, keep)
            scores = np.asarray(dev)
            out[pos : pos + len(lens)] = scores[: len(lens)]
            pos += len(lens)
        return out

    def maxsim_rerank(
        self,
        query: str,
        documents: Sequence[str],
        *,
        top_n: int | None = None,
    ) -> list[dict]:
        """maxsim() in the standard rerank-API shape: [{"index",
        "relevance_score"}, ...] sorted descending, truncated to top_n."""
        scores = self.maxsim(query, documents)
        order = np.argsort(-scores, kind="stable")
        if top_n is not None:
            order = order[:top_n]
        return [
            {"index": int(i), "relevance_score": float(scores[i])}
            for i in order
        ]

    def embed_tokens(self, token_lists: Sequence[Sequence[int]]) -> np.ndarray:
        """Token-id lists -> [n, n_embd] f32 (the reference's
        bert_eval_batch, but actually batched).

        The engine lock covers only planning/dispatch/compile-cache; the
        host fetches drain OUTSIDE it, so the next caller's dispatch
        overlaps this call's device->host transfer (under the axon relay a
        batch fetch is ~10x the compute time — serializing fetches under
        the lock was the serving bottleneck, VERDICT r2 weak #2).
        Exception: on a multi-host mesh fetches may all-gather, and SPMD
        collectives must run in the same order on every process — those
        stay under the lock (dispatch order == fetch order everywhere).
        """
        from ..utils.metrics import GLOBAL as metrics

        out = np.empty((len(token_lists), self.n_embd), dtype=np.float32)
        t0 = time.perf_counter()
        with metrics.timer("eval"):
            with self._lock:
                pending = self._dispatch(token_lists)
                if self._multiprocess:
                    pending = [(b, self._fetch(v)) for b, v in pending]
            combo = tuple(v.shape + (str(v.dtype),) for _, v in pending)
            if (
                not self._multiprocess
                and len(pending) > 1
                and len({(v.shape[1:], v.dtype) for _, v in pending}) == 1
                and self._concat_combo_ok(combo)
            ):
                # single-fetch: concatenate the batch results ON DEVICE so
                # only one device->host transfer happens.  Every fetch pays
                # a full round trip on relay/PCIe-attached hosts (~30 ms
                # under the relay); the concat dispatch is async and rides
                # the already-running pipeline.  All result paths share the
                # trailing shape ([.., E] float or [.., E+4] packed int8),
                # so mixed plain/packed/gather batches concat fine.
                cat = self._fetch(
                    jnp.concatenate([v for _, v in pending], axis=0)
                )
                fetched, off = [], 0
                for b, v in pending:
                    n = v.shape[0]
                    fetched.append((b, cat[off : off + n]))
                    off += n
                pending = fetched
            for batch, vecs in pending:
                if not isinstance(vecs, np.ndarray):
                    vecs = self._fetch(vecs)
                if isinstance(batch, PackedSegBatch):
                    out[batch.orig] = vecs[: len(batch.orig)]
                else:
                    out[batch.positions] = vecs[: len(batch.positions)]
        self._count_stats(token_lists, len(pending), t0)
        return out

    def embed_tokens_device(self, token_lists: Sequence[Sequence[int]]):
        """Like embed_tokens, but the embeddings never leave the device:
        returns a list of (original_positions, device_vecs) pairs (device
        rows sliced to the real sentences).  For consumers that keep
        vectors in HBM — the on-device VectorIndex ingests through this,
        skipping the device->host->device round trip entirely.  int8
        transfer engines transparently use a float32-output forward variant
        here (full fidelity; the packing exists only for host transfer)."""
        if self.opts.output_dtype == "int8" and self.mesh is not None:
            # single-device engines transparently use a float32-output
            # forward variant for this path; the mesh forwards are built
            # once with the engine opts and cannot swap encodings
            raise ValueError(
                "embed_tokens_device on a mesh needs a float output_dtype "
                "(int8 results are packed for host transfer)"
            )
        from ..utils.metrics import GLOBAL as metrics

        t0 = time.perf_counter()
        out = []
        with self._lock, metrics.timer("eval"):
            pending = self._dispatch(token_lists, float_out=True)
            for batch, vecs in pending:
                if isinstance(batch, PackedSegBatch):
                    out.append((batch.orig, vecs[: len(batch.orig)]))
                else:
                    out.append(
                        (batch.positions, vecs[: len(batch.positions)])
                    )
        self._count_stats(token_lists, len(pending), t0)
        return out

    # --- cross-encoder scoring (classification-head models) -----------------
    def _score_forward(self, shape: tuple[int, int]):
        """jitted scoring forward per static (batch, seq) shape.  Under a
        single-process GSPMD mesh the sharded params drive partitioning
        (resolve_impls pins the kernels to the XLA paths there); plain jit
        otherwise."""
        key = ("score", shape)
        fwd = self._fwd_cache.get(key)
        if fwd is None:
            config, opts = self.config, self.opts

            @jax.jit
            def fwd(params, ids, mask, type_ids):
                return bert_score_batch(
                    params, ids, mask, config, opts, type_ids=type_ids
                )

            self._fwd_cache[key] = fwd
        return fwd

    def score_token_pairs(
        self,
        token_lists: Sequence[Sequence[int]],
        type_lists: Sequence[Sequence[int]],
    ) -> np.ndarray:
        """Framed pair-id lists (+ parallel type-id lists) -> [n] f32 logits
        (or [n, n_labels] for multi-label heads).  Same bucketed batching
        and lock discipline as embed_tokens; the result fetch is tiny
        (n_labels floats per pair), so scoring is compute-bound, not
        transfer-bound."""
        if self.config.n_labels == 0:
            raise RuntimeError(
                "model has no classification head (embedding model); "
                "rerank/score needs a *ForSequenceClassification checkpoint"
            )
        if self._multiprocess:
            raise RuntimeError(
                "cross-encoder scoring on a multi-host mesh is not supported"
            )
        from ..utils.metrics import GLOBAL as metrics

        out = np.empty((len(token_lists), self.config.n_labels), np.float32)
        t0 = time.perf_counter()
        with metrics.timer("eval"):
            with self._lock:
                batches = pack_batches(
                    token_lists,
                    self.special_ids.pad,
                    seq_buckets=self.seq_buckets,
                    batch_buckets=self.batch_buckets,
                    max_seq=self.config.n_ctx,
                    max_tokens=self.max_batch_tokens,
                )
                pending = []
                for batch in batches:
                    types = np.zeros_like(batch.ids)
                    for row, idx in enumerate(batch.positions):
                        t = type_lists[idx]
                        types[row, : len(t)] = t
                    fwd = self._score_forward(batch.ids.shape)
                    pending.append(
                        (batch, fwd(self.params, batch.ids, batch.mask, types))
                    )
            for batch, scores in pending:
                out[batch.positions] = np.asarray(scores)[
                    : len(batch.positions)
                ]
        self._count_stats(token_lists, len(pending), t0)
        return out[:, 0] if self.config.n_labels == 1 else out

    def score_pairs(
        self, pairs: Sequence[tuple[str, str]], *, activation: str | None = None
    ) -> np.ndarray:
        """(text_a, text_b) pairs -> relevance scores.  Raw logits by
        default (what HF *ForSequenceClassification returns);
        activation="sigmoid" maps to (0, 1) — sentence-transformers
        CrossEncoder.predict's default for single-label heads."""
        ids, types = self.tokenize_pairs(pairs)
        scores = self.score_token_pairs(ids, types)
        if activation == "sigmoid":
            scores = 1.0 / (1.0 + np.exp(-scores))
        elif activation is not None:
            raise ValueError(f"unknown activation {activation!r}")
        return scores

    def rerank(
        self,
        query: str,
        documents: Sequence[str],
        *,
        top_n: int | None = None,
        activation: str | None = "sigmoid",
    ) -> list[dict]:
        """Rank documents by cross-encoder relevance to the query:
        [{"index": int, "relevance_score": float}, ...] sorted descending,
        truncated to top_n.  The standard rerank-API shape (Jina/Cohere
        /v1/rerank); scores default to sigmoid like sentence-transformers'
        CrossEncoder for single-label heads."""
        if self.config.n_labels > 1:
            raise RuntimeError(
                f"rerank needs a single-label head (n_labels="
                f"{self.config.n_labels}); use score_pairs for multi-label"
            )
        scores = self.score_pairs(
            [(query, d) for d in documents], activation=activation
        )
        order = np.argsort(-scores, kind="stable")
        if top_n is not None:
            order = order[:top_n]
        return [
            {"index": int(i), "relevance_score": float(scores[i])}
            for i in order
        ]

    def resolve_prompt(
        self, prompt_name: str | None = None, prompt: str | None = None
    ) -> str:
        """Resolve the prefix string an encode call should prepend
        (sentence-transformers prompt semantics; the reference has no
        prompt concept — prefix models like e5 silently degrade through
        it).  `prompt` is a literal prefix and wins; `prompt_name` picks a
        named prefix from the model's prompts (converted out of
        config_sentence_transformers.json); None falls back to the model's
        default_prompt_name; "" explicitly disables the default."""
        if prompt is not None:
            if not isinstance(prompt, str):
                raise ValueError("prompt must be a string")
            return prompt
        if prompt_name is None:
            prompt_name = self.default_prompt_name
        if prompt_name == "":
            return ""
        if not isinstance(prompt_name, str) or prompt_name not in self.prompts:
            raise ValueError(
                f"unknown prompt_name {prompt_name!r} "
                f"(model prompts: {sorted(self.prompts)})"
            )
        return self.prompts[prompt_name]

    def encode(
        self,
        texts: str | Sequence[str],
        *,
        dimensions: int | None = None,
        prompt_name: str | None = None,
        prompt: str | None = None,
        truncate: bool = True,
    ) -> np.ndarray:
        """Texts -> [n, n_embd] L2-normalized f32 embeddings
        (the reference's bert_encode_batch, bert.h:54-62).

        dimensions: optional Matryoshka-style truncation — keep the first
        `dimensions` components and re-L2-normalize (OpenAI embeddings-API
        semantics; the reference has no equivalent, its wire is always the
        full n_embd, bert.h:46).

        prompt_name/prompt: named or literal prefix prepended to every
        text before tokenization (resolve_prompt).

        truncate=False: raise instead of silently cutting inputs past the
        model context (tokenize_batch)."""
        return self.encode_with_counts(
            texts, dimensions=dimensions, prompt_name=prompt_name,
            prompt=prompt, truncate=truncate,
        )[0]

    def query_prompt_prefix(self) -> str:
        """The resolved prefix for search queries: prompt "query" when the
        model declares one (sentence-transformers encode_query), else the
        default prompt, else ""."""
        return self.resolve_prompt(
            "query" if "query" in self.prompts else None
        )

    def document_prompt_prefix(self) -> str:
        """The resolved prefix for corpus documents: the first of
        "document"/"passage" the model declares (sentence-transformers
        encode_document), else the default prompt, else ""."""
        return self.resolve_prompt(
            next((n for n in ("document", "passage") if n in self.prompts),
                 None)
        )

    def encode_queries(
        self, texts: str | Sequence[str], **kw
    ) -> np.ndarray:
        """encode() with the model's query prefix (query_prompt_prefix)."""
        return self.encode(texts, prompt=self.query_prompt_prefix(), **kw)

    def encode_documents(
        self, texts: str | Sequence[str], **kw
    ) -> np.ndarray:
        """encode() with the model's document/corpus prefix
        (document_prompt_prefix)."""
        return self.encode(texts, prompt=self.document_prompt_prefix(), **kw)

    def encode_with_counts(
        self,
        texts: str | Sequence[str],
        *,
        dimensions: int | None = None,
        prompt_name: str | None = None,
        prompt: str | None = None,
        truncate: bool = True,
    ) -> tuple[np.ndarray, list[int]]:
        """encode() plus the per-text framed token counts (CLS/SEP included)
        — consumers that report usage (the HTTP /v1/embeddings envelope) get
        the counts from the tokenization that fed the forward pass instead
        of re-tokenizing.  Prompt-prefix tokens count toward usage (they go
        through the model)."""
        if isinstance(texts, str):
            texts = [texts]
        prefix = self.resolve_prompt(prompt_name, prompt)
        if prefix:
            texts = [prefix + t for t in texts]
        ids = self.tokenize_batch(texts, truncate=truncate)
        out = self.embed_tokens(ids)
        if dimensions is not None:
            out = truncate_normalize(out, dimensions)
        return out, [len(t) for t in ids]

    # --- introspection (bert.h:87-90 equivalents) ---------------------------
    @property
    def n_embd(self) -> int:
        """Output embedding width (bert_n_embd): the Dense head's
        out_features when present, else the encoder width."""
        return self.config.dense_out or self.config.n_embd

    @property
    def n_max_tokens(self) -> int:
        return self.config.n_ctx

    def id_to_token(self, token_id: int) -> str:
        if self.tokenizer is None:
            return ""
        return self.tokenizer.id_to_token(token_id)

    def decode(self, ids: Sequence[int]) -> str:
        """Token ids -> text (the reference tokenizer bridge's decode,
        tokenizer.cpp:39-48)."""
        if self.tokenizer is None:
            raise RuntimeError("engine has no tokenizer (model without blob kv)")
        return self.tokenizer.decode(ids)

    def warmup(self, shapes: Sequence[tuple[int, int]] | None = None) -> None:
        """Pre-compile the forward for the given (or smallest) shapes."""
        if shapes is None:
            shapes = [(max(self.batch_buckets[0], self._dp),
                       self.seq_buckets[0])]
        # same locking discipline as embed_tokens: warmup may run while
        # server executor threads drive the engine, and the compile-cache
        # writes must not race theirs
        with self._lock:
            for b, s in shapes:
                ids = np.full((b, s), self.special_ids.pad, dtype=np.int32)
                mask = np.zeros((b, s), dtype=np.int32)
                mask[:, 0] = 1
                if self._multiprocess:  # warm the path embed_tokens will use
                    gidx = self._gather_idx(np.arange(b, dtype=np.int32))
                    self._fetch(
                        self._forward((b, s), gather=True)(
                            self.params, ids, mask, gidx
                        )
                    )
                else:
                    self._fetch(self._forward((b, s))(self.params, ids, mask))
