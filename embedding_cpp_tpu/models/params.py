"""Parameter-tree construction: GGUF (or raw state dicts) -> device pytrees.

Replaces the reference's `llm_load_tensors` + ggml arena (bert.cpp:580-658):
tensors are shape-checked against the schema, per-layer tensors are stacked on
a leading layer axis (so the encoder runs as one `lax.scan` over layers), and
quantized matrices are repacked into the kernel layout (ops/qtensor.py)
instead of being dequantized — weights stay 4-bit in HBM.
"""
from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import numpy as np

from ..gguf.constants import (
    GGMLType,
    GGUFFileType,
    FTYPE_TO_GGML,
    ggml_nbytes,
)
from ..gguf.quant import dequantize as gguf_dequantize, quantize as gguf_quantize
from ..ops.qtensor import (
    QTensor,
    pack_q4_matmul,
    pack_q4_rows,
    pack_q8_matmul,
    pack_q8_rows,
)
from . import schema
from .config import BertConfig

# keys whose quantized payloads stay packed in "auto" mode (ffn_gate_w
# appears directly in the T5 schema; ModernBERT's arrives via the wi split)
_MATMUL_KEYS = frozenset(
    {"q_w", "k_w", "v_w", "o_w", "ffn_up_w", "ffn_down_w", "ffn_gate_w"}
)
_GATHER_KEYS = frozenset({"word"})

Q4_TYPES = (GGMLType.Q4_0, GGMLType.Q4_1)


class _TensorSource:
    """Uniform access to tensors as (raw bytes, ggml_type, hf_shape)."""

    def __init__(self, get: Callable[[str], tuple[np.ndarray, GGMLType, tuple]]):
        self.get = get

    def dense(self, name: str, shape: tuple, dtype) -> jnp.ndarray:
        raw, gtype, actual_shape = self.get(name)
        self._check(name, shape, actual_shape)
        n = int(np.prod(actual_shape))
        return jnp.asarray(
            gguf_dequantize(raw, gtype, n).reshape(actual_shape), dtype=dtype
        )

    def dense_t(self, name: str, shape: tuple, dtype) -> jnp.ndarray:
        """2-D weight in contraction-major ([in, out]) orientation."""
        return self.dense(name, shape, dtype).T

    def matmul_weight(self, name: str, shape: tuple, dtype, keep_q4: bool):
        raw, gtype, actual_shape = self.get(name)
        self._check(name, shape, actual_shape)
        if keep_q4 and gtype in Q4_TYPES:
            return pack_q4_matmul(raw, actual_shape, gtype)
        if keep_q4 and gtype == GGMLType.Q8_0:
            return pack_q8_matmul(raw, actual_shape)
        n = int(np.prod(actual_shape))
        return jnp.asarray(
            gguf_dequantize(raw, gtype, n).reshape(actual_shape).T, dtype=dtype
        )

    def matmul_weight_split(
        self, name: str, shape: tuple, dtype, keep_q4: bool, sections: int
    ) -> list:
        """Split a fused [out, in] weight into `sections` equal out-row
        groups, each returned in matmul orientation (packed QTensor or
        dense [in, out/sections]).  ModernBERT stores Wqkv [3E, E] and the
        GeGLU Wi [2F, E] fused (HF ModernBertAttention/ModernBertMLP); the
        quantized split is exact because ggml blocks run along the
        contraction (in) axis, so out-rows are whole blocks."""
        raw, gtype, actual_shape = self.get(name)
        self._check(name, shape, actual_shape)
        out, k = actual_shape
        if out % sections:
            raise ValueError(
                f"tensor {name}: {out} rows not divisible into {sections}"
            )
        sub = out // sections
        if keep_q4 and (gtype in Q4_TYPES or gtype == GGMLType.Q8_0):
            row_bytes = ggml_nbytes(gtype, k)
            rows = np.asarray(raw).reshape(out, row_bytes)
            parts = [
                np.ascontiguousarray(rows[j * sub : (j + 1) * sub]).reshape(-1)
                for j in range(sections)
            ]
            if gtype in Q4_TYPES:
                return [pack_q4_matmul(p, (sub, k), gtype) for p in parts]
            return [pack_q8_matmul(p, (sub, k)) for p in parts]
        w = gguf_dequantize(raw, gtype, out * k).reshape(out, k)
        return [
            jnp.asarray(w[j * sub : (j + 1) * sub].T, dtype=dtype)
            for j in range(sections)
        ]

    def gather_table(self, name: str, shape: tuple, dtype, keep_q4: bool):
        raw, gtype, actual_shape = self.get(name)
        self._check(name, shape, actual_shape)
        if keep_q4 and gtype in Q4_TYPES:
            return pack_q4_rows(raw, actual_shape, gtype)
        if keep_q4 and gtype == GGMLType.Q8_0:
            return pack_q8_rows(raw, actual_shape)
        n = int(np.prod(actual_shape))
        return jnp.asarray(
            gguf_dequantize(raw, gtype, n).reshape(actual_shape), dtype=dtype
        )

    @staticmethod
    def _check(name, expected, actual):
        if tuple(expected) != tuple(actual):
            raise ValueError(
                f"tensor {name}: shape {tuple(actual)} != expected {tuple(expected)}"
            )


def _stack_layer_values(values: list):
    """Stack per-layer leaves (arrays or QTensors) on a new leading axis."""
    first = values[0]
    if isinstance(first, QTensor):
        return QTensor(
            qs=jnp.stack([v.qs for v in values]),
            scales=jnp.stack([v.scales for v in values]),
            mins=None
            if first.mins is None
            else jnp.stack([v.mins for v in values]),
            shape=first.shape,
            qtype=first.qtype,
        )
    return jnp.stack(values)


def build_params(
    source: _TensorSource,
    config: BertConfig,
    *,
    weight_mode: str = "auto",
    dense_dtype=jnp.float32,
):
    """Assemble the parameter pytree.

    weight_mode:
      "auto"    — quantized matmul weights and the word-embedding table stay packed
                  (fused dequant on the compute path); everything else dense.
      "dequant" — everything dequantized to `dense_dtype` at load.
    """
    keep_q4 = weight_mode == "auto"
    f32 = jnp.float32

    emb = {}
    for name, (key, shape_fn) in schema.embedding_tensors(config).items():
        shape = shape_fn(config)
        if key == "word":
            emb[key] = source.gather_table(name, shape, dense_dtype, keep_q4)
        elif key in ("token_type", "position"):
            # tiny tables: always dense (dequantizing at load is exact)
            emb[key] = source.dense(name, shape, dense_dtype)
        elif key == "emb_proj_w":
            # factorized-embedding projection (ALBERT/ELECTRA): a small
            # [emb_width, n_embd] dense matmul on the hot path — dense at
            # load (dequantizing is exact), contraction-major
            emb[key] = source.dense_t(name, shape, dense_dtype)
        else:  # layernorm scale/bias + emb_proj bias stay f32
            emb[key] = source.dense(name, shape, f32)

    per_layer: dict[str, list] = {}
    # ALBERT shares one parameter set across layers: the stack has leading
    # dim 1 and the forward's scan reuses it n_layer times (models/bert.py)
    n_stack = 1 if config.shared_layers else config.n_layer
    for i in range(n_stack):
        for name, (key, shape_fn) in schema.layer_tensor_names(i, config).items():
            shape = shape_fn(config)
            if key == "wqkv":
                # ModernBERT fused QKV -> per-projection weights (schema.py
                # MODERNBERT_LAYER_TENSORS doc; fused QKV measured slower)
                for subkey, v in zip(
                    ("q_w", "k_w", "v_w"),
                    source.matmul_weight_split(name, shape, dense_dtype,
                                               keep_q4, 3),
                ):
                    per_layer.setdefault(subkey, []).append(v)
                continue
            if key == "wqkv_b":
                # nomic fused QKV bias -> per-projection thirds, matching
                # the wqkv weight split above
                full = source.dense(name, shape, f32)
                third = shape[0] // 3
                for j, subkey in enumerate(("q_b", "k_b", "v_b")):
                    per_layer.setdefault(subkey, []).append(
                        full[j * third : (j + 1) * third]
                    )
                continue
            if key == "wi":
                # GeGLU Wi -> (input, gate) halves, TP-shardable per half
                for subkey, v in zip(
                    ("ffn_up_w", "ffn_gate_w"),
                    source.matmul_weight_split(name, shape, dense_dtype,
                                               keep_q4, 2),
                ):
                    per_layer.setdefault(subkey, []).append(v)
                continue
            if key in _MATMUL_KEYS:
                v = source.matmul_weight(name, shape, dense_dtype, keep_q4)
            elif key.startswith("ln_"):
                v = source.dense(name, shape, f32)
            else:  # biases
                v = source.dense(name, shape, f32)
            per_layer.setdefault(key, []).append(v)

    if config.arch == "modernbert":
        # layer 0 has no attn_norm (nn.Identity) — pad the stack with a
        # ones row so the lax.scan xs stay rectangular; the forward skips
        # the norm for layer 0 entirely (models/modernbert.py), so the row
        # is never read
        per_layer["ln_att_scale"].insert(
            0, jnp.ones((config.n_embd,), f32)
        )
    layers = {k: _stack_layer_values(v) for k, v in per_layer.items()}
    params = {"embeddings": emb, "layers": layers}
    for name, (key, shape_fn) in schema.extra_tensors(config).items():
        # MPNet's shared relative-attention-bias table: tiny ([buckets, H]),
        # added directly to f32 attention scores — always dense f32
        params[key] = source.dense(name, shape_fn(config), f32)
    if config.dense_out:
        # sentence-transformers Dense head: tiny ([E, dense_out]); kept f32
        # (the head deliberately computes in f32 — bf16 storage would round
        # the weights before the f32 math could help)
        dense = {}
        for name, (key, shape_fn) in schema.DENSE_TENSORS.items():
            shape = shape_fn(config)
            if key == "dense_w":
                dense["w"] = source.dense_t(name, shape, f32)
            else:
                dense["b"] = source.dense(name, shape, f32)
        params["dense"] = dense
    if getattr(config, "mlm_head", False):
        # SPLADE MLM head: the transform linear + LayerNorm stay f32 (tiny,
        # accuracy over throughput); the decoder projection is the TIED word
        # table re-packed in matmul orientation — quantized payloads stay
        # packed (the [B*S, E] @ [E, V] logits matmul is the sparse path's
        # one big MXU op, served by the same fused dequant kernels as the
        # encoder), at the cost of a second 4/8-bit copy of the table.
        word_name = "embeddings.word_embeddings.weight"
        mlm = {}
        for name, (key, shape_fn) in schema.mlm_tensors(config).items():
            shape = shape_fn(config)
            if key == "mlm_dense_w":
                mlm["dense_w"] = source.dense_t(name, shape, f32)
            else:
                mlm[key.removeprefix("mlm_")] = source.dense(name, shape, f32)
        mlm["decoder_w"] = source.matmul_weight(
            word_name, (config.n_vocab, config.emb_width), dense_dtype, keep_q4
        )
        params["mlm"] = mlm
    if config.n_labels:
        # sequence-classification head (cross-encoder rerankers): two tiny
        # linears computed in f32 on the CLS hidden state — dense at load
        # regardless of file quantization (same policy as the Dense head)
        head = {}
        for name, (key, shape_fn) in schema.head_tensors(config).items():
            shape = shape_fn(config)
            if key.endswith("_w"):
                head[key.removeprefix("head_")] = source.dense_t(
                    name, shape, f32
                )
            else:
                head[key.removeprefix("head_")] = source.dense(
                    name, shape, f32
                )
        params["head"] = head
    if getattr(config, "colbert_dim", 0):
        # ColBERT per-token projection: one bias-free [E, dim] linear,
        # applied to every token's final hidden state — f32 like the other
        # output heads (tiny; accuracy over storage)
        (name, (_, shape_fn)), = schema.COLBERT_TENSORS.items()
        params["colbert"] = {
            "w": source.dense_t(name, shape_fn(config), f32)
        }
    return params


# --- sources ----------------------------------------------------------------

def source_from_gguf(reader) -> _TensorSource:
    def get(name: str):
        info = reader.tensors[name]
        return reader.tensor_raw(name), info.ggml_type, info.shape

    return _TensorSource(get)


def source_from_arrays(
    arrays: dict[str, np.ndarray], ftype: GGUFFileType = GGUFFileType.ALL_F32
) -> _TensorSource:
    """f32 numpy state dict (HF names/shapes) -> source, applying the same
    per-tensor type policy as the converter/quantizer: 2-D tensors named
    *weight get the file's type; everything else stays f32
    (convert-to-gguf.py:313-319, bert.cpp:1430-1436)."""
    target = FTYPE_TO_GGML[ftype]

    def get(name: str):
        arr = np.ascontiguousarray(arrays[name], dtype=np.float32)
        gtype = (
            target
            if name.endswith("weight") and arr.ndim == 2
            else GGMLType.F32
        )
        return gguf_quantize(arr.reshape(-1), gtype), gtype, arr.shape

    return _TensorSource(get)


def load_params(
    reader,
    config: BertConfig | None = None,
    *,
    weight_mode: str = "auto",
    dense_dtype=jnp.float32,
):
    if config is None:
        config = BertConfig.from_gguf_kv(reader.kv)
    return (
        build_params(
            source_from_gguf(reader),
            config,
            weight_mode=weight_mode,
            dense_dtype=dense_dtype,
        ),
        config,
    )


def random_state_dict(config: BertConfig, seed: int = 0) -> dict[str, np.ndarray]:
    """Random HF-style BERT state dict (for benchmarks/tests; no downloads)."""
    rng = np.random.default_rng(seed)

    def init(shape):
        return (rng.standard_normal(shape) * 0.02).astype(np.float32)

    sd: dict[str, np.ndarray] = {}
    for name, (key, shape_fn) in schema.embedding_tensors(config).items():
        shape = shape_fn(config)
        if key in ("ln_scale",):
            sd[name] = np.ones(shape, np.float32)
        elif key in ("ln_bias",):
            sd[name] = np.zeros(shape, np.float32)
        else:
            sd[name] = init(shape)
    for i in range(1 if config.shared_layers else config.n_layer):
        for name, (key, shape_fn) in schema.layer_tensor_names(i, config).items():
            shape = shape_fn(config)
            if key.startswith("ln_") and key.endswith("scale"):
                sd[name] = np.ones(shape, np.float32)
            elif key.startswith("ln_") and key.endswith("bias"):
                sd[name] = np.zeros(shape, np.float32)
            elif key.endswith("_b"):
                sd[name] = np.zeros(shape, np.float32)
            else:
                sd[name] = init(shape)
    for name, (key, shape_fn) in schema.extra_tensors(config).items():
        # norm scales init to ones (ModernBERT's final_norm); bias tables random
        if key.endswith("ln_scale"):
            sd[name] = np.ones(shape_fn(config), np.float32)
        else:
            sd[name] = init(shape_fn(config))
    if config.dense_out:
        for name, (key, shape_fn) in schema.DENSE_TENSORS.items():
            sd[name] = init(shape_fn(config))
    if getattr(config, "colbert_dim", 0):
        for name, (key, shape_fn) in schema.COLBERT_TENSORS.items():
            sd[name] = init(shape_fn(config))
    for name, (key, shape_fn) in schema.head_tensors(config).items():
        # head biases stay random (unlike encoder biases) so parity tests
        # exercise the bias adds of both head linears
        sd[name] = init(shape_fn(config))
    for name, (key, shape_fn) in schema.mlm_tensors(config).items():
        shape = shape_fn(config)
        if key == "mlm_ln_scale":
            sd[name] = np.ones(shape, np.float32)
        elif key == "mlm_ln_bias":
            sd[name] = np.zeros(shape, np.float32)
        else:
            # the |V| output bias stays random so sparse-parity tests
            # exercise the decoder bias add
            sd[name] = init(shape)
    return sd


def random_params(
    config: BertConfig,
    ftype: GGUFFileType = GGUFFileType.ALL_F32,
    seed: int = 0,
    *,
    weight_mode: str = "auto",
    dense_dtype=jnp.float32,
):
    sd = random_state_dict(config, seed)
    return build_params(
        source_from_arrays(sd, ftype),
        config,
        weight_mode=weight_mode,
        dense_dtype=dense_dtype,
    )
