// tpuembed.h — C ABI for the TPU embedding engine (the bert.h analog,
// reference bert.h:41-92).  TPU compute runs inside the JAX engine process;
// this ABI is the native client plane: tpe_load_from_file() spawns the
// engine server and connects, tpe_connect() attaches to a running one.
//
// Link against native/build/libtpuembed_capi.so (or dlopen it, see
// examples/dylib.cpp).  Tokenizer-only native access (no engine process)
// is the separate libtpuembed_tokenizer.so ABI.
#ifndef TPUEMBED_H
#define TPUEMBED_H

#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef struct Ctx tpe_ctx;

// bert_load_from_file equivalent: spawn the engine server on a free local
// port (python3 -m embedding_cpp_tpu.runtime.server; override the
// interpreter with $TPE_PYTHON, the readiness wait with
// $TPE_SPAWN_TIMEOUT_S) and connect.  NULL on failure.
tpe_ctx* tpe_load_from_file(const char* model_path);

// Attach to an already-running embedding server.  NULL on failure.
tpe_ctx* tpe_connect(const char* host, int port);

// Free the context; terminates the spawned server (if any).
void tpe_free(tpe_ctx* ctx);

// Embedding width of the loaded model (bert_n_embd).
int32_t tpe_n_embd(tpe_ctx* ctx);

// Embed one text into out[n_embd] (bert_encode).  0 = ok, -1 = error.
int tpe_encode(tpe_ctx* ctx, const char* text, float* out);

// Embed n_inputs texts into out[n_inputs * n_embd] (bert_encode_batch;
// unlike the reference, batching is real).  0 = ok, -1 = error.
int tpe_encode_batch(tpe_ctx* ctx, int32_t n_inputs, const char** texts,
                     float* out);

// Max tokens per input (bert_n_max_tokens).  0 on failure.
int32_t tpe_n_max_tokens(tpe_ctx* ctx);

// Tokenize one text (bert_tokenize: CLS/SEP framing + truncation applied
// server-side).  Fills out[0..min(count, cap)); returns the full token
// count, or -1 on error.
int32_t tpe_tokenize(tpe_ctx* ctx, const char* text, int32_t* out,
                     int32_t cap);

// Embed pre-tokenized inputs (bert_eval_batch): ids concatenates n_inputs
// id lists of lengths lens[i]; out holds n_inputs * n_embd floats.
int tpe_eval_batch(tpe_ctx* ctx, int32_t n_inputs, const int32_t* lens,
                   const int32_t* ids, float* out);

// Token id -> NUL-terminated token string in buf[cap]
// (bert_vocab_id_to_token).  Returns the token byte length, or -1.
int32_t tpe_vocab_id_to_token(tpe_ctx* ctx, int32_t token_id, char* buf,
                              int32_t cap);

// Build/append the server's on-device vector index (embeddings stay in
// device HBM).  Returns the total indexed count, or -1.
int32_t tpe_index(tpe_ctx* ctx, int32_t n_texts, const char** texts);

// Top-k search over the on-device index.  out_idx and out_scores must each
// hold n_queries * k entries; only ids + scores cross the wire.  The server
// replies with the REQUESTED k columns; slots without a result (k beyond
// the corpus size, or unfilled approximate-mode bins) carry index -1 and
// score -inf.  Returns the reply's k, or -1 on error.
int32_t tpe_search(tpe_ctx* ctx, int32_t n_queries, const char** queries,
                   int32_t k, int32_t* out_idx, float* out_scores);

// Cross-encoder rerank (needs a classification-head model; the reference
// has no rerank surface).  Scores each document against the query and
// ranks descending: out_idx/out_scores must hold min(top_n, n_docs)
// entries (top_n <= 0 means all documents).  Scores are sigmoid
// relevances in (0, 1).  Returns the result count, or -1 on error (e.g.
// the served model has no classification head — see tpe_last_error).
int32_t tpe_rerank(tpe_ctx* ctx, const char* query, int32_t n_docs,
                   const char** docs, int32_t top_n, int32_t* out_idx,
                   float* out_scores);

// Sparse (SPLADE) corpus building/search and hybrid dense+sparse retrieval
// — the tpe_index/tpe_search contracts verbatim.  Sparse needs an MLM-head
// model; hybrid_index adds to BOTH indexes (identical doc ids) and
// hybrid_search fuses the dense and sparse rankings by reciprocal rank.
int32_t tpe_sparse_index(tpe_ctx* ctx, int32_t n_texts, const char** texts);
int32_t tpe_sparse_search(tpe_ctx* ctx, int32_t n_queries,
                          const char** queries, int32_t k, int32_t* out_idx,
                          float* out_scores);
int32_t tpe_hybrid_index(tpe_ctx* ctx, int32_t n_texts, const char** texts);
int32_t tpe_hybrid_search(tpe_ctx* ctx, int32_t n_queries,
                          const char** queries, int32_t k, int32_t* out_idx,
                          float* out_scores);

// Late-interaction retrieval over the on-device token-state corpus
// (MaxSimIndex) — the tpe_index/tpe_search contracts verbatim; any encoder,
// scores are raw MaxSim sums.
int32_t tpe_maxsim_index(tpe_ctx* ctx, int32_t n_texts, const char** texts);
int32_t tpe_maxsim_search(tpe_ctx* ctx, int32_t n_queries,
                          const char** queries, int32_t k, int32_t* out_idx,
                          float* out_scores);

// SPLADE sparse encode (needs an MLM-head model; the reference is
// dense-only).  For each text, up to k (term id, weight) entries arrive
// sorted by descending weight: out_ids/out_weights must hold n_texts * k
// entries, out_nnz holds the per-text active count.  Unused slots are
// padded with id -1 / weight 0.  Returns 0, or -1 on error (e.g. the
// served model has no MLM head — see tpe_last_error).
int32_t tpe_encode_sparse(tpe_ctx* ctx, int32_t n_texts, const char** texts,
                          int32_t k, int32_t* out_ids, float* out_weights,
                          int32_t* out_nnz);

// Late-interaction MaxSim rerank (works with ANY served model — ColBERT-
// style sum-of-max cosine over token states, no classification head
// needed).  Same buffer contract as tpe_rerank; scores are raw MaxSim
// sums (unbounded, larger = more relevant).  Returns the result count,
// or -1 on error.
int32_t tpe_maxsim(tpe_ctx* ctx, const char* query, int32_t n_docs,
                   const char** docs, int32_t top_n, int32_t* out_idx,
                   float* out_scores);

// Requantize a GGUF model file (bert_model_quantize, bert.h:92).  ftype
// uses the reference's numeric codes (2=q4_0, 3=q4_1) plus 7=q8_0 (our
// extension).  Runs the quantize tool in a child process; returns 0 on
// success, -1 on failure.  Needs no tpe_ctx.
int tpe_model_quantize(const char* in_path, const char* out_path, int ftype);

// Human-readable description of the last failure on this context.
const char* tpe_last_error(tpe_ctx* ctx);

#ifdef __cplusplus
}
#endif

#endif  // TPUEMBED_H
