// C ABI for the TPU embedding engine — the bert.h equivalent
// (reference: bert.h:41-92, consumed via ctypes in examples/sample_dylib.py
// and dlopen in examples/dylib.cpp).
//
// Design: TPU compute must run inside the JAX process, so the native ABI is
// a *client plane*: tpe_load_from_file() spawns the engine server
// (embedding_cpp_tpu.runtime.server) as a child process and speaks the
// length-framed TPE2 protocol over a local socket; tpe_connect() attaches to
// an already-running server (local or remote).  Either way the caller gets
// the same load/encode/free surface the reference exposes, from any language
// with a C FFI.
//
// Build: make -C native  ->  native/build/libtpuembed_capi.so

#include <arpa/inet.h>
#include <errno.h>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <signal.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <sys/socket.h>
#include <sys/types.h>
#include <sys/wait.h>
#include <unistd.h>

#include <chrono>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Ctx {
    int fd = -1;
    int32_t n_embd = 0;
    int32_t n_max_tokens = -1;  // lazily fetched via the meta frame
    pid_t child = -1;  // spawned server process (or -1 when attached)
    std::string last_error;
};

bool read_exactly(int fd, void* buf, size_t n) {
    char* p = static_cast<char*>(buf);
    while (n > 0) {
        ssize_t r = ::read(fd, p, n);
        if (r <= 0) return false;
        p += r;
        n -= static_cast<size_t>(r);
    }
    return true;
}

bool write_all(int fd, const void* buf, size_t n) {
    const char* p = static_cast<const char*>(buf);
    while (n > 0) {
        // MSG_NOSIGNAL: a half-closed peer must surface as a -1 return from
        // tpe_encode_batch, not a SIGPIPE killing the host process
        ssize_t r = ::send(fd, p, n, MSG_NOSIGNAL);
        if (r <= 0) return false;
        p += r;
        n -= static_cast<size_t>(r);
    }
    return true;
}

// Connect and complete the n_embd handshake (server.py handle_client).
int handshake(const char* host, int port, int32_t* n_embd, std::string* err) {
    int fd = ::socket(AF_INET, SOCK_STREAM, 0);
    if (fd < 0) {
        *err = "socket() failed";
        return -1;
    }
    sockaddr_in addr{};
    addr.sin_family = AF_INET;
    addr.sin_port = htons(static_cast<uint16_t>(port));
    if (::inet_pton(AF_INET, host, &addr.sin_addr) != 1) {
        *err = std::string("bad host address: ") + host;
        ::close(fd);
        return -1;
    }
    if (::connect(fd, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) != 0) {
        *err = "connect() failed";
        ::close(fd);
        return -1;
    }
    int one = 1;
    ::setsockopt(fd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof(one));
    if (!read_exactly(fd, n_embd, 4) || *n_embd <= 0) {
        *err = "handshake failed (no n_embd)";
        ::close(fd);
        return -1;
    }
    return fd;
}

// Pick a free TCP port by binding port 0.
int free_port() {
    int fd = ::socket(AF_INET, SOCK_STREAM, 0);
    if (fd < 0) return -1;
    sockaddr_in addr{};
    addr.sin_family = AF_INET;
    addr.sin_addr.s_addr = htonl(INADDR_LOOPBACK);
    addr.sin_port = 0;
    if (::bind(fd, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) != 0) {
        ::close(fd);
        return -1;
    }
    socklen_t len = sizeof(addr);
    ::getsockname(fd, reinterpret_cast<sockaddr*>(&addr), &len);
    int port = ntohs(addr.sin_port);
    ::close(fd);
    return port;
}


// A protocol mismatch after a request was sent leaves the rest of the
// server's reply unread in the socket — every later call would misparse
// frames.  Mark the context dead (close the fd) so callers fail fast with
// last_error instead of desynchronizing silently.
void kill_conn(Ctx* ctx) {
    if (ctx->fd >= 0) ::close(ctx->fd);
    ctx->fd = -1;
}

// Read a reply's leading u32; decodes the shared error frame
// (0xFFFFFFFF | u32 len | utf8 message) into last_error.  Returns false on
// socket failure or error frame.  An error frame is read in full, so the
// stream stays consistent; anything else that fails kills the connection.
bool read_reply_count(Ctx* ctx, uint32_t* count) {
    if (!read_exactly(ctx->fd, count, 4)) {
        ctx->last_error = "recv failed";
        kill_conn(ctx);
        return false;
    }
    if (*count == 0xFFFFFFFFu) {
        uint32_t len = 0;
        if (!read_exactly(ctx->fd, &len, 4) || len > (1u << 20)) {
            ctx->last_error = "recv failed";
            kill_conn(ctx);
            return false;
        }
        std::string msg(len, '\0');
        if (len && !read_exactly(ctx->fd, &msg[0], len)) {
            ctx->last_error = "recv failed";
            kill_conn(ctx);
            return false;
        }
        ctx->last_error = "server error: " + msg;
        return false;
    }
    return true;
}

}  // namespace

extern "C" {

typedef struct Ctx tpe_ctx;

// Attach to a running embedding server.  Returns NULL on failure.
tpe_ctx* tpe_connect(const char* host, int port) {
    auto* ctx = new Ctx();
    std::string err;
    ctx->fd = handshake(host, port, &ctx->n_embd, &err);
    if (ctx->fd < 0) {
        delete ctx;
        return nullptr;
    }
    return ctx;
}

// The bert_load_from_file equivalent (bert.h:41): spawn the engine server
// on a free local port and connect.  First model compile can take tens of
// seconds; override the wait with TPE_SPAWN_TIMEOUT_S.  NULL on failure.
tpe_ctx* tpe_load_from_file(const char* model_path) {
    long timeout_s = 300;
    if (const char* t = getenv("TPE_SPAWN_TIMEOUT_S")) timeout_s = atol(t);

    // bind(0)+close then fork is inherently racy: another process can grab
    // the port before the child binds, making the child exit even though the
    // model is fine.  A child that dies early is retried on a fresh port
    // (bounded — a genuinely bad model also dies early, and those retries
    // fail fast).
    for (int attempt = 0; attempt < 3; ++attempt) {
        int port = free_port();
        if (port <= 0) return nullptr;

        pid_t pid = ::fork();
        if (pid < 0) return nullptr;
        if (pid == 0) {
            const char* py = getenv("TPE_PYTHON");
            if (!py || !*py) py = "python3";
            std::string port_s = std::to_string(port);
            ::execlp(py, py, "-m", "embedding_cpp_tpu.runtime.server", "-m",
                     model_path, "--host", "127.0.0.1", "--port",
                     port_s.c_str(), (char*)nullptr);
            _exit(127);  // exec failed
        }

        auto deadline =
            std::chrono::steady_clock::now() + std::chrono::seconds(timeout_s);
        std::string err;
        bool died = false;
        while (std::chrono::steady_clock::now() < deadline) {
            int status = 0;
            if (::waitpid(pid, &status, WNOHANG) == pid) {
                died = true;  // maybe lost the port race — retry fresh
                break;
            }
            int32_t n_embd = 0;
            int fd = handshake("127.0.0.1", port, &n_embd, &err);
            if (fd >= 0) {
                auto* ctx = new Ctx();
                ctx->fd = fd;
                ctx->n_embd = n_embd;
                ctx->child = pid;
                return ctx;
            }
            std::this_thread::sleep_for(std::chrono::milliseconds(200));
        }
        if (!died) {  // alive but never served within the timeout: give up
            ::kill(pid, SIGTERM);
            ::waitpid(pid, nullptr, 0);
            return nullptr;
        }
    }
    return nullptr;
}

void tpe_free(tpe_ctx* ctx) {
    if (!ctx) return;
    if (ctx->fd >= 0) ::close(ctx->fd);
    if (ctx->child > 0) {
        ::kill(ctx->child, SIGTERM);
        ::waitpid(ctx->child, nullptr, 0);
    }
    delete ctx;
}

int32_t tpe_n_embd(tpe_ctx* ctx) { return ctx ? ctx->n_embd : 0; }

const char* tpe_last_error(tpe_ctx* ctx) {
    return ctx ? ctx->last_error.c_str() : "null context";
}

// Embed n_inputs texts; out must hold n_inputs * n_embd floats.
// L2-normalized embeddings, batched server-side (the reference's
// bert_encode_batch, bert.h:54 — but actually batched).  Returns 0 on
// success, -1 on failure (see tpe_last_error).
int tpe_encode_batch(tpe_ctx* ctx, int32_t n_inputs, const char** texts,
                     float* out) {
    if (!ctx || ctx->fd < 0) return -1;
    if (n_inputs <= 0) return 0;

    // request: "TPE2" | u32 count | count * (u32 len | bytes)
    std::string req;
    req.reserve(64 * static_cast<size_t>(n_inputs));
    req.append("TPE2", 4);
    uint32_t count = static_cast<uint32_t>(n_inputs);
    req.append(reinterpret_cast<const char*>(&count), 4);
    for (int32_t i = 0; i < n_inputs; ++i) {
        uint32_t len = texts[i] ? static_cast<uint32_t>(strlen(texts[i])) : 0;
        req.append(reinterpret_cast<const char*>(&len), 4);
        if (len) req.append(texts[i], len);
    }
    if (!write_all(ctx->fd, req.data(), req.size())) {
        ctx->last_error = "send failed";
        return -1;
    }

    // reply: u32 count | count * n_embd * f32,
    // or error frame: 0xFFFFFFFF | u32 len | message
    uint32_t reply_count = 0;
    if (!read_reply_count(ctx, &reply_count)) return -1;
    if (reply_count != count) {
        ctx->last_error = "server returned wrong count";
        kill_conn(ctx);
        return -1;
    }
    size_t bytes = static_cast<size_t>(reply_count) *
                   static_cast<size_t>(ctx->n_embd) * sizeof(float);
    if (!read_exactly(ctx->fd, out, bytes)) {
        ctx->last_error = "recv failed";
        kill_conn(ctx);
        return -1;
    }
    return 0;
}

// Single text (the reference's bert_encode, bert.h:46).
int tpe_encode(tpe_ctx* ctx, const char* text, float* out) {
    return tpe_encode_batch(ctx, 1, &text, out);
}

// Max tokens per input of the loaded model (bert_n_max_tokens, bert.h:88).
// Fetched once via the meta frame; 0 on failure.
int32_t tpe_n_max_tokens(tpe_ctx* ctx) {
    if (!ctx || ctx->fd < 0) return 0;
    if (ctx->n_max_tokens >= 0) return ctx->n_max_tokens;
    if (!write_all(ctx->fd, "\x01TPM", 4)) return 0;
    uint32_t len = 0;
    if (!read_exactly(ctx->fd, &len, 4) || len > (1u << 20)) {
        kill_conn(ctx);
        return 0;
    }
    std::string json(len, '\0');
    if (len && !read_exactly(ctx->fd, &json[0], len)) {
        kill_conn(ctx);
        return 0;
    }
    const char* key = "\"n_max_tokens\":";
    size_t pos = json.find(key);
    ctx->n_max_tokens =
        pos == std::string::npos ? 0 : atoi(json.c_str() + pos + strlen(key));
    return ctx->n_max_tokens;
}

// Tokenize one text into out[cap] (bert_tokenize, bert.h:64: CLS/SEP
// framing + truncation happen server-side exactly like bert_encode's
// internal path).  Returns the token count, or -1 on error.
int32_t tpe_tokenize(tpe_ctx* ctx, const char* text, int32_t* out,
                     int32_t cap) {
    if (!ctx || ctx->fd < 0 || !text) return -1;
    std::string req;
    req.append("\x01TPT", 4);
    uint32_t one = 1;
    req.append(reinterpret_cast<const char*>(&one), 4);
    uint32_t len = static_cast<uint32_t>(strlen(text));
    req.append(reinterpret_cast<const char*>(&len), 4);
    req.append(text, len);
    if (!write_all(ctx->fd, req.data(), req.size())) {
        ctx->last_error = "send failed";
        return -1;
    }
    uint32_t count = 0;
    if (!read_reply_count(ctx, &count)) return -1;
    uint32_t k = 0;
    if (count != 1 || !read_exactly(ctx->fd, &k, 4) || k > (1u << 20)) {
        ctx->last_error = "bad tokenize reply";
        kill_conn(ctx);
        return -1;
    }
    std::vector<int32_t> ids(k);
    if (k && !read_exactly(ctx->fd, ids.data(), 4ull * k)) {
        ctx->last_error = "recv failed";
        kill_conn(ctx);
        return -1;
    }
    int32_t n = static_cast<int32_t>(k) < cap ? static_cast<int32_t>(k) : cap;
    if (out && n > 0) memcpy(out, ids.data(), 4ull * n);
    return static_cast<int32_t>(k);
}

// Embed pre-tokenized inputs (bert_eval_batch, bert.h:79): ids is the
// concatenation of n_inputs id lists whose lengths are in lens; out must
// hold n_inputs * n_embd floats.  0 = ok, -1 = error.
int tpe_eval_batch(tpe_ctx* ctx, int32_t n_inputs, const int32_t* lens,
                   const int32_t* ids, float* out) {
    if (!ctx || ctx->fd < 0 || n_inputs <= 0) return n_inputs == 0 ? 0 : -1;
    // validate lens before touching the ids buffer: a negative length would
    // otherwise wrap to a ~4 GiB append reading far past the caller's array
    // (mirrors the server-side MAX_IDS / MAX_REQUEST_IDS caps)
    size_t total = 0;
    for (int32_t i = 0; i < n_inputs; ++i) {
        if (lens[i] < 0 || lens[i] > (1 << 20)) {
            ctx->last_error = "invalid lens[" + std::to_string(i) +
                              "] = " + std::to_string(lens[i]);
            return -1;
        }
        total += static_cast<size_t>(lens[i]);
    }
    if (total > (1u << 22)) {
        ctx->last_error = "request exceeds 1<<22 total ids";
        return -1;
    }
    std::string req;
    req.append("\x01TPI", 4);
    uint32_t count = static_cast<uint32_t>(n_inputs);
    req.append(reinterpret_cast<const char*>(&count), 4);
    size_t off = 0;
    for (int32_t i = 0; i < n_inputs; ++i) {
        uint32_t k = static_cast<uint32_t>(lens[i]);
        req.append(reinterpret_cast<const char*>(&k), 4);
        req.append(reinterpret_cast<const char*>(ids + off), 4ull * k);
        off += k;
    }
    if (!write_all(ctx->fd, req.data(), req.size())) {
        ctx->last_error = "send failed";
        return -1;
    }
    uint32_t reply = 0;
    if (!read_reply_count(ctx, &reply)) return -1;
    if (reply != count) {
        ctx->last_error = "server returned wrong count";
        kill_conn(ctx);
        return -1;
    }
    size_t bytes = static_cast<size_t>(count) *
                   static_cast<size_t>(ctx->n_embd) * sizeof(float);
    if (!read_exactly(ctx->fd, out, bytes)) {
        ctx->last_error = "recv failed";
        kill_conn(ctx);
        return -1;
    }
    return 0;
}

namespace {
// Append `u32 count | count * (u32 len | utf8)` to req.
void append_texts(std::string* req, int32_t n, const char** texts) {
    uint32_t count = static_cast<uint32_t>(n);
    req->append(reinterpret_cast<const char*>(&count), 4);
    for (int32_t i = 0; i < n; ++i) {
        uint32_t len = texts[i] ? static_cast<uint32_t>(strlen(texts[i])) : 0;
        req->append(reinterpret_cast<const char*>(&len), 4);
        if (len) req->append(texts[i], len);
    }
}
}  // namespace

// Build/append the server's on-device vector index (the \x01TPB frame —
// embeddings stay in device HBM; runtime/search.py).  Returns the total
// indexed count, or -1 (see tpe_last_error).
static int32_t index_like(tpe_ctx* ctx, const char* magic, int32_t n_texts,
                          const char** texts) {
    if (!ctx || ctx->fd < 0 || n_texts <= 0) return -1;
    std::string req;
    req.append(magic, 4);
    append_texts(&req, n_texts, texts);
    if (!write_all(ctx->fd, req.data(), req.size())) {
        ctx->last_error = "send failed";
        return -1;
    }
    uint32_t total = 0;
    if (!read_reply_count(ctx, &total)) return -1;
    return static_cast<int32_t>(total);
}

int32_t tpe_index(tpe_ctx* ctx, int32_t n_texts, const char** texts) {
    return index_like(ctx, "\x01TPB", n_texts, texts);
}

// Top-k search over the on-device index (the \x01TPS frame): out_idx and
// out_scores must each hold n_queries * k entries.  Only ids + scores cross
// the wire.  The server always replies with the REQUESTED k columns; slots
// without a result (k beyond the corpus size) carry id -1 / score -inf.
// Returns the reply's k (== the requested k against current servers; older
// servers clamped, hence kr <= ku is still accepted), or -1.
static int32_t search_like(tpe_ctx* ctx, const char* magic,
                           int32_t n_queries, const char** queries,
                           int32_t k, int32_t* out_idx, float* out_scores) {
    if (!ctx || ctx->fd < 0 || n_queries <= 0 || k <= 0 || !out_idx ||
        !out_scores)
        return -1;
    std::string req;
    req.append(magic, 4);
    uint32_t ku = static_cast<uint32_t>(k);
    req.append(reinterpret_cast<const char*>(&ku), 4);
    append_texts(&req, n_queries, queries);
    if (!write_all(ctx->fd, req.data(), req.size())) {
        ctx->last_error = "send failed";
        return -1;
    }
    uint32_t n = 0;
    if (!read_reply_count(ctx, &n)) return -1;
    uint32_t kr = 0;
    if (n != static_cast<uint32_t>(n_queries) ||
        !read_exactly(ctx->fd, &kr, 4) || kr > ku) {
        ctx->last_error = "bad search reply";
        kill_conn(ctx);
        return -1;
    }
    size_t cells = static_cast<size_t>(n) * kr;
    if (!read_exactly(ctx->fd, out_idx, 4 * cells) ||
        !read_exactly(ctx->fd, out_scores, 4 * cells)) {
        ctx->last_error = "recv failed";
        kill_conn(ctx);
        return -1;
    }
    return static_cast<int32_t>(kr);
}

int32_t tpe_search(tpe_ctx* ctx, int32_t n_queries, const char** queries,
                   int32_t k, int32_t* out_idx, float* out_scores) {
    return search_like(ctx, "\x01TPS", n_queries, queries, k, out_idx,
                       out_scores);
}

// Sparse (SPLADE) corpus building/search and hybrid dense+sparse retrieval
// (the \x01TPY/\x01TPZ/\x01TPF/\x01TPG frames) — the tpe_index/tpe_search
// buffer contracts verbatim.  Sparse needs an MLM-head model; hybrid adds
// to BOTH indexes atomically and fuses rankings by reciprocal rank.
int32_t tpe_sparse_index(tpe_ctx* ctx, int32_t n_texts, const char** texts) {
    return index_like(ctx, "\x01TPY", n_texts, texts);
}

int32_t tpe_sparse_search(tpe_ctx* ctx, int32_t n_queries,
                          const char** queries, int32_t k, int32_t* out_idx,
                          float* out_scores) {
    return search_like(ctx, "\x01TPZ", n_queries, queries, k, out_idx,
                       out_scores);
}

int32_t tpe_hybrid_index(tpe_ctx* ctx, int32_t n_texts, const char** texts) {
    return index_like(ctx, "\x01TPF", n_texts, texts);
}

int32_t tpe_hybrid_search(tpe_ctx* ctx, int32_t n_queries,
                          const char** queries, int32_t k, int32_t* out_idx,
                          float* out_scores) {
    return search_like(ctx, "\x01TPG", n_queries, queries, k, out_idx,
                       out_scores);
}

// Late-interaction retrieval over the on-device token-state corpus
// (runtime/maxsim_search.MaxSimIndex; the \x01TPJ/\x01TPK frames) — the
// tpe_index/tpe_search buffer contracts verbatim.  Works with any encoder
// (no classification head needed); scores are raw MaxSim sums.
int32_t tpe_maxsim_index(tpe_ctx* ctx, int32_t n_texts, const char** texts) {
    return index_like(ctx, "\x01TPJ", n_texts, texts);
}

int32_t tpe_maxsim_search(tpe_ctx* ctx, int32_t n_queries,
                          const char** queries, int32_t k, int32_t* out_idx,
                          float* out_scores) {
    return search_like(ctx, "\x01TPK", n_queries, queries, k, out_idx,
                       out_scores);
}

// Cross-encoder rerank (the \x01TPR frame; runtime/engine.rerank).  The
// reply is m ranked (index, sigmoid score) pairs, m = min(top_n, n_docs);
// a model without a classification head fails with an error frame that
// lands in last_error, stream intact.
int32_t tpe_rerank(tpe_ctx* ctx, const char* query, int32_t n_docs,
                   const char** docs, int32_t top_n, int32_t* out_idx,
                   float* out_scores) {
    if (!ctx || ctx->fd < 0 || !query || n_docs <= 0 || !out_idx ||
        !out_scores)
        return -1;
    std::string req;
    req.append("\x01TPR", 4);
    uint32_t tn = top_n > 0 ? static_cast<uint32_t>(top_n) : 0;
    req.append(reinterpret_cast<const char*>(&tn), 4);
    uint32_t qlen = static_cast<uint32_t>(strlen(query));
    req.append(reinterpret_cast<const char*>(&qlen), 4);
    req.append(query, qlen);
    append_texts(&req, n_docs, docs);
    if (!write_all(ctx->fd, req.data(), req.size())) {
        ctx->last_error = "send failed";
        return -1;
    }
    uint32_t m = 0;
    if (!read_reply_count(ctx, &m)) return -1;
    uint32_t cap = tn ? (tn < static_cast<uint32_t>(n_docs)
                             ? tn
                             : static_cast<uint32_t>(n_docs))
                      : static_cast<uint32_t>(n_docs);
    if (m > cap) {
        ctx->last_error = "bad rerank reply";
        kill_conn(ctx);
        return -1;
    }
    if (!read_exactly(ctx->fd, out_idx, 4ull * m) ||
        !read_exactly(ctx->fd, out_scores, 4ull * m)) {
        ctx->last_error = "recv failed";
        kill_conn(ctx);
        return -1;
    }
    return static_cast<int32_t>(m);
}

// SPLADE sparse encode (the \x01TPW frame; runtime/engine.encode_sparse).
// Per text the server sends nnz <= k (term id, weight) entries sorted by
// descending weight; the remainder of each row pads with id -1 / weight 0.
// A dense model fails with an error frame in last_error, stream intact.
int32_t tpe_encode_sparse(tpe_ctx* ctx, int32_t n_texts, const char** texts,
                          int32_t k, int32_t* out_ids, float* out_weights,
                          int32_t* out_nnz) {
    if (!ctx || ctx->fd < 0 || n_texts <= 0 || k <= 0 || !out_ids ||
        !out_weights || !out_nnz)
        return -1;
    std::string req;
    req.append("\x01TPW", 4);
    uint32_t ku = static_cast<uint32_t>(k);
    req.append(reinterpret_cast<const char*>(&ku), 4);
    append_texts(&req, n_texts, texts);
    if (!write_all(ctx->fd, req.data(), req.size())) {
        ctx->last_error = "send failed";
        return -1;
    }
    uint32_t n = 0;
    if (!read_reply_count(ctx, &n)) return -1;
    if (n != static_cast<uint32_t>(n_texts)) {
        ctx->last_error = "bad sparse reply";
        kill_conn(ctx);
        return -1;
    }
    for (uint32_t i = 0; i < n; ++i) {
        uint32_t nnz = 0;
        if (!read_exactly(ctx->fd, &nnz, 4) || nnz > ku) {
            ctx->last_error = "bad sparse row";
            kill_conn(ctx);
            return -1;
        }
        int32_t* ids = out_ids + static_cast<size_t>(i) * ku;
        float* ws = out_weights + static_cast<size_t>(i) * ku;
        if (!read_exactly(ctx->fd, ids, 4ull * nnz) ||
            !read_exactly(ctx->fd, ws, 4ull * nnz)) {
            ctx->last_error = "recv failed";
            kill_conn(ctx);
            return -1;
        }
        for (uint32_t j = nnz; j < ku; ++j) {
            ids[j] = -1;
            ws[j] = 0.0f;
        }
        out_nnz[i] = static_cast<int32_t>(nnz);
    }
    return 0;
}

// Late-interaction MaxSim rerank (the \x01TPX frame; runtime/engine
// .maxsim_rerank) — the \x01TPR wire layout with raw MaxSim sums instead
// of sigmoid scores, and no head requirement on the served model.
int32_t tpe_maxsim(tpe_ctx* ctx, const char* query, int32_t n_docs,
                   const char** docs, int32_t top_n, int32_t* out_idx,
                   float* out_scores) {
    if (!ctx || ctx->fd < 0 || !query || n_docs <= 0 || !out_idx ||
        !out_scores)
        return -1;
    std::string req;
    req.append("\x01TPX", 4);
    uint32_t tn = top_n > 0 ? static_cast<uint32_t>(top_n) : 0;
    req.append(reinterpret_cast<const char*>(&tn), 4);
    uint32_t qlen = static_cast<uint32_t>(strlen(query));
    req.append(reinterpret_cast<const char*>(&qlen), 4);
    req.append(query, qlen);
    append_texts(&req, n_docs, docs);
    if (!write_all(ctx->fd, req.data(), req.size())) {
        ctx->last_error = "send failed";
        return -1;
    }
    uint32_t m = 0;
    if (!read_reply_count(ctx, &m)) return -1;
    uint32_t cap = tn ? (tn < static_cast<uint32_t>(n_docs)
                             ? tn
                             : static_cast<uint32_t>(n_docs))
                      : static_cast<uint32_t>(n_docs);
    if (m > cap) {
        ctx->last_error = "bad maxsim reply";
        kill_conn(ctx);
        return -1;
    }
    if (!read_exactly(ctx->fd, out_idx, 4ull * m) ||
        !read_exactly(ctx->fd, out_scores, 4ull * m)) {
        ctx->last_error = "recv failed";
        kill_conn(ctx);
        return -1;
    }
    return static_cast<int32_t>(m);
}

// Token id -> token string (bert_vocab_id_to_token, bert.h:90).  Writes a
// NUL-terminated string into buf[cap]; returns the token byte length
// (excluding NUL), or -1 on error.
int32_t tpe_vocab_id_to_token(tpe_ctx* ctx, int32_t token_id, char* buf,
                              int32_t cap) {
    if (!ctx || ctx->fd < 0 || !buf || cap <= 0) return -1;
    std::string req;
    req.append("\x01TPV", 4);
    uint32_t id = static_cast<uint32_t>(token_id);
    req.append(reinterpret_cast<const char*>(&id), 4);
    if (!write_all(ctx->fd, req.data(), req.size())) {
        ctx->last_error = "send failed";
        return -1;
    }
    // reply head doubles as the shared error-frame marker (0xFFFFFFFF):
    // read_reply_count decodes either, so a server-side failure lands in
    // last_error with the stream still consistent
    uint32_t len = 0;
    if (!read_reply_count(ctx, &len)) return -1;
    if (len > (1u << 20)) {
        ctx->last_error = "bad vocab reply";
        kill_conn(ctx);
        return -1;
    }
    std::string tok(len, '\0');
    if (len && !read_exactly(ctx->fd, &tok[0], len)) {
        ctx->last_error = "recv failed";
        kill_conn(ctx);
        return -1;
    }
    int32_t n = static_cast<int32_t>(len) < cap - 1
                    ? static_cast<int32_t>(len) : cap - 1;
    memcpy(buf, tok.data(), n);
    buf[n] = '\0';
    return static_cast<int32_t>(len);
}

// bert_model_quantize parity (bert.h:92, reference CLI models/quantize.cpp):
// requantizes in_path -> out_path.  ftype codes match the reference's
// numeric convention (2=q4_0, 3=q4_1) plus our extensions (7=q8_0, and the
// names understood by cli.quantize via the same codes).  Runs the quantize
// CLI in a child process — consistent with this capi's client-plane design,
// where tpe_load_from_file also spawns the Python engine.  Returns 0 on
// success, -1 on failure.
int tpe_model_quantize(const char* in_path, const char* out_path, int ftype) {
    if (!in_path || !out_path) return -1;
    pid_t pid = ::fork();
    if (pid < 0) return -1;
    if (pid == 0) {
        const char* py = getenv("TPE_PYTHON");
        if (!py || !*py) py = "python3";
        std::string code = std::to_string(ftype);
        ::execlp(py, py, "-m", "embedding_cpp_tpu.cli.quantize", in_path,
                 out_path, code.c_str(), "-q", (char*)nullptr);
        _exit(127);  // exec failed
    }
    int status = 0;
    pid_t r;
    do {
        r = ::waitpid(pid, &status, 0);
    } while (r == -1 && errno == EINTR);  // retry: a signal must not turn a
                                          // successful quantize into -1 + zombie
    if (r != pid) return -1;
    return (WIFEXITED(status) && WEXITSTATUS(status) == 0) ? 0 : -1;
}

}  // extern "C"
