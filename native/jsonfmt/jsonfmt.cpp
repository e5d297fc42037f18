// Fast JSON serialization of embedding matrices for the HTTP float mode.
//
// The OpenAI-default `encoding_format: "float"` reply embeds every f32 as a
// JSON number.  CPython renders each via PyFloat repr (shortest-roundtrip
// dtoa on a boxed double) — measured ~5x slower end-to-end than the base64
// mode on the 1-core serving host (benchmarks/results/serving_v5e.json:
// 1,880 vs 9,686 sentences/s).  The reference never hits this problem only
// because it has no JSON surface at all (raw f32 wire, examples/server.cpp).
//
// Here the whole `data` array is rendered in one C++ call with
// std::to_chars (shortest round-trip, locale-free).  Values parse back to
// bit-identical f32; the Python layer splices the rendered bytes into the
// response envelope.
#include <charconv>
#include <cstdint>
#include <cstdio>
#include <cmath>
#include <cstring>

namespace {

// Worst-case bytes per rendered float: shortest-roundtrip f32 is at most
// "-1.17549435e-38" = 15 chars, plus separator, plus one byte of slack.
constexpr int64_t kPerFloat = 17;
// Per-row envelope, counted exactly then padded: 1 (row comma)
// + 30 ('{"object":"embedding","index":') + 20 (int64 digits incl. sign)
// + 14 (',"embedding":[') + 2 (']}') = 67; budget 80.
constexpr int64_t kPerRow = 80;

char* append(char* p, const char* s) {
    size_t n = strlen(s);
    memcpy(p, s, n);
    return p + n;
}

char* append_float(char* p, float v, char* end) {
    // JSON has no Inf/NaN tokens; embeddings are finite by construction but
    // a defensive null keeps the output parseable either way (std::isfinite,
    // not a magnitude threshold: FLT_MAX is finite and must render)
    if (!std::isfinite(v)) return append(p, "null");
    auto res = std::to_chars(p, end, v);
    return res.ptr;
}

}  // namespace

extern "C" {

// Render `[{"object":"embedding","index":0,"embedding":[...]}, ...]` for an
// [n_rows, n_cols] row-major f32 matrix into out[cap].  `index_base` offsets
// the per-row index field.  Returns bytes written, or -1 if cap is too
// small (caller sizes cap via tpuembed_json_data_cap).
int64_t tpuembed_json_embedding_data(const float* v, int64_t n_rows,
                                     int64_t n_cols, int64_t index_base,
                                     char* out, int64_t cap) {
    if (!v || !out || n_rows < 0 || n_cols <= 0) return -1;
    const int64_t need = 2 + n_rows * (kPerRow + kPerFloat * n_cols);
    if (cap < need) return -1;
    char* p = out;
    char* end = out + cap;
    *p++ = '[';
    for (int64_t r = 0; r < n_rows; ++r) {
        if (r) *p++ = ',';
        p = append(p, "{\"object\":\"embedding\",\"index\":");
        p += snprintf(p, 24, "%lld",
                      static_cast<long long>(index_base + r));
        p = append(p, ",\"embedding\":[");
        const float* row = v + r * n_cols;
        for (int64_t c = 0; c < n_cols; ++c) {
            if (c) *p++ = ',';
            p = append_float(p, row[c], end);
        }
        p = append(p, "]}");
    }
    *p++ = ']';
    return p - out;
}

// Conservative output-buffer size for tpuembed_json_embedding_data.
// MUST over-estimate: the renderer's only bound check is this same formula
// up front (a too-small constant here was a reproduced heap overflow with
// 20-digit index values + worst-case float widths).
int64_t tpuembed_json_data_cap(int64_t n_rows, int64_t n_cols) {
    return 2 + n_rows * (kPerRow + kPerFloat * n_cols);
}

}  // extern "C"
