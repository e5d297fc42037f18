// Q4_0 / Q4_1 / Q8_0 / F16 codecs + multithreaded tensor requantization.
//
// Native counterpart of the reference's quantizer core
// (bert_model_quantize's dequant/quant hot loops, bert.cpp:1236-1311 and
// 1487-1534, which use ggml's codecs and a mutex-protected chunk pool).
// The block math matches embedding_cpp_tpu/gguf/quant.py bit-for-bit
// (enforced by tests); -ffp-contract=off keeps x87/FMA from diverging.
//
// C ABI at the bottom, bound via ctypes (embedding_cpp_tpu/gguf/native_codec.py).

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int QK = 32;

// ---- f16 <-> f32 (software, round-to-nearest-even) ------------------------

float f16_to_f32(uint16_t h) {
    uint32_t sign = (uint32_t)(h & 0x8000) << 16;
    uint32_t exp = (h >> 10) & 0x1F;
    uint32_t mant = h & 0x3FF;
    uint32_t bits;
    if (exp == 0) {
        if (mant == 0) {
            bits = sign;
        } else {  // subnormal
            int shift = 0;
            while (!(mant & 0x400)) { mant <<= 1; ++shift; }
            mant &= 0x3FF;
            bits = sign | ((127 - 15 - shift + 1) << 23) | (mant << 13);
        }
    } else if (exp == 31) {
        bits = sign | 0x7F800000 | (mant << 13);
    } else {
        bits = sign | ((exp - 15 + 127) << 23) | (mant << 13);
    }
    float out;
    std::memcpy(&out, &bits, 4);
    return out;
}

uint16_t f32_to_f16(float f) {
    uint32_t bits;
    std::memcpy(&bits, &f, 4);
    uint32_t sign = (bits >> 16) & 0x8000;
    int32_t exp = (int32_t)((bits >> 23) & 0xFF) - 127 + 15;
    uint32_t mant = bits & 0x7FFFFF;
    if (((bits >> 23) & 0xFF) == 0xFF)  // inf/nan
        return (uint16_t)(sign | 0x7C00 | (mant ? 0x200 : 0));
    if (exp >= 31) return (uint16_t)(sign | 0x7C00);  // overflow -> inf
    if (exp <= 0) {  // subnormal or zero
        if (exp < -10) return (uint16_t)sign;
        mant |= 0x800000;
        int shift = 14 - exp;
        uint32_t half = mant >> shift;
        uint32_t rem = mant & ((1u << shift) - 1);
        uint32_t halfway = 1u << (shift - 1);
        if (rem > halfway || (rem == halfway && (half & 1))) ++half;
        return (uint16_t)(sign | half);
    }
    uint32_t half = (uint32_t)(exp << 10) | (mant >> 13);
    uint32_t rem = mant & 0x1FFF;
    if (rem > 0x1000 || (rem == 0x1000 && (half & 1))) ++half;
    return (uint16_t)(sign | half);
}

// ---- block codecs ----------------------------------------------------------

void quantize_block_q4_0(const float *x, uint8_t *rec) {
    float amax = 0.0f, maxv = 0.0f;
    for (int j = 0; j < QK; ++j) {
        float a = std::fabs(x[j]);
        if (a > amax) { amax = a; maxv = x[j]; }
    }
    float d = maxv / -8.0f;
    float id = d != 0.0f ? 1.0f / d : 0.0f;
    uint16_t dh = f32_to_f16(d);
    std::memcpy(rec, &dh, 2);
    for (int j = 0; j < QK / 2; ++j) {
        float v0 = x[j] * id + 8.5f;
        float v1 = x[j + QK / 2] * id + 8.5f;
        uint8_t q0 = (uint8_t)std::fmin(std::floor(v0), 15.0f);
        uint8_t q1 = (uint8_t)std::fmin(std::floor(v1), 15.0f);
        rec[2 + j] = (uint8_t)(q0 | (q1 << 4));
    }
}

void quantize_block_q4_1(const float *x, uint8_t *rec) {
    float mn = x[0], mx = x[0];
    for (int j = 1; j < QK; ++j) {
        mn = std::fmin(mn, x[j]);
        mx = std::fmax(mx, x[j]);
    }
    float d = (mx - mn) / 15.0f;
    float id = d != 0.0f ? 1.0f / d : 0.0f;
    uint16_t dh = f32_to_f16(d), mh = f32_to_f16(mn);
    std::memcpy(rec, &dh, 2);
    std::memcpy(rec + 2, &mh, 2);
    for (int j = 0; j < QK / 2; ++j) {
        float v0 = (x[j] - mn) * id + 0.5f;
        float v1 = (x[j + QK / 2] - mn) * id + 0.5f;
        uint8_t q0 = (uint8_t)std::fmin(std::floor(v0), 15.0f);
        uint8_t q1 = (uint8_t)std::fmin(std::floor(v1), 15.0f);
        rec[4 + j] = (uint8_t)(q0 | (q1 << 4));
    }
}

void quantize_block_q8_0(const float *x, uint8_t *rec) {
    float amax = 0.0f;
    for (int j = 0; j < QK; ++j) amax = std::fmax(amax, std::fabs(x[j]));
    float d = amax / 127.0f;
    float id = d != 0.0f ? 1.0f / d : 0.0f;
    uint16_t dh = f32_to_f16(d);
    std::memcpy(rec, &dh, 2);
    for (int j = 0; j < QK; ++j) {
        // round half away from zero, spelled as trunc(v + copysign(.5, v))
        // so it is bit-exact with gguf/quant.py quantize_q8_0 (roundf would
        // differ on pathological float32 ties)
        float v = x[j] * id;
        int8_t q = (int8_t)std::truncf(v + std::copysignf(0.5f, v));
        std::memcpy(rec + 2 + j, &q, 1);
    }
}

void dequantize_block_q4_0(const uint8_t *rec, float *out) {
    uint16_t dh;
    std::memcpy(&dh, rec, 2);
    float d = f16_to_f32(dh);
    for (int j = 0; j < QK / 2; ++j) {
        out[j] = (float)(rec[2 + j] & 0x0F) * d - 8.0f * d;
        out[j + QK / 2] = (float)(rec[2 + j] >> 4) * d - 8.0f * d;
    }
}

void dequantize_block_q4_1(const uint8_t *rec, float *out) {
    uint16_t dh, mh;
    std::memcpy(&dh, rec, 2);
    std::memcpy(&mh, rec + 2, 2);
    float d = f16_to_f32(dh), m = f16_to_f32(mh);
    for (int j = 0; j < QK / 2; ++j) {
        out[j] = (float)(rec[4 + j] & 0x0F) * d + m;
        out[j + QK / 2] = (float)(rec[4 + j] >> 4) * d + m;
    }
}

void dequantize_block_q8_0(const uint8_t *rec, float *out) {
    uint16_t dh;
    std::memcpy(&dh, rec, 2);
    float d = f16_to_f32(dh);
    for (int j = 0; j < QK; ++j) {
        int8_t q;
        std::memcpy(&q, rec + 2 + j, 1);
        out[j] = (float)q * d;
    }
}

// type codes: 0=f32, 1=f16, 2=q4_0, 3=q4_1, 8=q8_0 (GGML enum values)
int64_t type_rec_bytes(int t) {
    switch (t) {
    case 0: return 4 * QK;  // per QK elements
    case 1: return 2 * QK;
    case 2: return 18;
    case 3: return 20;
    case 8: return 34;
    }
    return -1;
}

bool dequant_span(const uint8_t *src, int t, int64_t nblocks, float *out) {
    switch (t) {
    case 0:
        std::memcpy(out, src, (size_t)nblocks * QK * 4);
        return true;
    case 1:
        for (int64_t i = 0; i < nblocks * QK; ++i) {
            uint16_t h;
            std::memcpy(&h, src + 2 * i, 2);
            out[i] = f16_to_f32(h);
        }
        return true;
    case 2:
        for (int64_t i = 0; i < nblocks; ++i)
            dequantize_block_q4_0(src + 18 * i, out + QK * i);
        return true;
    case 3:
        for (int64_t i = 0; i < nblocks; ++i)
            dequantize_block_q4_1(src + 20 * i, out + QK * i);
        return true;
    case 8:
        for (int64_t i = 0; i < nblocks; ++i)
            dequantize_block_q8_0(src + 34 * i, out + QK * i);
        return true;
    }
    return false;
}

bool quant_span(const float *src, int t, int64_t nblocks, uint8_t *out) {
    switch (t) {
    case 0:
        std::memcpy(out, src, (size_t)nblocks * QK * 4);
        return true;
    case 1:
        for (int64_t i = 0; i < nblocks * QK; ++i) {
            uint16_t h = f32_to_f16(src[i]);
            std::memcpy(out + 2 * i, &h, 2);
        }
        return true;
    case 2:
        for (int64_t i = 0; i < nblocks; ++i)
            quantize_block_q4_0(src + QK * i, out + 18 * i);
        return true;
    case 3:
        for (int64_t i = 0; i < nblocks; ++i)
            quantize_block_q4_1(src + QK * i, out + 20 * i);
        return true;
    case 8:
        for (int64_t i = 0; i < nblocks; ++i)
            quantize_block_q8_0(src + QK * i, out + 34 * i);
        return true;
    }
    return false;
}

}  // namespace

extern "C" {

// f32 -> encoded. n % 32 == 0 for q4 types. Returns bytes written, or -1.
int64_t tpuembed_quantize(const float *src, int64_t n, int dst_type,
                          uint8_t *out) {
    if (n % QK) return -1;
    if (!quant_span(src, dst_type, n / QK, out)) return -1;
    return n / QK * type_rec_bytes(dst_type) / 1;
}

// encoded -> f32. Returns n, or -1.
int64_t tpuembed_dequantize(const uint8_t *src, int src_type, int64_t n,
                            float *out) {
    if (n % QK) return -1;
    if (!dequant_span(src, src_type, n / QK, out)) return -1;
    return n;
}

// Requantize a tensor src_type -> dst_type with a thread pool over block
// chunks (the reference's mutex work-queue, bert.cpp:1487-1534, as an
// atomic chunk counter). Returns bytes written, or -1.
int64_t tpuembed_requantize(const uint8_t *src, int src_type, int64_t n,
                            int dst_type, uint8_t *out, int n_threads) {
    if (n % QK) return -1;
    int64_t nblocks = n / QK;
    int64_t src_rb = type_rec_bytes(src_type) ;
    int64_t dst_rb = type_rec_bytes(dst_type);
    if (src_rb < 0 || dst_rb < 0) return -1;
    // type_rec_bytes is already the per-QK-elements record size
    int64_t src_step = src_rb;
    int64_t dst_step = dst_rb;

    constexpr int64_t CHUNK = 512;  // blocks per work item
    std::atomic<int64_t> next(0);
    std::atomic<bool> ok(true);

    auto worker = [&]() {
        std::vector<float> buf(CHUNK * QK);
        while (ok.load()) {
            int64_t b0 = next.fetch_add(CHUNK);
            if (b0 >= nblocks) break;
            int64_t cnt = std::min(CHUNK, nblocks - b0);
            if (!dequant_span(src + b0 * src_step, src_type, cnt, buf.data()) ||
                !quant_span(buf.data(), dst_type, cnt, out + b0 * dst_step)) {
                ok.store(false);
            }
        }
    };
    if (n_threads <= 1) {
        worker();
    } else {
        std::vector<std::thread> pool;
        for (int t = 0; t < n_threads; ++t) pool.emplace_back(worker);
        for (auto &th : pool) th.join();
    }
    return ok.load() ? nblocks * dst_step : -1;
}

}  // extern "C"
