// dlopen demo for the native C ABI — the reference's examples/dylib.cpp,
// re-targeted at libtpuembed_capi.so (tpuembed.h instead of bert.h).
//
// Build:  g++ -O2 -o dylib_demo examples/dylib.cpp -ldl
// Run:    ./dylib_demo <model.gguf>          (spawns the engine server)
//         ./dylib_demo --connect HOST PORT   (attaches to a running one)
#include <dlfcn.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include <vector>

typedef void* (*tpe_load_fn)(const char*);
typedef void* (*tpe_connect_fn)(const char*, int);
typedef void (*tpe_free_fn)(void*);
typedef int32_t (*tpe_n_embd_fn)(void*);
typedef int (*tpe_encode_batch_fn)(void*, int32_t, const char**, float*);
typedef const char* (*tpe_last_error_fn)(void*);
typedef int32_t (*tpe_index_fn)(void*, int32_t, const char**);
typedef int32_t (*tpe_search_fn)(void*, int32_t, const char**, int32_t,
                                 int32_t*, float*);

int main(int argc, char** argv) {
    if (argc < 2) {
        fprintf(stderr, "usage: %s <model.gguf> | --connect HOST PORT\n",
                argv[0]);
        return 1;
    }

    void* lib = dlopen("native/build/libtpuembed_capi.so", RTLD_NOW);
    if (!lib) {
        fprintf(stderr, "dlopen failed: %s\n", dlerror());
        return 1;
    }
    auto load = (tpe_load_fn)dlsym(lib, "tpe_load_from_file");
    auto connect = (tpe_connect_fn)dlsym(lib, "tpe_connect");
    auto free_ctx = (tpe_free_fn)dlsym(lib, "tpe_free");
    auto n_embd_fn = (tpe_n_embd_fn)dlsym(lib, "tpe_n_embd");
    auto encode_batch = (tpe_encode_batch_fn)dlsym(lib, "tpe_encode_batch");
    auto last_error = (tpe_last_error_fn)dlsym(lib, "tpe_last_error");
    if (!load || !connect || !free_ctx || !n_embd_fn || !encode_batch) {
        fprintf(stderr, "dlsym failed: %s\n", dlerror());
        return 1;
    }

    void* ctx = nullptr;
    if (strcmp(argv[1], "--connect") == 0 && argc >= 4) {
        ctx = connect(argv[2], atoi(argv[3]));
    } else {
        ctx = load(argv[1]);
    }
    if (!ctx) {
        fprintf(stderr, "load/connect failed\n");
        return 1;
    }

    int32_t n_embd = n_embd_fn(ctx);
    printf("n_embd = %d\n", n_embd);

    const char* texts[] = {
        "Hello from the C ABI",
        "Embeddings over a TPU engine",
    };
    std::vector<float> out(2 * (size_t)n_embd);
    if (encode_batch(ctx, 2, texts, out.data()) != 0) {
        fprintf(stderr, "encode failed: %s\n", last_error(ctx));
        free_ctx(ctx);
        return 1;
    }
    for (int i = 0; i < 2; ++i) {
        printf("[%d] %-32s ->", i, texts[i]);
        for (int j = 0; j < 6 && j < n_embd; ++j)
            printf(" %+.4f", out[(size_t)i * n_embd + j]);
        printf(" ...\n");
    }

    // on-device vector search: index a tiny corpus, query top-2 —
    // only ids + scores come back over the socket
    auto index_fn = (tpe_index_fn)dlsym(lib, "tpe_index");
    auto search_fn = (tpe_search_fn)dlsym(lib, "tpe_search");
    if (index_fn && search_fn) {
        const char* corpus[] = {
            "The quick brown fox jumps over the lazy dog",
            "Quantum entanglement cannot transmit information",
            "A fast auburn fox leaps above the sleepy hound",
        };
        if (index_fn(ctx, 3, corpus) >= 3) {
            const char* query = "a speedy fox";
            int32_t idx[2];
            float scores[2];
            int32_t k = search_fn(ctx, 1, &query, 2, idx, scores);
            if (k > 0) {
                printf("search %-24s ->", query);
                for (int j = 0; j < k; ++j)
                    printf(" #%d(%.3f)", idx[j], scores[j]);
                printf("\n");
            }
        }
    }
    free_ctx(ctx);
    dlclose(lib);
    return 0;
}
