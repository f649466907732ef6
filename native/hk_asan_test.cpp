// Memory-safety harness for the HeavyKeeper (native/hk.cpp): randomized
// geometry/stream trials plus bad-argument cases, run under ASan/UBSan
// via `make -C native asan-test`.
#include <cstdint>
#include <cstdio>
#include <random>
#include <vector>

extern "C" {
void *dtpu_hk_create(int nrows, int size_log2, uint64_t seed,
                     double decay_base);
void dtpu_hk_destroy(void *p);
void dtpu_hk_add(void *p, const uint64_t *keys, int64_t n);
void dtpu_hk_query(void *p, const uint64_t *keys, int64_t n, uint32_t *out);
}

int main() {
    // bad-argument cases must return nullptr, never allocate garbage
    if (dtpu_hk_create(0, 16, 1, 1.08)) { printf("bad nrows accepted\n"); return 1; }
    if (dtpu_hk_create(4, 0, 1, 1.08)) { printf("bad size accepted\n"); return 1; }
    if (dtpu_hk_create(4, 31, 1, 1.08)) { printf("huge size accepted\n"); return 1; }
    if (dtpu_hk_create(4, 16, 1, 1.0)) { printf("bad base accepted\n"); return 1; }
    dtpu_hk_destroy(nullptr);  // must be a safe no-op

    std::mt19937_64 g(7);
    for (int trial = 0; trial < 50; ++trial) {
        int nrows = 1 + (int)(g() % 6);
        int size_log2 = 1 + (int)(g() % 14);  // includes tiny 2-slot tables
        void *hk = dtpu_hk_create(nrows, size_log2, g(), 1.08);
        if (!hk) { printf("create failed trial=%d\n", trial); return 1; }
        dtpu_hk_add(hk, nullptr, 0);   // empty batch
        int64_t n = (int64_t)(g() % 5000);
        std::vector<uint64_t> keys(n ? n : 1);
        for (auto &k : keys) k = g() % 97;  // heavy collisions by design
        dtpu_hk_add(hk, keys.data(), n);
        std::vector<uint32_t> out(n ? n : 1, 0xDEADBEEF);
        dtpu_hk_query(hk, keys.data(), n, out.data());
        for (int64_t i = 0; i < n; ++i) {
            if (out[i] == 0xDEADBEEF) { printf("query skipped %lld\n",
                                               (long long)i); return 1; }
        }
        dtpu_hk_destroy(hk);
    }
    printf("hk asan: OK\n");
    return 0;
}
