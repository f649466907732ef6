#include <cstdint>
#include <cstdio>
#include <cmath>
#include <vector>
#include <random>
extern "C" int dtpu_fmt_rows(const float*, const int64_t*, int64_t, int,
                             int64_t, int, char*, int64_t*);
int main() {
    std::mt19937 g(2);
    std::uniform_real_distribution<float> u(-1e38f, 1e38f);
    for (int trial = 0; trial < 200; ++trial) {
        int nrows = trial % 7;            // includes 0 rows
        std::vector<int64_t> off(nrows + 1, 0);
        for (int r = 0; r < nrows; ++r)
            off[r + 1] = off[r] + (g() % 50);   // includes empty rows
        int64_t total = off[nrows];
        std::vector<float> vals(total ? total : 1);
        for (auto& v : vals) {
            switch (g() % 6) {
                case 0: v = u(g); break;
                case 1: v = NAN; break;
                case 2: v = INFINITY; break;
                case 3: v = -INFINITY; break;
                case 4: v = 3.4e38f; break;
                default: v = 1e-45f;
            }
        }
        for (int fmt = 0; fmt < 3; ++fmt) {
            int64_t slot = fmt == 2 ? 56 : 18;
            std::vector<char> out((total ? total : 1) * slot);
            std::vector<int64_t> seg(nrows ? nrows : 1);
            int rc = dtpu_fmt_rows(vals.data(), off.data(), nrows, fmt, slot,
                                   3, out.data(), seg.data());
            if (rc != 0) { printf("rc=%d trial=%d fmt=%d\n", rc, trial, fmt); return 1; }
            for (int r = 0; r < nrows; ++r) {
                int64_t cnt = off[r + 1] - off[r];
                if (seg[r] < cnt || seg[r] > cnt * slot) { printf("bad seg\n"); return 1; }
            }
        }
    }
    // bad-arg paths
    int64_t off0[2] = {0, 1}; float v = 1; char o[64]; int64_t s;
    if (dtpu_fmt_rows(nullptr, off0, 1, 0, 18, 1, o, &s) != -1) return 1;
    if (dtpu_fmt_rows(&v, off0, 1, 0, 4, 1, o, &s) != -1) return 1;
    if (dtpu_fmt_rows(&v, off0, 1, 2, 18, 1, o, &s) != -1) return 1;
    printf("ASAN emit harness: OK\n");
    return 0;
}
