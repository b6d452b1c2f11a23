// Native host-side graph kernels for dgll_tpu.
//
// Role parity with the reference's native layer (the CUDA fused kernel +
// pybind11 bridge, /root/reference/dgll/FusedKernel/): here the *device* hot path
// is Pallas (ops/pallas/), and this library covers the *host* hot loops that feed
// the TPU — CSR construction, fanout neighbour sampling (the minibatch producer),
// and random-walk generation — multithreaded C++ exported with a C ABI and loaded
// via ctypes (no pybind11 in this environment).
//
// Build: g++ -O3 -march=native -shared -fPIC -pthread -o libdgll_host.so graph_kernels.cpp

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <atomic>
#include <thread>
#include <vector>

namespace {

// splitmix64 seeded xorshift128+ per worker: fast, reproducible, no libc rand locks
struct Rng {
    uint64_t s0, s1;
    explicit Rng(uint64_t seed) {
        auto sm = [](uint64_t& x) {
            x += 0x9e3779b97f4a7c15ULL;
            uint64_t z = x;
            z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
            z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
            return z ^ (z >> 31);
        };
        uint64_t st = seed;
        s0 = sm(st);
        s1 = sm(st);
        if (!(s0 | s1)) s1 = 1;
    }
    inline uint64_t next() {
        uint64_t a = s0, b = s1;
        s0 = b;
        a ^= a << 23;
        s1 = a ^ b ^ (a >> 18) ^ (b >> 5);
        return s1 + b;
    }
    // unbiased-enough bounded draw (mul-shift)
    inline uint64_t bounded(uint64_t n) {
        return (uint64_t)(((__uint128_t)next() * n) >> 64);
    }
    inline double uniform() { return (next() >> 11) * (1.0 / 9007199254740992.0); }
};

inline int n_workers(int64_t work, int64_t grain) {
    unsigned hw = std::thread::hardware_concurrency();
    if (hw == 0) hw = 4;
    int64_t want = work / grain + 1;
    return (int)std::min<int64_t>(hw, std::max<int64_t>(1, want));
}

template <class F>
void parallel_for(int64_t n, int64_t grain, F&& fn) {
    int nw = n_workers(n, grain);
    if (nw <= 1) {
        fn(0, n, 0);
        return;
    }
    std::vector<std::thread> ts;
    int64_t chunk = (n + nw - 1) / nw;
    for (int w = 0; w < nw; ++w) {
        int64_t lo = w * chunk, hi = std::min<int64_t>(n, lo + chunk);
        if (lo >= hi) break;
        ts.emplace_back([=, &fn] { fn(lo, hi, w); });
    }
    for (auto& t : ts) t.join();
}

}  // namespace

extern "C" {

// Counting-sort CSR build. dst[e] in [0, n). Fills indptr[n+1] and order[e]
// (stable permutation that sorts edges by dst — apply to src/weights in python).
void dgll_build_csr(const int64_t* dst, int64_t e, int64_t n, int64_t* indptr,
                    int64_t* order) {
    std::memset(indptr, 0, sizeof(int64_t) * (n + 1));
    for (int64_t i = 0; i < e; ++i) indptr[dst[i] + 1]++;
    for (int64_t v = 0; v < n; ++v) indptr[v + 1] += indptr[v];
    std::vector<int64_t> cur(indptr, indptr + n);
    for (int64_t i = 0; i < e; ++i) order[cur[dst[i]]++] = i;
}

// Uniform with-replacement fanout sampling over an in-edge CSR.
// nodes[b] (global ids), mask[b]; writes out[b*k] sampled neighbour ids and
// outmask[b*k]. Zero-degree / masked rows emit the node's own id with mask 0.
void dgll_sample_neighbors(const int64_t* indptr, const int64_t* nbrs,
                           const int64_t* nodes, const uint8_t* mask, int64_t b,
                           int64_t k, uint64_t seed, int64_t* out,
                           uint8_t* outmask) {
    parallel_for(b, 4096, [&](int64_t lo, int64_t hi, int w) {
        Rng rng(seed * 0x100000001b3ULL + (uint64_t)w * 0x9e3779b9ULL + lo);
        for (int64_t i = lo; i < hi; ++i) {
            int64_t v = nodes[i];
            int64_t d0 = indptr[v], d1 = indptr[v + 1];
            int64_t deg = d1 - d0;
            bool ok = mask[i] && deg > 0;
            for (int64_t j = 0; j < k; ++j) {
                int64_t slot = i * k + j;
                if (ok) {
                    out[slot] = nbrs[d0 + (int64_t)rng.bounded((uint64_t)deg)];
                    outmask[slot] = 1;
                } else {
                    out[slot] = v;
                    outmask[slot] = 0;
                }
            }
        }
    });
}

// Uniform random walks over an out-edge CSR: walks[nw, L], starts[nw].
// Zero-degree nodes self-loop (fixed-length walks for static shapes downstream).
void dgll_random_walks(const int64_t* indptr, const int64_t* nbrs,
                       const int64_t* starts, int64_t nw, int64_t L, uint64_t seed,
                       int64_t* walks) {
    parallel_for(nw, 1024, [&](int64_t lo, int64_t hi, int w) {
        Rng rng(seed * 0x100000001b3ULL + (uint64_t)w * 0x9e3779b9ULL + lo);
        for (int64_t i = lo; i < hi; ++i) {
            int64_t cur = starts[i];
            walks[i * L] = cur;
            for (int64_t t = 1; t < L; ++t) {
                int64_t d0 = indptr[cur], deg = indptr[cur + 1] - d0;
                if (deg > 0) cur = nbrs[d0 + (int64_t)rng.bounded((uint64_t)deg)];
                walks[i * L + t] = cur;
            }
        }
    });
}

// node2vec p/q-biased 2nd-order walks via rejection sampling over a *sorted*
// out-edge CSR (sorted rows give O(log d) membership tests).
void dgll_node2vec_walks(const int64_t* indptr, const int64_t* nbrs_sorted,
                         const int64_t* starts, int64_t nw, int64_t L, double p,
                         double q, uint64_t seed, int64_t* walks) {
    const double inv_p = 1.0 / p, inv_q = 1.0 / q;
    const double wmax = std::max(1.0, std::max(inv_p, inv_q));
    parallel_for(nw, 512, [&](int64_t lo, int64_t hi, int w) {
        Rng rng(seed * 0x100000001b3ULL + (uint64_t)w * 0x9e3779b9ULL + lo);
        auto has_edge = [&](int64_t u, int64_t v) {
            const int64_t* b = nbrs_sorted + indptr[u];
            const int64_t* e = nbrs_sorted + indptr[u + 1];
            const int64_t* it = std::lower_bound(b, e, v);
            return it != e && *it == v;
        };
        for (int64_t i = lo; i < hi; ++i) {
            int64_t cur = starts[i], prev = cur;
            walks[i * L] = cur;
            for (int64_t t = 1; t < L; ++t) {
                int64_t d0 = indptr[cur], deg = indptr[cur + 1] - d0;
                if (deg == 0) {
                    walks[i * L + t] = cur;
                    prev = cur;
                    continue;
                }
                int64_t cand = cur;
                for (int r = 0; r < 16; ++r) {
                    cand = nbrs_sorted[d0 + (int64_t)rng.bounded((uint64_t)deg)];
                    double wgt = (cand == prev) ? inv_p
                                 : (has_edge(prev, cand) ? 1.0 : inv_q);
                    if (rng.uniform() < wgt / wmax) break;
                }
                prev = cur;
                cur = cand;
                walks[i * L + t] = cur;
            }
        }
    });
}

int dgll_abi_version() { return 1; }

}  // extern "C"
