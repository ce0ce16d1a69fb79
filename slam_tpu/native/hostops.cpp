// Native host-side inner loops.
//
// The reference implements every per-descriptor host operation in C++
// (openvslam/match_base.h popcount distance, map_point.cpp medoid
// descriptor, feature_search.cpp radius search, random_array.cc seeded
// RANSAC index sampling). The TPU framework keeps its dense bulk work on
// the device; these are the residual host-side hot loops, exposed through a
// plain C ABI for ctypes (no pybind11 dependency).
//
// Build: g++ -O3 -march=native -shared -fPIC hostops.cpp -o libhostops.so

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <random>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Hamming distances over 256-bit descriptors stored as uint32[8]
// (reference: openvslam/match_base.h:18-39)
// ---------------------------------------------------------------------------

static inline int desc_distance(const uint32_t* a, const uint32_t* b) {
    int d = 0;
    for (int i = 0; i < 8; ++i) d += __builtin_popcount(a[i] ^ b[i]);
    return d;
}

// out[n*m] = hamming(a[i], b[j])
void hamming_matrix(const uint32_t* a, int64_t n, const uint32_t* b, int64_t m,
                    int32_t* out) {
    for (int64_t i = 0; i < n; ++i) {
        const uint32_t* ai = a + 8 * i;
        int32_t* row = out + m * i;
        for (int64_t j = 0; j < m; ++j) {
            row[j] = desc_distance(ai, b + 8 * j);
        }
    }
}

// out[m] = hamming(a, b[j]) for a single query descriptor
void hamming_row(const uint32_t* a, const uint32_t* b, int64_t m, int32_t* out) {
    for (int64_t j = 0; j < m; ++j) out[j] = desc_distance(a, b + 8 * j);
}

// ---------------------------------------------------------------------------
// Medoid descriptor: index with the smallest median distance to the others
// (reference: map_point.cpp:75-116). Ties keep the first index (strict <).
// ---------------------------------------------------------------------------

int64_t medoid_descriptor(const uint32_t* descs, int64_t n) {
    if (n <= 0) return -1;
    if (n == 1) return 0;
    std::vector<int32_t> dist(n * n, 0);
    for (int64_t i = 0; i < n; ++i) {
        for (int64_t j = i + 1; j < n; ++j) {
            int d = desc_distance(descs + 8 * i, descs + 8 * j);
            dist[i * n + j] = d;
            dist[j * n + i] = d;
        }
    }
    int64_t best_idx = 0;
    int32_t best_median = INT32_MAX;
    std::vector<int32_t> row(n);
    const int64_t mid = (int64_t)(0.5 * (n - 1));
    for (int64_t i = 0; i < n; ++i) {
        std::memcpy(row.data(), dist.data() + i * n, n * sizeof(int32_t));
        std::nth_element(row.begin(), row.begin() + mid, row.end());
        const int32_t median = row[mid];
        if (median < best_median) {
            best_median = median;
            best_idx = i;
        }
    }
    return best_idx;
}

// ---------------------------------------------------------------------------
// Radius search over y-sorted keypoints (reference: feature_search.cpp:33-48)
// xs/ys are sorted by ys ascending; returns number of hits written to out.
// ---------------------------------------------------------------------------

int64_t radius_search(const float* xs, const float* ys, int64_t n,
                      float qx, float qy, float r, int64_t* out) {
    const float* lo = std::lower_bound(ys, ys + n, qy - r);
    int64_t count = 0;
    const float r2 = r * r;
    for (int64_t i = lo - ys; i < n && ys[i] <= qy + r; ++i) {
        const float dx = qx - xs[i];
        const float dy = qy - ys[i];
        if (dx * dx + dy * dy < r2) out[count++] = i;
    }
    return count;
}

// ---------------------------------------------------------------------------
// Deterministic unique random index arrays (reference: random_array.cc:21-62)
// Thread-local MT19937 with the reference's fixed seed.
// ---------------------------------------------------------------------------

static thread_local std::mt19937 g_rng(94235682);

void seed_random(uint32_t seed) { g_rng.seed(seed); }

// n unique random ints in [lo, hi], shuffled (reference semantics)
void create_random_array(int64_t n, int32_t lo, int32_t hi, int32_t* out) {
    std::uniform_int_distribution<int32_t> dist(lo, hi);
    std::vector<int32_t> vals;
    vals.reserve(n);
    while ((int64_t)vals.size() < n) {
        int32_t v = dist(g_rng);
        bool dup = false;
        for (int32_t u : vals) {
            if (u == v) { dup = true; break; }
        }
        if (!dup) vals.push_back(v);
    }
    std::memcpy(out, vals.data(), n * sizeof(int32_t));
}

}  // extern "C"
