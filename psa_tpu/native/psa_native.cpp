// Native host search engine (C++17 + OpenMP).
//
// Table-driven equivalent of the reference CPU engine (cpu_funcs.c:222-300):
// all pair logic comes from the precomputed tables built in Python
// (core/tables.py), the scan order and float semantics match the reference's
// sequential f64 accumulation, and the thread merge preserves the canonical
// tie-break (best score -> lowest offset -> lowest char position) by merging
// contiguous offset blocks in ascending order.
//
// Roles in the framework:
//  * bit-exact oracle for differential tests at native speed,
//  * CPU fallback backend ("--backend native"),
//  * fast candidate re-scorer for ops/select.py.
//
// Build: g++ -O3 -march=native -fopenmp -shared -fPIC psa_native.cpp -o _libpsa.so

#include <cmath>
#include <cstdint>
#include <limits>

#if defined(_OPENMP)
#include <omp.h>
#endif

namespace {

constexpr int kNCodes = 29;

struct Best {
    double total;
    int32_t offset;
    int32_t char_offset;
    int32_t sub_code;
    bool found;
};

// Scan one offset exactly like find_best_mutant_offset (cpu_funcs.c:257-300):
// sequential f64 sum of pair weights; keep the first strictly-better diff.
inline void scan_offset(const int32_t* c1, const int32_t* c2, int n2,
                        const double* pair_w, const double* diff,
                        const int8_t* sub, bool is_max, int32_t offset,
                        double* out_total, int32_t* out_i, int32_t* out_sub) {
    double total = 0.0;
    double best_diff = is_max ? -std::numeric_limits<double>::infinity()
                              : std::numeric_limits<double>::infinity();
    int32_t best_i = -1;
    int32_t best_sub = -1;
    const int32_t* win = c1 + offset;
    for (int i = 0; i < n2; ++i) {
        const int idx = win[i] * kNCodes + c2[i];
        total += pair_w[idx];
        const double d = diff[idx];
        if (std::isnan(d)) continue;
        if ((is_max && d > best_diff) || (!is_max && d < best_diff)) {
            best_diff = d;
            best_i = i;
            best_sub = sub[idx];
        }
    }
    if (best_i < 0) {
        *out_total = best_diff;  // +-inf: offset can never win (cpu_funcs.c:297)
        *out_i = -1;
        *out_sub = -1;
        return;
    }
    *out_total = total + best_diff;
    *out_i = best_i;
    *out_sub = best_sub;
}

// is_swapable (cuda_funcs.cu:290-307): strictly better score, else lower
// offset, else lower char offset.
inline bool better(const Best& cur, const Best& cand, bool is_max) {
    if (!cand.found) return false;
    if (!cur.found) return true;
    if ((is_max && cand.total > cur.total) || (!is_max && cand.total < cur.total))
        return true;
    if (cand.total == cur.total) {
        if (cand.offset < cur.offset) return true;
        if (cand.offset == cur.offset && cand.char_offset < cur.char_offset)
            return true;
    }
    return false;
}

}  // namespace

extern "C" {

// Full search over [first_offset, last_offset). Returns 1 when a mutation was
// found, 0 otherwise.
int psa_search(const int32_t* codes1, int32_t n1,
               const int32_t* codes2, int32_t n2,
               const double* pair_w, const double* diff, const int8_t* sub,
               int32_t is_max, int32_t first_offset, int32_t last_offset,
               int32_t nthreads,
               double* out_score, int32_t* out_offset,
               int32_t* out_char_offset, int32_t* out_sub_code) {
    (void)n1;
    const bool maxm = is_max != 0;
    const int32_t total = last_offset - first_offset;
    if (total <= 0) return 0;

#if defined(_OPENMP)
    const int nt = nthreads > 0 ? nthreads : omp_get_max_threads();
#else
    const int nt = 1;
#endif
    // Contiguous ascending blocks per thread (like cpu_funcs.c:192-196), so
    // the ordered merge below reproduces the global tie-break exactly.
    Best* results = new Best[nt];

#if defined(_OPENMP)
#pragma omp parallel num_threads(nt)
#endif
    {
#if defined(_OPENMP)
        const int tid = omp_get_thread_num();
#else
        const int tid = 0;
#endif
        const int32_t per = total / nt;
        const int32_t lo = first_offset + per * tid;
        const int32_t hi = (tid == nt - 1) ? last_offset : lo + per;
        Best local{0.0, -1, -1, -1, false};
        for (int32_t o = lo; o < hi; ++o) {
            double t;
            int32_t ci, sc;
            scan_offset(codes1, codes2, n2, pair_w, diff, sub, maxm, o,
                        &t, &ci, &sc);
            if (ci < 0) continue;
            Best cand{t, o, ci, sc, true};
            if (better(local, cand, maxm)) local = cand;
        }
        results[tid] = local;
    }

    Best best{0.0, -1, -1, -1, false};
    for (int t = 0; t < nt; ++t)
        if (better(best, results[t], maxm)) best = results[t];
    delete[] results;

    if (!best.found) return 0;
    *out_score = best.total;
    *out_offset = best.offset;
    *out_char_offset = best.char_offset;
    *out_sub_code = best.sub_code;
    return 1;
}

// Sequential re-scorer for one offset (candidate verification in select.py).
void psa_score_offset(const int32_t* codes1, const int32_t* codes2, int32_t n2,
                      const double* pair_w, const double* diff, const int8_t* sub,
                      int32_t is_max, int32_t offset,
                      double* out_total, int32_t* out_char_offset,
                      int32_t* out_sub_code) {
    scan_offset(codes1, codes2, n2, pair_w, diff, sub, is_max != 0, offset,
                out_total, out_char_offset, out_sub_code);
}

// Batch sequential re-scorer: scan_offset over an arbitrary candidate list
// (ops/select.pick_from_candidates).  OpenMP across candidates; each
// candidate's f64 accumulation stays sequential, so results are
// bit-identical to per-offset psa_score_offset calls.
void psa_rescore_batch(const int32_t* codes1, const int32_t* codes2,
                       int32_t n2, const double* pair_w, const double* diff,
                       const int8_t* sub, int32_t is_max,
                       const int64_t* offsets, int32_t n_cand,
                       double* out_totals, int32_t* out_char_offsets,
                       int32_t* out_sub_codes) {
#if defined(_OPENMP)
#pragma omp parallel for schedule(static) if (n_cand > 16)
#endif
    for (int32_t k = 0; k < n_cand; ++k) {
        scan_offset(codes1, codes2, n2, pair_w, diff, sub, is_max != 0,
                    static_cast<int32_t>(offsets[k]),
                    &out_totals[k], &out_char_offsets[k], &out_sub_codes[k]);
    }
}

// Multi-query batch re-scorer: one call re-scores candidates drawn from B
// different queries (models/batch.batched_search_exact).  Query q's codes
// live at row q of the padded (B, l1_stride) / (B, l2_stride) matrices the
// batch path already has contiguous; each candidate k names its query via
// qidx[k].  Bit-identical to per-query psa_rescore_batch calls — the ~190us
// of per-query Python/ctypes overhead those cost at B=1000 was ~44% of the
// whole exact batch wall time.
void psa_rescore_multi(const int32_t* c1b, int32_t l1_stride,
                       const int32_t* c2b, int32_t l2_stride,
                       const int32_t* n2s,
                       const double* pair_w, const double* diff,
                       const int8_t* sub, int32_t is_max,
                       const int32_t* qidx, const int64_t* offsets,
                       int32_t n_cand,
                       double* out_totals, int32_t* out_char_offsets,
                       int32_t* out_sub_codes) {
#if defined(_OPENMP)
#pragma omp parallel for schedule(static) if (n_cand > 16)
#endif
    for (int32_t k = 0; k < n_cand; ++k) {
        const int32_t q = qidx[k];
        scan_offset(c1b + static_cast<int64_t>(q) * l1_stride,
                    c2b + static_cast<int64_t>(q) * l2_stride, n2s[q],
                    pair_w, diff, sub, is_max != 0,
                    static_cast<int32_t>(offsets[k]),
                    &out_totals[k], &out_char_offsets[k], &out_sub_codes[k]);
    }
}

// Per-offset integer stats (counts of 4 sign classes + max rank), matching
// the device engines' contract — lets tests diff device output against
// native output on large inputs quickly.
void psa_offset_stats(const int32_t* codes1, const int32_t* codes2,
                      int32_t n2, const int8_t* sign, const int8_t* rank,
                      int32_t first_offset, int32_t last_offset,
                      int32_t* out_counts /* (noff,4) */,
                      int32_t* out_maxrank /* (noff,) */) {
#if defined(_OPENMP)
#pragma omp parallel for schedule(static)
#endif
    for (int32_t o = first_offset; o < last_offset; ++o) {
        const int32_t* win = codes1 + o;
        int32_t c[4] = {0, 0, 0, 0};
        int32_t mr = -1;
        for (int i = 0; i < n2; ++i) {
            const int idx = win[i] * kNCodes + codes2[i];
            const int s = sign[idx];
            if (s < 4) ++c[s];
            const int r = rank[idx];
            if (r > mr) mr = r;
        }
        int32_t* row = out_counts + 4 * (o - first_offset);
        row[0] = c[0]; row[1] = c[1]; row[2] = c[2]; row[3] = c[3];
        out_maxrank[o - first_offset] = mr;
    }
}

}  // extern "C"
