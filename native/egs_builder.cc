// Native egs/supervision builder — the host-side runtime hot path.
//
// TPU-native equivalent of the reference's C++ egs pipeline (upstream
// nnet3-chain-get-egs / chain-supervision.cc, driven by get_egs.sh —
// SURVEY.md §3.1): building per-chunk numerator graphs (dense transition
// matrices, tolerance masks, init/final vectors) for millions of chunks is
// pure host work that must never stall the TPU step.  The Python
// implementation (graphs/supervision.py) is the reference semantics; this
// library reproduces it exactly (tested bit-for-bit) at C++ speed with
// OpenMP over the batch.
//
// Layout must match graphs/supervision.py:
//   states [enter_1, loop_1, enter_2, loop_2, ...], S = max_states
//   trans[src, loop_i] = self_loop_prob
//   trans[src, enter_{i+1}] = (1-a) * lm_probs[p_i + 1, p_{i+1}]
//   enter_i allowed at t in [b_i - tol, b_i + tol]
//   loop_i  allowed at t in [max(b_i - tol + 1, 0|crossing), e_i + tol]
//   init = den-init weights (or uniform) restricted to mask[0]
//
// Build:  g++ -O3 -march=native -fopenmp -shared -fPIC -o libegs.so egs_builder.cc

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// Tree callbacks are precomputed tables to keep the ABI trivial:
//   fwd_pdf_table: [num_phones + 1, num_phones]  (row 0 = left context BOS)
//   self_pdf_table: [num_phones]
// CI trees simply repeat rows.
void build_supervision_batch(
    const int32_t* phones,        // ragged phone ids, [total_phones]
    const int32_t* phone_offsets, // [B + 1] ragged offsets
    const int32_t* begins,        // ragged, aligned with phones (or null)
    const int32_t* ends,          // ragged (or null)
    const float* lm_probs,        // [P + 1, P]
    const int32_t* fwd_pdf_table, // [P + 1, P]
    const int32_t* self_pdf_table,// [P]
    const float* den_init_enter,  // [P] den init prob of enter(p), or null
    const float* den_init_loop,   // [P] den init prob of loop(p), or null
    float self_loop_prob,
    int32_t tol,
    int32_t num_frames,           // T
    int32_t max_states,           // S
    int32_t num_phones,           // P
    int32_t batch,                // B
    float* trans_out,             // [B, S, S]
    int32_t* pdf_out,             // [B, S]
    float* init_out,              // [B, S]
    float* final_out,             // [B, S]
    float* mask_out)              // [B, T, S]
{
    const int32_t S = max_states;
    const int32_t T = num_frames;
    const float a = self_loop_prob;

#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic)
#endif
    for (int32_t b = 0; b < batch; ++b) {
        const int32_t lo = phone_offsets[b], hi = phone_offsets[b + 1];
        const int32_t n = hi - lo;
        float* trans = trans_out + (size_t)b * S * S;
        int32_t* pdf = pdf_out + (size_t)b * S;
        float* init = init_out + (size_t)b * S;
        float* fin = final_out + (size_t)b * S;
        float* mask = mask_out + (size_t)b * T * S;
        std::memset(trans, 0, sizeof(float) * S * S);
        std::memset(init, 0, sizeof(float) * S);
        std::memset(fin, 0, sizeof(float) * S);
        std::memset(mask, 0, sizeof(float) * T * S);
        std::memset(pdf, 0, sizeof(int32_t) * S);

        int32_t prev = -1;
        for (int32_t i = 0; i < n; ++i) {
            const int32_t p = phones[lo + i];
            const int32_t e = 2 * i, l = 2 * i + 1;
            pdf[e] = fwd_pdf_table[(prev + 1) * num_phones + p];
            pdf[l] = self_pdf_table[p];
            trans[(size_t)e * S + l] = a;
            trans[(size_t)l * S + l] = a;
            if (i + 1 < n) {
                const int32_t q = phones[lo + i + 1];
                const float w = (1.0f - a) * lm_probs[(p + 1) * num_phones + q];
                trans[(size_t)e * S + 2 * (i + 1)] = w;
                trans[(size_t)l * S + 2 * (i + 1)] = w;
            }
            prev = p;
        }
        for (int32_t s = 0; s < 2 * n; ++s) fin[s] = 1.0f;

        if (begins == nullptr) {  // unaligned (e2e): all states all frames
            for (int32_t t = 0; t < T; ++t)
                for (int32_t s = 0; s < 2 * n; ++s) mask[(size_t)t * S + s] = 1.0f;
            init[0] = 1.0f;
            continue;
        }

        for (int32_t i = 0; i < n; ++i) {
            const int32_t bg = begins[lo + i], en = ends[lo + i];
            int32_t ent_lo = std::max(bg - tol, 0);
            int32_t ent_hi = std::min(bg + tol, T - 1);
            int32_t loop_lo = std::max(bg - tol + 1, 0);
            int32_t loop_hi = std::min(en + tol, T - 1);
            if (i == 0 && bg <= 0) loop_lo = 0;
            for (int32_t t = ent_lo; t <= ent_hi; ++t)
                mask[(size_t)t * S + 2 * i] = 1.0f;
            for (int32_t t = loop_lo; t <= loop_hi; ++t)
                mask[(size_t)t * S + 2 * i + 1] = 1.0f;
        }

        // init: den-init weights restricted to states allowed at t=0
        float tot = 0.0f;
        prev = -1;
        for (int32_t i = 0; i < n; ++i) {
            const int32_t p = phones[lo + i];
            if (mask[2 * i] > 0.0f)
                init[2 * i] = den_init_enter ? den_init_enter[p] : 1.0f;
            if (mask[2 * i + 1] > 0.0f)
                init[2 * i + 1] = den_init_loop ? den_init_loop[p] : 1.0f;
            tot += init[2 * i] + init[2 * i + 1];
            prev = p;
        }
        if (den_init_enter == nullptr && tot > 0.0f) {  // uniform fallback
            for (int32_t s = 0; s < 2 * n; ++s) init[s] /= tot;
        }
    }
}

// Batched Levenshtein (corpus scoring): returns per-pair
// [sub, ins, del, hits] into counts_out[4*i].
void edit_distance_batch(
    const int32_t* refs, const int32_t* ref_offsets,
    const int32_t* hyps, const int32_t* hyp_offsets,
    int32_t num_pairs, int32_t* counts_out)
{
#ifdef _OPENMP
#pragma omp parallel
#endif
    {
        int32_t* dp = nullptr;
        int32_t cap = 0;
#ifdef _OPENMP
#pragma omp for schedule(dynamic)
#endif
        for (int32_t k = 0; k < num_pairs; ++k) {
            const int32_t* r = refs + ref_offsets[k];
            const int32_t* h = hyps + hyp_offsets[k];
            const int32_t n = ref_offsets[k + 1] - ref_offsets[k];
            const int32_t m = hyp_offsets[k + 1] - hyp_offsets[k];
            const int32_t need = (n + 1) * (m + 1);
            if (need > cap) { delete[] dp; dp = new int32_t[need]; cap = need; }
            for (int32_t i = 0; i <= n; ++i) dp[i * (m + 1)] = i;
            for (int32_t j = 0; j <= m; ++j) dp[j] = j;
            for (int32_t i = 1; i <= n; ++i)
                for (int32_t j = 1; j <= m; ++j) {
                    int32_t c = dp[(i - 1) * (m + 1) + j - 1] + (r[i - 1] != h[j - 1]);
                    c = std::min(c, dp[(i - 1) * (m + 1) + j] + 1);
                    c = std::min(c, dp[i * (m + 1) + j - 1] + 1);
                    dp[i * (m + 1) + j] = c;
                }
            // backtrace
            int32_t i = n, j = m, subs = 0, ins = 0, dels = 0, hits = 0;
            while (i > 0 || j > 0) {
                if (i > 0 && j > 0 &&
                    dp[i * (m + 1) + j] ==
                        dp[(i - 1) * (m + 1) + j - 1] + (r[i - 1] != h[j - 1])) {
                    if (r[i - 1] == h[j - 1]) ++hits; else ++subs;
                    --i; --j;
                } else if (j > 0 && dp[i * (m + 1) + j] == dp[i * (m + 1) + j - 1] + 1) {
                    ++ins; --j;
                } else {
                    ++dels; --i;
                }
            }
            counts_out[4 * k + 0] = subs;
            counts_out[4 * k + 1] = ins;
            counts_out[4 * k + 2] = dels;
            counts_out[4 * k + 3] = hits;
        }
        delete[] dp;
    }
}

}  // extern "C"
