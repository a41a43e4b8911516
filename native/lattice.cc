// Native lattice generator: beam-pruned Viterbi forward/backward with
// exact posterior pruning at lattice_beam.
//
// C++ runtime counterpart of decode/lattice.py::generate_lattice (the
// Python module is the tested reference semantics).  Reference role:
// ``nnet3-latgen-faster`` lattice generation feeding the const-arpa /
// RNNLM rescoring stages (SURVEY.md §3.3).
//
// Node numbering matches the Python module: 0 = super-start, interior
// nodes are surviving (t, state) pairs in (t, state) order, last node is
// the super-end.  Arcs are emitted sorted by src node.

#include <cstddef>
#include <cstdint>
#include <vector>

namespace {
constexpr float kNegInf = -1e30f;
}

extern "C" {

// Returns 0 on success, -1 if no complete path survived the beam,
// -2 if max_nodes/max_arcs was exceeded (call again with more room).
// out_counts: [2] = {num_nodes (incl. super start/end), num_arcs}.
int32_t generate_lattice(
    const float* obs,            // [T, P] log-probs
    int32_t T, int32_t P,
    const int32_t* succ_offsets, // [S+1] CSR successors
    const int32_t* succ_dst,     // [E]
    const float* succ_logw,      // [E]
    const int32_t* state_pdf,    // [S]
    const float* log_init,       // [S]
    const float* log_final,      // [S]
    const int32_t* word_of_state,// [S]
    int32_t S,
    float acoustic_scale,
    float beam,
    float lattice_beam,
    int32_t max_nodes,
    int32_t max_arcs,
    int32_t* out_node_time,      // [max_nodes]
    int32_t* out_arc_src,        // [max_arcs]
    int32_t* out_arc_dst,
    int32_t* out_arc_word,
    float* out_arc_am,
    float* out_arc_gs,
    int32_t* out_counts)
{
    std::vector<float> obs_s((std::size_t)T * S);
    for (int32_t t = 0; t < T; ++t)
        for (int32_t s = 0; s < S; ++s)
            obs_s[(std::size_t)t * S + s] =
                obs[(std::size_t)t * P + state_pdf[s]] * acoustic_scale;

    // forward Viterbi with per-frame beam
    std::vector<float> alpha((std::size_t)T * S, kNegInf);
    {
        float mx = kNegInf;
        for (int32_t s = 0; s < S; ++s) {
            const float v = log_init[s] + obs_s[s];
            alpha[s] = (log_init[s] <= kNegInf / 2) ? kNegInf : v;
            if (alpha[s] > mx) mx = alpha[s];
        }
        for (int32_t s = 0; s < S; ++s)
            if (alpha[s] < mx - beam) alpha[s] = kNegInf;
    }
    for (int32_t t = 1; t < T; ++t) {
        const float* ap = &alpha[(std::size_t)(t - 1) * S];
        float* at = &alpha[(std::size_t)t * S];
        for (int32_t s = 0; s < S; ++s) {
            if (ap[s] <= kNegInf / 2) continue;
            for (int32_t e = succ_offsets[s]; e < succ_offsets[s + 1]; ++e) {
                const float v = ap[s] + succ_logw[e];
                if (v > at[succ_dst[e]]) at[succ_dst[e]] = v;
            }
        }
        float mx = kNegInf;
        for (int32_t s = 0; s < S; ++s) {
            if (at[s] > kNegInf / 2) at[s] += obs_s[(std::size_t)t * S + s];
            if (at[s] > mx) mx = at[s];
        }
        for (int32_t s = 0; s < S; ++s)
            if (at[s] < mx - beam) at[s] = kNegInf;
    }

    // backward Viterbi over surviving states
    std::vector<float> beta((std::size_t)T * S, kNegInf);
    for (int32_t s = 0; s < S; ++s) beta[(std::size_t)(T - 1) * S + s] = log_final[s];
    for (int32_t t = T - 2; t >= 0; --t) {
        const float* an = &alpha[(std::size_t)(t + 1) * S];
        const float* bn = &beta[(std::size_t)(t + 1) * S];
        const float* on = &obs_s[(std::size_t)(t + 1) * S];
        float* bt = &beta[(std::size_t)t * S];
        for (int32_t s = 0; s < S; ++s) {
            float best = kNegInf;
            for (int32_t e = succ_offsets[s]; e < succ_offsets[s + 1]; ++e) {
                const int32_t d = succ_dst[e];
                if (an[d] <= kNegInf / 2) continue;
                const float v = succ_logw[e] + on[d] + bn[d];
                if (v > best) best = v;
            }
            bt[s] = best;
        }
    }

    float best = kNegInf;
    for (int32_t s = 0; s < S; ++s) {
        const float v = alpha[(std::size_t)(T - 1) * S + s] + log_final[s];
        if (v > best) best = v;
    }
    if (best <= kNegInf / 2) return -1;
    const float cutoff = best - lattice_beam;

    // surviving nodes, numbered (t, state)-lexicographic after super-start
    std::vector<int32_t> node_of((std::size_t)T * S, -1);
    int32_t num_nodes = 1;  // super-start
    for (int32_t t = 0; t < T; ++t)
        for (int32_t s = 0; s < S; ++s)
            if (alpha[(std::size_t)t * S + s] + beta[(std::size_t)t * S + s] >= cutoff)
                node_of[(std::size_t)t * S + s] = num_nodes++;
    const int32_t end_node = num_nodes++;
    if (num_nodes > max_nodes) return -2;
    out_node_time[0] = -1;
    for (int32_t t = 0; t < T; ++t)
        for (int32_t s = 0; s < S; ++s)
            if (node_of[(std::size_t)t * S + s] >= 0)
                out_node_time[node_of[(std::size_t)t * S + s]] = t;
    out_node_time[end_node] = -1;

    int32_t na = 0;
    auto emit = [&](int32_t src, int32_t dst, int32_t w, float am,
                    float gs) -> bool {
        if (na >= max_arcs) return false;
        out_arc_src[na] = src;
        out_arc_dst[na] = dst;
        out_arc_word[na] = w;
        out_arc_am[na] = am;
        out_arc_gs[na] = gs;
        ++na;
        return true;
    };

    // start arcs
    for (int32_t s = 0; s < S; ++s) {
        if (node_of[s] < 0 || log_init[s] <= kNegInf / 2) continue;
        if (log_init[s] + obs_s[s] + beta[s] < cutoff) continue;
        if (!emit(0, node_of[s], word_of_state[s], obs_s[s], log_init[s]))
            return -2;
    }
    // transitions
    for (int32_t t = 0; t + 1 < T; ++t) {
        for (int32_t s = 0; s < S; ++s) {
            const int32_t ns = node_of[(std::size_t)t * S + s];
            if (ns < 0) continue;
            const float a = alpha[(std::size_t)t * S + s];
            for (int32_t e = succ_offsets[s]; e < succ_offsets[s + 1]; ++e) {
                const int32_t d = succ_dst[e];
                const int32_t nd = node_of[(std::size_t)(t + 1) * S + d];
                if (nd < 0) continue;
                const float am = obs_s[(std::size_t)(t + 1) * S + d];
                const float tot = a + succ_logw[e] + am
                                  + beta[(std::size_t)(t + 1) * S + d];
                if (tot < cutoff) continue;
                if (!emit(ns, nd, word_of_state[d], am, succ_logw[e]))
                    return -2;
            }
        }
    }
    // final arcs
    for (int32_t s = 0; s < S; ++s) {
        const int32_t ns = node_of[(std::size_t)(T - 1) * S + s];
        if (ns < 0 || log_final[s] <= kNegInf / 2) continue;
        if (alpha[(std::size_t)(T - 1) * S + s] + log_final[s] < cutoff) continue;
        if (!emit(ns, end_node, -1, 0.0f, log_final[s])) return -2;
    }

    out_counts[0] = num_nodes;
    out_counts[1] = na;
    return 0;
}

}  // extern "C"
