// Native n-best decoder: backward-Viterbi heuristic + exact A* enumeration.
//
// The C++ runtime counterpart of decode/nbest.py (reference equivalent:
// the ``nnet3-latgen-faster`` C++ decoder producing hypotheses for LM
// rescoring, SURVEY.md §3.3).  The Python module is the reference
// semantics (tested equivalent); this implementation handles production
// decode volumes: CSR sparse graphs, arena-allocated backpointer chains,
// and a bounded priority queue.
//
// Built into libegs.so together with egs_builder.cc.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <queue>
#include <set>
#include <vector>

namespace {

constexpr float kNegInf = -1e30f;

struct Node {
    float priority;   // score + heuristic
    float score;      // exact partial score
    int32_t t;
    int32_t state;
    int32_t link;     // index into word arena (-1 = empty)
};

struct NodeLess {
    bool operator()(const Node& a, const Node& b) const {
        return a.priority < b.priority;  // max-heap
    }
};

}  // namespace

extern "C" {

// Returns the number of hypotheses found (<= n).
// Graph: CSR successors per state with log-weights; states emit pdfs
// (state-emitting form, matching graphs/fsa.py).
int32_t decode_nbest(
    const float* obs,            // [T, P] log-probs
    int32_t T, int32_t P,
    const int32_t* succ_offsets, // [S+1]
    const int32_t* succ_dst,     // [E]
    const float* succ_logw,      // [E]
    const int32_t* state_pdf,    // [S]
    const float* log_init,       // [S]
    const float* log_final,      // [S]
    const int32_t* word_of_state,// [S] (-1 = no word emitted)
    int32_t S,
    int32_t n,
    float acoustic_scale,
    int32_t max_pops,
    int32_t max_words,
    int32_t* out_words,          // [n, max_words]
    int32_t* out_lens,           // [n]
    float* out_scores)           // [n]
{
    // obs gathered per state, scaled
    std::vector<float> obs_s((size_t)T * S);
    for (int32_t t = 0; t < T; ++t)
        for (int32_t s = 0; s < S; ++s)
            obs_s[(size_t)t * S + s] =
                obs[(size_t)t * P + state_pdf[s]] * acoustic_scale;

    // backward Viterbi: bwd[t][s] = best suffix score after being at s@t
    std::vector<float> bwd((size_t)T * S, kNegInf);
    for (int32_t s = 0; s < S; ++s) bwd[(size_t)(T - 1) * S + s] = log_final[s];
    for (int32_t t = T - 2; t >= 0; --t) {
        const float* bn = &bwd[(size_t)(t + 1) * S];
        const float* on = &obs_s[(size_t)(t + 1) * S];
        float* bt = &bwd[(size_t)t * S];
        for (int32_t s = 0; s < S; ++s) {
            float best = kNegInf;
            for (int32_t e = succ_offsets[s]; e < succ_offsets[s + 1]; ++e) {
                const int32_t d = succ_dst[e];
                const float v = succ_logw[e] + on[d] + bn[d];
                if (v > best) best = v;
            }
            bt[s] = best;
        }
    }

    // word arena: (prev_link, word)
    std::vector<std::pair<int32_t, int32_t>> arena;
    arena.reserve(1 << 16);
    auto push_word = [&](int32_t link, int32_t w) -> int32_t {
        if (w < 0) return link;
        arena.emplace_back(link, w);
        return (int32_t)arena.size() - 1;
    };

    std::priority_queue<Node, std::vector<Node>, NodeLess> heap;
    for (int32_t s = 0; s < S; ++s) {
        if (log_init[s] <= kNegInf / 2) continue;
        const float sc = log_init[s] + obs_s[s];
        const float pri = sc + bwd[s];
        if (pri <= kNegInf / 2) continue;
        heap.push({pri, sc, 0, s, push_word(-1, word_of_state[s])});
    }

    std::set<std::vector<int32_t>> seen;
    int32_t found = 0, pops = 0;
    std::vector<int32_t> words_buf;
    while (!heap.empty() && found < n && pops < max_pops) {
        Node nd = heap.top();
        heap.pop();
        ++pops;
        if (nd.t == T - 1) {
            const float total = nd.score + log_final[nd.state];
            if (total <= kNegInf / 2) continue;
            words_buf.clear();
            for (int32_t l = nd.link; l >= 0; l = arena[l].first)
                words_buf.push_back(arena[l].second);
            std::reverse(words_buf.begin(), words_buf.end());
            if ((int32_t)words_buf.size() > max_words) continue;
            if (!seen.insert(words_buf).second) continue;
            out_lens[found] = (int32_t)words_buf.size();
            std::memcpy(out_words + (size_t)found * max_words, words_buf.data(),
                        words_buf.size() * sizeof(int32_t));
            out_scores[found] = total;
            ++found;
            continue;
        }
        const int32_t tn = nd.t + 1;
        const float* on = &obs_s[(size_t)tn * S];
        const float* bn = &bwd[(size_t)tn * S];
        for (int32_t e = succ_offsets[nd.state]; e < succ_offsets[nd.state + 1];
             ++e) {
            const int32_t d = succ_dst[e];
            const float sc = nd.score + succ_logw[e] + on[d];
            const float pri = sc + bn[d];
            if (pri <= kNegInf / 2) continue;
            heap.push({pri, sc, tn, d, push_word(nd.link, word_of_state[d])});
        }
    }
    return found;
}

}  // extern "C"
