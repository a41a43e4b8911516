// Native time-synchronous beam decoder over sparse (CSR arc-list) HCLG
// graphs with non-emitting junction states — the production counterpart of
// decode/beam.py (reference equivalent: `nnet3-latgen-faster`, SURVEY.md
// §3.3).  Same semantics as the Python decoder (parity-tested): Viterbi
// token passing with epsilon closure, score-beam + max-active pruning,
// one-best traceback, and beam-surviving-arc lattice output pruned to
// lattice_beam around the best path.
//
// The Python module remains the reference implementation; this exists
// because the per-frame numpy vectorization still costs ~RTF 0.37 with
// lattices on the 8.7M-state 30k-vocab graph (docs/
// sparse_decode_bench_30k.json) — the decode-side bottleneck named in
// VERDICT r3 #6.  Built into libegs.so.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

constexpr float kNegInf = -1e30f;

// per-destination recombination map over graph states, O(1) amortized via
// epoch stamping (no clearing between uses)
struct StateMap {
    std::vector<int32_t> idx;
    std::vector<int32_t> epoch;
    int32_t cur = 0;
    explicit StateMap(int32_t s) : idx(s, -1), epoch(s, -1) {}
    void next() { ++cur; }
    // returns slot index or -1 if unseen this epoch
    int32_t get(int32_t s) const { return epoch[s] == cur ? idx[s] : -1; }
    void put(int32_t s, int32_t i) {
        epoch[s] = cur;
        idx[s] = i;
    }
};

struct Frontier {
    std::vector<int32_t> state;
    std::vector<float> score;   // total path score (incl. am so far)
    std::vector<float> gs;      // graph part accumulated this frame advance
    std::vector<int32_t> prev;  // token index in the previous frame
    std::vector<int32_t> word;  // last word crossed this frame advance (-1)
    void clear() {
        state.clear(); score.clear(); gs.clear(); prev.clear(); word.clear();
    }
    size_t size() const { return state.size(); }
    void push(int32_t s, float sc, float g, int32_t p, int32_t w) {
        state.push_back(s); score.push_back(sc); gs.push_back(g);
        prev.push_back(p); word.push_back(w);
    }
};

struct Graph {
    const int64_t* out_start;
    const int32_t* arc_dst;
    const float* arc_w;
    const int32_t* arc_word;
    const int32_t* state_pdf;
    const float* final_w;
    int32_t S;
};

// best end-of-utterance weight per token: max over label-free epsilon paths
// of (path weight + final_w) — decode/beam.py:_final_closure
void final_closure(const Graph& g, const std::vector<int32_t>& states,
                   std::vector<float>* best_out) {
    const int32_t n = (int32_t)states.size();
    best_out->assign(n, kNegInf);
    for (int32_t i = 0; i < n; ++i) (*best_out)[i] = g.final_w[states[i]];
    // frontier entries: (state, score, token); recombined per (state, token)
    std::vector<int32_t> st(states), tok(n);
    std::vector<float> sc(n, 0.0f);
    for (int32_t i = 0; i < n; ++i) tok[i] = i;
    std::unordered_map<int64_t, int32_t> seen;
    std::vector<int32_t> nst, ntok;
    std::vector<float> nsc;
    for (int depth = 0; depth < 64 && !st.empty(); ++depth) {
        nst.clear(); ntok.clear(); nsc.clear();
        seen.clear();
        for (size_t i = 0; i < st.size(); ++i) {
            const int32_t s = st[i];
            for (int64_t e = g.out_start[s]; e < g.out_start[s + 1]; ++e) {
                const int32_t d = g.arc_dst[e];
                if (g.state_pdf[d] >= 0 || g.arc_word[e] >= 0) continue;
                const float v = sc[i] + g.arc_w[e];
                const float f = v + g.final_w[d];
                if (f > (*best_out)[tok[i]]) (*best_out)[tok[i]] = f;
                const int64_t key = (int64_t)d * (n + 1) + tok[i];
                auto it = seen.find(key);
                if (it == seen.end()) {
                    seen.emplace(key, (int32_t)nst.size());
                    nst.push_back(d); nsc.push_back(v); ntok.push_back(tok[i]);
                } else if (v > nsc[it->second]) {
                    nsc[it->second] = v;
                }
            }
        }
        st.swap(nst); sc.swap(nsc); tok.swap(ntok);
    }
}

}  // namespace

extern "C" {

// Return codes: 0 = ok, -1 = beam search died (retry with a wider beam),
// -2 = an output buffer is too small (retry with bigger max_* bounds).
int32_t beam_decode_sparse_native(
    const float* obs,          // [T, P] log-probs
    int32_t T, int32_t P,
    const int64_t* out_start,  // [S+1]
    const int32_t* arc_dst,    // [E]
    const float* arc_w,        // [E] ln
    const int32_t* arc_word,   // [E] (-1 = eps)
    const int32_t* state_pdf,  // [S] (-1 = non-emitting)
    const float* final_w,      // [S] ln (~-1e30 = none)
    int32_t S, int32_t start_state,
    float acoustic_scale, float beam, int32_t max_active,
    int32_t want_lattice, float lattice_beam,
    int32_t max_out_words,
    int32_t* out_words,        // [max_out_words]
    int32_t* out_n_words,      // [1]
    float* out_score,          // [1]
    int32_t max_nodes, int32_t max_arcs,
    int32_t* lat_node_time,    // [max_nodes]
    int32_t* lat_src, int32_t* lat_dst, int32_t* lat_word,  // [max_arcs]
    float* lat_am, float* lat_gs,                           // [max_arcs]
    int32_t* lat_counts,       // [2]: n_nodes, n_arcs
    float* out_mean_active)    // [1]: mean surviving tokens/frame (or null)
{
    const Graph g{out_start, arc_dst, arc_w, arc_word, state_pdf, final_w, S};
    StateMap smap(S);

    // per-frame surviving tokens (for traceback / lattice nodes)
    std::vector<std::vector<int32_t>> fr_state(T), fr_prev(T), fr_word(T);
    std::vector<std::vector<float>> fr_score(T);
    // recorded candidate arcs landing on survivors (lattice events)
    std::vector<std::vector<int32_t>> ev_prev(T), ev_dtok(T), ev_word(T);
    std::vector<std::vector<float>> ev_gs(T), ev_am(T);

    Frontier cur, nxt, cand;
    std::vector<int32_t> tok_states(1, start_state);
    std::vector<float> tok_scores(1, 0.0f);

    for (int32_t t = 0; t < T; ++t) {
        const float* am_t = obs + (size_t)t * P;
        // --- frame advance with epsilon closure -----------------------
        cand.clear();
        cur.clear();
        for (size_t i = 0; i < tok_states.size(); ++i)
            cur.push(tok_states[i], tok_scores[i], 0.0f, (int32_t)i, -1);
        for (int depth = 0; depth < 64 && !cur.state.empty(); ++depth) {
            nxt.clear();
            smap.next();
            for (size_t i = 0; i < cur.state.size(); ++i) {
                const int32_t s = cur.state[i];
                for (int64_t e = g.out_start[s]; e < g.out_start[s + 1]; ++e) {
                    const int32_t d = g.arc_dst[e];
                    const float w = g.arc_w[e];
                    const float sc = cur.score[i] + w;
                    const float gsc = cur.gs[i] + w;
                    const int32_t wd =
                        g.arc_word[e] >= 0 ? g.arc_word[e] : cur.word[i];
                    if (g.state_pdf[d] >= 0) {
                        const float am = am_t[g.state_pdf[d]] * acoustic_scale;
                        cand.push(d, sc + am, gsc, cur.prev[i], wd);
                    } else {
                        const int32_t slot = smap.get(d);
                        if (slot < 0) {
                            smap.put(d, (int32_t)nxt.size());
                            nxt.push(d, sc, gsc, cur.prev[i], wd);
                        } else if (sc > nxt.score[slot]) {
                            nxt.score[slot] = sc; nxt.gs[slot] = gsc;
                            nxt.prev[slot] = cur.prev[i];
                            nxt.word[slot] = wd;
                        }
                    }
                }
            }
            cur.state.swap(nxt.state); cur.score.swap(nxt.score);
            cur.gs.swap(nxt.gs); cur.prev.swap(nxt.prev);
            cur.word.swap(nxt.word);
        }
        if (cand.state.empty()) return -1;  // died; caller widens the beam

        // --- per-destination recombination ----------------------------
        smap.next();
        auto& us = fr_state[t];
        auto& usc = fr_score[t];
        auto& upv = fr_prev[t];
        auto& uwd = fr_word[t];
        std::vector<int32_t> land(cand.size());  // cand -> token slot
        for (size_t i = 0; i < cand.size(); ++i) {
            const int32_t d = cand.state[i];
            int32_t slot = smap.get(d);
            if (slot < 0) {
                slot = (int32_t)us.size();
                smap.put(d, slot);
                us.push_back(d); usc.push_back(cand.score[i]);
                upv.push_back(cand.prev[i]); uwd.push_back(cand.word[i]);
            } else if (cand.score[i] > usc[slot]) {
                usc[slot] = cand.score[i];
                upv[slot] = cand.prev[i];
                uwd[slot] = cand.word[i];
            }
            land[i] = slot;
        }

        // --- beam + max-active pruning --------------------------------
        float best = kNegInf;
        for (float v : usc) best = std::max(best, v);
        float cutoff = best - beam;
        if ((int32_t)us.size() > max_active) {
            std::vector<float> tmp(usc);
            std::nth_element(tmp.begin(),
                             tmp.end() - max_active, tmp.end());
            cutoff = std::max(cutoff, *(tmp.end() - max_active));
        }
        // compact survivors, remembering old->new slot mapping
        std::vector<int32_t> remap(us.size(), -1);
        size_t n_keep = 0;
        for (size_t i = 0; i < us.size(); ++i) {
            if (usc[i] >= cutoff) {
                remap[i] = (int32_t)n_keep;
                us[n_keep] = us[i]; usc[n_keep] = usc[i];
                upv[n_keep] = upv[i]; uwd[n_keep] = uwd[i];
                ++n_keep;
            }
        }
        us.resize(n_keep); usc.resize(n_keep);
        upv.resize(n_keep); uwd.resize(n_keep);

        if (want_lattice) {
            auto& ep = ev_prev[t]; auto& ed = ev_dtok[t];
            auto& ew = ev_word[t]; auto& eg = ev_gs[t]; auto& ea = ev_am[t];
            for (size_t i = 0; i < cand.size(); ++i) {
                const int32_t slot = remap[land[i]];
                if (slot < 0) continue;
                if (cand.score[i] < usc[slot] - lattice_beam) continue;
                const float src_sc = t > 0 ? tok_scores[cand.prev[i]] : 0.0f;
                ep.push_back(cand.prev[i]);
                ed.push_back(slot);
                ew.push_back(cand.word[i]);
                eg.push_back(cand.gs[i]);
                ea.push_back(cand.score[i] - cand.gs[i] - src_sc);
            }
        }
        tok_states = us;
        tok_scores = usc;
    }
    if (out_mean_active) {
        double tot = 0.0;
        for (int32_t t = 0; t < T; ++t) tot += (double)fr_state[t].size();
        out_mean_active[0] = T > 0 ? (float)(tot / T) : 0.0f;
    }

    // --- final epsilon pass + one-best traceback ----------------------
    std::vector<float> fin;
    final_closure(g, tok_states, &fin);
    int32_t use_tok = 0;
    float best_plain = kNegInf, best_final = kNegInf;
    int32_t best_plain_tok = 0, best_final_tok = -1;
    for (size_t i = 0; i < tok_scores.size(); ++i) {
        if (tok_scores[i] > best_plain) {
            best_plain = tok_scores[i];
            best_plain_tok = (int32_t)i;
        }
        const float f = tok_scores[i] + fin[i];
        if (f > -1e29f && f > best_final) {
            best_final = f;
            best_final_tok = (int32_t)i;
        }
    }
    float total;
    if (best_final_tok >= 0) {
        use_tok = best_final_tok;
        total = best_final;
    } else {
        use_tok = best_plain_tok;
        total = best_plain;
    }
    *out_score = total;

    {
        std::vector<int32_t> words_rev;
        int32_t tok = use_tok;
        for (int32_t t = T - 1; t >= 0; --t) {
            const int32_t w = fr_word[t][tok];
            if (w >= 0) words_rev.push_back(w);
            tok = fr_prev[t][tok];
        }
        if ((int32_t)words_rev.size() > max_out_words) return -2;
        *out_n_words = (int32_t)words_rev.size();
        for (size_t i = 0; i < words_rev.size(); ++i)
            out_words[i] = words_rev[words_rev.size() - 1 - i];
    }

    if (!want_lattice) {
        if (lat_counts) { lat_counts[0] = 0; lat_counts[1] = 0; }
        return 0;
    }

    // --- lattice: exact backward over recorded events, pruned ---------
    // node ids: 0 = start, then per (t, token), last = end
    std::vector<int64_t> offs(T + 1);
    offs[0] = 1;
    for (int32_t t = 0; t < T; ++t)
        offs[t + 1] = offs[t] + (int64_t)fr_state[t].size();
    const int64_t n_nodes = offs[T] + 1;
    if (n_nodes > max_nodes) return -2;
    const int64_t end = n_nodes - 1;

    std::vector<std::vector<float>> bwd(T);
    for (int32_t t = 0; t < T; ++t)
        bwd[t].assign(fr_state[t].size(), kNegInf);
    // final arcs from last-frame tokens (fallback: zeros when none final)
    std::vector<float> last_fin;
    final_closure(g, fr_state[T - 1], &last_fin);
    bool any_final = false;
    for (float v : last_fin) any_final |= (v > -1e29f);
    if (!any_final) last_fin.assign(fr_state[T - 1].size(), 0.0f);
    bwd[T - 1] = last_fin;
    for (int32_t t = T - 1; t >= 1; --t) {
        for (size_t i = 0; i < ev_prev[t].size(); ++i) {
            const float c = ev_gs[t][i] + ev_am[t][i] + bwd[t][ev_dtok[t][i]];
            float& b = bwd[t - 1][ev_prev[t][i]];
            if (c > b) b = c;
        }
    }

    for (int64_t i = 0; i < n_nodes; ++i) lat_node_time[i] = -1;
    for (int32_t t = 0; t < T; ++t)
        for (int64_t i = offs[t]; i < offs[t + 1]; ++i) lat_node_time[i] = t;

    const float thresh = total - lattice_beam;
    int64_t na = 0;
    for (int32_t t = 0; t < T; ++t) {
        for (size_t i = 0; i < ev_prev[t].size(); ++i) {
            const float fwd_prev =
                t > 0 ? fr_score[t - 1][ev_prev[t][i]] : 0.0f;
            const float tot =
                fwd_prev + ev_gs[t][i] + ev_am[t][i] + bwd[t][ev_dtok[t][i]];
            if (tot < thresh) continue;
            if (na >= max_arcs) return -2;
            lat_src[na] = t > 0 ? (int32_t)(offs[t - 1] + ev_prev[t][i]) : 0;
            lat_dst[na] = (int32_t)(offs[t] + ev_dtok[t][i]);
            lat_word[na] = ev_word[t][i];
            lat_am[na] = ev_am[t][i];
            lat_gs[na] = ev_gs[t][i];
            ++na;
        }
    }
    for (size_t i = 0; i < fr_state[T - 1].size(); ++i) {
        if (fr_score[T - 1][i] + last_fin[i] < thresh) continue;
        if (na >= max_arcs) return -2;
        lat_src[na] = (int32_t)(offs[T - 1] + (int64_t)i);
        lat_dst[na] = (int32_t)end;
        lat_word[na] = -1;
        lat_am[na] = 0.0f;
        lat_gs[na] = last_fin[i];
        ++na;
    }
    lat_counts[0] = (int32_t)n_nodes;
    lat_counts[1] = (int32_t)na;
    return 0;
}

}  // extern "C"
