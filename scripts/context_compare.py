"""Left-2 vs classic +-1 triphone trees: the context-window design call.

The reference's tri5_7d tree uses a center phone with one LEFT and one
RIGHT phone of context (`run_tdnn_7q_fbk_40_manual.sh:26`); this
framework's flagship path uses two LEFT phones instead (strictly causal —
`graphs/topology.TriphoneTree` rationale).  This experiment measures what
the choice costs: identical corpus / alignments / leaf budget / model /
training budget, only the tree (and its den composition + decode graph)
differs:

  left2  — TriphoneTree (l2, l1, p), standard composition
  pm1    — CrossTriphoneTree (l, p, r), committed-successor composition
           (den exact; decode exact within words, word-final phones use
           the r=-1 class — see decode/graph_sparse.pdf_seq)
  left1  — biphone-context reference point at the same leaf budget

Reports per tree: clustering data log-likelihood, den size, train/dev
chain objf, first-pass WER.  Writes docs/context_compare.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

LEAVES = 400
STEPS = 800
# "sym": symmetric +-1 coarticulation corpus (right_context_shift on) ->
# docs/context_compare_sym.json; default: the left-colored e2e corpus.
# "symhard": sym corpus at higher emission noise -> WERs in a range where
# the trees actually separate (the clean variants saturate at <=1%) ->
# docs/context_compare_symhard.json
MODE = sys.argv[1] if len(sys.argv) > 1 else ""
SYM = MODE in ("sym", "symhard")
HARD = MODE == "symhard"


def main():
    from tdnnf_nas_tpu.data.synthetic import (WordCorpusConfig,
                                              make_word_corpus)
    from tdnnf_nas_tpu.decode.graph_sparse import build_hclg_sparse
    from tdnnf_nas_tpu.decode.wfst import Lexicon
    from tdnnf_nas_tpu.graphs import (accumulate_cross_triphone_stats,
                                      accumulate_tree_stats,
                                      accumulate_triphone_stats,
                                      build_clustered_cross_triphone_tree,
                                      build_clustered_tree,
                                      build_clustered_triphone_tree)
    from tdnnf_nas_tpu.graphs.tree_cluster import _loglike
    from tdnnf_nas_tpu.lm.ngram import estimate_ngram_lm
    from tdnnf_nas_tpu.models import TdnnfModelConfig
    from tdnnf_nas_tpu.recipes.chain_recipes import (decode_corpus_words,
                                                     prepare_data,
                                                     train_model)
    from tdnnf_nas_tpu.train import (ChainObjectiveConfig, OptimizerConfig,
                                     TrainerConfig, make_valid_step)
    from tdnnf_nas_tpu.data.egs import batch_iterator
    import jax
    import jax.numpy as jnp

    cfg = WordCorpusConfig(
        vocab_size=300, num_phones=30, feat_dim=24, num_utts=720,
        min_words=4, max_words=12,
        min_pron=1 if HARD else 2, max_pron=3 if HARD else 5, mean_dur=3.5,
        emission_noise=3.2 if HARD else 1.3,
        context_shift=0.8 if SYM else 1.0,
        right_context_shift=0.8 if SYM else 0.0,
        num_speakers=8, speaker_shift=1.0, seed=0)
    utts, prons, word_seqs, phone_seqs, _, topo = make_word_corpus(cfg)[:6]
    n_test = 60
    test, train = utts[:n_test], utts[n_test:]
    train_phones = [u.phones for u in train]
    feats = [u.feats for u in train]
    begins = [u.begins for u in train]
    P = cfg.num_phones
    fs = cfg.frame_subsampling_factor

    # word trigram LM for decode (shared across contenders)
    word_sym = [f"w{w}" for w in range(cfg.vocab_size)]
    lm_text = [[word_sym[w] for w in ws] for ws in word_seqs[n_test:]]
    lm3 = estimate_ngram_lm(lm_text, order=3)

    def cluster_ll(stats, table, n_fwd):
        """Data log-likelihood of the clustered leaves (per-frame)."""
        p, rest = stats.counts.shape[0], int(np.prod(stats.counts.shape[1:]))
        d = stats.sums.shape[-1]
        table = np.asarray(table).ravel()
        cnt = stats.counts.reshape(p * rest)
        sm = stats.sums.reshape(p * rest, d)
        ssq = stats.sumsqs.reshape(p * rest, d)
        ll, n_tot = 0.0, 0.0
        # leaf ids are per-phone clusters in a flat [p*rest] table
        leaves = {}
        for i in range(p * rest):
            if cnt[i] > 0:
                leaves.setdefault(int(table[i]), []).append(i)
        for ids in leaves.values():
            n = float(cnt[ids].sum())
            ll += _loglike(n, sm[ids].sum(0), ssq[ids].sum(0))
            n_tot += n
        return ll / max(n_tot, 1.0)

    contenders = {}
    s2 = accumulate_tree_stats(feats, train_phones, begins, P, fs)
    t2 = build_clustered_tree(s2, num_leaves=LEAVES)
    contenders["left1"] = (t2, cluster_ll(s2, t2._fwd_table, t2._n_fwd))
    s3 = accumulate_triphone_stats(feats, train_phones, begins, P, fs)
    t3 = build_clustered_triphone_tree(s3, num_leaves=LEAVES)
    contenders["left2"] = (t3, cluster_ll(s3, t3._fwd_table, t3._n_fwd))
    sc = accumulate_cross_triphone_stats(feats, train_phones, begins, P, fs)
    tc = build_clustered_cross_triphone_tree(sc, num_leaves=LEAVES)
    contenders["pm1"] = (tc, cluster_ll(sc, tc._fwd_table, tc._n_fwd))

    out = {"leaves": LEAVES, "steps": STEPS,
           "corpus": ("300-vocab, symmetric +-1 coarticulation"
                      + (", hard (noise 3.2, prons 1-3)" if HARD else "")
                      if SYM
                      else "e2e_wer 300-vocab (left-1 coarticulation only)"),
           "table": {}}
    path0 = ("docs/context_compare_symhard.json" if HARD
             else "docs/context_compare_sym.json" if SYM
             else "docs/context_compare.json")
    if os.path.exists(path0):  # resume: keep completed contender rows
        try:
            with open(path0) as f:
                out["table"].update(json.load(f).get("table", {}))
        except Exception:
            pass
    for name, (tree, ll) in contenders.items():
        if name in out["table"]:
            print(f"{name}: kept from {path0}", flush=True)
            continue
        t0 = time.time()
        bundle = prepare_data(train, train_phones, tree, topo, P,
                              dev_fraction=0.05, phone_lm_order=3,
                              num_extra_lm_states=300)
        mc = TdnnfModelConfig(
            feat_dim=24, ivector_dim=0, num_pdfs=tree.num_pdfs,
            hidden_dim=512, bottleneck_dim=64, prefinal_big=512,
            prefinal_small=192,
            time_strides=(1, 1, 3, 3, 3))
        tcfg = TrainerConfig(
            objective=ChainObjectiveConfig(),
            optimizer=OptimizerConfig(kind="adam", lr_initial=1e-3,
                                      lr_final=1e-4, num_steps=STEPS))
        state, mets = train_model(bundle, mc, tcfg, STEPS, batch_size=48,
                                  chunk_width=40, seed=0, log_every=200)
        vstep = make_valid_step(mc, tcfg, bundle.den_arrays)
        dev_chunks = bundle.egs(mc, chunk_width=40, dev=True,
                                max_phones_per_chunk=40)
        vals = []
        for i, b in enumerate(batch_iterator(dev_chunks, 16,
                                             np.random.RandomState(0))):
            if i >= 6:
                break
            vals.append(float(vstep(state, jax.tree.map(jnp.asarray, b))
                              ["objf_mmi"]))
        g = build_hclg_sparse(Lexicon(prons), lm3, word_sym, topo, tree)
        rep = decode_corpus_words(bundle, mc, state, g, test,
                                  acoustic_scale=1.0, beam=16.0,
                                  max_active=7000, num_workers=2)
        out["table"][name] = {
            "pdfs": int(tree.num_pdfs),
            "cluster_ll_per_frame": round(ll, 4),
            "den_states": int(bundle.den_fsa.num_states),
            "den_arcs": int(len(bundle.den_fsa.arc_w)),
            "train_objf": round(mets.last("objf_mmi"), 4),
            "dev_objf": round(float(np.mean(vals)), 4),
            "hclg_states": int(g.num_states),
            "wer": round(rep["wer"], 2),
            "seconds": round(time.time() - t0),
        }
        print(name, json.dumps(out["table"][name]), flush=True)
        os.makedirs("docs", exist_ok=True)
        path = path0
        with open(path, "w") as f:
            json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
