"""Word-position-dependent phones vs +-1 context: the prepare_lang question.

Kaldi's prepare_lang marks lexicon phones _B/_E/_I/_S (word position) so
trees can model word-boundary allophony; the reference trains every
system on marked phones (`run.sh:139-257`).  VERDICT r3 #8 asks this
framework to either add the marks or show measured evidence that its
left+right context windows subsume them.

This experiment does both: on a corpus with genuine word-boundary
allophony (WordCorpusConfig.boundary_shift colors emissions by position
in the word), it trains at a matched leaf budget:

  left1       — biphone tree, unmarked phones  (no way to see position)
  left1_wpd   — biphone tree over _B/_E/_I/_S-marked phones
                (graphs/wpd.py; the prepare_lang configuration)
  pm1         — +-1 cross-triphone tree, unmarked phones (position is
                implied by the l/r neighbor identities: word-internal
                neighbors are in-pron, cross-word neighbors vary)

Writes docs/wpd_compare.json.  Usage: python scripts/wpd_compare.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

STEPS = 500
LEAVES = 260


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from tdnnf_nas_tpu.data.egs import batch_iterator
    from tdnnf_nas_tpu.data.synthetic import (WordCorpusConfig,
                                              make_word_corpus)
    from tdnnf_nas_tpu.decode.graph_sparse import build_hclg_sparse
    from tdnnf_nas_tpu.decode.wfst import Lexicon
    from tdnnf_nas_tpu.graphs import (accumulate_cross_triphone_stats,
                                      accumulate_tree_stats,
                                      build_clustered_cross_triphone_tree,
                                      build_clustered_tree)
    from tdnnf_nas_tpu.graphs.topology import ChainTopology
    from tdnnf_nas_tpu.graphs.wpd import mark_lexicon, mark_word_stream, num_marked_phones
    from tdnnf_nas_tpu.lm.ngram import estimate_ngram_lm
    from tdnnf_nas_tpu.models import TdnnfModelConfig
    from tdnnf_nas_tpu.recipes.chain_recipes import (decode_corpus_words,
                                                     prepare_data,
                                                     train_model)
    from tdnnf_nas_tpu.train import (ChainObjectiveConfig, OptimizerConfig,
                                     TrainerConfig, make_valid_step)

    cfg = WordCorpusConfig(
        vocab_size=150, num_phones=14, feat_dim=24, num_utts=360,
        min_words=3, max_words=9, min_pron=2, max_pron=5, mean_dur=3.0,
        emission_noise=2.2, context_shift=0.5, boundary_shift=1.5, seed=0)
    utts, prons, word_seqs, phone_seqs, _, topo = make_word_corpus(cfg)
    n_test = 50
    test, train = utts[:n_test], utts[n_test:]
    P = cfg.num_phones
    fs = cfg.frame_subsampling_factor
    word_sym = [f"w{w}" for w in range(cfg.vocab_size)]
    lm3 = estimate_ngram_lm(
        [[word_sym[w] for w in ws] for ws in word_seqs[n_test:]], order=3)

    # marked variant of the corpus: same audio/durations, phone ids carry
    # the word-position mark; lexicon marked to match
    prons_m = mark_lexicon(prons)
    utts_m = [dataclasses.replace(u, phones=mark_word_stream(u.words, prons))
              for u in utts]
    test_m, train_m = utts_m[:n_test], utts_m[n_test:]
    P_m = num_marked_phones(P)
    topo_m = ChainTopology(P_m)

    def contender(name, c_utts, c_train, c_test, c_prons, c_topo, c_P,
                  tree_kind):
        t0 = time.time()
        tp = [u.phones for u in c_train]
        feats = [u.feats for u in c_train]
        begins = [u.begins for u in c_train]
        if tree_kind == "pm1":
            st = accumulate_cross_triphone_stats(feats, tp, begins, c_P, fs)
            tree = build_clustered_cross_triphone_tree(st, num_leaves=LEAVES)
        else:
            st = accumulate_tree_stats(feats, tp, begins, c_P, fs)
            tree = build_clustered_tree(st, num_leaves=LEAVES)
        bundle = prepare_data(c_train, tp, tree, c_topo, c_P,
                              dev_fraction=0.08, phone_lm_order=3,
                              num_extra_lm_states=200)
        mc = TdnnfModelConfig(
            feat_dim=cfg.feat_dim, ivector_dim=0, num_pdfs=tree.num_pdfs,
            hidden_dim=256, bottleneck_dim=64, prefinal_big=256,
            prefinal_small=128, time_strides=(1, 1, 3),
            compute_dtype="float32")
        tc = TrainerConfig(
            objective=ChainObjectiveConfig(),
            optimizer=OptimizerConfig(kind="adam", lr_initial=1e-3,
                                      lr_final=2e-4, num_steps=STEPS))
        st_, mets = train_model(bundle, mc, tc, STEPS, batch_size=32,
                                chunk_width=24, seed=0)
        vstep = make_valid_step(mc, tc, bundle.den_arrays)
        vals = []
        for i, b in enumerate(batch_iterator(
                bundle.egs(mc, chunk_width=24, dev=True), 16,
                np.random.RandomState(0))):
            if i >= 4:
                break
            vals.append(float(vstep(st_, jax.tree.map(jnp.asarray, b))
                              ["objf_mmi"]))
        g = build_hclg_sparse(Lexicon(c_prons), lm3, word_sym, c_topo, tree)
        rep = decode_corpus_words(bundle, mc, st_, g, c_test,
                                  acoustic_scale=1.0, beam=15.0,
                                  max_active=7000, num_workers=2)
        row = {"pdfs": int(tree.num_pdfs),
               "den_states": int(bundle.den_fsa.num_states),
               "train_objf": round(mets.last("objf_mmi"), 4),
               "dev_objf": round(float(np.mean(vals)), 4),
               "wer": round(rep["wer"], 2),
               "seconds": round(time.time() - t0)}
        print(name, json.dumps(row), flush=True)
        return row

    out = {"leaves": LEAVES, "steps": STEPS,
           "corpus": "150-vocab, boundary_shift=1.2 (word-boundary "
                     "allophony) + left coarticulation 0.5",
           "table": {}}
    out["table"]["left1"] = contender(
        "left1", utts, train, test, prons, topo, P, "left1")
    out["table"]["left1_wpd"] = contender(
        "left1_wpd", utts_m, train_m, test_m, prons_m, topo_m, P_m, "left1")
    out["table"]["pm1"] = contender(
        "pm1", utts, train, test, prons, topo, P, "pm1")
    os.makedirs("docs", exist_ok=True)
    with open("docs/wpd_compare.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
