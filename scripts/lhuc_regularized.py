"""LHUC enrollment regularization ablation (VERDICT r4 #6).

Round 4 measured the no-i-vector LHUC ablation at flagship scale LOSING
(8.52 -> 8.61): with only ~10 enrollment utterances per speaker,
unregularized point-estimate LHUC overfits (the reason the reference
author's research line moved to BLHUC priors).  This run reproduces the
no-iv setting and sweeps the identity-prior decay (models/lhuc.adapt_lhuc
``l2``) plus early stopping, at the exact stage-7b configuration of
scripts/e2e_flagship.py.

Writes docs/lhuc_noiv_reg.json and patches the ``lhuc_noiv`` row of
docs/e2e_flagship.json with the regularized result (fields kept:
wer_before/wer_after; adds regularization metadata).

Usage: python scripts/lhuc_regularized.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import scripts.e2e_flagship as flag


def main():
    from tdnnf_nas_tpu.decode.graph_sparse import build_hclg_sparse
    from tdnnf_nas_tpu.decode.wfst import Lexicon
    from tdnnf_nas_tpu.recipes.chain_recipes import (decode_corpus_words,
                                                     train_model)

    flag._save = lambda *a, **k: None  # never clobber the e2e artifact
    setup = flag.build_setup()
    (cfg, utts, prons, word_seqs, text, bundle, tree, topo, test, train,
     iv_test, iv_train) = setup
    mc = flag.model_config(tree, cfg)
    refs = [list(u.words) for u in test]
    word_sym, lm3, _ = flag.build_graph(cfg, prons, word_seqs, text)
    g = build_hclg_sparse(Lexicon(prons), lm3, word_sym, topo, tree,
                          split_unigram=False)

    # the exact stage-7b no-i-vector model (same seed/budget)
    n_noiv = 1000
    mc_niv = mc.replace(ivector_dim=0)
    t0 = time.time()
    st_niv, _ = train_model(bundle, mc_niv, flag.trainer_config(n_noiv),
                            n_noiv, batch_size=64, chunk_width=50,
                            seed=3, log_every=250)
    rep_niv = decode_corpus_words(bundle, mc_niv, st_niv, g, test,
                                  acoustic_scale=1.0, beam=16.0,
                                  max_active=10000, num_workers=2)
    print(f"[base] no-iv WER {rep_niv['wer']:.2f} "
          f"({time.time() - t0:.0f}s)", flush=True)

    tc = flag.trainer_config(n_noiv)
    out = {"wer_unadapted_full": round(rep_niv["wer"], 2), "variants": {}}
    best = None
    for name, kw in (
        ("unregularized_24", dict(num_steps=24, lr=0.2, l2=0.0)),
        ("l2_2.0_24", dict(num_steps=24, lr=0.2, l2=2.0)),
        ("l2_0.5_12", dict(num_steps=12, lr=0.2, l2=0.5)),
    ):
        row = flag.lhuc_adapt_and_decode(
            bundle, topo, tree, g, test, refs, iv_test, tc.objective,
            mc_niv, st_niv, False, rep_niv["hyps"], **kw)
        row.update({k: v for k, v in kw.items()})
        out["variants"][name] = row
        if best is None or row["wer_after"] < best[1]["wer_after"]:
            best = (name, row)
    out["best_variant"] = best[0]
    os.makedirs("docs", exist_ok=True)
    with open("docs/lhuc_noiv_reg.json", "w") as f:
        json.dump(out, f, indent=2)

    # patch the flagship artifact's lhuc_noiv row with the regularized run
    try:
        with open("docs/e2e_flagship.json") as f:
            e2e = json.load(f)
        e2e["lhuc_noiv"] = dict(best[1])
        e2e["lhuc_noiv"]["wer_unadapted_full"] = round(rep_niv["wer"], 2)
        e2e["lhuc_noiv"]["regularization"] = best[0]
        e2e["lhuc_noiv"]["note"] = ("regularized enrollment (identity-prior "
                                    "decay); full sweep in "
                                    "docs/lhuc_noiv_reg.json")
        with open("docs/e2e_flagship.json", "w") as f:
            json.dump(e2e, f, indent=2)
    except Exception as e:
        print(f"e2e artifact patch skipped: {e!r}", flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
