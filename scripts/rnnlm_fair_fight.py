"""RNNLM rescoring at flagship scale, done the reference's way.

The reference applies RNNLM lattice rescoring ON TOP of the fsh_fg
4-gram rescore (`local/rnnlm/run_tdnn_lstm_...e40.sh` after
`lmrescore_const_arpa.sh`), with a 40-epoch TDNN-LSTM.  The flagship
stage-6 run gave the RNNLM 2 epochs and rescored the tg first pass —
it beat the first pass (7.44 -> 7.39) but not the 4-gram (7.20).

Here: same corpus/AM/budget as the flagship base, but the RNNLM trains
4x longer and rescoring replaces the FULL 4-gram scores (n-best drawn
from the tg lattices, re-scored to fg, then prob-space-interpolated
with the RNNLM at several weights — Kaldi tunes the same knob).

Writes docs/rnnlm_rescore.json.  Usage: python scripts/rnnlm_fair_fight.py
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
    from tdnnf_nas_tpu.decode.lattice import lattice_nbest
    from tdnnf_nas_tpu.decode.rescore import (_old_lm_token_logprobs,
                                              rescore_nbest_rnnlm_batched)
    from tdnnf_nas_tpu.decode.scoring import score_corpus
    from tdnnf_nas_tpu.decode.wfst import Lexicon
    from tdnnf_nas_tpu.lm.rnnlm import RnnLMConfig, RnnLMScorer, train_rnnlm
    from tdnnf_nas_tpu.recipes.chain_recipes import (decode_corpus_words,
                                                     train_model)

    import pickle

    # build_setup _save()s its partial progress dict to
    # docs/e2e_flagship.json — neutralize it here so a side run never
    # clobbers the committed flagship artifact (observed once)
    flag._save = lambda *a, **k: None
    setup = flag.build_setup()
    (cfg, utts, prons, word_seqs, text, bundle, tree, topo, test, train,
     iv_test, iv_train) = setup
    mc = flag.model_config(tree, cfg)
    wtt = lambda w: f"w{w}"
    refs = [list(u.words) for u in test]
    # round 5: the interpolation weight is a TUNED hyperparameter — pick it
    # on a dev half and report the held-out eval half (Kaldi tunes
    # lmrescore_pruned --weight on dev; the round-4 field was an oracle
    # over the sweep, flagged by the advisor)
    n_dev = len(test) // 2
    nb_cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".cache",
        "rnnlm_fight_nbests_tsucc.pkl" if flag.TOPIC_SUCC
        else "rnnlm_fight_nbests_v2.pkl")

    # AM identical to the flagship base run (same seed/budget)
    cached_nb = None
    if os.path.exists(nb_cache):
        with open(nb_cache, "rb") as f:
            cached_nb = pickle.load(f)
    word_sym, lm3, lm4 = flag.build_graph(cfg, prons, word_seqs, text)
    t0 = time.time()
    if cached_nb is None:
        state, _ = train_model(bundle, mc, flag.trainer_config(1600), 1600,
                               batch_size=64, chunk_width=50, seed=0,
                               log_every=400)
        print(f"[am] trained ({time.time() - t0:.0f}s)", flush=True)
        g = build_hclg_sparse(Lexicon(prons), lm3, word_sym, topo, tree,
                              split_unigram=False)
        t0 = time.time()
        rep = decode_corpus_words(bundle, mc, state, g, test,
                                  acoustic_scale=1.0,
                                  beam=16.0, max_active=10000, lattice=True,
                                  lattice_beam=8.0, num_workers=2,
                                  ivectors=list(iv_test))
        print(f"[decode] tg WER={rep['wer']:.2f} ({time.time() - t0:.0f}s)",
              flush=True)
        wer_tg = rep["wer"]

        # n-best with tg scores -> replace tg by the FULL 4-gram
        nbests_tg = [lattice_nbest(lat, n=30) for lat in rep["lattices"]]
        nbests_fg = []
        for hyps in nbests_tg:
            out = []
            for words, total in hyps:
                old = sum(_old_lm_token_logprobs(list(words), lm3, wtt))
                new = sum(_old_lm_token_logprobs(list(words), lm4, wtt))
                out.append((list(words), total - old + new))
            out.sort(key=lambda h: -h[1])
            nbests_fg.append(out)
        lattices = rep["lattices"]
        with open(nb_cache, "wb") as f:
            pickle.dump({"nbests_fg": nbests_fg, "wer_tg": wer_tg,
                         "lattices": lattices}, f)
    else:
        nbests_fg = cached_nb["nbests_fg"]
        wer_tg = cached_nb["wer_tg"]
        lattices = cached_nb.get("lattices")
        rep = {"wer": wer_tg}
        print("[decode] n-best restored from cache", flush=True)
    hyps_fg = [(h[0][0] if h else []) for h in nbests_fg]
    wer_fg = score_corpus(refs, hyps_fg)["wer"]
    wer_fg_eval = score_corpus(refs[n_dev:], hyps_fg[n_dev:])["wer"]
    oracle = score_corpus(
        refs, [min(h, key=lambda x: score_corpus([r], [x[0]])["wer"])[0]
               if h else [] for h, r in zip(nbests_fg, refs)])["wer"]
    print(f"[fg] 4-gram n-best rescore WER={wer_fg:.2f} "
          f"(eval half {wer_fg_eval:.2f}, oracle {oracle:.2f})", flush=True)

    # Fisher-analogue LM text for BOTH contenders: the reference's
    # rescoring LMs train on SWBD+Fisher (~25M tokens); the corpus's own
    # 124k sentences (~1.3M tokens) data-starve a 33M-param neural LM
    # against backoff counts (measured held-out ppl 5008 vs 1071 even
    # with early stopping).  Sample extra topic text from the SAME
    # generator (appended draws — the corpus and caches stay identical)
    # and re-estimate the 4-gram on it too; the first-pass tg stays
    # in-domain-small, as in the reference.
    import math as _math

    from tdnnf_nas_tpu.lm.ngram import estimate_ngram_lm

    n_extra = int(os.environ.get("RNNLM_EXTRA_TEXT", 700000))
    t0 = time.time()
    from tdnnf_nas_tpu.data.synthetic import make_word_corpus
    extra = make_word_corpus(cfg, extra_text_sents=n_extra)[7]
    print(f"[text] +{len(extra)} Fisher-analogue sentences "
          f"({time.time() - t0:.0f}s)", flush=True)
    t0 = time.time()
    sym_text = [[wtt(w) for w in ws] for ws in extra]
    base_text = [[wtt(w) for w in ws] for ws in text] + \
        [[wtt(w) for w in ws] for ws in word_seqs[flag.N_TEST:]]
    lm4_big = estimate_ngram_lm(base_text + sym_text, order=4)
    print(f"[fg+] 4-gram re-estimated on {len(base_text) + len(sym_text)} "
          f"sents ({time.time() - t0:.0f}s)", flush=True)

    # re-rescore the cached n-bests with the bigger 4-gram
    nbests_fg2 = []
    for hyps in nbests_fg:
        out2 = []
        for words, total in hyps:
            old = sum(_old_lm_token_logprobs(list(words), lm4, wtt))
            new = sum(_old_lm_token_logprobs(list(words), lm4_big, wtt))
            out2.append((list(words), total - old + new))
        out2.sort(key=lambda h: -h[1])
        nbests_fg2.append(out2)
    hyps2 = [(h[0][0] if h else []) for h in nbests_fg2]
    wer_fg2 = score_corpus(refs, hyps2)["wer"]
    wer_fg2_eval = score_corpus(refs[n_dev:], hyps2[n_dev:])["wer"]
    print(f"[fg+] big 4-gram n-best WER={wer_fg2:.2f} "
          f"(eval half {wer_fg2_eval:.2f})", flush=True)

    # RNNLM: reference shape, LR decay + held-out early stopping
    t0 = time.time()
    n_steps = int(os.environ.get("RNNLM_STEPS", 48000))
    rl_cfg = RnnLMConfig(vocab_size=cfg.vocab_size, embed_dim=1024,
                         hidden_dim=2048, proj_dim=512, tdnn_splice=True)
    lm_all = text + word_seqs[flag.N_TEST:] + extra
    lm_held = lm_all[::40][:512]  # held-out slice for early stopping
    held_set = set(map(tuple, map(tuple, (map(int, s) for s in lm_held))))
    lm_train = [s for s in lm_all if tuple(map(int, s)) not in held_set]
    # params cache: lets a re-measure of the rescoring stages (interp
    # sweep, lattice timing) skip the ~15 min retrain — keyed on corpus
    # variant + step budget + text size
    rnn_cache = os.path.join(
        os.path.dirname(nb_cache),
        f"rnnlm_params_{'tsucc' if flag.TOPIC_SUCC else 'base'}"
        f"_{n_steps}_{len(lm_train)}.pkl")
    if os.path.exists(rnn_cache):
        with open(rnn_cache, "rb") as f:
            rnn_params, ppl = pickle.load(f)
        print(f"[rnnlm] params restored from {rnn_cache} (ppl {ppl:.1f})",
              flush=True)
    else:
        rnn_params, ppl = train_rnnlm(lm_train, rl_cfg, num_steps=n_steps,
                                      batch_size=64, lr=2e-3, lr_final=1e-4,
                                      seed=0, heldout=lm_held,
                                      eval_every=3000)
        print(f"[rnnlm] trained {n_steps} steps, best held-out ppl "
              f"{ppl:.1f} ({time.time() - t0:.0f}s)", flush=True)
        import jax as _jax

        with open(rnn_cache, "wb") as f:
            pickle.dump((_jax.tree.map(np.asarray, rnn_params), ppl), f)
    scorer = RnnLMScorer(rl_cfg, rnn_params)

    # ppl diagnostic on TRUE held-out text (the test utterances' word
    # sequences — in neither LM's training data); both in NATURAL log
    # (scorer.score is log10, _old_lm_token_logprobs is ln)
    held = [list(u.words) for u in test]
    lp_rnn = sum(scorer.score(ws) for ws in held) * _math.log(10.0)
    lp_fg = sum(sum(_old_lm_token_logprobs(ws, lm4_big, wtt))
                for ws in held)
    n_tok = sum(len(ws) + 1 for ws in held)
    ppl_rnn_held = float(_math.exp(-lp_rnn / n_tok))
    ppl_fg_held = float(_math.exp(-lp_fg / n_tok))
    print(f"[ppl] test-utterance held-out: rnnlm {ppl_rnn_held:.1f} vs "
          f"big 4-gram {ppl_fg_held:.1f}", flush=True)
    nbests_fg = nbests_fg2
    lm4 = lm4_big

    out = {"corpus_variant": ("topic_successors" if flag.TOPIC_SUCC
                              else "base"),
           "wer_first_pass_tg": round(rep["wer"], 2),
           "wer_4gram_small_nbest": round(wer_fg, 2),
           "wer_4gram_nbest": round(wer_fg2, 2),
           "wer_4gram_nbest_eval_half": round(wer_fg2_eval, 2),
           "oracle_nbest_wer": round(oracle, 2),
           "lm_text": {"base_sents": len(base_text),
                       "fisher_analogue_extra": len(sym_text)},
           "rnnlm": {"embed": 1024, "cell": 2048, "rpd": 512,
                     "steps": n_steps, "lr_decay": "2e-3->1e-4",
                     "early_stopping": "held-out text slice, every 1500",
                     "ppl_heldout_text": round(ppl, 1),
                     "ppl_testutts": round(ppl_rnn_held, 1),
                     "ppl_testutts_4gram": round(ppl_fg_held, 1)},
           "sweep_dev_half": {}, "sweep_eval_half": {}}
    best_w, best_dev = None, None
    for w in (0.2, 0.35, 0.5, 0.65, 0.8):
        bests = rescore_nbest_rnnlm_batched(nbests_fg, lm4, scorer,
                                            lm_scale=1.0, interp_weight=w,
                                            word_to_token=wtt)
        hyp = [b[0] for b in bests]
        wer_dev = score_corpus(refs[:n_dev], hyp[:n_dev])["wer"]
        wer_eval = score_corpus(refs[n_dev:], hyp[n_dev:])["wer"]
        out["sweep_dev_half"][str(w)] = round(wer_dev, 2)
        out["sweep_eval_half"][str(w)] = round(wer_eval, 2)
        print(f"[rnnlm] interp={w}: dev={wer_dev:.2f} eval={wer_eval:.2f}",
              flush=True)
        if best_dev is None or wer_dev < best_dev:
            best_dev, best_w = wer_dev, w
    out["interp_weight_dev_choice"] = best_w
    out["wer_rnnlm_eval_at_dev_weight"] = out["sweep_eval_half"][str(best_w)]
    out["note"] = ("headline comparison: wer_rnnlm_eval_at_dev_weight vs "
                   "wer_4gram_nbest_eval_half (same eval half, weight "
                   "chosen on the dev half)")

    # production path: frontier-batched PRUNED LATTICE rescoring
    # (rescore_lattices_rnnlm — the lmrescore_pruned equivalent, VERDICT
    # r4 #5: the per-arc incremental path took ~24 s/lattice through the
    # tunnel; the batched path amortizes one device call per lattice level
    # over the whole test set)
    if lattices is not None:
        from tdnnf_nas_tpu.decode.lattice import rescore_lattices_rnnlm

        t0 = time.time()
        # pruning at Kaldi lmrescore_pruned defaults-ish: the frontier
        # batching removes the device bottleneck, host-side state
        # bookkeeping then dominates — keep the expansion set tight
        lat_out = rescore_lattices_rnnlm(
            lattices, lm3, scorer, lm_scale=1.0, n=1, word_to_token=wtt,
            interp_weight=best_w, beam=10.0, max_states_per_node=8,
            hist_len=2)
        dt = time.time() - t0
        hyp = [(o[0][0] if o else []) for o in lat_out]
        wer_lat = score_corpus(refs, hyp)["wer"]
        out["lattice_rescore"] = {
            "wer_rnnlm_lattice_over_tg": round(wer_lat, 2),
            "interp_weight": best_w,
            "seconds_total": round(dt, 1),
            "seconds_per_lattice": round(dt / max(len(lattices), 1), 2),
            "num_lattices": len(lattices),
        }
        print(f"[lattice] batched rescore: WER={wer_lat:.2f} "
              f"({dt:.1f}s = {dt / len(lattices):.2f}s/lattice)", flush=True)
    os.makedirs("docs", exist_ok=True)
    with open("docs/rnnlm_rescore.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
