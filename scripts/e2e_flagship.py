"""Flagship-scale end-to-end WER run at Switchboard shape.

The round-3 stand-in for the reference's full SWBD-300h experiment
(`run.sh` + `run_tdnn_7q_fbk_40_manual.sh`; no speech corpus or network
exists in this environment — see docs/STATUS.md).  Everything is at the
reference's structural scale:

  46 phones / ~30k-word vocabulary / 15-layer TDNN-F 7q (hidden 1536,
  bottleneck 160, ~18.6M params) / ~6k-pdf clustered left-2 triphone tree
  / pruned 4-gram den phone LM / real per-utterance i-vectors fed in
  training AND decode / per-speaker LHUC adaptation / trigram HCLG
  first-pass + 4-gram and RNNLM lattice rescoring.

Stages (each writes into docs/e2e_flagship.json):
  1 GMM ladder bootstrap on a stratified subset + full-corpus SAT align
    (~ run.sh:139-257 subset semantics)
  2 triphone tree + composed 4-gram den        (~ tri5_7d + den.fst)
  3 UBM + T-matrix i-vector extraction          (~ Prepare_NAS_data.sh:37-41)
  4 LF-MMI training of the 7q flagship on TPU   (~ train.py)
  5 30k-word trigram HCLG + parallel beam decode + lattices
  6 4-gram + RNNLM lattice rescoring            (~ lmrescore_const_arpa.sh)
  7 per-speaker LHUC adaptation -> WER delta    (rows 5-8 of
    img/search_result.png; supervised enrollment on the speaker's train
    utterances — the reference adapts unsupervised on 2-pass decode)
  8 bf16 vs f32 A/B at identical budget -> docs/bf16_parity.json
  9 ("search") two-stage DARTS at flagship scale -> searched/random/manual
    table -> docs/search_table_flagship.json

Usage: python scripts/e2e_flagship.py [base|search|all]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SMOKE = os.environ.get("FLAGSHIP_SMOKE", "") == "1"  # tiny bug-flush config
# round 5: corpus variant whose successor tables are topic-dependent —
# genuine long-range dependency for the RNNLM fair fight (the base
# flagship corpus and its committed artifacts are untouched; this knob
# only switches scripts that opt in, e.g. rnnlm_fair_fight.py)
TOPIC_SUCC = os.environ.get("FLAGSHIP_TOPIC_SUCC", "") == "1"
N_TEST = 20 if SMOKE else 200
OUT = {}


def _save(name=None):
    name = name or ("/tmp/e2e_flagship_smoke.json" if SMOKE
                    else "docs/e2e_flagship.json")
    os.makedirs("docs", exist_ok=True)
    with open(name, "w") as f:
        json.dump(OUT, f, indent=2)


def build_setup():
    from tdnnf_nas_tpu.data.ivector import (IvectorConfig, UbmConfig,
                                            extract_ivectors, train_ubm,
                                            train_ivector_extractor)
    from tdnnf_nas_tpu.data.synthetic import WordCorpusConfig, make_word_corpus
    from tdnnf_nas_tpu.gmm import GmmLadderConfig, MonoHmmConfig
    from tdnnf_nas_tpu.graphs import (accumulate_triphone_stats,
                                      build_clustered_triphone_tree)
    from tdnnf_nas_tpu.recipes.chain_recipes import (bootstrap_alignments_gmm,
                                                     prepare_data)

    cfg = WordCorpusConfig(
        vocab_size=2500 if SMOKE else 30000, num_phones=46, feat_dim=40,
        num_utts=220 if SMOKE else 4200,
        min_words=6, max_words=14, min_pron=3, max_pron=7, mean_dur=3.5,
        emission_noise=4.5, context_shift=1.0, num_speakers=40,
        speaker_shift=1.0, num_text_sents=4000 if SMOKE else 120000,
        # round 4: temporal heterogeneity (per-phone-class anticipatory
        # evidence at a ladder of lags) so context-offset choice matters —
        # manual 7q affine reach = 1+33+2 = 36 output frames, searchable
        # max = 1+42+2 = 45; the 38/44 lag classes need searched offsets.
        # Topics give the LM text long-range structure an RNNLM can
        # exploit but an n-gram cannot.
        lookahead_lags=(3, 8, 14, 20, 26, 32, 38, 44),
        lookahead_dim=12, lookahead_scale=2.5, num_topics=8,
        topic_successors=TOPIC_SUCC, seed=0)
    t0 = time.time()
    utts, prons, word_seqs, phone_seqs, _, topo, text = make_word_corpus(cfg)
    test, train = utts[:N_TEST], utts[N_TEST:]
    train_phones = [u.phones for u in train]
    frames = sum(len(u.pdf_align) for u in utts)
    print(f"[0] corpus: {len(utts)} utts, {frames} out-frames "
          f"(~{frames * 0.03 / 3600:.1f} h), vocab {cfg.vocab_size} "
          f"({time.time() - t0:.0f}s)", flush=True)
    OUT["corpus"] = {"vocab": cfg.vocab_size, "phones": cfg.num_phones,
                     "train_utts": len(train), "test_utts": len(test),
                     "audio_hours": round(frames * 0.03 / 3600, 2),
                     "noise": cfg.emission_noise,
                     "speakers": cfg.num_speakers,
                     "lm_text_sents": len(text)}

    # host-side bootstrap cache (GMM ladder + tree + i-vectors take ~30 min
    # of pure CPU at full scale; deterministic given the corpus config, so
    # retries after device-side failures skip straight to training)
    import pickle

    # repo-local cache dir (NOT a fixed world-writable /tmp path: on a
    # shared machine another user could plant a crafted pickle there)
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".cache")
    os.makedirs(cache_dir, exist_ok=True)
    cache_path = os.path.join(
        cache_dir, "flagship_smoke_setup.pkl" if SMOKE
        else ("flagship_setup_tsucc.pkl" if TOPIC_SUCC
              else "flagship_setup.pkl"))
    # key = config repr + a content fingerprint of the generated corpus
    # (a code change in make_word_corpus can shift the RNG stream and
    # change the corpus under an identical config — observed when a new
    # unconditional rng draw was added; stale alignments would silently
    # poison supervision)
    fp = (f"{frames}:{float(np.sum(np.abs(utts[0].feats[:8]))):.3f}:"
          f"{list(utts[0].phones[:6])}")
    cached = None
    if os.path.exists(cache_path):
        try:
            with open(cache_path, "rb") as f:
                cached = pickle.load(f)
            if (cached.get("cfg") != repr(cfg)
                    or cached.get("fingerprint") != fp):
                cached = None
        except Exception:
            cached = None
    if cached is not None:
        for u, b, e in zip(train, cached["begins"], cached["ends"]):
            u.begins, u.ends = b, e
        tree = cached["tree"]
        ivecs = cached["ivecs"]
        OUT["gmm"] = cached["gmm"]
        OUT["ivectors"] = cached["iv_diag"]
        within = cached["iv_diag"]["within_spk_cos"]
        between = cached["iv_diag"]["between_spk_cos"]
        t0 = time.time()  # stage 1-3 skipped; timing prints restart here
        print(f"[1-3] bootstrap restored from {cache_path}", flush=True)

    # stage 1: GMM ladder (subset EM + full-corpus SAT alignment)
    if cached is None:
        t0 = time.time()
        _, ladder = bootstrap_alignments_gmm(
            train, train_phones, cfg.num_phones,
            speakers=[u.speaker for u in train],
            ladder_cfg=GmmLadderConfig(
                mono=MonoHmmConfig(num_iters=8, max_mix=2, mix_up_iters=(4,)),
                tri_leaves=120 if SMOKE else 500, tri_em_iters=6,
                splice_context=2, lda_dim=36,
                lda_mllt_em_iters=5, sat_em_iters=4,
                train_subset=80 if SMOKE else 800))
        print(f"[1] GMM ladder: fmllr_gain={ladder.fmllr_gain:.3f} "
              f"({time.time() - t0:.0f}s)", flush=True)
        OUT["gmm"] = {"fmllr_gain": round(ladder.fmllr_gain, 3),
                      "train_subset": 800,
                      "seconds": round(time.time() - t0)}
        _save()

        # stage 2: triphone tree + composed 4-gram den
        t0 = time.time()
        stats = accumulate_triphone_stats(
            [u.feats for u in train], train_phones, [u.begins for u in train],
            cfg.num_phones, cfg.frame_subsampling_factor)
        tree = build_clustered_triphone_tree(
            stats, num_leaves=(400 if SMOKE else 6034 - cfg.num_phones))
        print(f"[2] tree: {tree.num_pdfs} pdfs ({time.time() - t0:.0f}s)",
              flush=True)

        # stage 3: i-vectors (UBM on pooled subset frames, T-matrix EM,
        # per-utterance extraction for train AND test)
        t0 = time.time()
        pool = np.concatenate(
            [u.feats for u in train[:50 if SMOKE else 150]])[::2]
        ubm = train_ubm(pool, UbmConfig(num_gauss=16 if SMOKE else 64,
                                        em_iters=6))
        t_mat = train_ivector_extractor(
            [u.feats for u in train[:100 if SMOKE else 600]], ubm,
            IvectorConfig(dim=100, em_iters=4))
        all_feats = [u.feats for u in utts]
        ivecs = extract_ivectors(all_feats, ubm, t_mat)
    iv_test, iv_train = ivecs[:N_TEST], ivecs[N_TEST:]
    # speaker separability diagnostic: mean within/between-speaker cosine
    spk = np.asarray([u.speaker for u in utts])
    ivn = ivecs / np.linalg.norm(ivecs, axis=1, keepdims=True)
    cos = ivn @ ivn.T
    same = spk[:, None] == spk[None, :]
    off = ~np.eye(len(utts), dtype=bool)
    within = float(cos[same & off].mean())
    between = float(cos[~same].mean())
    print(f"[3] i-vectors: within-spk cos {within:.3f} vs between "
          f"{between:.3f} ({time.time() - t0:.0f}s)", flush=True)
    OUT["ivectors"] = {"dim": 100, "within_spk_cos": round(within, 3),
                       "between_spk_cos": round(between, 3)}
    _save()

    if cached is None:
        try:
            with open(cache_path, "wb") as f:
                pickle.dump({
                    "cfg": repr(cfg),
                    "fingerprint": fp,
                    "begins": [list(u.begins) for u in train],
                    "ends": [list(u.ends) for u in train],
                    "tree": tree,
                    "ivecs": np.asarray(ivecs),
                    "gmm": OUT["gmm"],
                    "iv_diag": OUT["ivectors"],
                }, f)
            print(f"[1-3] bootstrap cached to {cache_path}", flush=True)
        except Exception as e:
            print(f"[1-3] cache save failed: {e!r}", flush=True)

    t0 = time.time()
    bundle = prepare_data(train, train_phones, tree, topo, cfg.num_phones,
                          dev_fraction=0.05, phone_lm_order=4,
                          num_extra_lm_states=500 if SMOKE else 2000,
                          ivectors=list(iv_train))
    print(f"[2b] den: S={bundle.den_fsa.num_states} "
          f"({time.time() - t0:.0f}s)", flush=True)
    OUT["tree_pdfs"] = int(tree.num_pdfs)
    OUT["den_states"] = int(bundle.den_fsa.num_states)
    _save()
    return (cfg, utts, prons, word_seqs, text, bundle, tree, topo, test,
            train, iv_test, iv_train)


def model_config(tree, cfg, dtype="bfloat16"):
    from tdnnf_nas_tpu.models import TdnnfModelConfig

    return TdnnfModelConfig(feat_dim=cfg.feat_dim, ivector_dim=100,
                            num_pdfs=tree.num_pdfs, compute_dtype=dtype)


def trainer_config(num_steps, lr0=1e-3, lr1=1e-4):
    from tdnnf_nas_tpu.train import (ChainObjectiveConfig, OptimizerConfig,
                                     TrainerConfig)

    return TrainerConfig(
        objective=ChainObjectiveConfig(),
        optimizer=OptimizerConfig(kind="adam", lr_initial=lr0, lr_final=lr1,
                                  num_steps=num_steps),
        dropout_schedule=((0.0, 0.0), (0.2, 0.3), (0.5, 0.3), (1.0, 0.0)))


def build_graph(cfg, prons, word_seqs, text):
    from tdnnf_nas_tpu.decode.graph_sparse import build_hclg_sparse
    from tdnnf_nas_tpu.decode.wfst import Lexicon
    from tdnnf_nas_tpu.lm.ngram import estimate_ngram_lm

    word_sym = [f"w{w}" for w in range(cfg.vocab_size)]
    trans_text = [[word_sym[w] for w in ws] for ws in word_seqs[N_TEST:]]
    full_text = [[word_sym[w] for w in ws] for ws in text] + trans_text
    # first-pass trigram from the acoustic transcripts + a 10% text slice
    # (the reference's in-domain sw1_tg); the rescoring 4-gram sees ALL
    # the text (sw1_fsh_fg trained on SWBD+Fisher,
    # run_tdnn_7q_fbk_40_manual.sh:216-237 tg -> fsh_fg rescore)
    tg_text = ([[word_sym[w] for w in ws]
                for ws in text[: len(text) // 10]] + trans_text)
    t0 = time.time()
    lm3 = estimate_ngram_lm(tg_text, order=3)
    lm4 = estimate_ngram_lm(full_text, order=4)
    print(f"[5] LMs: tg {len(lm3.logprobs)} ngrams ({len(tg_text)} sents), "
          f"fg {len(lm4.logprobs)} ({len(full_text)} sents) "
          f"({time.time() - t0:.0f}s)", flush=True)
    return word_sym, lm3, lm4


def run_base():
    import jax

    from tdnnf_nas_tpu.decode.graph_sparse import build_hclg_sparse
    from tdnnf_nas_tpu.decode.lattice import (rescore_lattice,
                                              rescore_lattice_rnnlm)
    from tdnnf_nas_tpu.decode.scoring import score_corpus
    from tdnnf_nas_tpu.decode.wfst import Lexicon
    from tdnnf_nas_tpu.models import count_params
    from tdnnf_nas_tpu.recipes.chain_recipes import (decode_corpus_words,
                                                     train_model)

    setup = build_setup()
    (cfg, utts, prons, word_seqs, text, bundle, tree, topo, test, train,
     iv_test, iv_train) = setup
    mc = model_config(tree, cfg)

    # stage 4: LF-MMI training of the flagship on TPU
    n_steps = 120 if SMOKE else 1600
    tc = trainer_config(n_steps)
    t0 = time.time()
    state, metrics = train_model(bundle, mc, tc, n_steps, batch_size=64,
                                 chunk_width=50, seed=0, log_every=100)
    objf = metrics.last("objf_mmi")
    print(f"[4] train objf_mmi={objf:.4f} "
          f"params={count_params(state.params):,} "
          f"({time.time() - t0:.0f}s)", flush=True)
    OUT["train"] = {"steps": n_steps, "objf_mmi": round(float(objf), 4),
                    "params": int(count_params(state.params)),
                    "seconds": round(time.time() - t0),
                    "egs_stats": dict(bundle.egs_stats)}
    _save()

    # stage 5: 30k-word trigram HCLG + parallel decode with lattices
    word_sym, lm3, lm4 = build_graph(cfg, prons, word_seqs, text)
    t0 = time.time()
    # compact unigram junction at 30k words: the exact per-left-phone
    # split costs 2.2x states / ~15x decode time at this scale (see
    # graph_sparse.build_hclg_sparse(split_unigram=...))
    g = build_hclg_sparse(Lexicon(prons), lm3, word_sym, topo, tree,
                          split_unigram=False)
    print(f"[5] HCLG: {g.num_states} states, {g.num_arcs} arcs "
          f"({time.time() - t0:.0f}s)", flush=True)
    OUT["hclg"] = {"states": int(g.num_states), "arcs": int(g.num_arcs),
                   "build_s": round(time.time() - t0)}
    t0 = time.time()
    rep = decode_corpus_words(bundle, mc, state, g, test,
                              acoustic_scale=1.0, beam=16.0,
                              max_active=10000, lattice=True,
                              lattice_beam=8.0, num_workers=2,
                              ivectors=list(iv_test))
    wer_tg = rep["wer"]
    print(f"[5] first-pass (tg) WER={wer_tg:.2f}% "
          f"({time.time() - t0:.0f}s)", flush=True)
    OUT["wer_first_pass_tg"] = round(wer_tg, 2)
    _save()

    # stage 6: 4-gram + RNNLM lattice rescoring
    wtt = lambda w: word_sym[w]
    refs = [list(u.words) for u in test]
    hyps4 = []
    for lat in rep["lattices"]:
        best = rescore_lattice(lat, lm3, lm4, lm_scale=1.0,
                               word_to_token=wtt, n=1)
        hyps4.append(best[0][0] if best else [])
    wer_fg = score_corpus(refs, hyps4)["wer"]
    print(f"[6] +4-gram rescore WER={wer_fg:.2f}%", flush=True)
    OUT["wer_4gram_rescore"] = round(wer_fg, 2)
    _save()

    wer_rnn = None
    try:
        from tdnnf_nas_tpu.lm.rnnlm import (RnnLMConfig, RnnLMScorer,
                                            train_rnnlm)

        t0 = time.time()
        # the reference's 1024-embed / 2048-cell / rpd-512 TDNN-LSTM
        # rescorer shape, trained on the FULL text
        # (run_tdnn_lstm_fbk40_mod_hasfisher_large_drop_e40.sh:27-36)
        rl_cfg = RnnLMConfig(vocab_size=cfg.vocab_size,
                             embed_dim=128 if SMOKE else 1024,
                             hidden_dim=256 if SMOKE else 2048,
                             proj_dim=0 if SMOKE else 512,
                             tdnn_splice=not SMOKE)
        lm_ids = text + word_seqs[N_TEST:]
        rnn_params, rnn_ppl = train_rnnlm(lm_ids, rl_cfg,
                                          num_steps=150 if SMOKE else 4000,
                                          batch_size=64, seed=0)
        print(f"[6] RNNLM trained: ppl~{rnn_ppl:.1f} "
              f"({time.time() - t0:.0f}s)", flush=True)
        scorer = RnnLMScorer(rl_cfg, rnn_params)
        # batched n-best rescoring with prob-space interpolation (Kaldi
        # lmrescore_pruned.sh --weight semantics); the per-arc incremental
        # lattice rescoring costs a device round trip per expansion —
        # measured ~24 s/lattice through the tunnel at this scale
        from tdnnf_nas_tpu.decode.lattice import lattice_nbest
        from tdnnf_nas_tpu.decode.rescore import rescore_nbest_rnnlm_batched

        nbests = [lattice_nbest(lat, n=20) for lat in rep["lattices"]]
        bests = rescore_nbest_rnnlm_batched(nbests, lm3, scorer,
                                            lm_scale=1.0,
                                            interp_weight=0.5,
                                            word_to_token=wtt)
        hyps_r = [b[0] for b in bests]
        wer_rnn = score_corpus(refs, hyps_r)["wer"]
        print(f"[6] +RNNLM rescore WER={wer_rnn:.2f}% "
              f"({time.time() - t0:.0f}s)", flush=True)
    except Exception as e:
        print(f"[6] RNNLM rescore skipped: {e!r}", flush=True)
    OUT["wer_rnnlm_rescore"] = (round(wer_rnn, 2)
                                if wer_rnn is not None else None)
    _save()

    # stage 7: per-speaker LHUC adaptation (supervised enrollment on the
    # speaker's TRAIN utterances; model frozen, only LHUC scales move).
    # Two rows (VERDICT r3 #5): the i-vector flagship (expected ~no gain —
    # i-vectors already carry the speaker) and a NO-i-vector ablation
    # (where LHUC must earn the reference's +LHUC rows,
    # img/search_result.png rows 5-8).

    def lhuc_pass(mc_l, state_l, use_iv, base_hyps, **kw):
        return lhuc_adapt_and_decode(bundle, topo, tree, g, test, refs,
                                     iv_test, tc.objective, mc_l, state_l,
                                     use_iv, base_hyps, **kw)

    try:
        OUT["lhuc"] = lhuc_pass(mc, state, True, rep["hyps"])
    except Exception as e:
        import traceback

        traceback.print_exc()
        print(f"[7] LHUC (iv) skipped: {e!r}", flush=True)
        OUT["lhuc"] = None
    _save()

    # ablation: train a no-i-vector flagship at reduced budget; without
    # the i-vector input the per-speaker affine corruption is unmodeled,
    # leaving LHUC real work to do (the reference's LHUC setting —
    # its +LHUC rows adapt models whose inputs are speaker-independent)
    try:
        n_noiv = 120 if SMOKE else 1000
        mc_niv = mc.replace(ivector_dim=0)
        t0 = time.time()
        st_niv, _ = train_model(bundle, mc_niv, trainer_config(n_noiv),
                                n_noiv, batch_size=64, chunk_width=50,
                                seed=3, log_every=200)
        rep_niv = decode_corpus_words(bundle, mc_niv, st_niv, g, test,
                                      acoustic_scale=1.0, beam=16.0,
                                      max_active=10000, num_workers=2)
        print(f"[7b] no-iv model: WER {rep_niv['wer']:.2f} "
              f"({time.time() - t0:.0f}s)", flush=True)
        OUT["lhuc_noiv"] = lhuc_pass(mc_niv, st_niv, False, rep_niv["hyps"])
        OUT["lhuc_noiv"]["wer_unadapted_full"] = round(rep_niv["wer"], 2)
    except Exception as e:
        import traceback

        traceback.print_exc()
        print(f"[7b] LHUC no-iv ablation skipped: {e!r}", flush=True)
        OUT["lhuc_noiv"] = None
    _save()

    # stage 8: bf16 vs f32 A/B at identical (shorter) budget
    try:
        t0 = time.time()
        ab = {}
        n_ab = 60 if SMOKE else 600
        for dtype in ("bfloat16", "float32"):
            mc_ab = model_config(tree, cfg, dtype=dtype)
            st, mets = train_model(bundle, mc_ab, trainer_config(n_ab), n_ab,
                                   batch_size=64, chunk_width=50, seed=11)
            rep_ab = decode_corpus_words(bundle, mc_ab, st, g, test[:100],
                                         acoustic_scale=1.0, beam=16.0,
                                         max_active=10000, num_workers=2,
                                         ivectors=list(iv_test[:100]))
            hist = [v for _, v in mets.series["objf_mmi"]]
            ab[dtype] = {"objf_final": round(float(np.mean(hist[-20:])), 4),
                         "objf_curve_10": [round(float(v), 4)
                                           for v in hist[::60]],
                         "wer": round(rep_ab["wer"], 2)}
            print(f"[8] {dtype}: objf={ab[dtype]['objf_final']} "
                  f"wer={ab[dtype]['wer']}", flush=True)
        ab["delta_wer"] = round(ab["bfloat16"]["wer"] - ab["float32"]["wer"],
                                2)
        ab["note"] = ("identical 600-step budget, same seed/egs; bf16 is "
                      "the production compute dtype")
        with open("/tmp/bf16_parity.json" if SMOKE else
                  "docs/bf16_parity.json", "w") as f:
            json.dump(ab, f, indent=2)
        print(f"[8] bf16 A/B done ({time.time() - t0:.0f}s)", flush=True)
        OUT["bf16_parity"] = {"delta_wer": ab["delta_wer"]}
    except Exception as e:
        print(f"[8] bf16 A/B skipped: {e!r}", flush=True)
    _save()
    print(json.dumps(OUT), flush=True)
    return setup, state, g, lm3, word_sym


def lhuc_adapt_and_decode(bundle, topo, tree, g, test, refs, iv_test,
                          objective_cfg, mc_l, state_l, use_iv, base_hyps,
                          num_steps=24, lr=0.2, l2=0.0):
    """Per-speaker LHUC enrollment + adapted decode of the speakers' test
    utterances.  ``l2`` decays the logits toward identity (enrollment
    regularization for the speaker-independent setting, VERDICT r4 #6)."""
    import jax
    import jax.numpy as jnp

    from tdnnf_nas_tpu.data.egs import EgsConfig, batch_iterator, make_egs
    from tdnnf_nas_tpu.decode.beam import beam_decode_sparse
    from tdnnf_nas_tpu.decode.scoring import score_corpus
    from tdnnf_nas_tpu.models import model_context
    from tdnnf_nas_tpu.models.lhuc import adapt_lhuc, apply_model_lhuc

    t0 = time.time()
    left, right = model_context(mc_l)
    fs = mc_l.frame_subsampling_factor
    spk_train = {}
    for i, u in enumerate(bundle.train_utts):
        spk_train.setdefault(u.speaker, []).append(i)
    hyps_l = [None] * len(test)
    n_spk = 0

    # params as jit ARGS (closed-over 19M-param arrays would be baked
    # into the HLO as constants — observed to wedge the remote compile)
    @jax.jit
    def fwd_lhuc(params, bn_state, lhuc, feats, iv):
        chain, _, _ = apply_model_lhuc(mc_l, params, bn_state,
                                       lhuc, feats, iv, train=False)
        return chain

    # ONE decode shape for the whole stage: pad every utterance to the
    # test-set max (single compile instead of one per 64-frame bucket)
    t_max = max(len(u.pdf_align) for u in test)
    t_pad_all = ((t_max + 63) // 64) * 64

    egs_cfg = EgsConfig(chunk_width=50, left_context=left,
                        right_context=right, max_phones_per_chunk=40)
    for spk in sorted({u.speaker for u in test}):
        idx = spk_train.get(spk, [])[:10]
        if not idx:
            continue
        sutts = [bundle.train_utts[i] for i in idx]
        sivs = ([bundle.train_ivectors[i] for i in idx]
                if use_iv else None)
        chunks = make_egs(sutts, bundle.lm, topo, tree, egs_cfg,
                          den_fsa=bundle.den_fsa, ivectors=sivs)
        batches = []
        for b in batch_iterator(chunks, 16, np.random.RandomState(0),
                                drop_last=False):
            n_b = b["feats"].shape[0]
            if n_b < 16:  # pad to one fixed shape across all speakers
                b = jax.tree.map(
                    lambda a: (np.concatenate(
                        [a, np.repeat(a[:1], 16 - n_b, 0)])
                        if isinstance(a, np.ndarray)
                        and a.ndim and a.shape[0] == n_b else a), b)
            batches.append(jax.tree.map(jnp.asarray, b))
            if len(batches) >= 8:
                break
        lhuc, _ = adapt_lhuc(mc_l, state_l.params, state_l.bn_state,
                             bundle.den_arrays, objective_cfg, batches,
                             num_steps=num_steps, lr=lr, l2=l2)
        # decode this speaker's test utts with the adapted scales
        tidx = [i for i, u in enumerate(test) if u.speaker == spk]
        for i in tidx:
            u = test[i]
            t_out = len(u.pdf_align)
            need = left + (t_pad_all - 1) * fs + 1 + right
            feats = np.concatenate([
                np.repeat(u.feats[:1], left, 0), u.feats,
                np.repeat(u.feats[-1:], need, 0)])[None][:, :need]
            iv_arg = (jnp.asarray(iv_test[i][None]) if use_iv
                      else None)
            obs = np.asarray(
                fwd_lhuc(state_l.params, state_l.bn_state, lhuc,
                         jnp.asarray(feats), iv_arg), np.float32)[0]
            res = beam_decode_sparse(obs[:t_out], g, beam=16.0,
                                     max_active=10000, retry_beam=64.0)
            hyps_l[i] = res.words
        n_spk += 1
    done = [i for i, h in enumerate(hyps_l) if h is not None]
    wer_lhuc = score_corpus([refs[i] for i in done],
                            [hyps_l[i] for i in done])["wer"]
    base_sub = score_corpus([refs[i] for i in done],
                            [base_hyps[i] for i in done])["wer"]
    print(f"[7] LHUC iv={use_iv} l2={l2} steps={num_steps} ({n_spk} "
          f"speakers, {len(done)} utts): WER {base_sub:.2f} -> "
          f"{wer_lhuc:.2f} ({time.time() - t0:.0f}s)", flush=True)
    return {"speakers": n_spk, "utts": len(done),
            "wer_before": round(base_sub, 2),
            "wer_after": round(wer_lhuc, 2)}


def run_search(shared=None):
    """Stage 9: the search table at flagship scale."""
    import jax
    import jax.numpy as jnp

    from tdnnf_nas_tpu.data.egs import batch_iterator
    from tdnnf_nas_tpu.decode.graph_sparse import build_hclg_sparse
    from tdnnf_nas_tpu.decode.wfst import Lexicon
    from tdnnf_nas_tpu.models import (DartsModelConfig, SearchMode,
                                      count_params)
    from tdnnf_nas_tpu.nas import child_config_from_arch, extract_offsets
    from tdnnf_nas_tpu.recipes.chain_recipes import (decode_corpus_words,
                                                     train_model)
    from tdnnf_nas_tpu.train import (OptimizerConfig, TrainerConfig,
                                     make_valid_step)

    if shared is None:
        setup = build_setup()
        (cfg, utts, prons, word_seqs, text, bundle, tree, topo, test, train,
         iv_test, iv_train) = setup
        word_sym, lm3, _ = build_graph(cfg, prons, word_seqs, text)
        # compact unigram junction at 30k words (same call as run_base:
        # the exact per-left-context split multiplies unigram-source
        # chains by the live final-tuple count — tens of GB at this scale)
        g = build_hclg_sparse(Lexicon(prons), lm3, word_sym, topo, tree,
                              split_unigram=False)
    else:
        setup, _, g, lm3, word_sym = shared
        (cfg, utts, prons, word_seqs, text, bundle, tree, topo, test, train,
         iv_test, iv_train) = setup
    mc = model_config(tree, cfg)

    base_opt = dict(kind="adam", lr_initial=1e-3, lr_final=1e-4)
    darts = DartsModelConfig(base=mc, search_offsets=True, max_stride=3)
    n_pre = 80 if SMOKE else 700
    n_cv = 60 if SMOKE else 1000  # round 5: longer cv-update -> tighter alpha

    pre_tc = TrainerConfig(
        train_theta=True, train_alpha=False, search_mode=SearchMode.UNIFORM,
        optimizer=OptimizerConfig(num_steps=n_pre, **base_opt))
    t0 = time.time()
    sup_state, _ = train_model(bundle, darts, pre_tc, n_pre, batch_size=48,
                               chunk_width=50, seed=0, supernet=True,
                               log_every=100)
    print(f"[9] pretrain done ({time.time() - t0:.0f}s)", flush=True)

    def mean_entropy(a):
        p = np.exp(a) / np.exp(a).sum(-1, keepdims=True)
        return float(np.mean(-(p * np.log(p + 1e-20)).sum(-1)))

    # round 5 (robustness): TWO independent cv-updates (different gumbel /
    # egs-order seeds from the SAME pretrained supernet — the reference's
    # repeatability question for `generate_top_list.py` top-K extraction)
    cv = {}
    for cv_seed in (1, 11):
        cv_tc = TrainerConfig(
            train_theta=False, train_alpha=True, bn_frozen=True,
            search_mode=SearchMode.GUMBEL,
            optimizer=OptimizerConfig(num_steps=n_cv, alpha_lr_scale=30.0,
                                      **base_opt))
        st, _ = train_model(bundle, darts, cv_tc, n_cv, batch_size=48,
                            chunk_width=50, seed=cv_seed, supernet=True,
                            init_state=sup_state, dev=True, log_every=200)
        a_lin = np.asarray(st.alphas["offsets_linear"])
        a_aff = np.asarray(st.alphas["offsets_affine"])
        cv[cv_seed] = (a_lin, a_aff)
    a_lin, a_aff = cv[1]
    ent = (mean_entropy(a_lin) + mean_entropy(a_aff)) / 2
    uniform_ent = float(np.log(a_lin.shape[-1]))
    print(f"[9] alpha entropy {ent:.3f} vs uniform {uniform_ent:.3f}",
          flush=True)

    archs = extract_offsets(a_lin, a_aff, top_k=3)
    top1_pairs = archs[0][0]
    top2_pairs = archs[1][0] if len(archs) > 1 else top1_pairs
    a_lin2, a_aff2 = cv[11]
    ent2 = (mean_entropy(a_lin2) + mean_entropy(a_aff2)) / 2
    seed2_top1 = extract_offsets(a_lin2, a_aff2, top_k=1)[0][0]
    agree = float(np.mean([a == b for a, b in
                           zip(np.ravel(top1_pairs), np.ravel(seed2_top1))]))
    print(f"[9] cv seed2: entropy {ent2:.3f}, top1 agreement with seed1 "
          f"{agree:.2f}", flush=True)

    def rand_arch(seed):
        rng = np.random.RandomState(seed)
        return tuple(
            (int(rng.randint(0, darts.max_stride + 1)),
             int(rng.randint(0, darts.max_stride + 1)))
            for _ in range(len(top1_pairs)))

    contenders = {
        "searched_top1": child_config_from_arch(mc, stride_pairs=top1_pairs),
        "searched_top2": child_config_from_arch(mc, stride_pairs=top2_pairs),
        "searched_seed2_top1": child_config_from_arch(
            mc, stride_pairs=seed2_top1),
        "random_arch": child_config_from_arch(mc,
                                              stride_pairs=rand_arch(123)),
        "random_arch2": child_config_from_arch(mc,
                                               stride_pairs=rand_arch(456)),
        "manual_baseline": mc,
    }
    if seed2_top1 == top1_pairs:
        contenders.pop("searched_seed2_top1")
    table = {}
    for name, ccfg in contenders.items():
        n_child = 100 if SMOKE else 1000
        tc = trainer_config(n_child)
        t0 = time.time()
        st, mets = train_model(bundle, ccfg, tc, n_child, batch_size=64,
                               chunk_width=50, seed=7, log_every=250)
        vstep = make_valid_step(ccfg, tc, bundle.den_arrays)
        dev_chunks = bundle.egs(ccfg, chunk_width=50,
                                max_phones_per_chunk=40, dev=True)
        vals = []
        for i, b in enumerate(batch_iterator(dev_chunks, 16,
                                             np.random.RandomState(0))):
            if i >= 6:
                break
            vals.append(float(vstep(st, jax.tree.map(jnp.asarray, b))
                              ["objf_mmi"]))
        rep = decode_corpus_words(bundle, ccfg, st, g, test,
                                  acoustic_scale=1.0, beam=16.0,
                                  max_active=10000, num_workers=2,
                                  ivectors=list(iv_test))
        pairs = (ccfg.time_strides_asym
                 or [(s, s) for s in ccfg.time_strides])
        table[name] = {
            "strides": [list(p) for p in pairs],
            "lookahead_reach": 1 + sum(a for _, a in pairs) + 2,
            "params": int(count_params(st.params)),
            "train_objf": round(mets.last("objf_mmi"), 4),
            "dev_objf": round(float(np.mean(vals)), 4),
            "wer": round(rep["wer"], 2),
        }
        print(f"[9] {name}: dev_objf={table[name]['dev_objf']} "
              f"wer={table[name]['wer']} ({time.time() - t0:.0f}s)",
              flush=True)

    out = {
        "scale": "flagship (46 phones, 30k vocab, 7q supernet)",
        "alpha_entropy": round(ent, 3),
        "alpha_entropy_seed2": round(ent2, 3),
        "alpha_entropy_uniform": round(uniform_ent, 3),
        "cv_steps": n_cv,
        "top1_logprob": float(archs[0][1]),
        "seed_top1_agreement": round(agree, 3),
        "table": table,
    }
    os.makedirs("docs", exist_ok=True)
    with open("/tmp/search_table_flagship.json" if SMOKE else
              "docs/search_table_flagship.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    shared = None
    if mode in ("base", "all"):
        shared = run_base()
    if mode in ("search", "all"):
        if shared is None:
            # standalone search: build_setup must never clobber the
            # committed base artifact with its partial progress dict
            # (observed: a search-only run gutted docs/e2e_flagship.json)
            _save_orig = _save
            globals()["_save"] = lambda *a, **k: None
        run_search(shared)
