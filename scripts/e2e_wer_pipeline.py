"""Full-pipeline WER run: GMM bootstrap -> triphone tree + 4-gram den ->
chain training (TPU) -> trigram HCLG beam decode -> lattice rescoring
(4-gram + RNNLM) -> WER; plus the NAS search-proves-itself table.

The round-2 stand-in for the reference's Switchboard run (no speech corpus
ships in this environment): a hard word-level synthetic corpus —
context-colored emissions (coarticulation), per-speaker affine corruption
(what SAT/fMLLR exist for), high emission noise so first-pass WER is
genuinely nonzero — pushed through every production stage end to end:

  stage 1  GMM ladder bootstrap (mono -> tri -> LDA+MLLT -> SAT/fMLLR)
           replacing the oracle alignments            (~ run.sh:139-257)
  stage 2  clustered left-2 triphone tree + pruned 4-gram den phone LM
           (~ build_tree.sh + chain-est-phone-lm)
  stage 3  LF-MMI training on TPU                     (~ train.py)
  stage 4  trigram word LM + sparse HCLG + batched decode + lattices
           (~ mkgraph.sh + nnet3-latgen-faster)
  stage 5  4-gram lattice rescoring + RNNLM lattice rescoring
           (~ lmrescore_const_arpa.sh + rnnlm/lmrescore_pruned.sh)
  stage 6  ("search" mode) two-stage DARTS: supernet pretrain -> gumbel
           cv-update -> extract top-1; retrain top-1 / random / manual
           under identical budgets; WER table      (~ img/search_result.png)

Usage: python scripts/e2e_wer_pipeline.py [base|search|all]
Writes docs/e2e_wer{,_hard,_sil}.json and docs/search_table_e2e{,_hard}.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_TEST = 60
# E2E_SILENCE=1: optional-silence variant (silence corpus + silence-aware
# HCLG, prepare_lang semantics) -> docs/e2e_wer_sil.json
SILENCE = os.environ.get("E2E_SILENCE", "") == "1"
# E2E_HARD=1: higher emission noise -> nonzero first-pass WER so the
# rescoring deltas are measurable (post-tree-fix the default corpus
# decodes at 0.0% everywhere) -> docs/e2e_wer_hard.json
HARD = os.environ.get("E2E_HARD", "") == "1"


def build_setup():
    from tdnnf_nas_tpu.data.synthetic import WordCorpusConfig, make_word_corpus
    from tdnnf_nas_tpu.gmm import GmmLadderConfig, MonoHmmConfig
    from tdnnf_nas_tpu.graphs import (accumulate_triphone_stats,
                                      build_clustered_triphone_tree)
    from tdnnf_nas_tpu.recipes.chain_recipes import (bootstrap_alignments_gmm,
                                                     prepare_data)

    # HARD (round 5): noise 2.2 still saturated at 0.0% post-tree-fix, so
    # the discriminative variant now also uses SHORT confusable
    # pronunciations (1-3 phones -> dense homophone neighborhoods) and
    # more noise, targeting a ~5-15% first-pass WER where rescoring /
    # adaptation deltas are measurable (VERDICT r4 #7)
    cfg = WordCorpusConfig(
        vocab_size=300, num_phones=31 if SILENCE else 30, feat_dim=24,
        num_utts=720,
        min_words=4, max_words=12,
        min_pron=1 if HARD else 2, max_pron=3 if HARD else 5, mean_dur=3.5,
        emission_noise=3.6 if HARD else 1.3,
        context_shift=1.0, num_speakers=8,
        speaker_shift=1.0, silence_prob=0.3 if SILENCE else 0.0, seed=0)
    utts, prons, word_seqs, phone_seqs, _, topo = make_word_corpus(cfg)
    test, train = utts[:N_TEST], utts[N_TEST:]
    train_phones = [u.phones for u in train]

    # stage 1: GMM bootstrap replaces the oracle alignments on TRAIN
    t0 = time.time()
    _, ladder = bootstrap_alignments_gmm(
        train, train_phones, cfg.num_phones,
        speakers=[u.speaker for u in train],
        ladder_cfg=GmmLadderConfig(
            mono=MonoHmmConfig(num_iters=8, max_mix=2, mix_up_iters=(4,)),
            tri_leaves=120, tri_em_iters=6, splice_context=2, lda_dim=20,
            lda_mllt_em_iters=5, sat_em_iters=4))
    t_gmm = time.time() - t0
    print(f"[1] GMM ladder: fmllr_gain={ladder.fmllr_gain:.3f} "
          f"({t_gmm:.0f}s)", flush=True)

    # stage 2: triphone tree + 4-gram den from the BOOTSTRAPPED alignments
    t0 = time.time()
    stats = accumulate_triphone_stats(
        [u.feats for u in train], train_phones, [u.begins for u in train],
        cfg.num_phones, cfg.frame_subsampling_factor)
    tree = build_clustered_triphone_tree(stats, num_leaves=400)
    bundle = prepare_data(train, train_phones, tree, topo, cfg.num_phones,
                          dev_fraction=0.08, phone_lm_order=4,
                          num_extra_lm_states=500)
    print(f"[2] tree {tree.num_pdfs} pdfs; den S={bundle.den_fsa.num_states} "
          f"({time.time() - t0:.0f}s)", flush=True)
    return cfg, utts, prons, word_seqs, bundle, tree, topo, test, train


def model_config(tree, cfg):
    from tdnnf_nas_tpu.models import TdnnfModelConfig

    return TdnnfModelConfig(
        feat_dim=cfg.feat_dim, ivector_dim=0, hidden_dim=512,
        bottleneck_dim=128, time_strides=(1, 1, 3, 3, 3),
        num_pdfs=tree.num_pdfs, prefinal_big=512, prefinal_small=192,
        compute_dtype="bfloat16")


def run_base():
    import jax

    from tdnnf_nas_tpu.decode.graph_sparse import build_hclg_sparse
    from tdnnf_nas_tpu.decode.lattice import (rescore_lattice,
                                              rescore_lattice_rnnlm)
    from tdnnf_nas_tpu.decode.scoring import score_corpus
    from tdnnf_nas_tpu.decode.wfst import Lexicon
    from tdnnf_nas_tpu.lm.ngram import estimate_ngram_lm
    from tdnnf_nas_tpu.recipes.chain_recipes import (decode_corpus_words,
                                                     train_model)
    from tdnnf_nas_tpu.train import (OptimizerConfig, TrainerConfig,
                                     ChainObjectiveConfig)

    cfg, utts, prons, word_seqs, bundle, tree, topo, test, train = \
        build_setup()
    mc = model_config(tree, cfg)

    # stage 3: chain training on TPU
    tc = TrainerConfig(
        objective=ChainObjectiveConfig(),
        optimizer=OptimizerConfig(kind="adam", lr_initial=1.5e-3,
                                  lr_final=2e-4, num_steps=900),
        dropout_schedule=((0.0, 0.0), (0.2, 0.3), (0.5, 0.3), (1.0, 0.0)))
    t0 = time.time()
    state, metrics = train_model(bundle, mc, tc, 900, batch_size=48,
                                 chunk_width=24, seed=0, log_every=100)
    objf = metrics.last("objf_mmi")
    t0v = time.time()
    print(f"[3] train objf_mmi={objf:.4f} ({time.time() - t0:.0f}s)",
          flush=True)

    # stage 4: trigram HCLG + batched decode with lattices.
    # The first-pass trigram sees only HALF the transcripts; the rescoring
    # 4-gram sees them all — the reference's sw1_tg (in-domain subset)
    # vs sw1_fsh_fg (full text) split that gives its 4-gram rescore its
    # gain (eval2000 14.3 -> 12.9, run_tdnn_7q_fbk_40_manual.sh:216-237)
    word_sym = [f"w{w}" for w in range(cfg.vocab_size)]
    train_text = [[word_sym[w] for w in ws] for ws in word_seqs[N_TEST:]]
    lm3 = estimate_ngram_lm(train_text[: len(train_text) // 2], order=3)
    lm4 = estimate_ngram_lm(train_text, order=4)
    t0 = time.time()
    g = build_hclg_sparse(Lexicon(prons), lm3, word_sym, topo, tree,
                          sil_phone=cfg.silence_phone,
                          sil_prob=0.3 if SILENCE else 0.0)
    print(f"[4] HCLG: {g.num_states} states, {g.num_arcs} arcs "
          f"({time.time() - t0:.0f}s)", flush=True)
    t0 = time.time()
    rep = decode_corpus_words(bundle, mc, state, g, test,
                              acoustic_scale=1.0, beam=15.0,
                              lattice=True, lattice_beam=8.0,
                              num_workers=2)
    wer_tg = rep["wer"]
    print(f"[4] first-pass (tg) WER={wer_tg:.2f}%  "
          f"({time.time() - t0:.0f}s)", flush=True)

    # stage 5a: 4-gram lattice rescoring (const-arpa semantics)
    wtt = lambda w: word_sym[w]
    refs = [list(u.words) for u in test]
    hyps4 = []
    for lat in rep["lattices"]:
        best = rescore_lattice(lat, lm3, lm4, lm_scale=1.0,
                               word_to_token=wtt, n=1)
        hyps4.append(best[0][0] if best else [])
    wer_fg = score_corpus(refs, hyps4)["wer"]
    print(f"[5] +4-gram rescore WER={wer_fg:.2f}%", flush=True)

    # stage 5b: RNNLM lattice rescoring
    wer_rnn = None
    try:
        from tdnnf_nas_tpu.lm.rnnlm import RnnLMConfig, train_rnnlm, RnnLMScorer

        # tdnn-lstmp rescorer shape (embed/cell/rpd + splice), the
        # reference architecture at reduced scale
        rl_cfg = RnnLMConfig(vocab_size=cfg.vocab_size, embed_dim=64,
                             hidden_dim=128, proj_dim=64, tdnn_splice=True)
        rnn_params, _ = train_rnnlm(word_seqs[N_TEST:], rl_cfg, num_steps=400,
                                    batch_size=32, seed=0)
        scorer = RnnLMScorer(rl_cfg, rnn_params)
        hyps_r = []
        for lat in rep["lattices"]:
            best = rescore_lattice_rnnlm(lat, lm3, scorer, lm_scale=1.0,
                                         interp_weight=0.5,
                                         word_to_token=wtt, n=1)
            hyps_r.append(best[0][0] if best else [])
        wer_rnn = score_corpus(refs, hyps_r)["wer"]
        print(f"[5] +RNNLM rescore WER={wer_rnn:.2f}%", flush=True)
    except Exception as e:
        print(f"[5] RNNLM rescore skipped: {e!r}", flush=True)

    out = {
        "corpus": {"vocab": cfg.vocab_size, "phones": cfg.num_phones,
                   "train_utts": len(train), "test_utts": len(test),
                   "noise": cfg.emission_noise,
                   "speakers": cfg.num_speakers},
        "gmm_bootstrap": True,
        "silence": SILENCE,
        "tree_pdfs": int(tree.num_pdfs),
        "den_states": int(bundle.den_fsa.num_states),
        "train_objf_mmi": round(float(objf), 4),
        "hclg_states": int(g.num_states),
        "wer_first_pass_tg": round(wer_tg, 2),
        "wer_4gram_rescore": round(wer_fg, 2),
        "wer_rnnlm_rescore": (round(wer_rnn, 2)
                              if wer_rnn is not None else None),
    }
    os.makedirs("docs", exist_ok=True)
    path = ("docs/e2e_wer_sil.json" if SILENCE
            else "docs/e2e_wer_hard.json" if HARD else "docs/e2e_wer.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)
    return cfg, utts, prons, word_seqs, bundle, tree, topo, test, g, lm3


def run_search(shared=None):
    """Stage 6: the search-proves-itself table (VERDICT item #5)."""
    import jax

    from tdnnf_nas_tpu.decode.graph_sparse import build_hclg_sparse
    from tdnnf_nas_tpu.decode.wfst import Lexicon
    from tdnnf_nas_tpu.lm.ngram import estimate_ngram_lm
    from tdnnf_nas_tpu.models import DartsModelConfig, SearchMode
    from tdnnf_nas_tpu.nas import child_config_from_arch, extract_offsets
    from tdnnf_nas_tpu.recipes.chain_recipes import (decode_corpus_words,
                                                     train_model)
    from tdnnf_nas_tpu.train import (ChainObjectiveConfig, OptimizerConfig,
                                     TrainerConfig, make_valid_step)

    if shared is None:
        cfg, utts, prons, word_seqs, bundle, tree, topo, test, train = \
            build_setup()
        word_sym = [f"w{w}" for w in range(cfg.vocab_size)]
        lm3 = estimate_ngram_lm(
            [[word_sym[w] for w in ws] for ws in word_seqs[N_TEST:]], order=3)
        g = build_hclg_sparse(Lexicon(prons), lm3, word_sym, topo, tree,
                          sil_phone=cfg.silence_phone,
                          sil_prob=0.3 if SILENCE else 0.0)
    else:
        cfg, utts, prons, word_seqs, bundle, tree, topo, test, g, lm3 = shared
    mc = model_config(tree, cfg)

    base_opt = dict(kind="adam", lr_initial=1.5e-3, lr_final=2e-4)
    darts = DartsModelConfig(base=mc, search_offsets=True, max_stride=3)

    # --- supernet pretrain (uniform path sampling, 95% split) ---
    pre_tc = TrainerConfig(
        train_theta=True, train_alpha=False, search_mode=SearchMode.UNIFORM,
        optimizer=OptimizerConfig(num_steps=500, **base_opt))
    t0 = time.time()
    sup_state, _ = train_model(bundle, darts, pre_tc, 500, batch_size=48,
                               chunk_width=24, seed=0, supernet=True,
                               log_every=100)
    print(f"[6] pretrain done ({time.time() - t0:.0f}s)", flush=True)

    # --- cv alpha update (gumbel, frozen BN/theta, 5% dev split) ---
    cv_tc = TrainerConfig(
        train_theta=False, train_alpha=True, bn_frozen=True,
        search_mode=SearchMode.GUMBEL,
        optimizer=OptimizerConfig(num_steps=400, alpha_lr_scale=10.0,
                                  **base_opt))
    sup_state, cv_metrics = train_model(bundle, darts, cv_tc, 400,
                                        batch_size=48, chunk_width=24,
                                        seed=1, supernet=True,
                                        init_state=sup_state, dev=True,
                                        log_every=100)
    a_lin = np.asarray(sup_state.alphas["offsets_linear"])
    a_aff = np.asarray(sup_state.alphas["offsets_affine"])

    def mean_entropy(a):
        p = np.exp(a) / np.exp(a).sum(-1, keepdims=True)
        return float(np.mean(-(p * np.log(p + 1e-20)).sum(-1)))

    ent = (mean_entropy(a_lin) + mean_entropy(a_aff)) / 2
    uniform_ent = float(np.log(a_lin.shape[-1]))
    print(f"[6] alpha entropy {ent:.3f} vs uniform {uniform_ent:.3f}",
          flush=True)

    archs = extract_offsets(a_lin, a_aff, top_k=1)
    top1_pairs = archs[0][0]

    # --- identical-budget retrains: top-1 / random / manual ---
    rng = np.random.RandomState(123)
    rand_pairs = tuple(
        (int(rng.randint(0, darts.max_stride + 1)),
         int(rng.randint(0, darts.max_stride + 1)))
        for _ in range(len(top1_pairs)))
    contenders = {
        "searched_top1": child_config_from_arch(mc, stride_pairs=top1_pairs),
        "random_arch": child_config_from_arch(mc, stride_pairs=rand_pairs),
        "manual_baseline": mc,
    }
    table = {}
    for name, ccfg in contenders.items():
        tc = TrainerConfig(
            objective=ChainObjectiveConfig(),
            optimizer=OptimizerConfig(num_steps=700, **base_opt))
        t0 = time.time()
        st, mets = train_model(bundle, ccfg, tc, 700, batch_size=48,
                               chunk_width=24, seed=7, log_every=200)
        # held-out objf on the dev split
        vstep = make_valid_step(ccfg, tc, bundle.den_arrays)
        from tdnnf_nas_tpu.data.egs import batch_iterator
        dev_chunks = bundle.egs(ccfg, chunk_width=24, dev=True)
        vals = []
        import jax.numpy as jnp
        for i, b in enumerate(batch_iterator(dev_chunks, 16,
                                             np.random.RandomState(0))):
            if i >= 4:
                break
            vals.append(float(vstep(st, jax.tree.map(jnp.asarray, b))
                              ["objf_mmi"]))
        rep = decode_corpus_words(bundle, ccfg, st, g, test,
                                  acoustic_scale=1.0, beam=15.0,
                                  num_workers=2)
        from tdnnf_nas_tpu.models import count_params
        table[name] = {
            "strides": [list(p) for p in
                        (ccfg.time_strides_asym or
                         [(s, s) for s in ccfg.time_strides])],
            "params": int(count_params(st.params)),
            "train_objf": round(mets.last("objf_mmi"), 4),
            "dev_objf": round(float(np.mean(vals)), 4),
            "wer": round(rep["wer"], 2),
        }
        print(f"[6] {name}: dev_objf={table[name]['dev_objf']} "
              f"wer={table[name]['wer']} ({time.time() - t0:.0f}s)",
              flush=True)

    out = {
        "alpha_entropy": round(ent, 3),
        "alpha_entropy_uniform": round(uniform_ent, 3),
        "top1_logprob": float(archs[0][1]),
        "table": table,
    }
    os.makedirs("docs", exist_ok=True)
    # NOTE: distinct filename per corpus variant — the committed search WIN
    # (docs/search_table.json, planted-lookahead corpus) must never be
    # clobbered by this pipeline's search-sanity stage (whose corpus has no
    # temporal structure, so extraction there is a posterior-noise negative
    # control, alpha entropy ~uniform)
    st_path = ("docs/search_table_e2e_hard.json" if HARD
               else "docs/search_table_e2e.json")
    with open(st_path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    shared = None
    if mode in ("base", "all"):
        shared = run_base()
    if mode in ("search", "all"):
        run_search(shared)
