"""End-to-end WER demo: train on the word corpus, decode, rescore.

Produces docs/wer_synthetic.json: first-pass (bigram graph) WER vs 4-gram
and RNNLM rescoring, through both the n-best and the lattice pipelines
(native lattice generation + G-replacement / pruned-RNNLM rescoring),
plus the lattice oracle WER — the full decode stack exercised at once.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main(train_steps=300):
    from tdnnf_nas_tpu.data.synthetic import WordCorpusConfig, make_word_corpus
    from tdnnf_nas_tpu.decode import (
        Lexicon, estimate_word_lm, build_decoding_graph, decode_words,
    )
    from tdnnf_nas_tpu.decode.nbest import nbest_decode
    from tdnnf_nas_tpu.decode.rescore import rescore_nbest
    from tdnnf_nas_tpu.decode.scoring import score_corpus
    from tdnnf_nas_tpu.lm import estimate_ngram_lm
    from tdnnf_nas_tpu.lm.rnnlm import RnnLMConfig, train_rnnlm, RnnLMScorer
    from tdnnf_nas_tpu.models import TdnnfModelConfig, model_context, apply_model
    from tdnnf_nas_tpu.recipes import prepare_data, train_model
    from tdnnf_nas_tpu.train import TrainerConfig, ChainObjectiveConfig, OptimizerConfig

    cfg = WordCorpusConfig(
        vocab_size=40, num_phones=14, feat_dim=24, num_utts=160,
        min_words=3, max_words=8, emission_noise=1.2, seed=0,
    )
    utts, prons, word_seqs, phone_seqs, tree, topo = make_word_corpus(cfg)
    bundle = prepare_data(utts, phone_seqs, tree, topo, cfg.num_phones,
                          dev_fraction=0.15)
    model_cfg = TdnnfModelConfig(
        feat_dim=cfg.feat_dim, ivector_dim=0, hidden_dim=128,
        bottleneck_dim=32, time_strides=(1, 1, 3, 3), num_pdfs=tree.num_pdfs,
        prefinal_big=128, prefinal_small=64,
    )
    tr = TrainerConfig(
        objective=ChainObjectiveConfig(),
        optimizer=OptimizerConfig(kind="adam", lr_initial=2e-3, lr_final=4e-4,
                                  num_steps=train_steps),
    )
    state, metrics = train_model(bundle, model_cfg, tr, num_steps=train_steps,
                                 batch_size=16, chunk_width=20, seed=0)
    print(f"train objf: {metrics.last('objf_mmi'):.4f}", flush=True)

    # word LMs: first-pass bigram from train transcripts; big LMs likewise
    train_words = [u.words for u in bundle.train_utts]
    wlm = estimate_word_lm(train_words, cfg.vocab_size)
    dg = build_decoding_graph(Lexicon(prons), wlm, topo, tree)
    fourgram = estimate_ngram_lm([[str(w) for w in s] for s in train_words],
                                 order=4)
    rnn_cfg = RnnLMConfig(vocab_size=cfg.vocab_size, embed_dim=32,
                          hidden_dim=64, dropout=0.0)
    rnn_params, ppl = train_rnnlm(train_words, rnn_cfg, num_steps=300,
                                  batch_size=16, lr=5e-3)
    rnn = RnnLMScorer(rnn_cfg, rnn_params)
    print(f"rnnlm ppl: {ppl:.1f}", flush=True)

    from tdnnf_nas_tpu.data.native import generate_lattice_native, get_lib
    from tdnnf_nas_tpu.decode.lattice import (
        generate_lattice, lattice_oracle_wer, rescore_lattice,
        rescore_lattice_rnnlm,
    )

    gen_lattice = (generate_lattice_native if get_lib() is not None
                   else generate_lattice)
    left, right = model_context(model_cfg)
    refs, first, four_h, rnn_h = [], [], [], []
    lat_four_h, lat_rnn_h, oracle_errs, ref_words_total = [], [], 0, 0
    # bucket input lengths to multiples of 32 output frames => few compiles
    bucket = 32
    for utt in bundle.dev_utts:
        t_out = len(utt.pdf_align)
        t_pad = ((t_out + bucket - 1) // bucket) * bucket
        need = left + (t_pad - 1) * 3 + 1 + right
        feats = np.concatenate([
            np.repeat(utt.feats[:1], left, 0), utt.feats,
            np.repeat(utt.feats[-1:], need, 0),
        ])[None][:, :need]
        chain, _, _ = apply_model(model_cfg, state.params, state.bn_state,
                                  jnp.asarray(feats), train=False)
        obs = np.asarray(chain[0])[:t_out]
        nb = nbest_decode(obs, dg, n=10)
        if not nb:
            continue
        refs.append(utt.words)
        first.append(nb[0][0])
        four_h.append(rescore_nbest(nb, wlm, fourgram, lm_scale=1.0)[0][0])
        rnn_h.append(rescore_nbest(nb, wlm, rnn, lm_scale=1.0,
                                   word_to_token=lambda w: w)[0][0])
        lat = gen_lattice(obs, dg, beam=16.0, lattice_beam=8.0)
        lat_four_h.append(rescore_lattice(lat, wlm, fourgram, lm_scale=1.0,
                                          n=1)[0][0])
        lat_rnn_h.append(rescore_lattice_rnnlm(lat, wlm, rnn, lm_scale=1.0,
                                               n=1)[0][0])
        oracle_errs += lattice_oracle_wer(lat, utt.words)
        ref_words_total += len(utt.words)
    out = {
        "first_pass_wer": score_corpus(refs, first)["wer"],
        "fourgram_rescored_wer": score_corpus(refs, four_h)["wer"],
        "rnnlm_rescored_wer": score_corpus(refs, rnn_h)["wer"],
        "lattice_fourgram_wer": score_corpus(refs, lat_four_h)["wer"],
        "lattice_rnnlm_wer": score_corpus(refs, lat_rnn_h)["wer"],
        "lattice_oracle_wer": 100.0 * oracle_errs / max(ref_words_total, 1),
        "num_utts": len(refs),
        "train_objf": metrics.last("objf_mmi"),
        "rnnlm_ppl": ppl,
    }
    print(json.dumps(out, indent=1), flush=True)
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "docs", "wer_synthetic.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 300)
