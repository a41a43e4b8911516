"""Word-level decoding graph tests: planted recovery + trained-model WER."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tdnnf_nas_tpu.data.synthetic import WordCorpusConfig, make_word_corpus
from tdnnf_nas_tpu.decode.wfst import (
    Lexicon, estimate_word_lm, build_decoding_graph, decode_words,
)
from tdnnf_nas_tpu.decode.scoring import score_corpus


@pytest.fixture(scope="module")
def word_world():
    cfg = WordCorpusConfig()
    utts, prons, word_seqs, phone_seqs, tree, topo = make_word_corpus(cfg)
    lex = Lexicon(prons)
    wlm = estimate_word_lm(word_seqs, cfg.vocab_size)
    dg = build_decoding_graph(lex, wlm, topo, tree)
    return cfg, utts, lex, wlm, dg, tree, topo, phone_seqs


def test_graph_shapes_and_stochastic(word_world):
    cfg, utts, lex, wlm, dg, tree, *_ = word_world
    g = dg.graph
    s = sum(2 * len(p) for p in lex.prons.values())
    assert g.num_states == s
    # rows stochastic including final
    row = g.trans.sum(1) + g.final
    np.testing.assert_allclose(row, 1.0, atol=1e-4)
    assert (dg.word_of_state >= 0).sum() == lex.num_words


def test_planted_word_recovery(word_world):
    cfg, utts, lex, wlm, dg, tree, topo, _ = word_world
    # build obs that strongly favor the true pdf sequence of an utterance
    utt = utts[0]
    t = len(utt.pdf_align)
    obs = np.full((1, t, tree.num_pdfs), -10.0, np.float32)
    obs[0, np.arange(t), utt.pdf_align] = 0.0
    hyps, scores = decode_words(obs, dg)
    assert hyps[0] == utt.words, (hyps[0], utt.words)


def test_trained_model_word_wer(word_world):
    """Train a tiny model on the word corpus, decode words, check WER sane."""
    cfg, utts, lex, wlm, dg, tree, topo, phone_seqs = word_world
    from tdnnf_nas_tpu.models import TdnnfModelConfig, model_context, apply_model
    from tdnnf_nas_tpu.recipes import prepare_data, train_model
    from tdnnf_nas_tpu.train import TrainerConfig, OptimizerConfig, init_train_state

    bundle = prepare_data(utts, phone_seqs, tree, topo, cfg.num_phones,
                          dev_fraction=0.15)
    model_cfg = TdnnfModelConfig(
        feat_dim=cfg.feat_dim, ivector_dim=0, hidden_dim=32, bottleneck_dim=8,
        time_strides=(1, 2), num_pdfs=tree.num_pdfs, prefinal_big=32,
        prefinal_small=16, compute_dtype="float32",
    )
    tr = TrainerConfig(optimizer=OptimizerConfig(kind="adam", lr_initial=3e-3,
                                                 lr_final=1e-3, num_steps=80))
    state, _ = train_model(bundle, model_cfg, tr, num_steps=80, batch_size=8,
                           chunk_width=14, seed=0)

    left, right = model_context(model_cfg)
    refs, hyps = [], []
    for utt in bundle.dev_utts:
        t_out = len(utt.pdf_align)
        feats = np.concatenate([
            np.repeat(utt.feats[:1], left, 0), utt.feats,
            np.repeat(utt.feats[-1:], right + 2, 0),
        ])[None]
        need = left + (t_out - 1) * 3 + 1 + right
        chain, _, _ = apply_model(model_cfg, state.params, state.bn_state,
                                  jnp.asarray(feats[:, :need]), train=False)
        h, _ = decode_words(np.asarray(chain), dg)
        hyps.append(h[0])
        refs.append(utt.words)
    trained = score_corpus(refs, hyps)

    rand_state = init_train_state(model_cfg, tr, jax.random.PRNGKey(123))
    hyps_r = []
    for utt in bundle.dev_utts:
        t_out = len(utt.pdf_align)
        feats = np.concatenate([
            np.repeat(utt.feats[:1], left, 0), utt.feats,
            np.repeat(utt.feats[-1:], right + 2, 0),
        ])[None]
        need = left + (t_out - 1) * 3 + 1 + right
        chain, _, _ = apply_model(model_cfg, rand_state.params,
                                  rand_state.bn_state,
                                  jnp.asarray(feats[:, :need]), train=False)
        h, _ = decode_words(np.asarray(chain), dg)
        hyps_r.append(h[0])
    random_res = score_corpus(refs, hyps_r)
    assert trained["wer"] < random_res["wer"], (trained, random_res)
    assert trained["wer"] < 90.0, trained
