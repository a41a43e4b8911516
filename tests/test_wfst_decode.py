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


def test_crossword_graph_equivalent_with_ci_tree(word_world):
    """With a context-independent tree the cross-word graph is language-
    equivalent to the within-word graph: same decoded words, same score."""
    from tdnnf_nas_tpu.decode.wfst import build_decoding_graph_crossword

    cfg, utts, lex, wlm, dg, tree, topo, _ = word_world
    dgx = build_decoding_graph_crossword(lex, wlm, topo, tree)
    # rows stochastic incl. final (unreachable variants have zero rows)
    row = dgx.graph.trans.sum(1) + dgx.graph.final
    nz = row > 1e-6
    np.testing.assert_allclose(row[nz], 1.0, atol=1e-4)
    for utt in utts[:3]:
        t = len(utt.pdf_align)
        obs = np.full((1, t, tree.num_pdfs), -10.0, np.float32)
        obs[0, np.arange(t), utt.pdf_align] = 0.0
        h1, s1 = decode_words(obs, dg)
        h2, s2 = decode_words(obs, dgx)
        assert h2[0] == h1[0] == utt.words
        np.testing.assert_allclose(s2[0], s1[0], rtol=1e-5)


def test_crossword_graph_uses_true_left_context():
    """With a biphone tree, word-initial enter states carry pdfs keyed by
    the PREDECESSOR word's final phone (not BOS)."""
    from tdnnf_nas_tpu.graphs.topology import BiphoneTree, ChainTopology
    from tdnnf_nas_tpu.decode.wfst import (Lexicon, WordLM,
                                           build_decoding_graph_crossword,
                                           decode_words)

    num_phones = 4
    tree = BiphoneTree(num_phones)
    topo = ChainTopology(num_phones)
    lex = Lexicon({0: (0, 1), 1: (2,), 2: (3, 0)})
    probs = np.full((4, 3), 1.0 / 3, np.float32)
    wlm = WordLM(probs=probs, final=np.full((4,), 1.0 / 3, np.float32),
                 num_words=3)
    dgx = build_decoding_graph_crossword(lex, wlm, topo, tree)
    g = dgx.graph

    # follow word 1 (final phone 2) -> word 0 (first phone 0): the enter
    # state reached must emit forward_pdf(0, left=2)
    want_pdf = tree.forward_pdf(0, 2)
    bos_pdf = tree.forward_pdf(0, -1)
    assert want_pdf != bos_pdf
    # find word-1's final state(s) and the word-0 enter states they reach
    src_states = [s for s in range(g.num_states)
                  if dgx.word_of_state[s] == 1 or
                  (g.state_pdf[s] == tree.self_loop_pdf(2) and
                   dgx.word_of_state[s] == -1)]
    reached_pdfs = set()
    for s in src_states:
        for d in np.nonzero(g.trans[s])[0]:
            if dgx.word_of_state[d] == 0:
                reached_pdfs.add(int(g.state_pdf[d]))
    assert reached_pdfs == {want_pdf}

    # synthesize an utterance "1 0" with the TRUE cross-word pdfs and check
    # exact recovery
    pdfs = [tree.forward_pdf(2, -1), tree.self_loop_pdf(2),
            tree.forward_pdf(0, 2), tree.self_loop_pdf(0),
            tree.forward_pdf(1, 0), tree.self_loop_pdf(1)]
    t = len(pdfs)
    obs = np.full((1, t, tree.num_pdfs), -10.0, np.float32)
    obs[0, np.arange(t), pdfs] = 0.0
    hyps, _ = decode_words(obs, dgx)
    assert hyps[0] == [1, 0], hyps[0]
