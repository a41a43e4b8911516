"""Sparse HCLG (decode/graph_sparse.py) + beam decoder (decode/beam.py).

Reference anchors: `utils/mkgraph.sh` (HCLG over the sw1_tg 3-gram),
``nnet3-latgen-faster`` beam search + lattices
(`run_tdnn_7q_fbk_40_manual.sh:216-237`)."""

import numpy as np
import pytest

from tdnnf_nas_tpu.data.synthetic import WordCorpusConfig, make_word_corpus
from tdnnf_nas_tpu.decode.beam import beam_decode_sparse
from tdnnf_nas_tpu.decode.graph_sparse import build_hclg_sparse
from tdnnf_nas_tpu.decode.lattice import lattice_best_path, lattice_nbest
from tdnnf_nas_tpu.decode.scoring import score_corpus
from tdnnf_nas_tpu.decode.wfst import Lexicon
from tdnnf_nas_tpu.lm.ngram import estimate_ngram_lm


@pytest.fixture(scope="module")
def setup():
    cfg = WordCorpusConfig(vocab_size=14, num_phones=8, num_utts=40,
                           min_words=3, max_words=7, seed=5)
    utts, prons, word_seqs, phone_seqs, tree, topo = make_word_corpus(cfg)
    word_sym = [f"w{w}" for w in range(cfg.vocab_size)]
    lm = estimate_ngram_lm(
        [[word_sym[w] for w in ws] for ws in word_seqs], order=3)
    lex = Lexicon(prons)
    g = build_hclg_sparse(lex, lm, word_sym, topo, tree)
    return cfg, utts, word_seqs, tree, g


def _oracle_obs(utt, tree, noise=0.0, rng=None):
    t = len(utt.pdf_align)
    obs = np.full((t, tree.num_pdfs), -8.0, np.float32)
    obs[np.arange(t), utt.pdf_align] = 0.0
    if noise and rng is not None:
        obs += noise * rng.randn(t, tree.num_pdfs).astype(np.float32)
    return obs


def test_graph_structure(setup):
    cfg, utts, word_seqs, tree, g = setup
    assert g.num_states > 100
    assert (g.state_pdf[: 1] == -1).all() or (g.state_pdf == -1).any()
    # CSR consistent
    assert g.out_start[-1] == g.num_arcs
    assert (g.arc_dst < g.num_states).all()
    # some word labels and some epsilon arcs
    assert (g.arc_word >= 0).any() and (g.arc_word < 0).any()
    # junctions have final weights; emitting states never do
    em = g.state_pdf >= 0
    assert (g.final_w[em] <= -1e29).all()
    assert (g.final_w[~em] > -1e29).any()


def test_beam_decode_recovers_words(setup):
    cfg, utts, word_seqs, tree, g = setup
    refs, hyps = [], []
    for utt, ws in list(zip(utts, word_seqs))[:12]:
        res = beam_decode_sparse(_oracle_obs(utt, tree), g, beam=14.0)
        refs.append(ws)
        hyps.append(res.words)
    rep = score_corpus(refs, hyps)
    assert rep["wer"] < 0.05, (rep, refs[:3], hyps[:3])


def test_beam_invariance_to_wide_beam(setup):
    cfg, utts, word_seqs, tree, g = setup
    rng = np.random.RandomState(0)
    for utt in utts[:6]:
        obs = _oracle_obs(utt, tree, noise=1.0, rng=rng)
        a = beam_decode_sparse(obs, g, beam=20.0, max_active=10_000)
        b = beam_decode_sparse(obs, g, beam=200.0, max_active=10 ** 9)
        assert a.words == b.words
        assert abs(a.score - b.score) < 1e-3


def test_lattice_contains_best_path(setup):
    cfg, utts, word_seqs, tree, g = setup
    rng = np.random.RandomState(1)
    for utt in utts[:6]:
        obs = _oracle_obs(utt, tree, noise=1.0, rng=rng)
        res = beam_decode_sparse(obs, g, beam=16.0, lattice=True,
                                 lattice_beam=8.0)
        words, score = lattice_best_path(res.lattice)
        assert words == res.words, (words, res.words)
        assert abs(score - res.score) < 0.1, (score, res.score)
        # n-best: best entry == best path, scores non-increasing
        nb = lattice_nbest(res.lattice, n=5)
        assert nb[0][0] == res.words
        scs = [s for _, s in nb]
        assert all(scs[i] >= scs[i + 1] - 1e-6 for i in range(len(scs) - 1))


def test_tighter_beam_still_accurate_with_clean_obs(setup):
    cfg, utts, word_seqs, tree, g = setup
    refs, hyps = [], []
    for utt, ws in list(zip(utts, word_seqs))[:8]:
        res = beam_decode_sparse(_oracle_obs(utt, tree), g, beam=8.0,
                                 max_active=500)
        refs.append(ws)
        hyps.append(res.words)
    rep = score_corpus(refs, hyps)
    assert rep["wer"] < 0.05, rep
