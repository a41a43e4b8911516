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


def test_adaptive_beam_retry(setup, monkeypatch):
    """retry_beam re-decodes with a doubled beam on search death (Kaldi
    decode.sh retry semantics); without it the death propagates."""
    import tdnnf_nas_tpu.decode.beam as B

    cfg, utts, word_seqs, tree, g = setup
    obs = _oracle_obs(utts[0], tree)
    calls = []
    real = B._beam_decode_once

    def flaky(o, gg, ac, beam, *a, **k):
        calls.append(beam)
        if beam < 30.0:
            raise B.BeamSearchDied("forced death")
        return real(o, gg, ac, beam, *a, **k)

    monkeypatch.setattr(B, "_beam_decode_once", flaky)
    res = B.beam_decode_sparse(obs, g, beam=8.0, retry_beam=32.0,
                               native="never")
    assert calls == [8.0, 16.0, 32.0]
    assert res.words == utts[0].words
    calls.clear()
    with pytest.raises(B.BeamSearchDied):
        B.beam_decode_sparse(obs, g, beam=8.0, native="never")
    assert calls == [8.0]


def test_parallel_decode_workers_match_serial(setup):
    """Forked per-utterance decode workers (decode.sh --nj equivalent)
    return exactly the serial results."""
    import multiprocessing as mp

    from tdnnf_nas_tpu.recipes import chain_recipes as cr

    cfg, utts, word_seqs, tree, g = setup
    outs = [_oracle_obs(u, tree) for u in utts[:6]]
    kw = dict(acoustic_scale=1.0, beam=14.0, max_active=7000, lattice=True,
              lattice_beam=7.0, retry_beam=56.0)
    cr._DECODE_SHARED = (g, outs, kw)
    try:
        with mp.get_context("fork").Pool(2) as pool:
            res = pool.map(cr._decode_worker, range(len(outs)), chunksize=1)
    finally:
        cr._DECODE_SHARED = None
    res.sort(key=lambda r: r[0])
    for i, words, lat in res:
        ser = beam_decode_sparse(outs[i], g, **kw)
        assert words == ser.words
        assert lat is not None and lat.num_arcs == ser.lattice.num_arcs


def test_unigram_backoff_keeps_true_left_context():
    """Word pairs reachable only through the backoff (unigram) junction
    still get word-initial pdfs keyed by the TRUE predecessor final phone:
    the unigram junction is split per predecessor-final-phone (exact
    cross-word left context everywhere, the full-C-composition behavior)."""
    from tdnnf_nas_tpu.graphs.topology import BiphoneTree, ChainTopology

    P = 4
    tree = BiphoneTree(P)  # full table: every (left, phone) a distinct pdf
    topo = ChainTopology(P)
    prons = {0: (0, 1), 1: (2, 3), 2: (1, 2)}  # A, B, C
    word_sym = ["A", "B", "C"]
    # training text never contains the pair (A, B) -> decode of "A B" must
    # traverse the backoff path through the unigram junction
    text = [["A", "C"], ["C", "B"], ["B", "A"], ["A", "C"], ["C", "A"],
            ["B", "C"], ["C", "B"], ["A", "C", "B", "A"]]
    lm = estimate_ngram_lm(text, order=2)
    assert ("A", "B") not in lm.logprobs
    g = build_hclg_sparse(Lexicon(prons), lm, word_sym, topo, tree)

    # oracle obs for "A B" with TRUE biphone context across the boundary
    seq = [(0, -1), (1, 0), (2, 1), (3, 2)]  # (phone, left)
    pdfs = []
    for p, l in seq:
        pdfs.append(tree.forward_pdf(p, l))
        pdfs.append(tree.self_loop_pdf(p))
    obs = np.full((len(pdfs), tree.num_pdfs), -10.0, np.float32)
    obs[np.arange(len(pdfs)), pdfs] = 0.0
    res = beam_decode_sparse(obs, g, beam=20.0, max_active=5000)
    assert res.words == [0, 1], res.words
