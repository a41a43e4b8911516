"""Native (C++) egs builder vs the Python reference — bit-for-bit."""

import numpy as np
import pytest

from tdnnf_nas_tpu.data.native import (
    get_lib,
    build_supervision_batch_native,
    edit_distance_batch_native,
    tree_tables,
    den_init_tables,
)
from tdnnf_nas_tpu.graphs import (
    ChainTopology,
    ContextIndependentTree,
    estimate_phone_lm,
    build_denominator_graph,
    den_init_lookup,
    make_chunk_supervision,
)
from tdnnf_nas_tpu.decode.scoring import edit_distance

pytestmark = pytest.mark.skipif(get_lib() is None, reason="native lib unavailable")


def test_native_supervision_matches_python():
    num_phones = 6
    rng = np.random.RandomState(0)
    seqs = [rng.randint(0, num_phones, size=8).tolist() for _ in range(30)]
    lm = estimate_phone_lm(seqs, num_phones)
    topo = ChainTopology(num_phones)
    tree = ContextIndependentTree(num_phones)
    den = build_denominator_graph(lm, topo, tree)
    init_fn = den_init_lookup(den, num_phones)

    t_frames, max_states, tol = 14, 12, 2
    cases = [
        ([1, 3, 0, 2], [0, 3, 7, 11], [2, 6, 10, 13]),
        ([5, 4], [0, 8], [7, 13]),
        ([2, 2, 1], [1, 5, 9], [4, 8, 13]),
    ]
    fwd, slf = tree_tables(tree, num_phones)
    de, dl = den_init_tables(den, num_phones)
    out = build_supervision_batch_native(
        [c[0] for c in cases], [c[1] for c in cases], [c[2] for c in cases],
        lm.probs, fwd, slf, de, dl, topo.self_loop_prob, tol, t_frames,
        max_states,
    )
    for i, (ph, bg, en) in enumerate(cases):
        ref = make_chunk_supervision(ph, bg, en, lm, topo, tree, t_frames,
                                     max_states, tol=tol, den_init_fn=init_fn)
        np.testing.assert_allclose(out["trans"][i], ref.trans, atol=1e-6)
        np.testing.assert_array_equal(out["state_pdf"][i], ref.state_pdf)
        np.testing.assert_allclose(out["init"][i], ref.init, atol=1e-6)
        np.testing.assert_allclose(out["final"][i], ref.final, atol=1e-6)
        np.testing.assert_allclose(out["mask"][i], ref.mask, atol=1e-6)


def test_native_unaligned_mode():
    num_phones = 4
    rng = np.random.RandomState(1)
    seqs = [rng.randint(0, num_phones, size=6).tolist() for _ in range(20)]
    lm = estimate_phone_lm(seqs, num_phones)
    topo = ChainTopology(num_phones)
    tree = ContextIndependentTree(num_phones)
    fwd, slf = tree_tables(tree, num_phones)
    out = build_supervision_batch_native(
        [[0, 1, 2]], None, None, lm.probs, fwd, slf, None, None,
        topo.self_loop_prob, 2, 10, 8,
    )
    ref = make_chunk_supervision([0, 1, 2], None, None, lm, topo, tree, 10, 8)
    np.testing.assert_allclose(out["trans"][0], ref.trans, atol=1e-6)
    np.testing.assert_allclose(out["mask"][0], ref.mask, atol=1e-6)
    np.testing.assert_allclose(out["init"][0], ref.init, atol=1e-6)


def test_native_edit_distance():
    rng = np.random.RandomState(2)
    refs = [rng.randint(0, 5, size=rng.randint(1, 12)).tolist() for _ in range(25)]
    hyps = [rng.randint(0, 5, size=rng.randint(1, 12)).tolist() for _ in range(25)]
    out = edit_distance_batch_native(refs, hyps)
    for i, (r, h) in enumerate(zip(refs, hyps)):
        c = edit_distance(r, h)
        total_native = out[i, 0] + out[i, 1] + out[i, 2]
        total_py = c["sub"] + c["ins"] + c["del"]
        assert total_native == total_py, (i, out[i], c)
        assert out[i, 3] + out[i, 0] + out[i, 2] == len(r)


def test_native_nbest_matches_python():
    from tdnnf_nas_tpu.data.synthetic import WordCorpusConfig, make_word_corpus
    from tdnnf_nas_tpu.decode.wfst import Lexicon, estimate_word_lm, build_decoding_graph
    from tdnnf_nas_tpu.decode.nbest import nbest_decode
    from tdnnf_nas_tpu.data.native import nbest_decode_native

    cfg = WordCorpusConfig(num_utts=6, vocab_size=8)
    utts, prons, word_seqs, _, tree, topo = make_word_corpus(cfg)
    dg = build_decoding_graph(Lexicon(prons),
                              estimate_word_lm(word_seqs, cfg.vocab_size),
                              topo, tree)
    rng = np.random.RandomState(0)
    for utt in utts[:3]:
        t = len(utt.pdf_align)
        obs = np.full((t, tree.num_pdfs), -5.0, np.float32)
        obs[np.arange(t), utt.pdf_align] = 0.0
        obs += rng.randn(t, tree.num_pdfs).astype(np.float32) * 0.5
        py = nbest_decode(obs, dg, n=5)
        nat = nbest_decode_native(obs, dg, n=5)
        assert len(nat) == len(py)
        for (wp, sp), (wn, sn) in zip(py, nat):
            assert wp == wn, (wp, wn)
            np.testing.assert_allclose(sp, sn, rtol=1e-4, atol=1e-3)


def test_native_beam_sparse_matches_python():
    """C++ beam+lattice decoder == the numpy reference on a real HCLG
    (words, score, and lattice best path), incl. the died->retry path."""
    from tdnnf_nas_tpu.data.synthetic import WordCorpusConfig, make_word_corpus
    from tdnnf_nas_tpu.decode.beam import beam_decode_sparse
    from tdnnf_nas_tpu.decode.graph_sparse import build_hclg_sparse
    from tdnnf_nas_tpu.decode.lattice import lattice_best_path
    from tdnnf_nas_tpu.decode.wfst import Lexicon
    from tdnnf_nas_tpu.lm.ngram import estimate_ngram_lm
    from tdnnf_nas_tpu.data.native import get_lib

    if get_lib() is None:
        pytest.skip("native library unavailable")
    cfg = WordCorpusConfig(vocab_size=40, num_phones=10, feat_dim=12,
                           num_utts=24, min_words=2, max_words=6, seed=3)
    utts, prons, word_seqs, _, tree, topo = make_word_corpus(cfg)
    word_sym = [f"w{w}" for w in range(cfg.vocab_size)]
    lm = estimate_ngram_lm([[word_sym[w] for w in ws] for ws in word_seqs],
                           order=3)
    g = build_hclg_sparse(Lexicon(prons), lm, word_sym, topo, tree)
    rng = np.random.RandomState(0)
    for utt in utts[:8]:
        t = len(utt.pdf_align)
        obs = np.full((t, tree.num_pdfs), -5.0, np.float32)
        obs[np.arange(t), utt.pdf_align] = 0.0
        obs += rng.randn(t, tree.num_pdfs).astype(np.float32) * 0.5
        kw = dict(beam=12.0, max_active=500, retry_beam=48.0,
                  lattice=True, lattice_beam=6.0)
        py = beam_decode_sparse(obs, g, native="never", **kw)
        nat = beam_decode_sparse(obs, g, native="always", **kw)
        assert nat.words == py.words
        assert abs(nat.score - py.score) < 1e-3
        # lattice equivalence: same best path words + score
        pw, ps = lattice_best_path(py.lattice)
        nw, ns = lattice_best_path(nat.lattice)
        assert nw == pw
        assert abs(ns - ps) < 1e-3
        assert nat.lattice.num_arcs == py.lattice.num_arcs
