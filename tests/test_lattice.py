"""Lattice generation, operations, rescoring, and native-equivalence tests."""

import numpy as np
import pytest

from tdnnf_nas_tpu.data.synthetic import WordCorpusConfig, make_word_corpus
from tdnnf_nas_tpu.decode.lattice import (
    generate_lattice, lattice_best_path, lattice_nbest,
    lattice_arc_posteriors, lattice_oracle_wer, rescore_lattice,
    rescore_lattice_rnnlm,
)
from tdnnf_nas_tpu.decode.nbest import nbest_decode
from tdnnf_nas_tpu.decode.rescore import rescore_nbest
from tdnnf_nas_tpu.decode.wfst import (
    Lexicon, WordLM, build_decoding_graph, decode_words, estimate_word_lm,
)
from tdnnf_nas_tpu.graphs.topology import ChainTopology, ContextIndependentTree
from tdnnf_nas_tpu.lm.ngram import estimate_ngram_lm


@pytest.fixture(scope="module")
def world():
    cfg = WordCorpusConfig(num_utts=10)
    utts, prons, word_seqs, _, tree, topo = make_word_corpus(cfg)
    dg = build_decoding_graph(Lexicon(prons),
                              estimate_word_lm(word_seqs, cfg.vocab_size),
                              topo, tree)
    utt = utts[0]
    t = len(utt.pdf_align)
    obs = np.full((t, tree.num_pdfs), -4.0, np.float32)
    obs[np.arange(t), utt.pdf_align] = 0.0
    return cfg, utts, dg, obs, tree


def test_lattice_best_path_matches_viterbi(world):
    cfg, utts, dg, obs, tree = world
    lat = generate_lattice(obs, dg, beam=1e9, lattice_beam=10.0)
    words, score = lattice_best_path(lat)
    hyps, scores = decode_words(obs[None], dg)
    assert words == hyps[0]
    np.testing.assert_allclose(score, float(scores[0]), atol=1e-3)


def test_lattice_nbest_matches_exact_nbest(world):
    cfg, utts, dg, obs, tree = world
    lat = generate_lattice(obs, dg, beam=1e9, lattice_beam=25.0)
    ln = lattice_nbest(lat, n=5)
    nb = nbest_decode(obs, dg, n=5)
    # same score ranking; sequences equal where scores are untied
    np.testing.assert_allclose([s for _, s in ln], [s for _, s in nb],
                               atol=1e-3)
    assert [w for w, _ in ln[:3]] == [w for w, _ in nb[:3]]


def test_lattice_posteriors_conserved(world):
    cfg, utts, dg, obs, tree = world
    lat = generate_lattice(obs, dg, beam=1e9, lattice_beam=15.0)
    post, log_z = lattice_arc_posteriors(lat)
    assert np.isfinite(log_z)
    # flow conservation: posterior out of start and into end each sum to 1
    np.testing.assert_allclose(post[lat.arc_src == lat.start].sum(), 1.0,
                               atol=1e-4)
    np.testing.assert_allclose(post[lat.arc_dst == lat.end].sum(), 1.0,
                               atol=1e-4)
    # every time cut carries total posterior 1 (arcs are time-synchronous)
    for t in range(1, int(lat.node_time.max()) + 1):
        cut = lat.node_time[lat.arc_dst] == t
        np.testing.assert_allclose(post[cut].sum(), 1.0, atol=1e-4)


def test_lattice_oracle(world):
    cfg, utts, dg, obs, tree = world
    lat = generate_lattice(obs, dg, beam=1e9, lattice_beam=20.0)
    best_words, _ = lattice_best_path(lat)
    ref = utts[0].words
    oracle = lattice_oracle_wer(lat, ref)
    best_errs = lattice_oracle_wer(lat, best_words)  # 0 by definition
    assert best_errs == 0
    # oracle <= errors of the best path vs ref
    from tdnnf_nas_tpu.decode.scoring import edit_distance
    d = edit_distance(ref, best_words)
    assert oracle <= d["sub"] + d["ins"] + d["del"]
    # truth is in the lattice under these easy acoustics
    assert oracle == 0


def test_lattice_beam_monotone(world):
    cfg, utts, dg, obs, tree = world
    wide = generate_lattice(obs, dg, beam=1e9, lattice_beam=20.0)
    narrow = generate_lattice(obs, dg, beam=1e9, lattice_beam=2.0)
    assert narrow.num_arcs <= wide.num_arcs
    assert lattice_best_path(narrow)[0] == lattice_best_path(wide)[0]


def _homophone_setup():
    num_phones = 3
    tree = ContextIndependentTree(num_phones)
    topo = ChainTopology(num_phones)
    prons = {0: (0, 1), 1: (2,), 2: (0, 1)}  # 0 and 2 homophones
    p = np.full((4, 3), 1.0 / 3 * 0.8, np.float32)
    fin = np.full((4,), 0.2, np.float32)
    wlm = WordLM(probs=p, final=fin, num_words=3)
    dg = build_decoding_graph(Lexicon(prons), wlm, topo, tree)
    pdfs = []
    for ph in (2, 0, 1):
        pdfs += [tree.forward_pdf(ph), tree.self_loop_pdf(ph)]
    t = len(pdfs)
    obs = np.full((t, tree.num_pdfs), -8.0, np.float32)
    obs[np.arange(t), pdfs] = 0.0
    return dg, wlm, obs


def test_lattice_rescoring_matches_nbest_rescoring():
    dg, wlm, obs = _homophone_setup()
    big = estimate_ngram_lm([["1", "2"]] * 50, order=3)
    lat = generate_lattice(obs, dg, beam=1e9, lattice_beam=30.0)
    lat_out = rescore_lattice(lat, wlm, big, lm_scale=1.0, n=3)
    nb = nbest_decode(obs, dg, n=6)
    nb_out = rescore_nbest(nb, wlm, big, lm_scale=1.0)
    assert lat_out[0][0] == nb_out[0][0] == [1, 2]
    np.testing.assert_allclose(lat_out[0][1], nb_out[0][1], atol=1e-3)


def test_lattice_rnnlm_rescoring_fixes_homophones():
    dg, wlm, obs = _homophone_setup()
    from tdnnf_nas_tpu.lm.rnnlm import RnnLMConfig, train_rnnlm, RnnLMScorer

    cfg = RnnLMConfig(vocab_size=3, embed_dim=8, hidden_dim=16, dropout=0.0)
    params, _ = train_rnnlm([[1, 2]] * 8, cfg, num_steps=120, batch_size=8)
    scorer = RnnLMScorer(cfg, params)
    lat = generate_lattice(obs, dg, beam=1e9, lattice_beam=30.0)
    out = rescore_lattice_rnnlm(lat, wlm, scorer, lm_scale=1.0, n=2)
    assert out[0][0] == [1, 2], out


def test_rnnlm_incremental_matches_full_score():
    from tdnnf_nas_tpu.lm.rnnlm import RnnLMConfig, init_rnnlm, RnnLMScorer
    import jax
    import math

    cfg = RnnLMConfig(vocab_size=5, embed_dim=8, hidden_dim=16, dropout=0.0)
    params = init_rnnlm(cfg, jax.random.PRNGKey(3))
    scorer = RnnLMScorer(cfg, params)
    words = [2, 0, 4, 1]
    st = scorer.initial_state()
    total = 0.0
    for w in words:
        lp, st = scorer.advance(st, w)
        total += lp
    total += scorer.final_logprob(st)
    np.testing.assert_allclose(total, scorer.score(words) * math.log(10.0),
                               rtol=1e-4, atol=1e-4)


def test_native_lattice_matches_python(world):
    cfg, utts, dg, obs, tree = world
    from tdnnf_nas_tpu.data.native import generate_lattice_native, get_lib

    if get_lib() is None:
        pytest.skip("native library unavailable")
    for lb in (3.0, 12.0):
        py = generate_lattice(obs, dg, beam=14.0, lattice_beam=lb)
        nat = generate_lattice_native(obs, dg, beam=14.0, lattice_beam=lb)
        assert nat.num_nodes == py.num_nodes
        assert nat.num_arcs == py.num_arcs
        np.testing.assert_array_equal(nat.node_time, py.node_time)
        np.testing.assert_array_equal(nat.arc_src, py.arc_src)
        np.testing.assert_array_equal(nat.arc_dst, py.arc_dst)
        np.testing.assert_array_equal(nat.arc_word, py.arc_word)
        np.testing.assert_allclose(nat.arc_am, py.arc_am, atol=1e-4)
        np.testing.assert_allclose(nat.arc_gs, py.arc_gs, atol=1e-4)


def test_lattice_determinize(world):
    """determinize_lattice: each word sequence at most once, best score
    preserved, no interior epsilons, downstream ops still work."""
    from tdnnf_nas_tpu.decode.lattice import determinize_lattice

    cfg, utts, dg, obs, tree = world
    lat = generate_lattice(obs, dg, beam=1e9, lattice_beam=20.0)
    det = determinize_lattice(lat)

    # best path identical (words and score)
    w1, s1 = lattice_best_path(lat)
    w2, s2 = lattice_best_path(det)
    assert w2 == w1
    np.testing.assert_allclose(s2, s1, rtol=1e-5)

    # epsilons only into the super-end
    eps = det.arc_word < 0
    assert (det.arc_dst[eps] == det.end).all()

    # n-best of det has unique word sequences with scores matching the
    # deduped n-best of the original
    nb_raw = lattice_nbest(lat, n=50)
    best_raw = {}
    for words, sc in nb_raw:
        k = tuple(words)
        if k not in best_raw or sc > best_raw[k]:
            best_raw[k] = sc
    nb_det = lattice_nbest(det, n=20)
    seqs = [tuple(w) for w, _ in nb_det]
    assert len(seqs) == len(set(seqs))  # deterministic => unique
    for words, sc in nb_det[:10]:
        k = tuple(words)
        if k in best_raw:
            np.testing.assert_allclose(sc, best_raw[k], rtol=1e-5)


class _ZeroScorer:
    """RNNLM stand-in contributing nothing — isolates the old-LM removal."""

    def initial_state(self):
        return None

    def advance(self, state, word):
        return 0.0, None

    def final_logprob(self, state):
        return 0.0


def test_lattice_rnnlm_rescoring_nonstr_word_symbols():
    """ADVICE r2 (high): with an NGramLM old LM and non-str word symbols
    the old-LM removal must go through word_to_token — otherwise every
    lookup misses vocab and adds the unknown-word floor to each path."""
    import math

    from tdnnf_nas_tpu.lm.ngram import BOS, EOS

    dg, wlm, obs = _homophone_setup()
    lat = generate_lattice(obs, dg, beam=1e9, lattice_beam=30.0)
    wtt = lambda w: f"w{w}"
    texts = [[wtt(1), wtt(2)]] * 20 + [[wtt(0)], [wtt(2), wtt(1)]]
    old = estimate_ngram_lm(texts, order=2)
    out = rescore_lattice_rnnlm(lat, old, _ZeroScorer(), lm_scale=1.0,
                                word_to_token=wtt, n=1)
    words, sc = out[0]
    # expected: lattice base score of that word sequence minus the old-LM
    # logprob of the sequence in TOKEN space
    base = {tuple(w): s for w, s in lattice_nbest(lat, n=50)[::-1]}
    ln10 = math.log(10.0)
    ctx, old_lp = (BOS,), 0.0
    for w in words:
        old_lp += old.log_prob_word(ctx, wtt(w)) * ln10
        ctx = (ctx + (wtt(w),))[-(old.order - 1):]
    old_lp += old.log_prob_word(ctx, EOS) * ln10
    expected = base[tuple(words)] - old_lp
    np.testing.assert_allclose(sc, expected, atol=1e-3)
    # regression guard: a str() lookup would hit the -99 unknown floor
    assert abs(sc - expected) < 50.0


def test_batched_lattice_rnnlm_matches_incremental(world):
    """rescore_lattices_rnnlm (frontier-batched, one device call per
    longest-path level across ALL lattices) must reproduce
    rescore_lattice_rnnlm exactly: same word sequences and scores, with a
    real RnnLMScorer, an n-gram old LM, and interpolation."""
    import jax

    from tdnnf_nas_tpu.decode.lattice import rescore_lattices_rnnlm
    from tdnnf_nas_tpu.lm.rnnlm import RnnLMConfig, RnnLMScorer, init_rnnlm

    cfg, utts, dg, obs, tree = world
    wtt = lambda w: f"w{w}"
    texts = [[wtt(w) for w in u.words] for u in utts]
    old = estimate_ngram_lm(texts, order=2)
    rcfg = RnnLMConfig(vocab_size=cfg.vocab_size, embed_dim=12,
                       hidden_dim=24, proj_dim=16, tdnn_splice=True,
                       dropout=0.0)
    scorer = RnnLMScorer(rcfg, init_rnnlm(rcfg, jax.random.PRNGKey(0)))

    lats = []
    for u in utts[:3]:
        t = len(u.pdf_align)
        o = np.full((t, tree.num_pdfs), -4.0, np.float32)
        o[np.arange(t), u.pdf_align] = 0.0
        lats.append(generate_lattice(o, dg, beam=1e9, lattice_beam=12.0))

    for w in (1.0, 0.4):
        batched = rescore_lattices_rnnlm(
            lats, old, scorer, lm_scale=1.0, n=3, word_to_token=wtt,
            interp_weight=w)
        for lat, got in zip(lats, batched):
            ref = rescore_lattice_rnnlm(
                lat, old, scorer, lm_scale=1.0, n=3, word_to_token=wtt,
                interp_weight=w)
            assert [g[0] for g in got] == [r[0] for r in ref]
            np.testing.assert_allclose([g[1] for g in got],
                                       [r[1] for r in ref], rtol=1e-4,
                                       atol=1e-4)
