"""N-best decoding + n-gram estimation/ARPA + rescoring tests."""

import numpy as np

from tdnnf_nas_tpu.data.synthetic import WordCorpusConfig, make_word_corpus
from tdnnf_nas_tpu.decode.wfst import (
    Lexicon, WordLM, estimate_word_lm, build_decoding_graph, decode_words,
)
from tdnnf_nas_tpu.decode.nbest import nbest_decode
from tdnnf_nas_tpu.decode.rescore import rescore_nbest, graph_lm_logprob
from tdnnf_nas_tpu.graphs.topology import ChainTopology, ContextIndependentTree
from tdnnf_nas_tpu.lm.ngram import NGramLM, estimate_ngram_lm, BOS, EOS


def test_nbest_top1_matches_viterbi():
    cfg = WordCorpusConfig(num_utts=10)
    utts, prons, word_seqs, _, tree, topo = make_word_corpus(cfg)
    dg = build_decoding_graph(Lexicon(prons),
                              estimate_word_lm(word_seqs, cfg.vocab_size),
                              topo, tree)
    utt = utts[0]
    t = len(utt.pdf_align)
    obs = np.full((t, tree.num_pdfs), -6.0, np.float32)
    obs[np.arange(t), utt.pdf_align] = 0.0
    hyps, scores = decode_words(obs[None], dg)
    nb = nbest_decode(obs, dg, n=5)
    assert nb[0][0] == hyps[0]
    np.testing.assert_allclose(nb[0][1], float(scores[0]), atol=1e-3)
    # scores sorted descending, hypotheses distinct
    ss = [s for _, s in nb]
    assert all(ss[i] >= ss[i + 1] - 1e-6 for i in range(len(ss) - 1))
    assert len({tuple(w) for w, _ in nb}) == len(nb)


def test_ngram_estimate_and_arpa_roundtrip():
    rng = np.random.RandomState(0)
    sents = [[str(x) for x in rng.randint(0, 5, size=rng.randint(2, 7))]
             for _ in range(200)]
    lm = estimate_ngram_lm(sents, order=3)
    s1 = lm.score(["0", "1", "2"])
    assert np.isfinite(s1) and s1 < 0
    lm2 = NGramLM.from_arpa(lm.to_arpa())
    assert lm2.order == 3
    np.testing.assert_allclose(lm2.score(["0", "1", "2"]), s1, atol=1e-4)
    np.testing.assert_allclose(lm2.score(["4", "4", "0", "3"]),
                               lm.score(["4", "4", "0", "3"]), atol=1e-4)
    # conditional probs over the seen vocab are a (sub-)distribution
    tot = sum(10 ** lm.log_prob_word(["1"], w) for w in "01234") \
        + 10 ** lm.log_prob_word(["1"], EOS)
    assert 0.5 < tot < 1.3, tot


def test_rescoring_fixes_homophones():
    """Words A(id 0) and C(id 2) share a pronunciation; acoustics can't
    separate them, the big LM can — the point of LM rescoring."""
    num_phones = 3
    tree = ContextIndependentTree(num_phones)
    topo = ChainTopology(num_phones)
    prons = {0: (0, 1), 1: (2,), 2: (0, 1)}  # 0 and 2 homophones
    # first-pass LM: uniform
    p = np.full((4, 3), 1.0 / 3 * 0.8, np.float32)
    fin = np.full((4,), 0.2, np.float32)
    wlm = WordLM(probs=p, final=fin, num_words=3)
    dg = build_decoding_graph(Lexicon(prons), wlm, topo, tree)

    # utterance: word 1 then word 2 ("B C"), 2 frames per phone
    pdfs = []
    for ph in (2, 0, 1):
        pdfs += [tree.forward_pdf(ph), tree.self_loop_pdf(ph)]
    t = len(pdfs)
    obs = np.full((t, tree.num_pdfs), -8.0, np.float32)
    obs[np.arange(t), pdfs] = 0.0
    nb = nbest_decode(obs, dg, n=6)
    seqs = [tuple(w) for w, _ in nb]
    assert (1, 0) in seqs and (1, 2) in seqs  # both homophone readings found

    # big LM trained only on "B C" sentences => rescoring must pick (1, 2)
    big = estimate_ngram_lm([["1", "2"]] * 50, order=3)
    rescored = rescore_nbest(nb, wlm, big, lm_scale=1.0)
    assert rescored[0][0] == [1, 2], rescored[:3]


def test_graph_lm_logprob_consistency():
    cfg = WordCorpusConfig(num_utts=8, vocab_size=6)
    utts, prons, word_seqs, _, tree, topo = make_word_corpus(cfg)
    wlm = estimate_word_lm(word_seqs, 6)
    lp = graph_lm_logprob([0, 1], wlm)
    expect = (np.log(wlm.probs[0, 0]) + np.log(wlm.probs[1, 1])
              + np.log(wlm.final[2]))
    np.testing.assert_allclose(lp, expect, atol=1e-6)


def test_rescore_nbest_rnnlm_batched_matches_incremental():
    """Batched n-best RNNLM rescoring == the per-arc incremental scorer
    on sentence scores (interp 1.0 and 0.5), and per-token logprobs sum
    to RnnLMScorer.score."""
    import numpy as np

    from tdnnf_nas_tpu.decode.rescore import (_old_lm_token_logprobs,
                                              rescore_nbest_rnnlm_batched)
    from tdnnf_nas_tpu.lm.ngram import estimate_ngram_lm
    from tdnnf_nas_tpu.lm.rnnlm import RnnLMConfig, RnnLMScorer, train_rnnlm

    rng = np.random.RandomState(0)
    sents = [list(rng.randint(0, 12, size=rng.randint(2, 6)))
             for _ in range(60)]
    cfg = RnnLMConfig(vocab_size=12, embed_dim=16, hidden_dim=24)
    params, _ = train_rnnlm(sents, cfg, num_steps=30, batch_size=8, seed=0)
    scorer = RnnLMScorer(cfg, params)
    lm = estimate_ngram_lm([[f"w{w}" for w in s] for s in sents], order=2)
    wtt = lambda w: f"w{w}"

    hyps = [(list(s), 1.0) for s in sents[:5]]
    # interp 1.0: new_total = total - old + 1.0 * rnn_sum
    out = rescore_nbest_rnnlm_batched([hyps], lm, scorer, lm_scale=1.0,
                                      interp_weight=1.0, word_to_token=wtt)
    import math
    # check the winner's score formula on its own words
    w_best, s_best = out[0]
    old = sum(_old_lm_token_logprobs(w_best, lm, wtt))
    rnn = scorer.score(w_best) * math.log(10.0)
    assert abs(s_best - (1.0 - old + rnn)) < 1e-3
    # interp 0.5 runs and returns a hypothesis from the list
    out2 = rescore_nbest_rnnlm_batched([hyps], lm, scorer, lm_scale=1.0,
                                       interp_weight=0.5, word_to_token=wtt)
    assert out2[0][0] in [h[0] for h in hyps]
