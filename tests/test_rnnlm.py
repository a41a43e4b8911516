"""RNNLM training + rescoring tests."""

import numpy as np

from tdnnf_nas_tpu.lm.rnnlm import RnnLMConfig, train_rnnlm, RnnLMScorer
from tdnnf_nas_tpu.decode.rescore import rescore_nbest
from tdnnf_nas_tpu.decode.wfst import WordLM


def _patterned_sentences(rng, n=300):
    """Sentences with a strong sequential pattern: w -> (w+1) % 10."""
    out = []
    for _ in range(n):
        start = rng.randint(0, 10)
        length = rng.randint(3, 7)
        out.append([(start + i) % 10 for i in range(length)])
    return out


def test_rnnlm_learns_pattern():
    rng = np.random.RandomState(0)
    sents = _patterned_sentences(rng)
    cfg = RnnLMConfig(vocab_size=10, embed_dim=16, hidden_dim=32, dropout=0.0)
    params, ppl = train_rnnlm(sents, cfg, num_steps=150, batch_size=16, lr=5e-3)
    assert ppl < 5.0, ppl  # far below uniform (10)
    scorer = RnnLMScorer(cfg, params)
    good = scorer.score([3, 4, 5, 6])
    bad = scorer.score([3, 9, 1, 7])
    assert good > bad + 1.0, (good, bad)


def test_rnnlm_rescoring_interface():
    rng = np.random.RandomState(1)
    sents = _patterned_sentences(rng)
    cfg = RnnLMConfig(vocab_size=10, embed_dim=16, hidden_dim=32, dropout=0.0)
    params, _ = train_rnnlm(sents, cfg, num_steps=120, batch_size=16, lr=5e-3)
    scorer = RnnLMScorer(cfg, params)
    # fake n-best: pattern-following hyp vs random hyp, equal first-pass score
    wlm = WordLM(probs=np.full((11, 10), 0.08, np.float32),
                 final=np.full((11,), 0.2, np.float32), num_words=10)
    nbest = [([2, 3, 4], -50.0), ([2, 8, 5], -50.0)]
    rescored = rescore_nbest(nbest, wlm, scorer, lm_scale=1.0,
                             word_to_token=lambda w: w)
    assert rescored[0][0] == [2, 3, 4]


def test_bidirectional_rescoring():
    """Backward LM (reversed-text training) + interpolated scoring — the
    reference's `_back_` recipe pair."""
    from tdnnf_nas_tpu.lm.rnnlm import (BidirectionalRnnLMScorer,
                                        reverse_sentences)

    rng = np.random.RandomState(2)
    sents = _patterned_sentences(rng)
    cfg = RnnLMConfig(vocab_size=10, embed_dim=16, hidden_dim=32, dropout=0.0)
    fwd_params, _ = train_rnnlm(sents, cfg, num_steps=120, batch_size=16,
                                lr=5e-3)
    bwd_params, bppl = train_rnnlm(reverse_sentences(sents), cfg,
                                   num_steps=120, batch_size=16, lr=5e-3)
    assert bppl < 5.0, bppl  # backward pattern is just as learnable
    bi = BidirectionalRnnLMScorer(RnnLMScorer(cfg, fwd_params),
                                  RnnLMScorer(cfg, bwd_params), interp=0.5)
    good = bi.score([3, 4, 5, 6])
    bad = bi.score([3, 9, 1, 7])
    assert good > bad + 1.0, (good, bad)

    wlm = WordLM(probs=np.full((11, 10), 0.08, np.float32),
                 final=np.full((11,), 0.2, np.float32), num_words=10)
    nbest = [([2, 3, 4], -50.0), ([2, 8, 5], -50.0)]
    rescored = rescore_nbest(nbest, wlm, bi, lm_scale=1.0,
                             word_to_token=lambda w: w)
    assert rescored[0][0] == [2, 3, 4]


def test_tdnn_lstmp_variant_and_incremental_parity():
    """Projected LSTM (Kaldi-RNNLM rpd) + TDNN splice: the reference
    rescorer's architecture (embed/cell/rpd,
    run_tdnn_lstm_fbk40_mod_hasfisher_large_drop_e40.sh:27-36).  The
    incremental (lattice) scorer must agree with the batch scorer."""
    import math

    rng = np.random.RandomState(4)
    sents = _patterned_sentences(rng)
    cfg = RnnLMConfig(vocab_size=10, embed_dim=16, hidden_dim=48,
                      proj_dim=24, tdnn_splice=True, dropout=0.0)
    params, ppl = train_rnnlm(sents, cfg, num_steps=200, batch_size=16,
                              lr=5e-3)
    assert ppl < 5.0, ppl
    # projection shape: recurrent state is proj_dim wide
    assert params["lstm"]["wp"].shape == (48, 24)
    assert params["lstm"]["wh"].shape == (24, 4 * 48)
    scorer = RnnLMScorer(cfg, params)
    words = [3, 4, 5, 6]
    batch_ln = scorer.score(words) * math.log(10.0)  # score() is log10
    state = scorer.initial_state()
    inc_ln = 0.0
    for w in words:
        lp, state = scorer.advance(state, w)
        inc_ln += lp
    inc_ln += scorer.final_logprob(state)
    np.testing.assert_allclose(inc_ln, batch_ln, rtol=1e-4, atol=1e-4)
