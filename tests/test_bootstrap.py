"""Flat-start bootstrap loop: unaligned train -> force-align -> aligned train.

The e2e-chain replacement of the reference's GMM-HMM alignment ladder
(SURVEY.md §7.3.2 decision: no GMM bootstrap; flat-start + self-alignment).
"""

import dataclasses

import numpy as np
import jax
import pytest

from tdnnf_nas_tpu.data import SyntheticCorpusConfig, make_synthetic_corpus
from tdnnf_nas_tpu.data.egs import EgsConfig, make_egs, batch_iterator
from tdnnf_nas_tpu.decode.align import align_corpus, align_utterance
from tdnnf_nas_tpu.models import TdnnfModelConfig, model_context
from tdnnf_nas_tpu.recipes import prepare_data, train_model
from tdnnf_nas_tpu.train import TrainerConfig, OptimizerConfig
from tdnnf_nas_tpu.train.finalize import shrink_params, combine_states


@pytest.fixture(scope="module")
def world():
    cfg = SyntheticCorpusConfig(num_utts=36, num_phones=5, feat_dim=10, seed=7)
    utts, phone_seqs, tree, topo = make_synthetic_corpus(cfg)
    bundle = prepare_data(utts, phone_seqs, tree, topo, cfg.num_phones,
                          dev_fraction=0.15)
    model_cfg = TdnnfModelConfig(
        feat_dim=10, ivector_dim=0, hidden_dim=32, bottleneck_dim=8,
        time_strides=(1, 2), num_pdfs=tree.num_pdfs, prefinal_big=32,
        prefinal_small=16, compute_dtype="float32",
    )
    tr = TrainerConfig(optimizer=OptimizerConfig(kind="adam", lr_initial=3e-3,
                                                 lr_final=1e-3, num_steps=60))
    state, _ = train_model(bundle, model_cfg, tr, num_steps=60, batch_size=8,
                           chunk_width=14, seed=0)
    return bundle, model_cfg, state


def test_alignment_close_to_truth(world):
    bundle, model_cfg, state = world
    utts = bundle.dev_utts[:4]
    aligned = align_corpus(bundle, model_cfg, state, utts)
    # aligned begins/ends form a valid segmentation and roughly track truth
    for utt, al in zip(utts, aligned):
        t_out = len(utt.pdf_align)
        assert al.begins[0] >= 0 and al.ends[-1] <= t_out - 1
        for i in range(1, len(al.begins)):
            assert al.begins[i] == al.ends[i - 1] + 1  # contiguous
        err = np.mean(np.abs(np.asarray(al.begins) - np.asarray(utt.begins)))
        assert err < 4.0, (utt.begins, al.begins)


def test_alignment_supports_retraining(world):
    """Aligned egs from self-alignment must train (tolerance mode)."""
    bundle, model_cfg, state = world
    aligned = align_corpus(bundle, model_cfg, state, bundle.train_utts[:20])
    b2 = dataclasses.replace(bundle, train_utts=aligned)
    tr = TrainerConfig(optimizer=OptimizerConfig(kind="adam", lr_initial=2e-3,
                                                 lr_final=1e-3, num_steps=10))
    state2, metrics = train_model(b2, model_cfg, tr, num_steps=10, batch_size=4,
                                  chunk_width=14, seed=1, init_state=state)
    assert np.isfinite(metrics.last("objf_mmi"))


def test_shrink_and_combine(world):
    bundle, model_cfg, state = world
    shrunk = shrink_params(state.params, 0.99)
    w0 = np.asarray(state.params["tdnn1"]["w"])
    w1 = np.asarray(shrunk["tdnn1"]["w"])
    np.testing.assert_allclose(w1, w0 * 0.99, rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(shrunk["lda"]["w"]),
                                  np.asarray(state.params["lda"]["w"]))

    import dataclasses as dc
    s2 = dc.replace(state, params=shrunk)
    best, objfs = combine_states([state, s2],
                                 valid_objf_fn=lambda s: float(
                                     np.asarray(s.params["tdnn1"]["w"]).sum()))
    assert len(objfs) == 2
    avg, _ = combine_states([state, s2], valid_objf_fn=lambda s: 0.0,
                            mode="average")
    np.testing.assert_allclose(
        np.asarray(avg.params["tdnn1"]["w"]), (w0 + w1) / 2, rtol=1e-6)


def test_weighted_combine_never_worse_than_best(world):
    """nnet3-chain-combine semantics: objective-driven greedy combination
    returns >= the best single checkpoint on the validation objective, and
    actually combines when averaging helps (noisy params around an
    optimum)."""
    import dataclasses as dc

    bundle, model_cfg, state = world
    rng = np.random.RandomState(0)
    # objective: closeness of tdnn1/w to a fixed target — averaging two
    # opposite-noise copies beats either one
    target = np.asarray(state.params["tdnn1"]["w"]).astype(np.float64)
    noise = rng.randn(*target.shape) * 0.1

    def with_w(w):
        p = dict(state.params)
        layer = dict(p["tdnn1"])
        layer["w"] = np.asarray(w, np.float32)
        p["tdnn1"] = layer
        return dc.replace(state, params=p)

    def objf(s):
        w = np.asarray(s.params["tdnn1"]["w"], np.float64)
        return -float(np.sum((w - target) ** 2))

    s_plus = with_w(target + noise)
    s_minus = with_w(target - noise)
    s_bad = with_w(target + 10 * noise)
    best, objfs = combine_states([s_plus, s_minus, s_bad], objf, mode="best")
    comb, _ = combine_states([s_plus, s_minus, s_bad], objf, mode="weighted")
    assert objf(comb) >= objf(best)  # never worse than best checkpoint
    # averaging the +/- pair recovers ~the target; the bad one is rejected
    assert objf(comb) > objf(best) + 0.5 * abs(objf(best))
    np.testing.assert_allclose(np.asarray(comb.params["tdnn1"]["w"]),
                               target, atol=1e-5)
