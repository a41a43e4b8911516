"""GMM-HMM bootstrap ladder tests: mono EM, LDA/MLLT, fMLLR, alignments."""

import numpy as np
import pytest

from tdnnf_nas_tpu.data.synthetic import SyntheticCorpusConfig, make_synthetic_corpus
from tdnnf_nas_tpu.gmm import (
    GmmLadderConfig, MonoHmmConfig, run_gmm_ladder, train_mono,
    viterbi_align_gmm, estimate_lda, estimate_mllt, estimate_fmllr,
    apply_fmllr, splice_frames,
)
from tdnnf_nas_tpu.gmm.gmm import path_to_phone_bounds
from tdnnf_nas_tpu.gmm.transforms import fmllr_auxf


@pytest.fixture(scope="module")
def corpus():
    cfg = SyntheticCorpusConfig(num_utts=24, num_phones=6, feat_dim=10,
                                mean_dur=4.0, emission_noise=0.6, seed=3)
    utts, phone_seqs, tree, topo = make_synthetic_corpus(cfg)
    return cfg, utts, phone_seqs


def test_mono_em_loglike_improves_and_aligns(corpus):
    cfg, utts, phone_seqs = corpus
    feats = [u.feats for u in utts]
    am, paths, lls = train_mono(feats, phone_seqs, cfg.num_phones,
                                MonoHmmConfig(num_iters=8, max_mix=2,
                                              mix_up_iters=(4,)))
    assert lls[-1] > lls[0] + 0.5, lls
    # boundary accuracy at the INPUT rate vs truth (truth is output rate)
    errs = []
    for u, p in zip(utts, paths):
        b, e = path_to_phone_bounds(p, u.phones, am.states_per_phone)
        fs = cfg.frame_subsampling_factor
        errs += [abs(bi // fs - bt) for bi, bt in zip(b, u.begins)]
    assert np.mean(errs) < 1.5, np.mean(errs)


def test_mono_viterbi_ll_matches_alignment(corpus):
    cfg, utts, phone_seqs = corpus
    feats = [u.feats for u in utts]
    am, paths, _ = train_mono(feats, phone_seqs, cfg.num_phones,
                              MonoHmmConfig(num_iters=4, max_mix=1,
                                            mix_up_iters=()))
    path, score = viterbi_align_gmm(feats[0], phone_seqs[0], am)
    assert np.isfinite(score)
    # path is monotone non-decreasing, starts at 0, ends at last state
    assert path[0] == 0
    assert path[-1] == len(phone_seqs[0]) * am.states_per_phone - 1
    assert (np.diff(path) >= 0).all() and (np.diff(path) <= 1).all()


def test_lda_improves_class_separation(corpus):
    cfg, utts, phone_seqs = corpus
    rng = np.random.RandomState(0)
    feats = [u.feats for u in utts]
    am, paths, _ = train_mono(feats, phone_seqs, cfg.num_phones,
                              MonoHmmConfig(num_iters=4, max_mix=1,
                                            mix_up_iters=()))
    from tdnnf_nas_tpu.gmm.ladder import _state_classes

    classes = _state_classes(am, phone_seqs, paths)
    spliced = [splice_frames(f, 2) for f in feats]
    k = cfg.num_phones * am.states_per_phone
    lda = estimate_lda(spliced, classes, k, out_dim=8)
    assert lda.shape == (8, spliced[0].shape[1])
    # projected within-class covariance ~ identity (Kaldi normalization)
    proj = [x @ lda.T for x in spliced]
    within = np.zeros((8, 8))
    count = 0
    for x, c in zip(proj, classes):
        for cls in np.unique(c):
            sel = x[c == cls]
            within += (sel - sel.mean(0)).T @ (sel - sel.mean(0))
            count += sel.shape[0]
    within /= count
    np.testing.assert_allclose(np.diag(within), 1.0, atol=0.25)
    del rng


def test_mllt_aux_nondecreasing(corpus):
    cfg, utts, phone_seqs = corpus
    feats = [u.feats for u in utts]
    am, paths, _ = train_mono(feats, phone_seqs, cfg.num_phones,
                              MonoHmmConfig(num_iters=4, max_mix=1,
                                            mix_up_iters=()))
    from tdnnf_nas_tpu.gmm.ladder import _state_classes

    classes = _state_classes(am, phone_seqs, paths)
    k = cfg.num_phones * am.states_per_phone
    m, aux = estimate_mllt(feats, classes, k, num_iters=6)
    assert m.shape == (10, 10)
    diffs = np.diff(aux)
    assert (diffs > -1e-3).all(), aux
    assert aux[-1] > aux[0] - 1e-6


def test_fmllr_recovers_affine_corruption(corpus):
    cfg, utts, phone_seqs = corpus
    rng = np.random.RandomState(1)
    feats = [u.feats for u in utts]
    am, paths, _ = train_mono(feats, phone_seqs, cfg.num_phones,
                              MonoHmmConfig(num_iters=6, max_mix=1,
                                            mix_up_iters=()))
    from tdnnf_nas_tpu.gmm.ladder import _frame_gaussians, _state_classes

    classes = _state_classes(am, phone_seqs, paths)
    # corrupt one "speaker" (all utts) with a known invertible affine
    a_true = np.eye(10) + 0.25 * rng.randn(10, 10)
    b_true = 0.5 * rng.randn(10)
    corrupted = [f @ a_true.T + b_true for f in feats]
    mus, ivs = [], []
    for f, c in zip(feats, classes):
        mu, iv = _frame_gaussians(am, f, c)
        mus.append(mu)
        ivs.append(iv)
    w = estimate_fmllr(corrupted, mus, ivs, num_iters=8)
    ident = np.concatenate([np.eye(10), np.zeros((10, 1))], axis=1)
    gain = fmllr_auxf(corrupted, mus, ivs, w) - fmllr_auxf(corrupted, mus,
                                                           ivs, ident)
    assert gain > 1.0, gain
    # adapted features should align nearly as well as clean ones
    adapted = [apply_fmllr(f, w) for f in corrupted]
    ll_clean = np.mean([viterbi_align_gmm(f, p, am)[1] / f.shape[0]
                        for f, p in zip(feats, phone_seqs)])
    ll_adapt = np.mean([viterbi_align_gmm(f, p, am)[1] / f.shape[0]
                        for f, p in zip(adapted, phone_seqs)])
    ll_corr = np.mean([viterbi_align_gmm(f, p, am)[1] / f.shape[0]
                       for f, p in zip(corrupted, phone_seqs)])
    assert ll_adapt > ll_corr + 1.0
    assert ll_adapt > ll_clean - 2.0


def test_full_ladder_alignments(corpus):
    cfg, utts, phone_seqs = corpus
    rng = np.random.RandomState(2)
    # two speakers with distinct affine channel effects
    speakers = [i % 2 for i in range(len(utts))]
    chans = {s: (np.eye(10) + 0.15 * rng.randn(10, 10), 0.3 * rng.randn(10))
             for s in (0, 1)}
    feats = [u.feats @ chans[s][0].T + chans[s][1]
             for u, s in zip(utts, speakers)]
    res = run_gmm_ladder(
        feats, phone_seqs, cfg.num_phones,
        GmmLadderConfig(mono=MonoHmmConfig(num_iters=6, max_mix=2,
                                           mix_up_iters=(3,)),
                        splice_context=2, lda_dim=8,
                        lda_mllt_em_iters=5, sat_em_iters=4),
        speakers=speakers,
    )
    assert res.fmllr_gain > 0.0, res.fmllr_gain
    assert len(res.fmllr) == 2
    assert res.mono_ll[-1] > res.mono_ll[0]
    # output-rate boundary accuracy vs truth
    errs = []
    for u, b in zip(utts, res.begins):
        errs += [abs(bi - bt) for bi, bt in zip(b, u.begins)]
    assert np.mean(errs) < 2.0, np.mean(errs)
    # ends >= begins, within utterance length
    for u, b, e in zip(utts, res.begins, res.ends):
        t_out = len(u.pdf_align)
        assert all(0 <= bi <= ei < t_out for bi, ei in zip(b, e))


def test_gmm_alignments_feed_chain_supervision(corpus):
    """GMM-ladder alignments drop into the chain egs pipeline."""
    cfg, utts, phone_seqs = corpus
    import copy

    from tdnnf_nas_tpu.recipes import bootstrap_alignments_gmm, prepare_data

    utts2 = copy.deepcopy(utts)
    utts2, res = bootstrap_alignments_gmm(
        utts2, phone_seqs, cfg.num_phones,
        ladder_cfg=GmmLadderConfig(
            mono=MonoHmmConfig(num_iters=4, max_mix=1, mix_up_iters=()),
            splice_context=2, lda_dim=8, lda_mllt_em_iters=3,
            sat_em_iters=3),
    )
    from tdnnf_nas_tpu.graphs.topology import ChainTopology, ContextIndependentTree

    tree = ContextIndependentTree(cfg.num_phones)
    topo = ChainTopology(cfg.num_phones)
    bundle = prepare_data(utts2, phone_seqs, tree, topo, cfg.num_phones,
                          dev_fraction=0.15)
    from tdnnf_nas_tpu.models import TdnnfModelConfig

    model_cfg = TdnnfModelConfig(
        feat_dim=cfg.feat_dim, ivector_dim=0, hidden_dim=16,
        bottleneck_dim=4, time_strides=(1,), num_pdfs=tree.num_pdfs,
        prefinal_big=16, prefinal_small=8, compute_dtype="float32",
    )
    egs = bundle.egs(model_cfg, chunk_width=12, tol=2)
    assert len(egs) > 0
    # masks must admit at least one frame per chunk (valid supervision)
    assert all(e.sup.mask.sum() > 0 for e in egs)


def test_train_tri_context_dependent_tying():
    """tri1/tri2-equivalent: tied (phone, state, left) GMMs raise loglike
    over the monophone model on context-colored data (ref run.sh:139-199)."""
    from tdnnf_nas_tpu.gmm import train_tri
    from tdnnf_nas_tpu.gmm.gmm import corpus_loglike

    cfg = SyntheticCorpusConfig(num_utts=24, num_phones=5, feat_dim=10,
                                mean_dur=4.0, emission_noise=0.5,
                                context_shift=2.0, seed=7)
    utts, phone_seqs, _, _ = make_synthetic_corpus(cfg)
    feats = [u.feats for u in utts]
    mono_cfg = MonoHmmConfig(num_iters=6, max_mix=2, mix_up_iters=(3,))
    am0, _, _ = train_mono(feats, phone_seqs, cfg.num_phones, mono_cfg)
    ll_mono = corpus_loglike(am0, feats, phone_seqs)
    am1, paths, lls = train_tri(feats, phone_seqs, cfg.num_phones, mono_cfg,
                                am0, num_leaves=30)
    ll_tri = corpus_loglike(am1, feats, phone_seqs)
    assert ll_tri > ll_mono + 0.1, (ll_mono, ll_tri)
    # tying is genuinely context-dependent: some (phone, state) row has
    # different tied ids across left contexts
    tt = am1.tie_table
    assert tt is not None
    assert any(len(set(tt[p, s].tolist())) > 1
               for p in range(cfg.num_phones)
               for s in range(am1.states_per_phone))
    # every tied id in range, table dense
    assert tt.min() >= 0 and tt.max() < len(am1.gmms)


def test_ladder_with_tri_stages():
    cfg = SyntheticCorpusConfig(num_utts=24, num_phones=5, feat_dim=10,
                                mean_dur=4.0, emission_noise=0.5,
                                context_shift=2.0, seed=8)
    utts, phone_seqs, _, _ = make_synthetic_corpus(cfg)
    feats = [u.feats for u in utts]
    res = run_gmm_ladder(
        feats, phone_seqs, cfg.num_phones,
        GmmLadderConfig(mono=MonoHmmConfig(num_iters=5, max_mix=2,
                                           mix_up_iters=(3,)),
                        tri_leaves=25, tri_em_iters=5,
                        splice_context=2, lda_dim=8,
                        lda_mllt_em_iters=4, sat_em_iters=3),
    )
    assert res.am.tie_table is not None  # tri tying survived to tri4
    errs = []
    for u, b in zip(utts, res.begins):
        errs += [abs(bi - bt) for bi, bt in zip(b, u.begins)]
    assert np.mean(errs) < 2.0, np.mean(errs)


def test_ladder_train_subset_aligns_full_corpus(corpus):
    """train_subset: EM stages run on a stratified subset, alignments are
    produced for EVERY utterance by the final SAT model (Kaldi's run.sh
    trains mono/tri on 30k-short/100k subsets and aligns the full set)."""
    cfg, utts, phone_seqs = corpus
    speakers = [i % 2 for i in range(len(utts))]
    res = run_gmm_ladder(
        [u.feats for u in utts], phone_seqs, cfg.num_phones,
        GmmLadderConfig(mono=MonoHmmConfig(num_iters=6, max_mix=2,
                                           mix_up_iters=(3,)),
                        splice_context=2, lda_dim=8,
                        lda_mllt_em_iters=5, sat_em_iters=4,
                        train_subset=len(utts) // 2),
        speakers=speakers,
    )
    assert len(res.begins) == len(utts)
    assert len(res.fmllr) == 2  # both speakers covered (stratified)
    errs = []
    for u, b in zip(utts, res.begins):
        errs += [abs(bi - bt) for bi, bt in zip(b, u.begins)]
    assert np.mean(errs) < 2.5, np.mean(errs)
