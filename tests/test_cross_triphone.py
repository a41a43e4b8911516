"""+-1 right-context triphone trees: committed-successor den composition,
numerator consistency, and end-to-end training.

Covers the reference's tri5_7d tree shape (center phone with one LEFT and
one RIGHT phone of context, `run_tdnn_7q_fbk_40_manual.sh:26`) — the
committed-successor composition is the TPU-shaped equivalent of Kaldi's
C-transducer delayed-symbol composition (upstream context-fst.cc +
chain-den-graph.cc).
"""

import numpy as np
import jax.numpy as jnp

from tdnnf_nas_tpu.graphs import (
    ChainTopology,
    CrossTriphoneTree,
    accumulate_cross_triphone_stats,
    build_clustered_cross_triphone_tree,
    compile_denominator_fsa,
    estimate_ngram_phone_lm,
    estimate_phone_lm,
    make_chunk_supervision,
)
from tdnnf_nas_tpu.ops.fwdbwd import forward_score_reference

P = 6


def _corpus(num=60, seed=0):
    rng = np.random.RandomState(seed)
    seqs = [list(rng.randint(0, P, rng.randint(4, 12))) for _ in range(num)]
    feats = [rng.randn(len(s) * 3, 8).astype(np.float32) for s in seqs]
    begins = [list(range(len(s))) for s in seqs]
    return seqs, feats, begins


def _tree(seqs, feats, begins, leaves=30):
    stats = accumulate_cross_triphone_stats(feats, seqs, begins, P, 1)
    return build_clustered_cross_triphone_tree(stats, num_leaves=leaves)


def test_cross_tree_right_context_splits():
    seqs, feats, begins = _corpus()
    tree = _tree(seqs, feats, begins)
    assert tree.right_context == 1
    assert tree.num_pdfs <= 30 + P
    # full-table tree: distinct right contexts give distinct leaves
    full = CrossTriphoneTree(
        P, np.arange(P * (P + 1) * (P + 1)), P * (P + 1) * (P + 1))
    assert (full.forward_pdf_lr(0, 1, 2) != full.forward_pdf_lr(0, 1, 3))
    assert (full.forward_pdf_lr(0, 1, 2) != full.forward_pdf_lr(0, 2, 2))


def test_committed_den_stochastic_and_subset():
    seqs, feats, begins = _corpus()
    tree = _tree(seqs, feats, begins)
    topo = ChainTopology(P)
    for lm in (estimate_phone_lm(seqs, P),
               estimate_ngram_phone_lm(seqs, P, order=4,
                                       num_extra_lm_states=20)):
        fsa = compile_denominator_fsa(lm, topo, tree)
        assert fsa.committed
        g = fsa.to_state_graph()
        rows = np.asarray(g.trans, np.float64).sum(1)
        np.testing.assert_allclose(rows, 1.0, atol=1e-6)
        # init probs exist along a real utterance walk
        e, l = fsa.init_lookup_seq(lm, seqs[0])
        assert (e > 0).all() and (l > 0).all()
        # numerator score never exceeds the denominator's
        ph = seqs[0][:5]
        nxt = seqs[0][5] if len(seqs[0]) > 5 else -1
        sup = make_chunk_supervision(
            ph, [0, 2, 4, 6, 8], [1, 3, 5, 7, 9], lm, topo, tree, 10, 16,
            tol=2, den_init_seq=(e[:5], l[:5]), init_ctx=lm.walk_init(),
            next_phone=nxt)
        rng = np.random.RandomState(3)
        obs = rng.randn(10, tree.num_pdfs).astype(np.float32)
        zn = forward_score_reference(obs, sup.trans, sup.state_pdf, sup.init,
                                     sup.final, mask=sup.mask)
        zd = forward_score_reference(obs, np.asarray(g.trans),
                                     np.asarray(g.state_pdf),
                                     np.asarray(g.init), np.asarray(g.final))
        assert zn <= zd + 1e-3


def test_committed_num_is_weight_exact_subset():
    """Numerator pdfs, transition weights, and init weights must EXACTLY
    match the denominator arcs along the true-path position walk (the
    normalization-FST property, upstream chain-supervision.cc)."""
    seqs, feats, begins = _corpus()
    tree = _tree(seqs, feats, begins)
    topo = ChainTopology(P)
    a = 0.5
    lm = estimate_ngram_phone_lm(seqs, P, order=3, num_extra_lm_states=10)
    fsa = compile_denominator_fsa(lm, topo, tree)
    for seq in seqs[:5]:
        e, l = fsa.init_lookup_seq(lm, seq)
        n = len(seq)
        sup = make_chunk_supervision(
            seq, list(range(0, 2 * n, 2)), list(range(1, 2 * n, 2)), lm,
            ChainTopology(P, a), tree, 2 * n, 2 * n, tol=0,
            den_init_seq=(e, l), init_ctx=lm.walk_init(), next_phone=-1)
        pos = fsa.start_pos
        for i, q in enumerate(seq):
            r = int(seq[i + 1]) if i + 1 < n else -1
            k = (pos, int(q), r) if i == 0 else (pos, r)
            dest, pdf = fsa.pos_trans[k]
            # pdf identity
            assert sup.state_pdf[2 * i] == pdf
            dst_state = fsa.enter_state[(dest, pdf)]
            # den arc weight from pos -> dest enter state
            sel = (fsa.arc_src_pos == pos) & (fsa.arc_dst == dst_state)
            assert sel.sum() == 1
            w_den = float(fsa.arc_w[sel][0])
            if i == 0:
                # entry weight comes from the den init lookup instead
                assert sup.init[0] == e[0]
            else:
                assert abs(float(sup.trans[2 * (i - 1), 2 * i]) - w_den) \
                    < 1e-6, (i, w_den)
            # loop pdf + self-loop weight
            assert sup.state_pdf[2 * i + 1] == \
                np.asarray(fsa.state_pdf)[fsa.loop_state[dest]]
            pos = dest


def test_cross_triphone_training_end_to_end():
    """prepare_data + a few train steps on the +-1 tree (CPU)."""
    from tdnnf_nas_tpu.data.synthetic import (SyntheticCorpusConfig,
                                              make_synthetic_corpus)
    from tdnnf_nas_tpu.models import TdnnfModelConfig
    from tdnnf_nas_tpu.recipes.chain_recipes import prepare_data, train_model
    from tdnnf_nas_tpu.train import (ChainObjectiveConfig, OptimizerConfig,
                                     TrainerConfig)

    cfg = SyntheticCorpusConfig(num_phones=P, feat_dim=12, num_utts=40,
                                min_phones=4, max_phones=10,
                                context_shift=0.5, seed=1)
    utts, phone_seqs, _, topo = make_synthetic_corpus(cfg)
    stats = accumulate_cross_triphone_stats(
        [u.feats for u in utts], phone_seqs, [u.begins for u in utts], P,
        cfg.frame_subsampling_factor)
    tree = build_clustered_cross_triphone_tree(stats, num_leaves=24)
    bundle = prepare_data(utts, phone_seqs, tree, topo, P,
                          phone_lm_order=3, num_extra_lm_states=20)
    assert bundle.den_fsa is not None and bundle.den_fsa.committed
    mc = TdnnfModelConfig(feat_dim=12, ivector_dim=0, num_pdfs=tree.num_pdfs,
                          hidden_dim=32, bottleneck_dim=16,
                          prefinal_big=32, prefinal_small=16,
                          time_strides=(1, 1))
    tc = TrainerConfig(
        objective=ChainObjectiveConfig(),
        optimizer=OptimizerConfig(kind="adam", lr_initial=1e-3,
                                  lr_final=1e-3, num_steps=4))
    state, metrics = train_model(bundle, mc, tc, 4, batch_size=4,
                                 chunk_width=12, seed=0)
    objf = metrics.last("objf_mmi")
    assert np.isfinite(objf)
    assert objf < 0.5  # num <= den (+ bounded chunk-init constant)
