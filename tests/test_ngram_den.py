"""Pruned n-gram phone LM (chain-est-phone-lm equivalent), composed den FSA
(chain-make-den-fst equivalent at 4-gram/triphone scale), and the factored
sparse kernel.

Reference anchors: `steps/nnet3/chain/train.py:332` (4-gram den phone LM with
--num-extra-lm-states), `src/chain/chain-den-graph.cc` (den graph),
`run_tdnn_7q_fbk_40_manual.sh:26` (6034-leaf triphone tree tri5_7d)."""

import numpy as np
import jax
import jax.numpy as jnp

from tdnnf_nas_tpu.data import SyntheticCorpusConfig, make_synthetic_corpus
from tdnnf_nas_tpu.graphs import (
    BiphoneTree,
    ChainTopology,
    ContextIndependentTree,
    build_denominator_graph,
    compile_denominator_fsa,
    estimate_ngram_phone_lm,
    estimate_phone_lm,
    accumulate_triphone_stats,
    build_clustered_triphone_tree,
    make_chunk_supervision,
)
from tdnnf_nas_tpu.ops.fwdbwd import (
    forward_score,
    forward_score_factored,
    forward_score_reference,
)


def _seqs(num_phones=6, n=40, seed=0):
    rng = np.random.RandomState(seed)
    # markov chain so higher-order stats are informative
    gen = rng.dirichlet(np.ones(num_phones) * 0.3, size=num_phones)
    seqs = []
    for _ in range(n):
        s = [rng.randint(num_phones)]
        for _ in range(rng.randint(3, 14)):
            s.append(int(rng.choice(num_phones, p=gen[s[-1]])))
        seqs.append(s)
    return seqs


def test_ngram_lm_is_normalized_and_improves_on_bigram():
    p = 6
    seqs = _seqs(p)
    lm2 = estimate_phone_lm(seqs, p)
    lm4 = estimate_ngram_phone_lm(seqs, p, order=4, num_extra_lm_states=50)
    # rows are probability distributions
    rows = np.asarray(lm4.probs).sum(axis=1) + np.asarray(lm4.final)
    assert np.allclose(rows, 1.0, atol=1e-8)
    # budget respected: bigram backbone (P+1 states) + extras
    assert lm4.num_states <= (p + 1) + 50
    assert lm4.num_states > p + 1  # some extra states were worth keeping
    # 4-gram fits training data at least as well as the bigram
    ll2 = sum(lm2.log_prob(s) for s in seqs)
    ll4 = sum(lm4.log_prob(s) for s in seqs)
    assert ll4 > ll2, (ll4, ll2)


def test_ngram_next_state_longest_suffix():
    p = 5
    lm = estimate_ngram_phone_lm(_seqs(p, seed=3), p, order=3,
                                 num_extra_lm_states=30)
    for s, h in enumerate(lm.hists):
        for q in range(p):
            d = int(lm.next_state[s, q])
            ext = (tuple(h) + (q,))[-(lm.order - 1):]
            # destination history must be the longest kept suffix of ext
            dh = tuple(lm.hists[d])
            assert ext[-len(dh):] == dh
            for k in range(len(dh) + 1, len(ext) + 1):
                assert lm.state_of(ext[-k:]) == d


def test_compiled_bigram_biphone_matches_dense_builder():
    """The composed compiler at order 2 must be weight-equivalent to the
    round-1 dense biphone den graph (same logZ for any observations)."""
    p = 5
    seqs = _seqs(p, seed=1)
    lm = estimate_phone_lm(seqs, p)
    topo = ChainTopology(p)
    tree = BiphoneTree(p)
    dense = build_denominator_graph(lm, topo, tree)
    comp = compile_denominator_fsa(lm, topo, tree)
    g2 = comp.to_state_graph()
    assert comp.num_states <= dense.num_states

    rng = np.random.RandomState(0)
    t = 12
    obs = rng.randn(2, t, tree.num_pdfs).astype(np.float32)
    z1 = forward_score(jnp.asarray(obs), jnp.asarray(dense.trans),
                       jnp.asarray(dense.state_pdf), jnp.asarray(dense.init),
                       jnp.asarray(dense.final), leaky_coef=0.1)
    z2 = forward_score(jnp.asarray(obs), jnp.asarray(g2.trans),
                       jnp.asarray(g2.state_pdf), jnp.asarray(g2.init),
                       jnp.asarray(g2.final), leaky_coef=0.1)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), rtol=2e-3)


def test_factored_kernel_matches_dense_and_reference():
    import dataclasses as _dc

    p = 5
    seqs = _seqs(p, seed=2)
    lm = estimate_ngram_phone_lm(seqs, p, order=3, num_extra_lm_states=20)
    topo = ChainTopology(p)
    tree = BiphoneTree(p)
    comp = compile_denominator_fsa(lm, topo, tree)
    g = comp.to_state_graph()
    f_mxu = comp.to_factored()  # dense [Npos,S] MXU path (bf16 hi/lo split)
    assert f_mxu.trans_pos is not None
    f_gather = _dc.replace(f_mxu, trans_pos=None, trans_pos_hi=None,
                           trans_pos_lo=None)  # strict-f32 gather path

    rng = np.random.RandomState(1)
    t = 10
    obs = rng.randn(3, t, tree.num_pdfs).astype(np.float32)
    for leaky in (0.0, 0.1):
        zg = forward_score_factored(jnp.asarray(obs), f_gather,
                                    leaky_coef=leaky)
        zm = forward_score_factored(jnp.asarray(obs), f_mxu,
                                    leaky_coef=leaky)
        zd = forward_score(jnp.asarray(obs), jnp.asarray(g.trans),
                           jnp.asarray(g.state_pdf), jnp.asarray(g.init),
                           jnp.asarray(g.final), leaky_coef=leaky)
        np.testing.assert_allclose(np.asarray(zg), np.asarray(zd), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(zm), np.asarray(zd), rtol=2e-3)
        zr = forward_score_reference(obs[0], g.trans, g.state_pdf, g.init,
                                     g.final, leaky_coef=leaky)
        np.testing.assert_allclose(float(zg[0]), zr, rtol=1e-4)
    # gradients agree too (the backward is the occupancy-posterior pass)
    gd = jax.grad(lambda o: jnp.sum(forward_score(
        o, jnp.asarray(g.trans), jnp.asarray(g.state_pdf),
        jnp.asarray(g.init), jnp.asarray(g.final), leaky_coef=0.1)))(
        jnp.asarray(obs))
    gg = jax.grad(lambda o: jnp.sum(forward_score_factored(o, f_gather,
                                                           0.1)))(
        jnp.asarray(obs))
    gm = jax.grad(lambda o: jnp.sum(forward_score_factored(o, f_mxu, 0.1)))(
        jnp.asarray(obs))
    np.testing.assert_allclose(np.asarray(gg), np.asarray(gd), atol=2e-4)
    np.testing.assert_allclose(np.asarray(gm), np.asarray(gd), atol=5e-3)


def test_blocked_kernel_matches_dense():
    """The superblocked den kernel (class union-find + subposition padding
    + loop-column folding) must match the dense kernel bit-close for logZ
    AND gradients, at several superblock/enter-pad configurations."""
    from tdnnf_nas_tpu.ops.fwdbwd import forward_score_blocked

    p = 5
    seqs = _seqs(p, seed=2)
    lm = estimate_ngram_phone_lm(seqs, p, order=3, num_extra_lm_states=20)
    topo = ChainTopology(p)
    tree = BiphoneTree(p)
    comp = compile_denominator_fsa(lm, topo, tree)
    g = comp.to_state_graph()
    rng = np.random.RandomState(1)
    obs = rng.randn(3, 10, tree.num_pdfs).astype(np.float32)
    gd = jax.grad(lambda o: jnp.sum(forward_score(
        o, jnp.asarray(g.trans), jnp.asarray(g.state_pdf),
        jnp.asarray(g.init), jnp.asarray(g.final), leaky_coef=0.1)))(
        jnp.asarray(obs))
    for sb, r in ((8, 4), (3, 2), (1, 1)):
        blk = comp.to_blocked(superblocks=sb, enter_pad=r)
        for leaky in (0.0, 0.1):
            zb = forward_score_blocked(jnp.asarray(obs), blk,
                                       leaky_coef=leaky)
            zd = forward_score(jnp.asarray(obs), jnp.asarray(g.trans),
                               jnp.asarray(g.state_pdf),
                               jnp.asarray(g.init), jnp.asarray(g.final),
                               leaky_coef=leaky)
            np.testing.assert_allclose(np.asarray(zb), np.asarray(zd),
                                       rtol=2e-5, atol=2e-5)
        gb = jax.grad(lambda o: jnp.sum(forward_score_blocked(o, blk, 0.1)))(
            jnp.asarray(obs))
        np.testing.assert_allclose(np.asarray(gb), np.asarray(gd),
                                   atol=2e-5)


def test_blocked_kernel_committed_wildcard():
    """Blocked export of the committed (+-1) composition: the wildcard/EOS
    positions span all classes and must factor as the rank-1 broadcast
    term, with logZ/grad parity vs the dense export."""
    from tdnnf_nas_tpu.graphs import (accumulate_cross_triphone_stats,
                                      build_clustered_cross_triphone_tree)
    from tdnnf_nas_tpu.ops.fwdbwd import forward_score_blocked

    P = 6
    rng = np.random.RandomState(0)
    seqs = [list(rng.randint(0, P, rng.randint(4, 12))) for _ in range(60)]
    feats = [rng.randn(len(s) * 3, 8).astype(np.float32) for s in seqs]
    begins = [list(range(len(s))) for s in seqs]
    stats = accumulate_cross_triphone_stats(feats, seqs, begins, P, 1)
    tree = build_clustered_cross_triphone_tree(stats, num_leaves=30)
    lm = estimate_ngram_phone_lm(seqs, P, order=4, num_extra_lm_states=20)
    comp = compile_denominator_fsa(lm, ChainTopology(P), tree)
    assert comp.committed and comp.wildcard_positions
    g = comp.to_state_graph()
    blk = comp.to_blocked()
    assert blk.bcast_sel is not None  # wildcards really took the rank-R path
    obs = rng.randn(3, 10, tree.num_pdfs).astype(np.float32)
    zb = forward_score_blocked(jnp.asarray(obs), blk, leaky_coef=0.1)
    zd = forward_score(jnp.asarray(obs), jnp.asarray(g.trans),
                       jnp.asarray(g.state_pdf), jnp.asarray(g.init),
                       jnp.asarray(g.final), leaky_coef=0.1)
    np.testing.assert_allclose(np.asarray(zb), np.asarray(zd), rtol=2e-5,
                               atol=2e-5)
    gd = jax.grad(lambda o: jnp.sum(forward_score(
        o, jnp.asarray(g.trans), jnp.asarray(g.state_pdf),
        jnp.asarray(g.init), jnp.asarray(g.final), leaky_coef=0.1)))(
        jnp.asarray(obs))
    gb = jax.grad(lambda o: jnp.sum(forward_score_blocked(o, blk, 0.1)))(
        jnp.asarray(obs))
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gd), atol=2e-5)


def test_numerator_subset_of_ngram_den():
    """With the 4-gram den and init_lookup_seq numerator init, logZ_num <=
    logZ_den for any observations (numerator paths are a weight-exact
    subset — the normalization-FST property)."""
    p = 6
    seqs = _seqs(p, seed=4)
    lm = estimate_ngram_phone_lm(seqs, p, order=4, num_extra_lm_states=40)
    topo = ChainTopology(p)
    tree = BiphoneTree(p)
    comp = compile_denominator_fsa(lm, topo, tree)
    g = comp.to_state_graph()

    rng = np.random.RandomState(5)
    phones = seqs[0][:6]
    t = 14
    obs = rng.randn(1, t, tree.num_pdfs).astype(np.float32)
    sup = make_chunk_supervision(
        phones, None, None, lm, topo, tree, num_frames=t,
        max_states=2 * len(phones),
        den_init_seq=comp.init_lookup_seq(lm, phones))
    zn = forward_score(jnp.asarray(obs), jnp.asarray(sup.trans[None]),
                       jnp.asarray(sup.state_pdf[None]),
                       jnp.asarray(sup.init[None]),
                       jnp.asarray(sup.final[None]),
                       mask=jnp.asarray(sup.mask[None]))
    zd = forward_score(jnp.asarray(obs), jnp.asarray(g.trans),
                       jnp.asarray(g.state_pdf), jnp.asarray(g.init),
                       jnp.asarray(g.final))
    assert float(zn[0]) <= float(zd[0]) + 1e-3, (float(zn[0]), float(zd[0]))


def test_training_on_composed_den_improves_objective():
    """End-to-end: 4-gram phone LM + clustered triphone tree + factored
    den kernel, through prepare_data/train_model (the full recipe path)."""
    from tdnnf_nas_tpu.recipes.chain_recipes import prepare_data, train_model
    from tdnnf_nas_tpu.models import TdnnfModelConfig
    from tdnnf_nas_tpu.train import TrainerConfig, OptimizerConfig
    from tdnnf_nas_tpu.ops.fwdbwd import BlockedDenGraph

    cfg = SyntheticCorpusConfig(num_utts=48, num_phones=6, feat_dim=12,
                                context_shift=1.5)
    utts, phone_seqs, _, topo = make_synthetic_corpus(cfg)
    stats = accumulate_triphone_stats(
        [u.feats for u in utts], phone_seqs, [u.begins for u in utts],
        cfg.num_phones, cfg.frame_subsampling_factor)
    tree = build_clustered_triphone_tree(stats, num_leaves=24)
    bundle = prepare_data(utts, phone_seqs, tree, topo, cfg.num_phones,
                          phone_lm_order=4, num_extra_lm_states=60)
    assert isinstance(bundle.den_arrays, BlockedDenGraph)
    model_cfg = TdnnfModelConfig(
        feat_dim=12, ivector_dim=0, hidden_dim=48, bottleneck_dim=12,
        time_strides=(1, 3), num_pdfs=tree.num_pdfs, prefinal_big=48,
        prefinal_small=24, compute_dtype="float32",
    )
    trainer_cfg = TrainerConfig(
        optimizer=OptimizerConfig(kind="adam", lr_initial=2e-3,
                                  lr_final=5e-4, num_steps=120))
    state, metrics = train_model(bundle, model_cfg, trainer_cfg, 120,
                                 batch_size=8, chunk_width=16)
    hist = [v for _, v in metrics.series["objf_mmi"]]
    tail = float(np.mean(hist[-10:]))
    head = float(np.mean(hist[:10]))
    assert tail > head + 0.2, (head, tail)
    assert tail > -0.5 and tail < 0.05, tail
    # the drop-accounting counters are filled
    assert bundle.egs_stats["num_chunks"] > 0
    assert "dropped_fraction" in bundle.egs_stats


def test_triphone_tree_and_composed_den():
    cfg = SyntheticCorpusConfig(num_phones=5, num_utts=24, feat_dim=6)
    utts, phone_seqs, _, topo = make_synthetic_corpus(cfg)
    stats = accumulate_triphone_stats(
        [u.feats for u in utts], phone_seqs, [u.begins for u in utts],
        cfg.num_phones, cfg.frame_subsampling_factor)
    tree = build_clustered_triphone_tree(stats, num_leaves=30)
    assert tree.context_width == 3
    assert tree._n_fwd <= 30 + cfg.num_phones  # fallback clusters may add
    # left-2 context actually used: some phone has context-dependent pdfs
    diverse = any(
        len({tree.forward_pdf(q, l1, l2) for l1 in range(-1, cfg.num_phones)
             for l2 in range(-1, cfg.num_phones)}) > 1
        for q in range(cfg.num_phones))
    assert diverse

    lm = estimate_ngram_phone_lm(phone_seqs, cfg.num_phones, order=3,
                                 num_extra_lm_states=25)
    comp = compile_denominator_fsa(lm, topo, tree)
    f = comp.to_factored()
    g = comp.to_state_graph()
    rng = np.random.RandomState(7)
    obs = rng.randn(2, 9, tree.num_pdfs).astype(np.float32)
    zf = forward_score_factored(jnp.asarray(obs), f, leaky_coef=0.1)
    zd = forward_score(jnp.asarray(obs), jnp.asarray(g.trans),
                       jnp.asarray(g.state_pdf), jnp.asarray(g.init),
                       jnp.asarray(g.final), leaky_coef=0.1)
    np.testing.assert_allclose(np.asarray(zf), np.asarray(zd), rtol=1e-4)

    # numerator subset holds with the triphone tree too
    phones = phone_seqs[0][:5]
    sup = make_chunk_supervision(
        phones, None, None, lm, topo, tree, num_frames=9,
        max_states=2 * len(phones),
        den_init_seq=comp.init_lookup_seq(lm, phones))
    zn = forward_score(jnp.asarray(obs[:1]), jnp.asarray(sup.trans[None]),
                       jnp.asarray(sup.state_pdf[None]),
                       jnp.asarray(sup.init[None]),
                       jnp.asarray(sup.final[None]),
                       mask=jnp.asarray(sup.mask[None]))
    assert float(zn[0]) <= float(zd[0]) + 1e-3


def test_blocked_kernel_obs_bf16_close():
    """obs_bf16 keeps the expanded observations in bf16 (recursion f32):
    logZ must stay within bf16 rounding of the f32 path (~4e-3 relative
    per-frame mass error, far below training noise) and gradients close."""
    from tdnnf_nas_tpu.ops.fwdbwd import forward_score_blocked

    p = 5
    seqs = _seqs(p, seed=2)
    lm = estimate_ngram_phone_lm(seqs, p, order=3, num_extra_lm_states=20)
    comp = compile_denominator_fsa(lm, ChainTopology(p), BiphoneTree(p))
    blk = comp.to_blocked()
    rng = np.random.RandomState(1)
    obs = rng.randn(3, 12, BiphoneTree(p).num_pdfs).astype(np.float32)
    z32 = forward_score_blocked(jnp.asarray(obs), blk, leaky_coef=0.1)
    z16 = forward_score_blocked(jnp.asarray(obs), blk, leaky_coef=0.1,
                                obs_bf16=True)
    np.testing.assert_allclose(np.asarray(z16), np.asarray(z32), atol=0.15)
    g32 = jax.grad(lambda o: jnp.sum(forward_score_blocked(o, blk, 0.1)))(
        jnp.asarray(obs))
    g16 = jax.grad(lambda o: jnp.sum(forward_score_blocked(
        o, blk, 0.1, obs_bf16=True)))(jnp.asarray(obs))
    np.testing.assert_allclose(np.asarray(g16), np.asarray(g32), atol=0.02)
