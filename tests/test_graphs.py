"""Graph layer tests: phone LM, denominator graph, numerator supervision."""

import numpy as np
import jax.numpy as jnp

from tdnnf_nas_tpu.graphs import (
    ChainTopology,
    ContextIndependentTree,
    BiphoneTree,
    estimate_phone_lm,
    build_denominator_graph,
    den_init_lookup,
    make_chunk_supervision,
    tolerance_mask,
    stack_supervisions,
)
from tdnnf_nas_tpu.ops.fwdbwd import (forward_score, forward_score_linear,
                                      forward_score_reference)


def _toy_lm(num_phones=5, seed=0):
    rng = np.random.RandomState(seed)
    seqs = [rng.randint(0, num_phones, size=rng.randint(3, 10)).tolist() for _ in range(50)]
    return estimate_phone_lm(seqs, num_phones), seqs


def test_phone_lm_normalized():
    lm, _ = _toy_lm()
    row = lm.probs.sum(axis=1) + lm.final
    np.testing.assert_allclose(row, 1.0, atol=1e-5)
    assert (lm.probs > 0).all()  # interpolation keeps full support
    lp = lm.log_prob([0, 1, 2])
    assert np.isfinite(lp) and lp < 0


def test_den_graph_ci():
    lm, _ = _toy_lm()
    topo = ChainTopology(num_phones=5)
    tree = ContextIndependentTree(5)
    g = build_denominator_graph(lm, topo, tree)
    assert g.num_states == 10
    assert g.num_pdfs == 10
    g.validate()
    # every pdf is used exactly once in the CI graph
    assert sorted(g.state_pdf.tolist()) == list(range(10))
    # init = iteration-averaged occupancy from BOS (Kaldi SetInitialProbs
    # semantics) — near the stationary fixed point but includes ~1/iters of
    # the early (utterance-start) transient by design
    np.testing.assert_allclose(g.init.sum(), 1.0, atol=1e-4)
    p2 = g.init @ g.trans
    np.testing.assert_allclose(p2 / p2.sum(), g.init, atol=1e-2)
    assert (g.init > 0).all()  # every state reachable from BOS keeps mass


def test_den_graph_biphone():
    lm, _ = _toy_lm(num_phones=4)
    topo = ChainTopology(num_phones=4)
    tree = BiphoneTree(4)
    g = build_denominator_graph(lm, topo, tree)
    assert g.num_states == (4 + 1) * 4 + 4
    g.validate()


def test_tolerance_mask_semantics():
    m = tolerance_mask(begins=[0, 4], ends=[3, 7], num_frames=8, max_states=4, tol=1)
    # phone 0 enter allowed at frames [0, 1]; starts at 0 => loop from 0 too
    assert m[0, 0] == 1 and m[1, 0] == 1 and m[2, 0] == 0
    assert m[0, 1] == 1
    # phone 1 enter allowed [3, 5]
    assert m[2, 2] == 0 and m[3, 2] == 1 and m[5, 2] == 1 and m[6, 2] == 0
    # phone 1 loop allowed [4, 7]
    assert m[3, 3] == 0 and m[4, 3] == 1 and m[7, 3] == 1


def test_numerator_subset_of_denominator():
    """logZ_num <= logZ_den when numerator init uses den-graph init weights."""
    num_phones = 5
    lm, seqs = _toy_lm(num_phones)
    topo = ChainTopology(num_phones)
    tree = ContextIndependentTree(num_phones)
    den = build_denominator_graph(lm, topo, tree)
    init_fn = den_init_lookup(den, num_phones)

    rng = np.random.RandomState(7)
    t_frames, max_states = 12, 12
    phones = [1, 3, 0, 2]
    begins = [0, 3, 6, 9]
    ends = [2, 5, 8, 11]
    sup = make_chunk_supervision(
        phones, begins, ends, lm, topo, tree, t_frames, max_states, tol=1,
        den_init_fn=init_fn,
    )
    obs = rng.randn(1, t_frames, den.num_pdfs).astype(np.float32) * 2.0
    z_num = np.asarray(forward_score(
        jnp.asarray(obs), jnp.asarray(sup.trans[None]), jnp.asarray(sup.state_pdf[None]),
        jnp.asarray(sup.init[None]), jnp.asarray(sup.final[None]),
        mask=jnp.asarray(sup.mask[None]),
    ))[0]
    z_den = np.asarray(forward_score(
        jnp.asarray(obs), jnp.asarray(den.trans), jnp.asarray(den.state_pdf),
        jnp.asarray(den.init), jnp.asarray(den.final),
    ))[0]
    assert z_num <= z_den + 1e-3, (z_num, z_den)


def test_supervision_stacking_and_reference_consistency():
    num_phones = 4
    lm, _ = _toy_lm(num_phones, seed=1)
    topo = ChainTopology(num_phones)
    tree = ContextIndependentTree(num_phones)
    t_frames, max_states = 10, 8
    sups = [
        make_chunk_supervision([0, 1, 2], [0, 3, 7], [2, 6, 9], lm, topo, tree,
                               t_frames, max_states, tol=2),
        make_chunk_supervision([3, 2], [0, 5], [4, 9], lm, topo, tree,
                               t_frames, max_states, tol=2),
    ]
    batch = stack_supervisions(sups)
    # compact linear-chain form: the dense [S,S] trans is NOT shipped
    # (stack_supervisions drops it; the numerator runs the O(S) banded
    # kernel) — placeholder shape (B,1,1) keeps the pytree static
    assert batch.next_w is not None
    assert batch.trans.shape == (2, 1, 1)
    rng = np.random.RandomState(3)
    obs = rng.randn(2, t_frames, tree.num_pdfs).astype(np.float32)
    got = np.asarray(forward_score_linear(
        jnp.asarray(obs), jnp.asarray(batch.next_w),
        jnp.asarray(batch.state_pdf), jnp.asarray(batch.init),
        jnp.asarray(batch.final), jnp.asarray(batch.mask),
        self_loop_prob=batch.self_loop_prob,
    ))
    for i, sup in enumerate(sups):
        ref = forward_score_reference(obs[i], sup.trans, sup.state_pdf, sup.init,
                                      sup.final, mask=sup.mask)
        np.testing.assert_allclose(got[i], ref, rtol=5e-4, atol=5e-4)
