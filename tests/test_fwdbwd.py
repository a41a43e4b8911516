"""Forward-backward op vs numpy log-semiring reference + gradient checks."""

import numpy as np
import jax
import jax.numpy as jnp

from tdnnf_nas_tpu.ops.fwdbwd import (
    forward_score,
    forward_score_reference,
    occupancy_posteriors,
)


def _random_graph(rng, s, p):
    trans = rng.rand(s, s).astype(np.float32)
    # sparsify a bit and renormalize rows
    trans *= rng.rand(s, s) < 0.5
    trans[np.arange(s), np.arange(s)] += 0.3  # ensure nonzero rows
    trans /= trans.sum(axis=1, keepdims=True)
    state_pdf = rng.randint(0, p, size=s).astype(np.int32)
    init = rng.rand(s).astype(np.float32)
    init /= init.sum()
    final = np.ones(s, dtype=np.float32)
    return trans, state_pdf, init, final


def test_forward_matches_reference():
    rng = np.random.RandomState(0)
    s, p, t, b = 12, 6, 9, 3
    trans, state_pdf, init, final = _random_graph(rng, s, p)
    obs = rng.randn(b, t, p).astype(np.float32) * 2.0
    got = np.asarray(
        forward_score(jnp.asarray(obs), jnp.asarray(trans), jnp.asarray(state_pdf),
                      jnp.asarray(init), jnp.asarray(final))
    )
    for i in range(b):
        ref = forward_score_reference(obs[i], trans, state_pdf, init, final)
        np.testing.assert_allclose(got[i], ref, rtol=5e-4, atol=5e-4)


def test_forward_with_leaky():
    rng = np.random.RandomState(1)
    s, p, t = 8, 5, 7
    trans, state_pdf, init, final = _random_graph(rng, s, p)
    obs = rng.randn(1, t, p).astype(np.float32)
    got = np.asarray(
        forward_score(jnp.asarray(obs), jnp.asarray(trans), jnp.asarray(state_pdf),
                      jnp.asarray(init), jnp.asarray(final), leaky_coef=0.1)
    )[0]
    ref = forward_score_reference(obs[0], trans, state_pdf, init, final, leaky_coef=0.1)
    np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-4)
    # leaky adds probability mass => larger logZ
    base = forward_score_reference(obs[0], trans, state_pdf, init, final)
    assert got > base


def test_forward_with_mask_and_batched_graphs():
    rng = np.random.RandomState(2)
    s, p, t, b = 10, 4, 6, 2
    graphs = [_random_graph(rng, s, p) for _ in range(b)]
    obs = rng.randn(b, t, p).astype(np.float32)
    mask = (rng.rand(b, t, s) < 0.8).astype(np.float32)
    mask[:, :, 0] = 1.0  # keep at least one state alive
    trans = np.stack([g[0] for g in graphs])
    state_pdf = np.stack([g[1] for g in graphs])
    init = np.stack([g[2] for g in graphs])
    final = np.stack([g[3] for g in graphs])
    got = np.asarray(
        forward_score(jnp.asarray(obs), jnp.asarray(trans), jnp.asarray(state_pdf),
                      jnp.asarray(init), jnp.asarray(final), mask=jnp.asarray(mask))
    )
    for i in range(b):
        ref = forward_score_reference(obs[i], trans[i], state_pdf[i], init[i],
                                      final[i], mask=mask[i])
        np.testing.assert_allclose(got[i], ref, rtol=5e-4, atol=5e-4)


def test_posteriors_sum_to_one_and_match_fd():
    rng = np.random.RandomState(3)
    s, p, t = 6, 4, 5
    trans, state_pdf, init, final = _random_graph(rng, s, p)
    obs = rng.randn(1, t, p).astype(np.float32)
    args = (jnp.asarray(trans), jnp.asarray(state_pdf), jnp.asarray(init),
            jnp.asarray(final))
    logz, gamma = occupancy_posteriors(jnp.asarray(obs), *args, leaky_coef=0.05)
    gamma = np.asarray(gamma)
    np.testing.assert_allclose(gamma.sum(axis=-1), 1.0, atol=1e-4)
    assert (gamma >= -1e-6).all()
    # finite differences on a few entries
    eps = 1e-3
    for (ti, pi) in [(0, 1), (2, 3), (4, 0)]:
        op = obs.copy(); op[0, ti, pi] += eps
        om = obs.copy(); om[0, ti, pi] -= eps
        zp = forward_score_reference(op[0], trans, state_pdf, init, final, leaky_coef=0.05)
        zm = forward_score_reference(om[0], trans, state_pdf, init, final, leaky_coef=0.05)
        fd = (zp - zm) / (2 * eps)
        np.testing.assert_allclose(gamma[0, ti, pi], fd, rtol=2e-2, atol=2e-3)


def test_score_invariant_to_output_shift():
    """Adding a constant c to all outputs at frame t adds exactly c to logZ."""
    rng = np.random.RandomState(4)
    s, p, t = 6, 4, 5
    trans, state_pdf, init, final = _random_graph(rng, s, p)
    obs = rng.randn(1, t, p).astype(np.float32)
    args = (jnp.asarray(trans), jnp.asarray(state_pdf), jnp.asarray(init), jnp.asarray(final))
    z0 = np.asarray(forward_score(jnp.asarray(obs), *args))[0]
    obs2 = obs.copy(); obs2[0, 2, :] += 7.5
    z1 = np.asarray(forward_score(jnp.asarray(obs2), *args))[0]
    np.testing.assert_allclose(z1 - z0, 7.5, atol=1e-4)


def test_sparse_den_matches_dense():
    """SparseDenGraph forward (+grad) == dense forward on a biphone den."""
    import jax
    from tdnnf_nas_tpu.data import SyntheticCorpusConfig, make_synthetic_corpus
    from tdnnf_nas_tpu.graphs import estimate_phone_lm, build_denominator_graph
    from tdnnf_nas_tpu.ops.fwdbwd import (SparseDenGraph, forward_score,
                                          forward_score_sparse)

    cfg = SyntheticCorpusConfig(num_utts=10, num_phones=5, feat_dim=8)
    utts, phone_seqs, tree, topo = make_synthetic_corpus(cfg)
    lm = estimate_phone_lm(phone_seqs, cfg.num_phones)
    den = build_denominator_graph(lm, topo, tree)
    sp = SparseDenGraph.from_graph(den)
    assert sp.in_src.shape[1] <= den.num_states

    rng = np.random.RandomState(0)
    obs = jnp.asarray(rng.randn(3, 12, den.num_pdfs).astype(np.float32))

    for leaky in (0.0, 0.1):
        z_dense = forward_score(obs, jnp.asarray(den.trans),
                                jnp.asarray(den.state_pdf),
                                jnp.asarray(den.init), jnp.asarray(den.final),
                                leaky_coef=leaky)
        z_sparse = forward_score_sparse(obs, sp, leaky_coef=leaky)
        np.testing.assert_allclose(np.asarray(z_sparse), np.asarray(z_dense),
                                   rtol=1e-5)

    g_dense = jax.grad(lambda o: jnp.sum(forward_score(
        o, jnp.asarray(den.trans), jnp.asarray(den.state_pdf),
        jnp.asarray(den.init), jnp.asarray(den.final), leaky_coef=0.1)))(obs)
    g_sparse = jax.grad(lambda o: jnp.sum(forward_score_sparse(
        o, sp, leaky_coef=0.1)))(obs)
    np.testing.assert_allclose(np.asarray(g_sparse), np.asarray(g_dense),
                               rtol=2e-4, atol=1e-6)


def test_sparse_den_from_arcs():
    """from_arcs builds the same padded-CSR as from_graph (via the dense
    matrix of a small random stochastic graph)."""
    from tdnnf_nas_tpu.graphs.fsa import StateGraph
    from tdnnf_nas_tpu.ops.fwdbwd import (SparseDenGraph, forward_score,
                                          forward_score_sparse)

    rng = np.random.RandomState(1)
    s, p = 12, 6
    trans = np.zeros((s, s), np.float32)
    for i in range(s):
        nz = rng.choice(s, size=3, replace=False)
        w = rng.rand(3).astype(np.float32)
        trans[i, nz] = w / w.sum()
    init = np.ones(s, np.float32) / s
    final = np.ones(s, np.float32)
    pdf = rng.randint(0, p, size=s).astype(np.int32)
    g = StateGraph(trans=trans, state_pdf=pdf, init=init, final=final,
                   num_pdfs=p)
    src, dst = np.nonzero(trans)
    sp = SparseDenGraph.from_arcs(s, src, dst, trans[src, dst], pdf, init,
                                  final)
    obs = jnp.asarray(rng.randn(2, 9, p).astype(np.float32))
    z1 = forward_score_sparse(obs, sp, leaky_coef=0.05)
    z2 = forward_score(obs, jnp.asarray(trans), jnp.asarray(pdf),
                       jnp.asarray(init), jnp.asarray(final), leaky_coef=0.05)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), rtol=1e-5)


def test_sparse_den_in_chain_objective():
    """chain_objective dispatches on SparseDenGraph and matches dense."""
    from tdnnf_nas_tpu.data import (SyntheticCorpusConfig,
                                    make_synthetic_corpus, EgsConfig,
                                    make_egs, batch_iterator)
    from tdnnf_nas_tpu.graphs import (estimate_phone_lm,
                                      build_denominator_graph,
                                      den_init_lookup)
    from tdnnf_nas_tpu.ops.fwdbwd import DenGraphArrays, SparseDenGraph
    from tdnnf_nas_tpu.train.objective import (ChainObjectiveConfig,
                                               chain_objective)

    cfg = SyntheticCorpusConfig(num_utts=12, num_phones=5, feat_dim=8)
    utts, phone_seqs, tree, topo = make_synthetic_corpus(cfg)
    lm = estimate_phone_lm(phone_seqs, cfg.num_phones)
    den = build_denominator_graph(lm, topo, tree)
    egs_cfg = EgsConfig(chunk_width=10, left_context=4, right_context=4,
                        max_phones_per_chunk=12)
    chunks = make_egs(utts, lm, topo, tree, egs_cfg,
                      den_init_fn=den_init_lookup(den, cfg.num_phones))
    batch = next(batch_iterator(chunks, batch_size=4,
                                rng=np.random.RandomState(0)))
    rng = np.random.RandomState(2)
    chain_out = jnp.asarray(rng.randn(4, 10, den.num_pdfs).astype(np.float32))
    xent_out = jnp.asarray(rng.randn(4, 10, den.num_pdfs).astype(np.float32))
    ocfg = ChainObjectiveConfig()
    l1, m1 = chain_objective(chain_out, xent_out,
                             DenGraphArrays.from_graph(den), batch["sup"], ocfg)
    l2, m2 = chain_objective(chain_out, xent_out,
                             SparseDenGraph.from_graph(den), batch["sup"], ocfg)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    np.testing.assert_allclose(float(m1["objf_mmi"]), float(m2["objf_mmi"]),
                               rtol=1e-5)
