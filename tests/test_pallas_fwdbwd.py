"""Pallas fused forward-backward vs the XLA scan path (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tdnnf_nas_tpu.ops.fwdbwd import forward_score


def _pallas_interpret(monkeypatch=None):
    """On CPU tests we run the kernels in interpreter mode."""
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.force_tpu_interpret_mode()


def _random_graph(rng, s, p):
    trans = rng.rand(s, s).astype(np.float32)
    trans *= rng.rand(s, s) < 0.6
    trans[np.arange(s), np.arange(s)] += 0.3
    trans /= trans.sum(axis=1, keepdims=True)
    state_pdf = rng.randint(0, p, size=s).astype(np.int32)
    init = rng.rand(s).astype(np.float32)
    init /= init.sum()
    final = np.ones(s, dtype=np.float32)
    return trans, state_pdf, init, final


@pytest.mark.parametrize("leaky", [0.0, 0.1])
def test_pallas_forward_matches_xla(leaky):
    from tdnnf_nas_tpu.ops.pallas_fwdbwd import pallas_forward_score

    rng = np.random.RandomState(0)
    s, p, t, b = 16, 8, 7, 4
    trans, state_pdf, init, final = _random_graph(rng, s, p)
    obs = jnp.asarray(rng.randn(b, t, p).astype(np.float32) * 2)
    args = (jnp.asarray(trans), jnp.asarray(state_pdf), jnp.asarray(init),
            jnp.asarray(final))
    with _pallas_interpret():
        got = np.asarray(pallas_forward_score(obs, *args, leaky_coef=leaky))
    ref = np.asarray(forward_score(obs, *args, leaky_coef=leaky))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("leaky", [0.0, 0.1])
def test_pallas_backward_matches_xla(leaky):
    from tdnnf_nas_tpu.ops.pallas_fwdbwd import pallas_forward_score

    rng = np.random.RandomState(1)
    s, p, t, b = 12, 6, 6, 3
    trans, state_pdf, init, final = _random_graph(rng, s, p)
    obs = jnp.asarray(rng.randn(b, t, p).astype(np.float32))
    args = (jnp.asarray(trans), jnp.asarray(state_pdf), jnp.asarray(init),
            jnp.asarray(final))
    # weighted sum so per-sequence cotangents differ
    w = jnp.asarray(rng.rand(b).astype(np.float32) + 0.5)
    with _pallas_interpret():
        g_pallas = np.asarray(jax.grad(
            lambda o: jnp.sum(w * pallas_forward_score(o, *args, leaky_coef=leaky))
        )(obs))
    g_xla = np.asarray(jax.grad(
        lambda o: jnp.sum(w * forward_score(o, *args, leaky_coef=leaky))
    )(obs))
    np.testing.assert_allclose(g_pallas, g_xla, rtol=1e-3, atol=1e-5)
    # posteriors (w=1 rows) sum to w per frame
    with _pallas_interpret():
        g1 = np.asarray(jax.grad(
            lambda o: jnp.sum(w * pallas_forward_score(o, *args, leaky_coef=leaky))
        )(obs))
    np.testing.assert_allclose(g1.sum(-1), np.tile(np.asarray(w)[:, None], (1, t)),
                               atol=1e-4)


def test_pallas_blocked_den_matches_xla(monkeypatch):
    """Fused superblocked Pallas scan (W + one-hot permutation
    VMEM-resident, fused adjoint) vs the XLA blocked kernel — logZ and
    gradients, interpret mode (CPU-safe)."""
    from jax.experimental.pallas import tpu as pltpu

    from tdnnf_nas_tpu.graphs import (BiphoneTree, ChainTopology,
                                      compile_denominator_fsa,
                                      estimate_ngram_phone_lm)
    from tdnnf_nas_tpu.ops.fwdbwd import (forward_score_blocked,
                                          forward_score_blocked_pallas)
    from tests.test_ngram_den import _seqs

    p = 5
    seqs = _seqs(p, seed=2)
    lm = estimate_ngram_phone_lm(seqs, p, order=3, num_extra_lm_states=20)
    comp = compile_denominator_fsa(lm, ChainTopology(p), BiphoneTree(p))
    blk = comp.to_blocked(superblocks=3, enter_pad=2)
    rng = np.random.RandomState(1)
    obs = rng.randn(3, 10, BiphoneTree(p).num_pdfs).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        for leaky in (0.0, 0.1):
            zx = forward_score_blocked(jnp.asarray(obs), blk,
                                       leaky_coef=leaky)
            zp = forward_score_blocked_pallas(jnp.asarray(obs), blk,
                                              leaky_coef=leaky)
            np.testing.assert_allclose(np.asarray(zp), np.asarray(zx),
                                       atol=2e-5)
        gx = jax.grad(lambda o: jnp.sum(forward_score_blocked(
            o, blk, 0.1)))(jnp.asarray(obs))
        gp = jax.grad(lambda o: jnp.sum(forward_score_blocked_pallas(
            o, blk, 0.1)))(jnp.asarray(obs))
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                                   atol=2e-5)
