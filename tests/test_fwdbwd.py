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
