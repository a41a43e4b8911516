"""Bayes/GP TDNN-F variants (models/bayes.py) + fork primitives (ops/extras)."""

import numpy as np
import jax
import jax.numpy as jnp

from tdnnf_nas_tpu.models.tdnnf import TdnnfModelConfig, chunk_input_frames
from tdnnf_nas_tpu.models.bayes import (
    BayesTdnnfModelConfig,
    apply_bayes_model,
    gaussian_kl,
    gp_activation,
    gp_activation_coefs,
    init_bayes_model,
    variational_sample,
)
from tdnnf_nas_tpu.ops import extras

TINY_BASE = TdnnfModelConfig(
    feat_dim=8, ivector_dim=0, hidden_dim=32, bottleneck_dim=8,
    time_strides=(1, 0, 3), num_pdfs=10, prefinal_big=32, prefinal_small=16,
    compute_dtype="float32",
)
BAYES = BayesTdnnfModelConfig(base=TINY_BASE)
GP = BayesTdnnfModelConfig(base=TINY_BASE, gp_activation=True)


def test_bayes_shapes_and_test_mode_deterministic():
    params, bn = init_bayes_model(BAYES, jax.random.PRNGKey(0))
    t_in = chunk_input_frames(TINY_BASE, 5)
    feats = jax.random.normal(jax.random.PRNGKey(1), (2, t_in, 8))
    c1, x1, _, kl1 = apply_bayes_model(BAYES, params, bn, feats, train=False)
    c2, _, _, _ = apply_bayes_model(BAYES, params, bn, feats, train=False)
    assert c1.shape == (2, 5, 10) and x1.shape == (2, 5, 10)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    assert np.isfinite(float(kl1))


def _randomize_output_head(params, key):
    """The output heads are zero-initialized (Kaldi convention), which makes
    chain logits constant at init; perturb them so upstream effects show."""
    p = dict(params)
    for head in ("chain", "xent"):
        op = dict(p[f"output_{head}"])
        op["w"] = jax.random.normal(key, op["w"].shape) * 0.1
        p[f"output_{head}"] = op
    return p


def test_bayes_train_mode_samples():
    params, bn = init_bayes_model(
        BAYES.replace(rho_init=0.0), jax.random.PRNGKey(0))
    params = _randomize_output_head(params, jax.random.PRNGKey(9))
    t_in = chunk_input_frames(TINY_BASE, 5)
    feats = jax.random.normal(jax.random.PRNGKey(1), (1, t_in, 8))
    c1, _, _, _ = apply_bayes_model(
        BAYES, params, bn, feats, key=jax.random.PRNGKey(2), train=True)
    c2, _, _, _ = apply_bayes_model(
        BAYES, params, bn, feats, key=jax.random.PRNGKey(3), train=True)
    assert np.abs(np.asarray(c1) - np.asarray(c2)).max() > 0


def test_kl_zero_at_prior():
    mu = jnp.zeros((4, 5))
    # std == prior_std and mu == prior mean => KL = 0
    rho = jnp.full((4, 5), jnp.log(2.0))
    kl = gaussian_kl(mu, rho, prior_std=2.0)
    assert abs(float(kl)) < 1e-6
    # moving mu away increases KL
    kl2 = gaussian_kl(mu + 1.0, rho, prior_std=2.0)
    assert float(kl2) > 0.1


def test_variational_sample_share_last_axis():
    mu = jnp.zeros((2, 3, 8))
    rho = jnp.zeros_like(mu)  # std = 1
    w = variational_sample(mu, rho, jax.random.PRNGKey(0),
                           share_last_axis=True)
    # noise shared across the last axis => all columns equal
    np.testing.assert_allclose(np.asarray(w[..., 0]), np.asarray(w[..., 5]),
                               rtol=1e-6)
    assert variational_sample(mu, rho, None, test_mode=True) is mu


def test_gp_activation_mixture():
    # pure-relu logits reproduce relu; uniform logits reproduce the average
    x = jnp.linspace(-3, 3, 13)[None, :].repeat(4, 0).reshape(4, 13)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 16))
    hard = jnp.stack([jnp.full((16,), -30.0), jnp.zeros((16,)),
                      jnp.full((16,), -30.0)])
    y = gp_activation(x, gp_activation_coefs(hard))
    np.testing.assert_allclose(np.asarray(y), np.asarray(jax.nn.relu(x)),
                               atol=1e-5)
    unif = gp_activation_coefs(jnp.zeros((3, 16)))
    np.testing.assert_allclose(np.asarray(unif), 1.0 / 3, atol=1e-6)


def test_gp_model_runs_and_kl_grads_flow():
    params, bn = init_bayes_model(GP, jax.random.PRNGKey(0))
    params = _randomize_output_head(params, jax.random.PRNGKey(9))
    t_in = chunk_input_frames(TINY_BASE, 5)
    feats = jax.random.normal(jax.random.PRNGKey(1), (1, t_in, 8))

    def loss(p):
        chain, _, _, kl = apply_bayes_model(
            GP, p, bn, feats, key=jax.random.PRNGKey(2), train=True)
        return jnp.sum(jnp.square(chain)) + kl

    g = jax.grad(loss)(params)
    g_mu = g["tdnnf2"]["affine_mu"]
    g_rho = g["tdnnf2"]["affine_rho"]
    g_gp = g["tdnnf2"]["gpact_mu"]
    assert float(jnp.abs(g_mu).max()) > 0
    assert float(jnp.abs(g_rho).max()) > 0
    assert float(jnp.abs(g_gp).max()) > 0


def test_bayes_training_reduces_loss():
    """A few SGD steps on a toy regression through the Bayes model."""
    params, bn = init_bayes_model(BAYES, jax.random.PRNGKey(0))
    t_in = chunk_input_frames(TINY_BASE, 5)
    feats = jax.random.normal(jax.random.PRNGKey(1), (2, t_in, 8))
    target = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 10))

    @jax.jit
    def step(p, key):
        def loss(p):
            chain, _, _, kl = apply_bayes_model(
                BAYES, p, bn, feats, key=key, train=True)
            return jnp.mean(jnp.square(chain - target)) + kl
        l, g = jax.value_and_grad(loss)(p)
        return jax.tree.map(lambda a, b: a - 0.05 * b, p, g), l

    losses = []
    key = jax.random.PRNGKey(3)
    for i in range(30):
        params, l = step(params, jax.random.fold_in(key, i))
        losses.append(float(l))
    assert losses[-1] < losses[0] * 0.9


# ---- ops/extras primitives ----

def test_min_value_grad_is_constant():
    x = jnp.array([1.0, -2.0, 3.0])
    g = jax.grad(lambda v: jnp.sum(extras.min_value(v, 0.5)))(x)
    np.testing.assert_allclose(np.asarray(g), -0.5)


def test_softmax_gradnorm():
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 20))
    y = extras.softmax_gradnorm(x)
    np.testing.assert_allclose(np.asarray(y.sum(-1)), 1.0, rtol=1e-5)
    tgt = jax.random.normal(jax.random.PRNGKey(1), (3, 20))
    g_scaled = jax.grad(lambda v: jnp.sum(extras.softmax_gradnorm(v) * tgt))(x)
    g_plain = jax.grad(lambda v: jnp.sum(jax.nn.softmax(v, -1) * tgt))(x)
    np.testing.assert_allclose(np.asarray(g_scaled),
                               np.asarray(g_plain) * (100.0 / 20), rtol=1e-4)


def test_input_vector_linear():
    lin = jnp.arange(12.0).reshape(2, 6)
    gains = jnp.ones((2, 3)) * 2.0  # tiled x2 across the 6 linear dims
    out = extras.input_vector_linear(lin, gains, sizes=(2, 4))
    expect = np.asarray(lin) * 2.0
    np.testing.assert_allclose(np.asarray(out)[:, 0], expect[:, :2].sum(-1))
    np.testing.assert_allclose(np.asarray(out)[:, 1], expect[:, 2:].sum(-1))


def test_linear_select_col():
    params = jnp.arange(12.0).reshape(3, 4)  # D=3, N=4
    out = extras.linear_select_col(jnp.array([1, 3]), params)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(params)[:, [1, 3]].T)


def test_argmax_onehot_st():
    logits = jnp.array([[0.1, 2.0, -1.0]])
    y = extras.argmax_onehot_st(logits)
    np.testing.assert_allclose(np.asarray(y), [[0.0, 1.0, 0.0]])
    g = jax.grad(lambda v: jnp.sum(extras.argmax_onehot_st(v) * 3.0))(logits)
    np.testing.assert_allclose(np.asarray(g), 3.0)  # straight-through


def test_sample_vec_and_kl():
    B, D = 4, 6
    m = jax.random.normal(jax.random.PRNGKey(0), (B, D))
    s = jnp.ones((B, D)) * 0.5
    z, kl = extras.sample_vec_and_kl(m, s, jnp.zeros((B, D)), jnp.ones((B, D)),
                                     jax.random.PRNGKey(1))
    assert z.shape == (B, D) and kl.shape == (B,)
    # test mode: z == mean
    z2, kl2 = extras.sample_vec_and_kl(m, s, m, s, jax.random.PRNGKey(1),
                                       test_mode=True)
    np.testing.assert_array_equal(np.asarray(z2), np.asarray(m))
    np.testing.assert_allclose(np.asarray(kl2), 0.0, atol=1e-6)
    # shared-noise draw: eps identical across rows
    z3, _ = extras.sample_vec_and_kl(jnp.zeros((B, D)), jnp.ones((B, D)),
                                     jnp.zeros((B, D)), jnp.ones((B, D)),
                                     jax.random.PRNGKey(2))
    np.testing.assert_allclose(np.asarray(z3[0]), np.asarray(z3[1]))


def test_normal_rand_shared():
    x = extras.normal_rand(jax.random.PRNGKey(0), 3, 5, rand_per_frame=False)
    np.testing.assert_allclose(np.asarray(x[0]), np.asarray(x[2]))
