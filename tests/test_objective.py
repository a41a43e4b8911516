"""Chain objective: linear numerator kernel + surrogate gradient exactness."""

import numpy as np
import jax
import jax.numpy as jnp

from tdnnf_nas_tpu.graphs import (
    ChainTopology, ContextIndependentTree, estimate_phone_lm,
    build_denominator_graph, den_init_lookup, make_chunk_supervision,
    stack_supervisions,
)
from tdnnf_nas_tpu.ops.fwdbwd import (
    DenGraphArrays, forward_score, forward_score_linear, occupancy_posteriors,
)
from tdnnf_nas_tpu.train.objective import ChainObjectiveConfig, chain_objective


def _setup(num_phones=5, b=3, t=12, seed=0):
    rng = np.random.RandomState(seed)
    seqs = [rng.randint(0, num_phones, size=8).tolist() for _ in range(30)]
    lm = estimate_phone_lm(seqs, num_phones)
    topo = ChainTopology(num_phones)
    tree = ContextIndependentTree(num_phones)
    den = build_denominator_graph(lm, topo, tree)
    init_fn = den_init_lookup(den, num_phones)
    sups = []
    for i in range(b):
        phones = rng.randint(0, num_phones, size=4).tolist()
        begins = [0, 3, 6, 9]
        ends = [2, 5, 8, t - 1]
        sups.append(make_chunk_supervision(phones, begins, ends, lm, topo, tree,
                                           t, 10, tol=1, den_init_fn=init_fn))
    sup = stack_supervisions(sups)
    # batched supervisions drop the dense trans when next_w is present
    # (never shipped to device); stack it here for the dense reference
    sup.trans = np.stack([s.trans for s in sups])
    obs = rng.randn(b, t, den.num_pdfs).astype(np.float32)
    return den, sup, jnp.asarray(obs)


def test_linear_kernel_matches_dense():
    den, sup, obs = _setup()
    dense = forward_score(obs, jnp.asarray(sup.trans), jnp.asarray(sup.state_pdf),
                          jnp.asarray(sup.init), jnp.asarray(sup.final),
                          mask=jnp.asarray(sup.mask))
    lin = forward_score_linear(obs, jnp.asarray(sup.next_w),
                               jnp.asarray(sup.state_pdf), jnp.asarray(sup.init),
                               jnp.asarray(sup.final), jnp.asarray(sup.mask),
                               sup.self_loop_prob)
    np.testing.assert_allclose(np.asarray(lin), np.asarray(dense), rtol=2e-4,
                               atol=2e-4)
    # gradients agree too
    gd = jax.grad(lambda o: jnp.sum(forward_score(
        o, jnp.asarray(sup.trans), jnp.asarray(sup.state_pdf),
        jnp.asarray(sup.init), jnp.asarray(sup.final),
        mask=jnp.asarray(sup.mask))))(obs)
    gl = jax.grad(lambda o: jnp.sum(forward_score_linear(
        o, jnp.asarray(sup.next_w), jnp.asarray(sup.state_pdf),
        jnp.asarray(sup.init), jnp.asarray(sup.final), jnp.asarray(sup.mask),
        sup.self_loop_prob)))(obs)
    np.testing.assert_allclose(np.asarray(gl), np.asarray(gd), rtol=1e-3,
                               atol=1e-4)


def test_objective_gradient_is_posterior_difference():
    """d(-loss)/d chain_out == (gamma_num - gamma_den)/N exactly (surrogate)."""
    den, sup, obs = _setup(seed=1)
    den_arr = DenGraphArrays.from_graph(den)
    cfg = ChainObjectiveConfig(xent_regularize=0.0, leaky_hmm_coef=0.05)
    b, t, p = obs.shape

    def loss_fn(o):
        loss, _ = chain_objective(o, o, den_arr, sup, cfg)
        return loss

    g = jax.grad(loss_fn)(obs)
    _, gamma_num = occupancy_posteriors(
        obs, jnp.asarray(sup.trans), jnp.asarray(sup.state_pdf),
        jnp.asarray(sup.init), jnp.asarray(sup.final), mask=jnp.asarray(sup.mask))
    _, gamma_den = occupancy_posteriors(
        obs, den_arr.trans, den_arr.state_pdf, den_arr.init, den_arr.final,
        leaky_coef=0.05)
    expected = -(np.asarray(gamma_num) - np.asarray(gamma_den)) / (b * t)
    np.testing.assert_allclose(np.asarray(g), expected, rtol=1e-3, atol=1e-6)


def test_objective_value_and_xent():
    den, sup, obs = _setup(seed=2)
    den_arr = DenGraphArrays.from_graph(den)
    cfg = ChainObjectiveConfig(xent_regularize=0.1, leaky_hmm_coef=0.1)
    loss, metrics = chain_objective(obs, obs, den_arr, sup, cfg)
    # value matches the direct computation
    z_num = forward_score_linear(obs, jnp.asarray(sup.next_w),
                                 jnp.asarray(sup.state_pdf), jnp.asarray(sup.init),
                                 jnp.asarray(sup.final), jnp.asarray(sup.mask),
                                 sup.self_loop_prob)
    z_den = forward_score(obs, den_arr.trans, den_arr.state_pdf, den_arr.init,
                          den_arr.final, leaky_coef=0.1)
    b, t, _ = obs.shape
    mmi = float((jnp.sum(z_num) - jnp.sum(z_den)) / (b * t))
    np.testing.assert_allclose(float(metrics["objf_mmi"]), mmi, rtol=1e-5)
    assert float(metrics["objf_xent"]) < 0  # log-probs
    assert np.isfinite(float(loss))


def test_adafactor_optimizer_runs_and_descends():
    """Factored-preconditioner optimizer decreases a simple quadratic."""
    import jax
    from tdnnf_nas_tpu.train.optimizer import OptimizerConfig, make_optimizer

    cfg = OptimizerConfig(kind="adafactor", lr_initial=0.1, lr_final=0.1,
                          num_steps=100, max_change_per_leaf=10.0,
                          max_change_global=100.0)
    init_fn, update_fn = make_optimizer(cfg)
    rng = np.random.RandomState(0)
    target = jnp.asarray(rng.randn(12, 8).astype(np.float32))
    params = {"w": jnp.zeros((12, 8)), "k3": jnp.zeros((2, 6, 8)),
              "b": jnp.zeros((8,))}
    state = init_fn(params)

    def loss(p):
        return (jnp.sum((p["w"] - target) ** 2)
                + jnp.sum((p["k3"] - 1.0) ** 2) + jnp.sum((p["b"] + 2.0) ** 2))

    l0 = float(loss(params))
    for i in range(50):
        g = jax.grad(loss)(params)
        params, state = update_fn(g, state, params, jnp.asarray(i))
    l1 = float(loss(params))
    assert l1 < 0.2 * l0, (l0, l1)


def test_objective_gradients_finite_for_badly_matched_model():
    """Regression: extreme/badly-matched outputs (early supernet cv-update)
    must yield finite loss and gradients — the numerator runs in log space
    precisely because its masked per-frame mass can underflow f32."""
    den, sup, obs = _setup(seed=3, t=12)
    den_arr = DenGraphArrays.from_graph(den)
    cfg = ChainObjectiveConfig(xent_regularize=0.1, leaky_hmm_coef=0.1)
    rng = np.random.RandomState(9)
    # outputs with a ±40-nat dynamic range, adversarially anti-correlated
    # with the supervision (numerator path mass ~ e^-400 over the chunk)
    bad = jnp.asarray(rng.randn(*obs.shape).astype(np.float32) * 20.0)

    def loss_fn(o):
        loss, _ = chain_objective(o, o, den_arr, sup, cfg)
        return loss

    loss = float(loss_fn(bad))
    g = np.asarray(jax.grad(loss_fn)(bad))
    assert np.isfinite(loss)
    assert np.isfinite(g).all(), np.abs(g).max()


def test_ng_optimizer_runs_and_preconditions():
    """Kronecker-factored natural-gradient option (kind='ng'): descends a
    badly-conditioned quadratic faster than plain SGD at the same lr, keeps
    state shapes, and skips preconditioning for 1-D / oversized leaves."""
    import jax
    from tdnnf_nas_tpu.train.optimizer import OptimizerConfig, make_optimizer

    rng = np.random.RandomState(0)
    # ill-conditioned quadratic: loss = ||A (w - t)||^2 with A spectrum 1..30
    d = 16
    q, _ = np.linalg.qr(rng.randn(d, d))
    a = (q * np.linspace(1.0, 30.0, d)) @ q.T
    A = jnp.asarray(a.astype(np.float32))
    target = jnp.asarray(rng.randn(d, 8).astype(np.float32))

    def loss(p):
        return jnp.sum(jnp.square(A @ (p["w"] - target))) + jnp.sum(
            jnp.square(p["b"] - 1.0))

    def run(kind, lr):
        cfg = OptimizerConfig(kind=kind, lr_initial=lr, lr_final=lr,
                              num_steps=100, max_change_per_leaf=1e9,
                              max_change_global=1e9, ng_update_period=5)
        init_fn, update_fn = make_optimizer(cfg)
        params = {"w": jnp.zeros((d, 8)), "b": jnp.zeros((4,))}
        state = init_fn(params)
        step = jax.jit(lambda p, s, i: update_fn(jax.grad(loss)(p), s, p, i))
        for i in range(60):
            params, state = step(params, state, jnp.asarray(i))
        return float(loss(params))

    lr = 2e-3
    l_ng = run("ng", lr)
    l_sgd = run("sgd", lr)
    assert l_ng < 0.5 * l_sgd, (l_ng, l_sgd)

    # oversized side falls back to identity (no cl/pl state)
    cfg = OptimizerConfig(kind="ng", ng_max_dim=8)
    init_fn, update_fn = make_optimizer(cfg)
    params = {"w": jnp.zeros((16, 8))}
    st = init_fn(params)
    assert "cl" not in st["ng"]["w"] and "cr" in st["ng"]["w"]
    g = {"w": jnp.ones((16, 8))}
    newp, _ = update_fn(g, st, params, jnp.asarray(0))
    assert newp["w"].shape == (16, 8)
    assert np.isfinite(np.asarray(newp["w"])).all()
