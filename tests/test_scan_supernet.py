"""Scanned (lax.scan-over-layers) supernet == unrolled supernet."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tdnnf_nas_tpu.models import (
    TdnnfModelConfig, DartsModelConfig, SearchMode, init_supernet,
    apply_supernet,
)

BASE = TdnnfModelConfig(
    feat_dim=8, ivector_dim=0, hidden_dim=16, bottleneck_dim=4,
    time_strides=(1, 1, 1), num_pdfs=6, prefinal_big=16, prefinal_small=8,
    compute_dtype="float32",
)


@pytest.mark.parametrize("train,bn_frozen", [(False, False), (True, False),
                                             (True, True)])
def test_scan_matches_unrolled_softmax(train, bn_frozen):
    cfg_scan = DartsModelConfig(base=BASE, search_offsets=True, max_stride=2,
                                scan_layers=True)
    cfg_unr = cfg_scan.replace(scan_layers=False)
    params, alphas, bn = init_supernet(cfg_unr, jax.random.PRNGKey(0))
    alphas = {k: jnp.asarray(np.random.RandomState(1).randn(*v.shape)
                             .astype(np.float32)) for k, v in alphas.items()}
    k_cands = cfg_scan.num_candidates
    t_in = (1 + 2 * 3) * 2 + 4 * 3 + 1  # generous
    x = jnp.asarray(np.random.RandomState(2).randn(3, t_in, 8).astype(np.float32))
    out_u = apply_supernet(cfg_unr, params, alphas, bn, x,
                           mode=SearchMode.SOFTMAX, tau=0.7,
                           key=jax.random.PRNGKey(3), train=train,
                           bn_frozen=bn_frozen)
    out_s = apply_supernet(cfg_scan, params, alphas, bn, x,
                           mode=SearchMode.SOFTMAX, tau=0.7,
                           key=jax.random.PRNGKey(3), train=train,
                           bn_frozen=bn_frozen)
    np.testing.assert_allclose(np.asarray(out_s[0]), np.asarray(out_u[0]),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out_s[1]), np.asarray(out_u[1]),
                               rtol=2e-4, atol=2e-5)
    # BN stats agree layerwise
    for name in out_u[2]:
        for f in ("mean", "var"):
            np.testing.assert_allclose(np.asarray(out_s[2][name][f]),
                                       np.asarray(out_u[2][name][f]),
                                       rtol=2e-4, atol=2e-5)


def test_scan_with_bottleneck_and_sampling_modes():
    cfg = DartsModelConfig(
        base=BASE, search_offsets=True, max_stride=2, scan_layers=True,
        search_bottleneck=True, bottleneck_groups=(2, 2),
    )
    params, alphas, bn = init_supernet(cfg, jax.random.PRNGKey(0))
    t_in = (1 + 2 * 3) * 2 + 4 * 3 + 1
    x = jnp.ones((2, t_in, 8))
    for mode in (SearchMode.UNIFORM, SearchMode.GUMBEL, SearchMode.FREE):
        chain, xent, new_bn, coefs = apply_supernet(
            cfg, params, alphas, bn, x, mode=mode, tau=0.5,
            key=jax.random.PRNGKey(1), train=True,
        )
        assert np.isfinite(np.asarray(chain)).all(), mode
        assert "tdnnf2_linear" in coefs


def test_scan_gradients_flow_to_alphas():
    cfg = DartsModelConfig(base=BASE, search_offsets=True, max_stride=2,
                           scan_layers=True)
    params, alphas, bn = init_supernet(cfg, jax.random.PRNGKey(0))
    params["output_chain"]["w"] = jnp.asarray(
        np.random.RandomState(4).randn(8, 6).astype(np.float32) * 0.1)
    t_in = (1 + 2 * 3) * 2 + 4 * 3 + 1
    x = jnp.asarray(np.random.RandomState(5).randn(2, t_in, 8).astype(np.float32))

    def loss(al):
        c, _, _, _ = apply_supernet(cfg, params, al, bn, x,
                                    mode=SearchMode.SOFTMAX, tau=1.0,
                                    key=jax.random.PRNGKey(1), train=True)
        return jnp.sum(c**2)

    g = jax.grad(loss)(alphas)
    gn = float(sum(jnp.sum(jnp.abs(v)) for v in jax.tree.leaves(g)))
    assert np.isfinite(gn) and gn > 0


# ---- property sweep (VERDICT round-1 item #10): scan == unrolled across
# (layers, K, dtype, bottleneck on/off, per-sequence sampling), incl. grads
# (fidelity anchor: nnet-tdnn-component.cc:214-431) ----

_SWEEP = [
    # (strides, max_stride, dtype, bottleneck, per_seq)
    ((1, 1), 1, "float32", False, False),
    ((1, 1, 1, 1), 2, "float32", False, False),
    ((1, 1, 1), 3, "float32", False, False),
    ((1, 1, 1), 2, "bfloat16", False, False),
    ((1, 1, 1), 2, "float32", True, False),
    ((1, 1, 1, 1, 1), 2, "float32", True, False),
    ((1, 1, 1), 2, "bfloat16", True, False),
    ((1, 1, 1), 2, "float32", False, True),
    ((1, 1, 1), 2, "float32", True, True),
]


@pytest.mark.parametrize("strides,max_stride,dtype,bneck,per_seq", _SWEEP)
def test_scan_equivalence_property(strides, max_stride, dtype, bneck, per_seq):
    base = BASE.replace(time_strides=strides, compute_dtype=dtype)
    kw = dict(search_offsets=True, max_stride=max_stride,
              sample_per_sequence=per_seq)
    if bneck:
        kw.update(search_bottleneck=True, bottleneck_groups=(2, 2))
    cfg_scan = DartsModelConfig(base=base, scan_layers=True, **kw)
    cfg_unr = cfg_scan.replace(scan_layers=False)
    params, alphas, bn = init_supernet(cfg_unr, jax.random.PRNGKey(7))
    rng = np.random.RandomState(11)
    alphas = {k: jnp.asarray(rng.randn(*v.shape).astype(np.float32))
              for k, v in alphas.items()}
    k = cfg_scan.num_candidates
    n_layers = len(strides)
    t_in = 2 * (1 + n_layers * (k - 1)) + 6 * 3 + 1
    x = jnp.asarray(rng.randn(2, t_in, base.feat_dim).astype(np.float32))
    key = jax.random.PRNGKey(3)

    def run(cfg):
        return apply_supernet(cfg, params, alphas, bn, x,
                              mode=SearchMode.SOFTMAX, tau=0.8, key=key,
                              train=True)

    out_u = run(cfg_unr)
    out_s = run(cfg_scan)
    tol = dict(rtol=3e-2, atol=3e-2) if dtype == "bfloat16" else \
        dict(rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(out_s[0], np.float32),
                               np.asarray(out_u[0], np.float32), **tol)

    # gradients w.r.t. params AND alphas agree (softmax mode, deterministic)
    def loss(cfg, p, al):
        c, xe, _, _ = apply_supernet(cfg, p, al, bn, x,
                                     mode=SearchMode.SOFTMAX, tau=0.8,
                                     key=key, train=True)
        return jnp.sum(jnp.square(c.astype(jnp.float32))) + 0.5 * jnp.sum(
            jnp.square(xe.astype(jnp.float32)))

    gu = jax.grad(lambda p, al: loss(cfg_unr, p, al), argnums=(0, 1))(
        params, alphas)
    gs = jax.grad(lambda p, al: loss(cfg_scan, p, al), argnums=(0, 1))(
        params, alphas)
    gtol = dict(rtol=5e-2, atol=5e-2) if dtype == "bfloat16" else \
        dict(rtol=2e-3, atol=2e-4)
    for a, b in zip(jax.tree.leaves(gu), jax.tree.leaves(gs)):
        np.testing.assert_allclose(np.asarray(b, np.float32),
                                   np.asarray(a, np.float32), **gtol)
