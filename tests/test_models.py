"""TDNN-F model + DARTS supernet tests."""

import numpy as np
import jax
import jax.numpy as jnp

from tdnnf_nas_tpu.models import (
    TdnnfModelConfig,
    init_model,
    apply_model,
    model_context,
    chunk_input_frames,
    count_params,
    DartsModelConfig,
    SearchMode,
    init_supernet,
    apply_supernet,
    branch_coefs,
)
from tdnnf_nas_tpu.models.nas import _bottleneck_mask, BOTTLENECK_GROUPS, expected_flops
from tdnnf_nas_tpu.nas import (
    beam_search_archs,
    extract_offsets,
    child_config_from_arch,
    arch_param_count,
    temperature_at,
)

TINY = TdnnfModelConfig(
    feat_dim=8, ivector_dim=0, hidden_dim=32, bottleneck_dim=8,
    time_strides=(1, 0, 3), num_pdfs=10, prefinal_big=32, prefinal_small=16,
    compute_dtype="float32",
)


def test_model_context_and_shapes():
    left, right = model_context(TINY)
    assert left == right == 1 + 1 + 0 + 3
    w = 7
    t_in = chunk_input_frames(TINY, w)
    params, bn = init_model(TINY, jax.random.PRNGKey(0))
    feats = jnp.zeros((2, t_in, 8))
    chain, xent, new_bn = apply_model(TINY, params, bn, feats, train=True)
    assert chain.shape == (2, w, 10)
    assert xent.shape == (2, w, 10)
    assert set(new_bn) == set(bn)


def test_model_asym_strides():
    cfg = TINY.replace(time_strides_asym=((1, 2), (0, 0), (3, 1)))
    left, right = model_context(cfg)
    assert left == 1 + 1 + 0 + 3 and right == 1 + 2 + 0 + 1
    t_in = chunk_input_frames(cfg, 5)
    params, bn = init_model(cfg, jax.random.PRNGKey(1))
    chain, _, _ = apply_model(cfg, params, bn, jnp.zeros((1, t_in, 8)))
    assert chain.shape == (1, 5, 10)


def test_param_count_matches_analytic():
    params, _ = init_model(TINY, jax.random.PRNGKey(0))
    assert count_params(params) == arch_param_count(TINY)


def test_branch_coefs_modes():
    key = jax.random.PRNGKey(0)
    alpha = jnp.asarray([0.0, 1.0, -1.0, 0.5])
    c = branch_coefs(alpha, SearchMode.SOFTMAX, 1.0, None, share_index=0)
    assert float(c[0]) == 1.0  # share forced on
    np.testing.assert_allclose(
        np.asarray(c[1:]), np.asarray(jax.nn.softmax(alpha))[1:], atol=1e-6
    )
    c = branch_coefs(alpha, SearchMode.GUMBEL, 0.5, key, share_index=0)
    assert float(c[0]) == 1.0 and np.all(np.asarray(c) > 0)
    c = branch_coefs(alpha, SearchMode.FREE, 1.0, None, share_index=0)
    np.testing.assert_allclose(np.asarray(c), np.asarray(jax.nn.sigmoid(alpha)), atol=1e-6)
    c = np.asarray(branch_coefs(alpha, SearchMode.UNIFORM, 1.0, key, share_index=3))
    assert c[3] == 1.0 and c.sum() in (1.0, 2.0)  # share + possibly one sample
    assert set(np.unique(c)) <= {0.0, 1.0}
    # batched sampling
    cb = np.asarray(branch_coefs(alpha, SearchMode.UNIFORM, 1.0, key,
                                 share_index=3, batch=5))
    assert cb.shape == (5, 4) and (cb[:, 3] == 1.0).all()


def test_bottleneck_mask_nested():
    coef = jnp.asarray(jax.nn.one_hot(2, 8))  # candidate 2 => dims 25+25+30=80
    mask = np.asarray(_bottleneck_mask(coef, BOTTLENECK_GROUPS))
    assert mask.shape == (240,)
    assert mask[:80].min() == 1.0 and mask[80:].max() == 0.0
    # soft coefs: nested partial sums, monotone decreasing over groups
    coef = jax.nn.softmax(jnp.arange(8.0))
    m = np.asarray(_bottleneck_mask(coef, BOTTLENECK_GROUPS))
    assert m[0] >= m[100] >= m[239] - 1e-6
    np.testing.assert_allclose(m[0], 1.0, atol=1e-5)


def test_supernet_forward_modes():
    base = TINY.replace(time_strides=(1, 1))
    cfg = DartsModelConfig(base=base, search_offsets=True, max_stride=3)
    params, alphas, bn = init_supernet(cfg, jax.random.PRNGKey(0))
    assert alphas["offsets_linear"].shape == (2, 4)
    from tdnnf_nas_tpu.models import supernet_context

    left, right = supernet_context(cfg)
    assert left == right == 1 + 3 * 2
    t_in = left + 4 * 3 + 1 + right  # 5 output frames
    feats = jnp.ones((2, t_in, 8))
    for mode in (SearchMode.UNIFORM, SearchMode.GUMBEL, SearchMode.SOFTMAX,
                 SearchMode.FREE, SearchMode.FIXED):
        chain, xent, new_bn, coefs = apply_supernet(
            cfg, params, alphas, bn, feats, mode=mode, tau=0.5,
            key=jax.random.PRNGKey(1), train=True,
        )
        assert chain.shape == (2, 5, 10), mode
        assert np.isfinite(np.asarray(chain)).all(), mode
    assert "tdnnf2_linear" in coefs


def test_supernet_bottleneck_search():
    base = TINY.replace(time_strides=(1, 1), bottleneck_dim=0)
    cfg = DartsModelConfig(
        base=base, search_offsets=False, fixed_strides=((1, 1), (1, 1)),
        search_bottleneck=True, bottleneck_groups=(4, 4, 8),
    )
    params, alphas, bn = init_supernet(cfg, jax.random.PRNGKey(0))
    assert alphas["bottleneck"].shape == (2, 3)
    assert params["tdnnf2"]["linear"].shape == (2, 32, 16)
    t_in = 3 + 4 * 3 + 1 + 3
    chain, _, _, coefs = apply_supernet(
        cfg, params, alphas, bn, jnp.ones((1, t_in, 8)),
        mode=SearchMode.UNIFORM, key=jax.random.PRNGKey(2), train=True,
    )
    assert chain.shape == (1, 5, 10)
    ef = float(expected_flops(alphas["bottleneck"], cfg))
    assert abs(ef - 2 * np.mean([4, 8, 16])) < 1e-4  # uniform alphas


def test_beam_search_matches_bruteforce():
    rng = np.random.RandomState(0)
    logits = rng.randn(4, 3)
    got = beam_search_archs(logits, beam=50, top_k=5)
    # brute force
    from itertools import product

    def lsm(x):
        e = np.exp(x - x.max())
        return np.log(e / e.sum())

    lp = np.stack([lsm(l) for l in logits])
    all_archs = sorted(
        ((idx, sum(lp[c, i] for c, i in enumerate(idx)))
         for idx in product(range(3), repeat=4)),
        key=lambda h: -h[1],
    )
    for (gi, gl), (bi, bl) in zip(got, all_archs[:5]):
        assert gi == bi
        np.testing.assert_allclose(gl, bl, atol=1e-6)


def test_extraction_to_child_config():
    alpha_lin = np.zeros((3, 4)); alpha_lin[:, 2] = 5.0
    alpha_aff = np.zeros((3, 4)); alpha_aff[:, 1] = 5.0
    archs = extract_offsets(alpha_lin, alpha_aff, top_k=1)
    pairs, _ = archs[0]
    assert pairs == ((2, 1), (2, 1), (2, 1))
    child = child_config_from_arch(TINY, stride_pairs=pairs,
                                   bottleneck_dims=(4, 8, 4))
    assert child.stride_pairs == pairs
    assert child.layer_bottleneck(1) == 8
    params, _ = init_model(child, jax.random.PRNGKey(0))
    assert count_params(params) == arch_param_count(child)


def test_temperature_schedule():
    assert abs(temperature_at(0.0) - 1.0) < 1e-9
    assert abs(temperature_at(1.0) - 0.03) < 1e-9
    assert abs(temperature_at(0.5) - (0.5 * 0.97 + 0.03)) < 1e-9


def test_argmax_straight_through_mode():
    alpha = jnp.asarray([0.2, 1.5, -0.3])
    c = branch_coefs(alpha, SearchMode.ARGMAX_ST, 1.0, None, share_index=0)
    np.testing.assert_allclose(np.asarray(c), [1.0, 1.0, 0.0], atol=1e-6)
    # gradient flows via the softmax (straight-through)
    g = jax.grad(lambda a: jnp.sum(
        branch_coefs(a, SearchMode.ARGMAX_ST, 1.0, None, share_index=None)
        * jnp.asarray([1.0, 2.0, 3.0])))(alpha)
    soft_g = jax.grad(lambda a: jnp.sum(
        jax.nn.softmax(a) * jnp.asarray([1.0, 2.0, 3.0])))(alpha)
    np.testing.assert_allclose(np.asarray(g), np.asarray(soft_g), atol=1e-6)


def test_svd_reduce_bottleneck():
    """apply-svd equivalent: rank reduction preserves the forward map up to
    the discarded singular mass; exact when rank == existing bottleneck."""
    from tdnnf_nas_tpu.train.transforms import svd_factor, svd_reduce_bottleneck

    cfg = TINY
    params, bn = init_model(cfg, jax.random.PRNGKey(5))
    # random (not zero) output head so outputs are informative
    for head in ("chain", "xent"):
        params[f"output_{head}"]["w"] = (
            jax.random.normal(jax.random.PRNGKey(6),
                              params[f"output_{head}"]["w"].shape) * 0.1)
    t_in = chunk_input_frames(cfg, 6)
    feats = jax.random.normal(jax.random.PRNGKey(7), (2, t_in, cfg.feat_dim))
    ref, _, _ = apply_model(cfg, params, bn, feats)

    # full-rank "reduction" is exact (orthonormal basis change)
    cfg_same, p_same = svd_reduce_bottleneck(cfg, params,
                                             [cfg.bottleneck_dim] * cfg.num_tdnnf)
    out_same, _, _ = apply_model(cfg_same, p_same, bn, feats)
    np.testing.assert_allclose(np.asarray(out_same), np.asarray(ref),
                               rtol=1e-3, atol=1e-4)

    # rank-4 reduction: right shapes, param count drops, output still close
    dims = [4] * cfg.num_tdnnf
    cfg_r, p_r = svd_reduce_bottleneck(cfg, params, dims)
    assert cfg_r.layer_bottleneck(0) == 4
    assert p_r["tdnnf2"]["linear"].shape[-1] == 4
    assert p_r["tdnnf2"]["affine"].shape[1] == 4
    assert count_params(p_r) < count_params(params)
    out_r, _, _ = apply_model(cfg_r, p_r, bn, feats)
    rel = (np.linalg.norm(np.asarray(out_r) - np.asarray(ref))
           / np.linalg.norm(np.asarray(ref)))
    assert rel < 0.9, rel  # informative approximation, not garbage

    # generic single-matrix factorization
    w = np.asarray(jax.random.normal(jax.random.PRNGKey(8), (20, 12)))
    a, b, err = svd_factor(w, 12)
    np.testing.assert_allclose(a @ b, w, rtol=1e-4, atol=1e-5)
    assert err < 1e-6
    a, b, err = svd_factor(w, 4)
    assert a.shape == (20, 4) and b.shape == (4, 12) and 0 < err < 1
