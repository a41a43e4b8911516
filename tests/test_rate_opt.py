"""Rate-optimized (subsampled upper layers) forward == dense forward."""

import numpy as np
import jax
import jax.numpy as jnp

from tdnnf_nas_tpu.models import TdnnfModelConfig, init_model, apply_model, chunk_input_frames
from tdnnf_nas_tpu.models.tdnnf import _subsample_layer_index


def test_subsample_index():
    cfg = TdnnfModelConfig(time_strides=(1, 1, 1, 0, 3, 3, 3))
    # stride 0 and 3s are all divisible by 3 => subsample before layer 3 (the 0)
    assert _subsample_layer_index(cfg) == 3
    cfg2 = TdnnfModelConfig(time_strides=(3, 3, 3))
    assert _subsample_layer_index(cfg2) == 0
    cfg3 = TdnnfModelConfig(time_strides=(1, 3, 1))
    assert _subsample_layer_index(cfg3) == 3  # trailing 1 blocks optimization


def test_rate_optimized_forward_matches_dense():
    base = dict(
        feat_dim=6, ivector_dim=0, hidden_dim=16, bottleneck_dim=4,
        time_strides=(1, 0, 3, 3), num_pdfs=8, prefinal_big=16,
        prefinal_small=8, compute_dtype="float32",
    )
    cfg_opt = TdnnfModelConfig(**base, rate_optimize=True)
    cfg_dense = TdnnfModelConfig(**base, rate_optimize=False)
    assert _subsample_layer_index(cfg_opt) == 1
    params, bn = init_model(cfg_dense, jax.random.PRNGKey(0))
    w = 6
    t_in = chunk_input_frames(cfg_dense, w)
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(3, t_in, 6).astype(np.float32))
    # eval mode (stored BN stats) => paths must agree exactly
    c1, x1, _ = apply_model(cfg_dense, params, bn, feats, train=False)
    c2, x2, _ = apply_model(cfg_opt, params, bn, feats, train=False)
    assert c1.shape == c2.shape == (3, w, 8)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), rtol=1e-5, atol=1e-5)


def test_rate_optimized_asym():
    base = dict(
        feat_dim=6, ivector_dim=0, hidden_dim=16, bottleneck_dim=4,
        time_strides_asym=((1, 2), (3, 0), (0, 3)), num_pdfs=8,
        prefinal_big=16, prefinal_small=8, compute_dtype="float32",
    )
    cfg_opt = TdnnfModelConfig(**base, rate_optimize=True)
    cfg_dense = TdnnfModelConfig(**base, rate_optimize=False)
    assert _subsample_layer_index(cfg_opt) == 1
    params, bn = init_model(cfg_dense, jax.random.PRNGKey(1))
    t_in = chunk_input_frames(cfg_dense, 5)
    rng = np.random.RandomState(1)
    feats = jnp.asarray(rng.randn(2, t_in, 6).astype(np.float32))
    c1, _, _ = apply_model(cfg_dense, params, bn, feats, train=False)
    c2, _, _ = apply_model(cfg_opt, params, bn, feats, train=False)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), rtol=1e-5, atol=1e-5)
