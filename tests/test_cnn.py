"""CNN front-end + cnn-tdnn model tests."""

import numpy as np
import jax
import jax.numpy as jnp

from tdnnf_nas_tpu.models import TdnnfModelConfig, SearchMode
from tdnnf_nas_tpu.models.cnn import (
    ConvLayerConfig,
    ConvDartsLayerConfig,
    ResBlockConfig,
    CnnFrontendConfig,
    CnnTdnnfModelConfig,
    init_cnn_frontend,
    apply_cnn_frontend,
    init_cnn_tdnnf,
    apply_cnn_tdnnf,
    cnn_tdnnf_context,
)


def test_conv_frontend_shapes():
    cfg = CnnFrontendConfig(
        in_height=20,
        layers=(
            ConvLayerConfig(out_channels=8, time_offsets=(-1, 0, 1)),
            ConvLayerConfig(out_channels=16, time_offsets=(-1, 0, 1),
                            height_subsample=2),
        ),
    )
    assert cfg.left_context == 2 and cfg.right_context == 2
    assert cfg.out_height() == 10
    assert cfg.out_dim() == 160
    params, bn = init_cnn_frontend(cfg, jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.RandomState(0).randn(2, 30, 20).astype(np.float32))
    out, new_bn, consumed = apply_cnn_frontend(cfg, params, bn, x, train=True)
    assert out.shape == (2, 26, 160)
    assert consumed == 2
    assert np.isfinite(np.asarray(out)).all()


def test_conv_resblock_and_channel_average():
    cfg = CnnFrontendConfig(
        in_height=16,
        layers=(
            ConvLayerConfig(out_channels=8, time_offsets=(-1, 0, 1)),
            ResBlockConfig(channels=8, time_offsets=(-1, 0, 1)),
        ),
        channel_average=True,
    )
    assert cfg.left_context == 1 + 2
    params, bn = init_cnn_frontend(cfg, jax.random.PRNGKey(1))
    x = jnp.ones((1, 20, 16))
    out, _, consumed = apply_cnn_frontend(cfg, params, bn, x, train=False)
    assert out.shape == (1, 20 - 6, 8)  # channel-average collapses height
    assert consumed == 3


def test_conv_darts_layer_modes():
    cfg = CnnFrontendConfig(
        in_height=12,
        layers=(
            ConvDartsLayerConfig(out_channels=8,
                                 candidates=((0,), (-1, 0, 1), (-2, 0, 2))),
        ),
    )
    assert cfg.left_context == 2 and cfg.right_context == 2
    params, bn = init_cnn_frontend(cfg, jax.random.PRNGKey(2))
    alphas = jnp.zeros((1, 3))
    x = jnp.asarray(np.random.RandomState(1).randn(2, 15, 12).astype(np.float32))
    for mode in (SearchMode.UNIFORM, SearchMode.GUMBEL, SearchMode.SOFTMAX,
                 SearchMode.FIXED):
        out, _, consumed = apply_cnn_frontend(
            cfg, params, bn, x, alphas=alphas, mode=mode, tau=0.5,
            key=jax.random.PRNGKey(3), train=True,
        )
        assert out.shape == (2, 11, 8 * 12), mode
        assert consumed == 2
        assert np.isfinite(np.asarray(out)).all()


def test_cnn_tdnnf_model_forward_and_grad():
    cfg = CnnTdnnfModelConfig(
        cnn=CnnFrontendConfig(
            in_height=16,
            layers=(ConvLayerConfig(out_channels=8, time_offsets=(-1, 0, 1)),),
        ),
        tdnnf=TdnnfModelConfig(
            feat_dim=16, ivector_dim=0, hidden_dim=24, bottleneck_dim=8,
            time_strides=(1, 3), num_pdfs=10, prefinal_big=24,
            prefinal_small=12, compute_dtype="float32",
        ),
    )
    left, right = cnn_tdnnf_context(cfg)
    assert left == right == 1 + 1 + 3
    params, alphas, bn = init_cnn_tdnnf(cfg, jax.random.PRNGKey(0))
    assert alphas == {}
    w = 6
    t_in = left + (w - 1) * 3 + 1 + right
    x = jnp.asarray(np.random.RandomState(2).randn(2, t_in, 16).astype(np.float32))
    chain, xent, new_bn = apply_cnn_tdnnf(cfg, params, bn, x, train=True)
    assert chain.shape == (2, w, 10) and xent.shape == (2, w, 10)

    # output layer is zero-initialized (Kaldi-style); give it mass so the
    # grad check exercises the whole network
    params["output_chain"]["w"] = jnp.asarray(
        np.random.RandomState(3).randn(12, 10).astype(np.float32) * 0.1)

    def loss(p):
        c, _, _ = apply_cnn_tdnnf(cfg, p, bn, x, train=True)
        return jnp.sum(c**2)

    g = jax.grad(loss)(params)
    gn = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree.leaves(g))
    assert np.isfinite(gn) and gn > 0


def test_res2block_pre_activation():
    """Res2Block (pre-activation resnet, `convolution.py:1203`): BN->ReLU->
    conv ordering, identity bypass, gradient flows."""
    cfg = CnnFrontendConfig(
        in_height=16,
        layers=(
            ConvLayerConfig(out_channels=8, time_offsets=(-1, 0, 1)),
            ResBlockConfig(channels=8, time_offsets=(-1, 0, 1),
                           pre_activation=True),
        ),
        channel_average=True,
    )
    params, bn = init_cnn_frontend(cfg, jax.random.PRNGKey(1))
    assert "conv1_0" in bn  # the extra pre-activation BN slot
    x = jnp.asarray(np.random.RandomState(0).randn(2, 20, 16).astype(np.float32))
    out, new_bn, consumed = apply_cnn_frontend(cfg, params, bn, x, train=True)
    assert out.shape == (2, 14, 8)
    assert consumed == 3
    g = jax.grad(lambda p: jnp.sum(
        apply_cnn_frontend(cfg, p, bn, x, train=True)[0] ** 2))(params)
    assert float(jnp.abs(g["conv1"]["w1"]).max()) > 0
