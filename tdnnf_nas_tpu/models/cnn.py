"""CNN (2-D time-height convolution) front-ends for cnn-tdnn models.

TPU-native equivalent of the reference's convolution xconfig family
(`steps/libs/nnet3/xconfig/convolution.py`): `XconfigConvLayer` (:115,
TimeHeightConvolutionComponent), `XconfigConvDARTSLayer` (:329 — DARTS over
candidate time-offset patterns with use-gumbel/uniform-sample/Temp-
Proportion), `XconfigResBlock` (:844), `ChannelAverageLayer` (:1577).

Features are treated as [B, T, H, C] (freq-bins x channels) and convolved
with `lax.conv_general_dilated` in NHWC — XLA maps this straight onto the
MXU.  Time stays valid-convolution (context accounted like the TDNN
layers); height is SAME-padded with optional subsampling, as in the
reference convs.  The ConvDARTS layer mixes K candidate time-offset
branches with the same coefficient modes as the TDNN-F supernet
(`models/nas.branch_coefs`).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tdnnf_nas_tpu.core.config import Config
from tdnnf_nas_tpu.models import tdnnf as base
from tdnnf_nas_tpu.models.nas import SearchMode, branch_coefs

BN_EPS = base.BN_EPS


@dataclasses.dataclass(frozen=True)
class ConvLayerConfig(Config):
    """One time-height conv layer (XconfigConvLayer equivalent)."""

    out_channels: int = 64
    time_offsets: Tuple[int, ...] = (-1, 0, 1)
    height_kernel: int = 3
    height_subsample: int = 1
    relu: bool = True
    batchnorm: bool = True


@dataclasses.dataclass(frozen=True)
class ConvDartsLayerConfig(Config):
    """DARTS conv layer: K candidate time-offset patterns, mixed by alpha
    (XconfigConvDARTSLayer equivalent)."""

    out_channels: int = 64
    # candidate time-offset patterns; index 0 is the always-on share branch
    candidates: Tuple[Tuple[int, ...], ...] = ((0,), (-1, 0, 1), (-2, 0, 2), (-3, 0, 3))
    height_kernel: int = 3
    height_subsample: int = 1


@dataclasses.dataclass(frozen=True)
class ResBlockConfig(Config):
    """Two conv layers + identity bypass.

    pre_activation=False: conv->BN->ReLU ordering (`XconfigResBlock`,
    `steps/libs/nnet3/xconfig/convolution.py:844`).
    pre_activation=True: BN->ReLU->conv "resnet v2" ordering
    (`XconfigRes2Block`, `convolution.py:1203`).
    """

    channels: int = 64
    time_offsets: Tuple[int, ...] = (-1, 0, 1)
    height_kernel: int = 3
    pre_activation: bool = False


@dataclasses.dataclass(frozen=True)
class CnnFrontendConfig(Config):
    """Stack of conv / res / conv-darts layers + channel-average collapse."""

    in_height: int = 40  # freq bins
    layers: Tuple[ConvLayerConfig, ...] = (
        ConvLayerConfig(out_channels=32),
        ConvLayerConfig(out_channels=32, height_subsample=2),
        ConvLayerConfig(out_channels=64),
    )
    channel_average: bool = False  # ChannelAverageLayer at the end

    @property
    def left_context(self) -> int:
        return sum(_span_of(l)[0] for l in self.layers)

    @property
    def right_context(self) -> int:
        return sum(_span_of(l)[1] for l in self.layers)

    def out_height(self) -> int:
        h = self.in_height
        for l in self.layers:
            hs = getattr(l, "height_subsample", 1)
            h = (h + hs - 1) // hs
        return h

    def out_dim(self) -> int:
        last_c = self.layers[-1].out_channels if hasattr(self.layers[-1], "out_channels") \
            else self.layers[-1].channels
        if self.channel_average:
            return last_c
        return self.out_height() * last_c


def _span_of(layer) -> Tuple[int, int]:
    """(left, right) time context consumed by one layer."""
    if isinstance(layer, ConvDartsLayerConfig):
        return (max(-min(c) for c in layer.candidates),
                max(max(c) for c in layer.candidates))
    if isinstance(layer, ResBlockConfig):
        return (-2 * min(layer.time_offsets), 2 * max(layer.time_offsets))
    return (-min(layer.time_offsets), max(layer.time_offsets))


def _conv_kernel_init(key, k_t, k_h, c_in, c_out):
    fan = k_t * k_h * c_in
    return (jax.random.normal(key, (k_t, k_h, c_in, c_out), jnp.float32)
            / np.sqrt(fan))


def init_cnn_frontend(cfg: CnnFrontendConfig, key: jax.Array):
    params, bn_state = {}, {}
    keys = iter(jax.random.split(key, 4 * len(cfg.layers)))
    c_in = 1
    for i, layer in enumerate(cfg.layers):
        name = f"conv{i}"
        if isinstance(layer, ConvDartsLayerConfig):
            branches = {}
            for j, cand in enumerate(layer.candidates):
                branches[f"b{j}"] = _conv_kernel_init(
                    next(keys), len(cand), layer.height_kernel, c_in,
                    layer.out_channels)
            params[name] = {"branches": branches,
                            "bias": jnp.zeros((layer.out_channels,))}
            c_out = layer.out_channels
        elif isinstance(layer, ResBlockConfig):
            params[name] = {
                "w1": _conv_kernel_init(next(keys), len(layer.time_offsets),
                                        layer.height_kernel, c_in, layer.channels),
                "w2": _conv_kernel_init(next(keys), len(layer.time_offsets),
                                        layer.height_kernel, layer.channels,
                                        layer.channels),
                "bias1": jnp.zeros((layer.channels,)),
                "bias2": jnp.zeros((layer.channels,)),
            }
            bn_state[name + "_1"] = {"mean": jnp.zeros((layer.channels,)),
                                     "var": jnp.ones((layer.channels,))}
            if layer.pre_activation:
                bn_state[name + "_0"] = {"mean": jnp.zeros((c_in,)),
                                         "var": jnp.ones((c_in,))}
            c_out = layer.channels
        else:
            params[name] = {
                "w": _conv_kernel_init(next(keys), len(layer.time_offsets),
                                       layer.height_kernel, c_in,
                                       layer.out_channels),
                "bias": jnp.zeros((layer.out_channels,)),
            }
            c_out = layer.out_channels
        bn_state[name] = {"mean": jnp.zeros((c_out,)), "var": jnp.ones((c_out,))}
        c_in = c_out
    return params, bn_state


def _conv2d(x, w, height_subsample=1, time_dilation=1):
    """x [B,T,H,C] -> valid in time, SAME in height, NHWC conv."""
    return jax.lax.conv_general_dilated(
        x, w,
        window_strides=(1, height_subsample),
        padding=((0, 0), ((w.shape[1] - 1) // 2, w.shape[1] // 2)),
        rhs_dilation=(time_dilation, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )


def _bn4(x, stats, train):
    """Batchnorm over (B,T,H) per channel on [B,T,H,C]."""
    if train:
        mean = jnp.mean(x, axis=(0, 1, 2))
        var = jnp.mean(jnp.square(x), axis=(0, 1, 2)) - mean**2
        new = {"mean": base.BN_DECAY * stats["mean"] + (1 - base.BN_DECAY) * mean,
               "var": base.BN_DECAY * stats["var"] + (1 - base.BN_DECAY) * var}
    else:
        mean, var = stats["mean"], stats["var"]
        new = stats
    return (x - mean) * jax.lax.rsqrt(jnp.maximum(var, 0.0) + BN_EPS), new


def _branch_conv(x, w, offsets, dt):
    """Conv restricted to the given time offsets (contiguous or dilated)."""
    offs = tuple(offsets)
    if len(offs) == 1:
        # 1x1 in time at the given offset; slice handled by caller alignment
        return _conv2d(x.astype(dt), w.astype(dt))
    step = offs[1] - offs[0]
    assert all(offs[i + 1] - offs[i] == step for i in range(len(offs) - 1)), offs
    return _conv2d(x.astype(dt), w.astype(dt), time_dilation=step)


def apply_cnn_frontend(
    cfg: CnnFrontendConfig,
    params,
    bn_state,
    feats: jax.Array,  # [B, T, H]
    alphas: Optional[jax.Array] = None,  # [num_darts_layers, K]
    mode: str = SearchMode.FIXED,
    tau=1.0,
    key: Optional[jax.Array] = None,
    train: bool = False,
):
    """Returns (hidden [B, T', D], new_bn_state, consumed_left)."""
    new_bn = {}
    x = feats[..., None]  # [B,T,H,1]
    dt = jnp.bfloat16 if feats.dtype == jnp.bfloat16 else jnp.float32
    darts_idx = 0
    keys = iter(jax.random.split(key, 8)) if key is not None else None
    consumed_left = 0
    for i, layer in enumerate(cfg.layers):
        name = f"conv{i}"
        p = params[name]
        if isinstance(layer, ConvDartsLayerConfig):
            coef = branch_coefs(
                alphas[darts_idx], mode, tau,
                next(keys) if keys else None, share_index=0,
            )
            darts_idx += 1
            spans = [(-min(c), max(c)) for c in layer.candidates]
            max_l = max(s[0] for s in spans)
            max_r = max(s[1] for s in spans)
            t_out = x.shape[1] - max_l - max_r
            out = None
            for j, cand in enumerate(layer.candidates):
                l_j = -min(cand)
                y = _branch_conv(x[:, max_l - l_j:], p["branches"][f"b{j}"],
                                 cand, dt)[:, :t_out]
                y = y * coef[j]
                out = y if out is None else out + y
            x = out + p["bias"]
            consumed_left += max_l
            x, new_bn[name] = _bn4(jax.nn.relu(x), bn_state[name], train)
        elif isinstance(layer, ResBlockConfig):
            l_span = -min(layer.time_offsets)
            r_span = max(layer.time_offsets)
            trim = l_span + r_span
            prev = x[:, trim : x.shape[1] - trim] if trim else x
            if layer.pre_activation:
                # Res2Block: BN -> ReLU -> conv, twice, + bypass
                h0, new_bn[name + "_0"] = _bn4(x, bn_state[name + "_0"], train)
                h1 = _conv2d(jax.nn.relu(h0).astype(dt),
                             p["w1"].astype(dt)) + p["bias1"]
                h1, new_bn[name + "_1"] = _bn4(h1, bn_state[name + "_1"], train)
                h2 = _conv2d(jax.nn.relu(h1).astype(dt),
                             p["w2"].astype(dt)) + p["bias2"]
                if prev.shape[-1] == h2.shape[-1]:
                    h2 = h2 + prev
                x = h2
                new_bn[name] = bn_state[name]
            else:
                h1 = _conv2d(x.astype(dt), p["w1"].astype(dt)) + p["bias1"]
                h1, new_bn[name + "_1"] = _bn4(jax.nn.relu(h1),
                                               bn_state[name + "_1"], train)
                h2 = _conv2d(h1.astype(dt), p["w2"].astype(dt)) + p["bias2"]
                if prev.shape[-1] == h2.shape[-1]:
                    h2 = h2 + prev
                x, new_bn[name] = _bn4(jax.nn.relu(h2), bn_state[name], train)
            consumed_left += 2 * l_span
        else:
            x = _conv2d(x.astype(dt), p["w"].astype(dt),
                        height_subsample=layer.height_subsample) + p["bias"]
            if layer.relu:
                x = jax.nn.relu(x)
            if layer.batchnorm:
                x, new_bn[name] = _bn4(x, bn_state[name], train)
            else:
                new_bn[name] = bn_state[name]
            consumed_left += -min(layer.time_offsets)
    b, t = x.shape[0], x.shape[1]
    if cfg.channel_average:
        x = jnp.mean(x, axis=2)  # ChannelAverageLayer: average over height
    else:
        x = x.reshape(b, t, -1)
    return x, new_bn, consumed_left


# ---------------------------------------------------------------------------
# cnn-tdnn model assembly (the reference's cnn-tdnn recipe variants)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class CnnTdnnfModelConfig(Config):
    cnn: CnnFrontendConfig = dataclasses.field(default_factory=CnnFrontendConfig)
    tdnnf: base.TdnnfModelConfig = dataclasses.field(
        default_factory=base.TdnnfModelConfig)

    @property
    def num_darts_conv_layers(self) -> int:
        return sum(isinstance(l, ConvDartsLayerConfig) for l in self.cnn.layers)


def cnn_tdnnf_context(cfg: CnnTdnnfModelConfig) -> Tuple[int, int]:
    pairs = cfg.tdnnf.stride_pairs
    return (cfg.cnn.left_context + sum(l for l, _ in pairs),
            cfg.cnn.right_context + sum(r for _, r in pairs))


def init_cnn_tdnnf(cfg: CnnTdnnfModelConfig, key: jax.Array):
    """Returns (params, alphas, bn_state); alphas empty when no conv-darts."""
    k_cnn, k_proj, k_stack = jax.random.split(key, 3)
    cnn_params, cnn_bn = init_cnn_frontend(cfg.cnn, k_cnn)
    t = cfg.tdnnf
    # stack/head params from the base initializer, minus its input block
    stack_params, stack_bn = base.init_model(
        dataclasses.replace(t, feat_dim=1, ivector_dim=0), k_stack
    )
    del stack_params["lda"], stack_params["tdnn1"], stack_bn["tdnn1"]
    params = dict(stack_params)
    params["cnn"] = cnn_params
    params["proj"] = {
        "w": base._linear_init(k_proj, (cfg.cnn.out_dim(), t.hidden_dim),
                               cfg.cnn.out_dim()),
        "b": jnp.zeros((t.hidden_dim,)),
    }
    bn_state = dict(stack_bn)
    bn_state["cnn"] = cnn_bn
    bn_state["proj"] = {"mean": jnp.zeros((t.hidden_dim,)),
                        "var": jnp.ones((t.hidden_dim,))}
    alphas = {}
    n_darts = cfg.num_darts_conv_layers
    if n_darts:
        k = max(len(l.candidates) for l in cfg.cnn.layers
                if isinstance(l, ConvDartsLayerConfig))
        alphas["conv_offsets"] = jnp.zeros((n_darts, k))
    return params, alphas, bn_state


def apply_cnn_tdnnf(
    cfg: CnnTdnnfModelConfig,
    params,
    bn_state,
    feats: jax.Array,  # [B, T, H]
    alphas=None,
    mode: str = SearchMode.FIXED,
    tau=1.0,
    key: Optional[jax.Array] = None,
    train: bool = False,
    dropout_key: Optional[jax.Array] = None,
):
    """Forward of the cnn-tdnn model: conv front-end -> projection ->
    tdnnf stack + heads.  Returns (chain, xent, new_bn_state)."""
    t = cfg.tdnnf
    dt = t.dtype
    new_bn = {}
    x, cnn_bn, consumed_left = apply_cnn_frontend(
        cfg.cnn, params["cnn"], bn_state["cnn"], feats,
        alphas=(alphas or {}).get("conv_offsets"), mode=mode, tau=tau,
        key=key, train=train,
    )
    new_bn["cnn"] = cnn_bn
    x = jnp.matmul(x.astype(dt), params["proj"]["w"].astype(dt),
                   preferred_element_type=jnp.float32) + params["proj"]["b"]
    x = jax.nn.relu(x)
    x, new_bn["proj"] = base._batchnorm(x, bn_state["proj"], train)
    dk = iter(jax.random.split(dropout_key, 32)) if dropout_key is not None else None
    chain, xent = base.tdnnf_stack_and_heads(
        t, params, bn_state, new_bn, x, train, dk,
        consumed_left=consumed_left,
    )
    return chain, xent, new_bn
