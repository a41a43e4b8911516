"""Factored TDNN (TDNN-F) acoustic model — the manual/child architecture.

TPU-native equivalent of the reference's xconfig network
(`local/chain_NAS/run_tdnn_7q_fbk_40_manual.sh:127-159` +
`steps/libs/nnet3/xconfig/composite_layers.py:68-215`, `:1243-1331`):

  lda (fixed affine over Append(-1,0,1, ivector(t=0)))
  -> tdnn1: affine -> ReLU -> BatchNorm -> dropout                 (dim 1536)
  -> tdnnf2..15: linear([-s,0] splice -> bottleneck, semi-orth)
                 -> affine([0,s] splice -> dim, +bias)
                 -> ReLU -> BatchNorm -> dropout
                 -> bypass: 0.66*prev + cur                        (NoOp sum)
  -> prefinal-l: linear -> 256 (semi-orth)
  -> prefinal-chain: affine->1536 -> ReLU -> BN -> linear->256(orth) -> BN
     -> output affine -> num_pdfs                      (chain head)
  -> prefinal-xent (same shape) -> output-xent         (CE regularizer head)

Everything is a pure function over a params dict pytree; batchnorm running
stats live in a separate pytree (train mode uses batch stats and EMA-updates
the stored ones; eval uses stored — the principled version of the
reference's BatchNormComponent / BatchNormTestComponent text swap,
`nnet-normalize-component.cc:682-1010`).  Valid-convolution time semantics:
each layer shrinks time by its total stride span, so the chunk input carries
exactly the model's left/right context.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tdnnf_nas_tpu.core.config import Config
from tdnnf_nas_tpu.ops.tdnn import spliced_linear

BN_EPS = 1e-3  # Kaldi BatchNormComponent default epsilon
BN_DECAY = 0.98


@dataclasses.dataclass(frozen=True)
class TdnnfModelConfig(Config):
    """Flagship 7q shape by default (18.6M params at bottleneck 160)."""

    feat_dim: int = 40
    ivector_dim: int = 100
    hidden_dim: int = 1536
    bottleneck_dim: int = 160
    # strides of tdnnf2..tdnnf15 — 7q: 1,1,1,0 then `offset` x 10
    # (`run_tdnn_7q_fbk_40_manual.sh:137-151`); per-layer bottlenecks may
    # override bottleneck_dim (searched child models).
    time_strides: Tuple[int, ...] = (1, 1, 1, 0, 3, 3, 3, 3, 3, 3, 3, 3, 3, 3)
    # searched child models may use different linear/affine offsets per layer
    # (28 independently-searched values, `generate_top_list.py:95-143`);
    # nonempty => overrides time_strides with (linear_stride, affine_stride).
    time_strides_asym: Tuple[Tuple[int, int], ...] = ()
    bottleneck_dims: Tuple[int, ...] = ()  # empty => bottleneck_dim everywhere
    num_pdfs: int = 6034
    prefinal_big: int = 1536
    prefinal_small: int = 256
    bypass_scale: float = 0.66
    dropout_proportion: float = 0.0
    frame_subsampling_factor: int = 3
    compute_dtype: str = "bfloat16"
    # run trailing stride-divisible layers at the subsampled rate (matches
    # nnet3's compiled computation; ~2x fewer FLOPs for 7q).  In train mode
    # BN stats are then computed over the subsampled frames — also matching
    # Kaldi, which only ever computes the needed frames.
    rate_optimize: bool = True

    @property
    def lda_splice(self) -> Tuple[int, ...]:
        return (-1, 0, 1)

    @property
    def lda_dim(self) -> int:
        return self.feat_dim * 3 + self.ivector_dim

    def layer_bottleneck(self, i: int) -> int:
        if self.bottleneck_dims:
            return self.bottleneck_dims[i]
        return self.bottleneck_dim

    @property
    def num_tdnnf(self) -> int:
        return len(self.stride_pairs)

    @property
    def stride_pairs(self) -> Tuple[Tuple[int, int], ...]:
        """(linear_stride, affine_stride) per tdnnf layer."""
        if self.time_strides_asym:
            return tuple(tuple(p) for p in self.time_strides_asym)
        return tuple((s, s) for s in self.time_strides)

    @property
    def dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32


def model_context(cfg: TdnnfModelConfig) -> Tuple[int, int]:
    """(left, right) input context in original frames.

    lda contributes 1 each side; each tdnnf layer contributes its linear
    stride left ([-l,0] splice) and affine stride right ([0,r]) — the
    quantity the reference recomputes via
    `xconfig_to_configs_cal_info.py:233-266`.
    """
    pairs = cfg.stride_pairs
    return (1 + sum(l for l, _ in pairs), 1 + sum(r for _, r in pairs))


def chunk_input_frames(cfg: TdnnfModelConfig, chunk_width: int) -> int:
    """Input frames needed for `chunk_width` output (subsampled) frames."""
    left, right = model_context(cfg)
    fs = cfg.frame_subsampling_factor
    return left + (chunk_width - 1) * fs + 1 + right


def _subsample_layer_index(cfg: TdnnfModelConfig) -> int:
    """Earliest tdnnf layer from which ALL later strides are multiples of the
    frame-subsampling factor — from there on the stack runs at the subsampled
    rate with strides/fs, exactly reproducing the dense computation on the
    needed frames only (what nnet3's compiler computes via exact index sets;
    here a static phase-aligned slice).  Returns num_tdnnf when no such point
    exists (fully dense)."""
    fs = cfg.frame_subsampling_factor
    if fs <= 1:
        return len(cfg.stride_pairs)
    pairs = cfg.stride_pairs
    k = len(pairs)
    for i in range(len(pairs) - 1, -1, -1):
        l, r = pairs[i]
        if l % fs == 0 and r % fs == 0:
            k = i
        else:
            break
    return k


def subsample_time(x: jax.Array, phase: int, fs: int) -> jax.Array:
    """x[:, phase::fs] with a TPU-friendly backward.

    The naive strided index lowers through gather, whose transpose is a
    scatter-add over the full-rate hidden tensor plus layout-changing
    copies — measured as the dominant cost of the whole model backward.
    Slice + reshape + static index transposes to pads/reshapes instead.
    """
    if fs == 1:
        return x[:, phase:]
    b, t, f = x.shape
    n_out = (t - phase + fs - 1) // fs
    need = phase + n_out * fs
    if need > t:
        x = jnp.pad(x, ((0, 0), (0, need - t), (0, 0)))
    return x[:, phase:need].reshape(b, n_out, fs, f)[:, :, 0]


def _linear_init(key, shape, in_dim):
    return (jax.random.normal(key, shape, jnp.float32) / np.sqrt(in_dim)).astype(jnp.float32)


def init_model(cfg: TdnnfModelConfig, key: jax.Array):
    """Returns (params, bn_state) pytrees."""
    keys = jax.random.split(key, 64)
    ki = iter(range(64))
    params = {}
    params["lda"] = {
        "w": jnp.eye(cfg.lda_dim, dtype=jnp.float32),
        "b": jnp.zeros((cfg.lda_dim,), jnp.float32),
    }
    params["tdnn1"] = {
        "w": _linear_init(keys[next(ki)], (cfg.lda_dim, cfg.hidden_dim), cfg.lda_dim),
        "b": jnp.zeros((cfg.hidden_dim,), jnp.float32),
    }
    for i, (l, r) in enumerate(cfg.stride_pairs):
        k_lin = 2 if l > 0 else 1
        k_aff = 2 if r > 0 else 1
        bdim = cfg.layer_bottleneck(i)
        params[f"tdnnf{i + 2}"] = {
            "linear": _linear_init(
                keys[next(ki)], (k_lin, cfg.hidden_dim, bdim), k_lin * cfg.hidden_dim
            ),
            "affine": _linear_init(
                keys[next(ki)], (k_aff, bdim, cfg.hidden_dim), k_aff * bdim
            ),
            "affine_b": jnp.zeros((cfg.hidden_dim,), jnp.float32),
        }
    params["prefinal_l"] = _linear_init(
        keys[next(ki)], (cfg.hidden_dim, cfg.prefinal_small), cfg.hidden_dim
    )
    for head in ("chain", "xent"):
        params[f"prefinal_{head}"] = {
            "affine_w": _linear_init(
                keys[next(ki)], (cfg.prefinal_small, cfg.prefinal_big), cfg.prefinal_small
            ),
            "affine_b": jnp.zeros((cfg.prefinal_big,), jnp.float32),
            "linear": _linear_init(
                keys[next(ki)], (cfg.prefinal_big, cfg.prefinal_small), cfg.prefinal_big
            ),
        }
        params[f"output_{head}"] = {
            "w": jnp.zeros((cfg.prefinal_small, cfg.num_pdfs), jnp.float32),
            "b": jnp.zeros((cfg.num_pdfs,), jnp.float32),
        }
    bn_state = {}
    for name, dim in _bn_dims(cfg):
        bn_state[name] = {
            "mean": jnp.zeros((dim,), jnp.float32),
            "var": jnp.ones((dim,), jnp.float32),
        }
    return params, bn_state


def _bn_dims(cfg: TdnnfModelConfig):
    yield "tdnn1", cfg.hidden_dim
    for i in range(cfg.num_tdnnf):
        yield f"tdnnf{i + 2}", cfg.hidden_dim
    for head in ("chain", "xent"):
        yield f"prefinal_{head}_big", cfg.prefinal_big
        yield f"prefinal_{head}_small", cfg.prefinal_small


def _batchnorm(x, stats, train: bool):
    """Kaldi-style batchnorm: pure normalization, no learned scale/offset.

    Returns (normalized, new_stats).  x: [B, T, D]; stats over (B, T).
    Statistics always accumulate in f32 (x itself may be bf16 — activations
    stay in compute_dtype through the stack to halve HBM traffic; the
    normalize is elementwise so output dtype == input dtype).
    """
    if train:
        mean = jnp.mean(x, axis=(0, 1), dtype=jnp.float32)
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=(0, 1)) - mean**2
        new_stats = {
            "mean": BN_DECAY * stats["mean"] + (1 - BN_DECAY) * mean,
            "var": BN_DECAY * stats["var"] + (1 - BN_DECAY) * var,
        }
    else:
        mean, var = stats["mean"], stats["var"]
        new_stats = stats
    inv = jax.lax.rsqrt(jnp.maximum(var, 0.0) + BN_EPS)
    return ((x - mean) * inv).astype(x.dtype), new_stats


def _dropout(x, p, key, train: bool):
    """Per-dim dropout mask shared across time (GeneralDropoutComponent
    behavior, `composite_layers.py:192-196`).  ``p`` may be a python float
    or a traced scalar (the per-step dropout schedule,
    `--trainer.dropout-schedule` in `steps/libs/nnet3/train/common.py`)."""
    if not train or key is None:
        return x
    if isinstance(p, (int, float)) and p <= 0.0:
        return x
    keep = 1.0 - jnp.asarray(p, jnp.float32)
    mask = jax.random.bernoulli(key, keep, (x.shape[0], 1, x.shape[-1]))
    return x * mask.astype(x.dtype) / jnp.maximum(keep, 1e-3).astype(x.dtype)


def apply_model(
    cfg: TdnnfModelConfig,
    params,
    bn_state,
    feats: jax.Array,
    ivectors: Optional[jax.Array] = None,
    train: bool = False,
    dropout_key: Optional[jax.Array] = None,
    post_bn_scales=None,
    layer_activations=None,
    dropout_p=None,
):
    """Forward pass.

    Args:
      feats: [B, T_in, feat_dim] — T_in from chunk_input_frames().
      ivectors: [B, ivector_dim] per-chunk i-vectors (cfg.ivector_dim > 0).
      post_bn_scales: optional {layer_name: [hidden]} multiplicative scales
        applied after each layer's batchnorm (LHUC adaptation,
        models/lhuc.py).
      layer_activations: optional {layer_name: callable} replacing the ReLU
        of individual tdnnf layers (GP activations, models/bayes.py).

    Returns:
      (chain_logits [B, T_out, P], xent_logits [B, T_out, P], new_bn_state)
      with T_out = (T_in - left - right - 1)//fs + 1 at the subsampled rate.
    """
    dt = cfg.dtype
    new_bn = {}
    dk = iter(jax.random.split(dropout_key, 32)) if dropout_key is not None else None
    dp = cfg.dropout_proportion if dropout_p is None else dropout_p

    # --- lda: splice (-1,0,1) + appended constant-t ivector, fixed affine ---
    t_spliced = feats.shape[1] - 2
    spl = jnp.concatenate(
        [feats[:, o + 1 : o + 1 + t_spliced] for o in (-1, 0, 1)], axis=-1
    )
    if cfg.ivector_dim:
        assert ivectors is not None, "model configured with ivectors"
        iv = jnp.broadcast_to(
            ivectors[:, None, :], (spl.shape[0], t_spliced, cfg.ivector_dim)
        )
        spl = jnp.concatenate([spl, iv], axis=-1)
    x = (
        jnp.matmul(spl.astype(dt), params["lda"]["w"].astype(dt),
                   preferred_element_type=jnp.float32)
        + params["lda"]["b"]
    ).astype(dt)

    # --- tdnn1 ---
    x = (jnp.matmul(x, params["tdnn1"]["w"].astype(dt),
                    preferred_element_type=jnp.float32)
         + params["tdnn1"]["b"]).astype(dt)
    x = jax.nn.relu(x)
    x, new_bn["tdnn1"] = _batchnorm(x, bn_state["tdnn1"], train)
    if post_bn_scales is not None and "tdnn1" in post_bn_scales:
        x = x * post_bn_scales["tdnn1"]
    x = _dropout(x, dp, next(dk) if dk else None, train)

    chain, xent = tdnnf_stack_and_heads(cfg, params, bn_state, new_bn, x,
                                        train, dk, consumed_left=1,
                                        post_bn_scales=post_bn_scales,
                                        layer_activations=layer_activations,
                                        dropout_p=dropout_p)
    return chain, xent, new_bn


def tdnnf_stack_and_heads(
    cfg: TdnnfModelConfig, params, bn_state, new_bn, x, train, dk,
    consumed_left: int = 1, post_bn_scales=None, layer_activations=None,
    dropout_p=None,
):
    """The tdnnf stack + prefinal/output heads on a hidden sequence x.

    consumed_left: original-frame position of x's frame 0 (how much left
    context the input block already consumed) — needed for the phase of the
    rate-optimized subsample.  Shared by the plain and CNN front-end models.
    """
    dt = cfg.dtype
    # --- tdnnf stack (rate-optimized: drop to the subsampled rate once all
    # remaining strides are multiples of fs — SURVEY.md §5.7) ---
    fs = cfg.frame_subsampling_factor
    sub_at = _subsample_layer_index(cfg) if cfg.rate_optimize else len(cfg.stride_pairs)
    pairs = cfg.stride_pairs
    left_total = consumed_left + sum(l for l, _ in pairs)
    subsampled = False
    for i, (l, r) in enumerate(pairs):
        if i == sub_at and not subsampled and fs > 1:
            # positions needed downstream are == left_total (mod fs) in
            # original coords; x's frame 0 sits at original position p_k
            p_k = consumed_left + sum(pl for pl, _ in pairs[:i])
            phase = (left_total - p_k) % fs
            x = subsample_time(x, phase, fs)
            subsampled = True
        if subsampled:
            l, r = l // fs, r // fs
        name = f"tdnnf{i + 2}"
        p = params[name]
        lin_off = (-l, 0) if l > 0 else (0,)
        aff_off = (0, r) if r > 0 else (0,)
        bottleneck = spliced_linear(x, p["linear"], lin_off,
                                    compute_dtype=dt).astype(dt)
        cur = spliced_linear(bottleneck, p["affine"], aff_off, bias=p["affine_b"],
                             compute_dtype=dt).astype(dt)
        act = layer_activations.get(name, jax.nn.relu) if layer_activations else jax.nn.relu
        cur = act(cur)
        cur, new_bn[name] = _batchnorm(cur, bn_state[name], train)
        if post_bn_scales is not None and name in post_bn_scales:
            cur = cur * post_bn_scales[name]
        cur = _dropout(cur,
                       cfg.dropout_proportion if dropout_p is None else dropout_p,
                       next(dk) if dk else None, train)
        # bypass: trim prev to cur's (shorter) time extent
        prev = x[:, l : x.shape[1] - r] if (l or r) else x
        x = cur + jnp.asarray(cfg.bypass_scale, cur.dtype) * prev

    # --- subsample to output frame rate (if not already there) ---
    if not subsampled and fs > 1:
        x = subsample_time(x, 0, fs)

    # --- prefinal-l ---
    pl = jnp.matmul(x.astype(dt), params["prefinal_l"].astype(dt),
                    preferred_element_type=jnp.float32).astype(dt)

    outs = []
    for head in ("chain", "xent"):
        hp = params[f"prefinal_{head}"]
        h = (jnp.matmul(pl, hp["affine_w"].astype(dt),
                        preferred_element_type=jnp.float32)
             + hp["affine_b"]).astype(dt)
        h = jax.nn.relu(h)
        h, new_bn[f"prefinal_{head}_big"] = _batchnorm(
            h, bn_state[f"prefinal_{head}_big"], train
        )
        h = jnp.matmul(h.astype(dt), hp["linear"].astype(dt),
                       preferred_element_type=jnp.float32).astype(dt)
        h, new_bn[f"prefinal_{head}_small"] = _batchnorm(
            h, bn_state[f"prefinal_{head}_small"], train
        )
        op = params[f"output_{head}"]
        outs.append(
            jnp.matmul(h.astype(dt), op["w"].astype(dt),
                       preferred_element_type=jnp.float32) + op["b"]
        )
    return outs[0], outs[1]


def semiorth_param_paths(cfg: TdnnfModelConfig):
    """Names of params under the semi-orthogonal constraint: every tdnnf
    `linear` factor, prefinal-l, and the prefinal `linear` factors
    (orthonormal-constraint=-1.0 in the reference xconfig,
    `run_tdnn_7q_fbk_40_manual.sh:121,152-157`)."""
    paths = [("prefinal_l",)]
    for i in range(cfg.num_tdnnf):
        paths.append((f"tdnnf{i + 2}", "linear"))
    for head in ("chain", "xent"):
        paths.append((f"prefinal_{head}", "linear"))
    return paths


def count_params(params) -> int:
    return int(sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(params)))


def estimate_lda(spliced_feats: np.ndarray, ridge: float = 1e-3) -> Tuple[np.ndarray, np.ndarray]:
    """Whitening preconditioner over spliced input features.

    Stand-in for the reference's LDA-like preconditioning matrix estimated
    from egs (`steps/nnet3/chain/train.py:426-434`): zero-mean + decorrelate
    + unit-variance linear map (w, b) with y = x @ w + b.
    """
    x = spliced_feats.reshape(-1, spliced_feats.shape[-1]).astype(np.float64)
    mean = x.mean(axis=0)
    cov = np.cov(x - mean, rowvar=False) + ridge * np.eye(x.shape[1])
    evals, evecs = np.linalg.eigh(cov)
    w = evecs @ np.diag(1.0 / np.sqrt(np.maximum(evals, 1e-8))) @ evecs.T
    b = -mean @ w
    return w.astype(np.float32), b.astype(np.float32)
