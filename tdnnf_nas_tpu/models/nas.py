"""DARTS supernet models: context-offset and bottleneck-dim search.

TPU-native re-design of the reference's supernet machinery:

* **Context-offset supernet** — equivalent of `TdnnDARTSV3Component`
  (`src/nnet3/nnet-tdnn-component.cc:38-1012`) + the config surgery of
  `local/chain_NAS/scripts/generate_config.py`: each tdnnf sublayer holds K
  candidate branches (linear sublayer offsets -(K-1)..0, affine sublayer
  offsets 0..K-1) with per-branch weights and architecture logits alpha.
  Branch mixing coefficients per mode (faithful to the reference propagate,
  `.cc:256-289`):

    - ``uniform``  : one branch sampled uniformly, weight 1, PLUS the
                     always-on share branch (offset 0) — the 95%-data
                     pretrain mode (`uniform_sample_`).
    - ``gumbel``   : coef = softmax((alpha + G)/tau), G = -log(-log U);
                     share branch forced to weight 1.
    - ``softmax``  : coef = softmax(alpha); share branch forced to 1.
    - ``free``     : coef = sigmoid(alpha), all branches scaled (no special
                     share) — `free_select_`.

  The hand-written alpha-gradient of the reference (softmax Jacobian / tau,
  x5 entropy hack, x10000 scale paired with LearningRateFactor 1e-4 —
  `.cc:541-590`) is replaced by straight autodiff through the coef
  computation, with the folklore scalings exposed as explicit optimizer
  hyperparameters (see train/optimizer.py alpha_lr_scale).

* **Bottleneck-dim supernet** — equivalent of the
  OnehotFunction/CopyN/ElementwiseProduct generated graph
  (`generate_bottleneckCB8share_onehottrain_config.py`): a single 240-wide
  bottleneck whose activations are masked by nested group masks
  (group g active for candidate k iff g <= k; widths 25,25,30,20,20,40,40,40
  -> cumulative dims {25,50,80,100,120,160,200,240}), giving full weight
  sharing of the leading columns.  The FLOPs penalty becomes an analytic
  differentiable expectation sum_k coef_k * dim_k (replacing the
  {Gumbel,}SoftmaxFlopsComponent backprop injection,
  `nnet-simple-component.cc:10006-10017`).

Both searches can be active at once (the stage-8 combo recipes).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tdnnf_nas_tpu.core.config import Config
from tdnnf_nas_tpu.models import tdnnf as base
from tdnnf_nas_tpu.ops.tdnn import spliced_linear

# default bottleneck candidate group widths (cumsum = candidate dims)
BOTTLENECK_GROUPS = (25, 25, 30, 20, 20, 40, 40, 40)
BOTTLENECK_DIMS = tuple(np.cumsum(BOTTLENECK_GROUPS).tolist())  # (25,...,240)


class SearchMode:
    UNIFORM = "uniform"
    GUMBEL = "gumbel"
    SOFTMAX = "softmax"
    FREE = "free"
    ARGMAX_ST = "argmax_st"  # hard one-hot fwd, softmax straight-through grad
    FIXED = "fixed"  # no search: share branch only (diagnostics)


@dataclasses.dataclass(frozen=True)
class DartsModelConfig(Config):
    """Supernet config wrapping the base TDNN-F shape.

    search_offsets: K = max_stride+1 candidate offsets per sublayer.
    search_bottleneck: nested-mask 240-wide bottleneck per layer.
    When search_offsets is False, fixed_strides gives the (searched or 7q)
    offsets for each layer, as in the stage-8 combo supernets.
    """

    base: base.TdnnfModelConfig = dataclasses.field(default_factory=base.TdnnfModelConfig)
    search_offsets: bool = True
    max_stride: int = 6
    fixed_strides: Tuple[Tuple[int, int], ...] = ()
    search_bottleneck: bool = False
    bottleneck_groups: Tuple[int, ...] = BOTTLENECK_GROUPS
    sample_per_sequence: bool = False
    # compile the homogeneous offsets-supernet stack as ONE lax.scan layer
    # body instead of L unrolled layers (~L x faster compile, identical
    # math; sampling uses per-layer folded keys).  Applies only when
    # search_offsets is on (layers are then structurally identical).
    scan_layers: bool = True

    @property
    def num_candidates(self) -> int:
        return self.max_stride + 1

    @property
    def num_layers(self) -> int:
        return self.base.num_tdnnf

    @property
    def bottleneck_candidates(self) -> Tuple[int, ...]:
        return tuple(np.cumsum(self.bottleneck_groups).tolist())

    @property
    def supernet_bottleneck(self) -> int:
        return int(sum(self.bottleneck_groups)) if self.search_bottleneck else (
            self.base.bottleneck_dim
        )


def supernet_context(cfg: DartsModelConfig) -> Tuple[int, int]:
    """Max (left, right) context over all candidate branches."""
    if cfg.search_offsets:
        k = cfg.max_stride
        n = cfg.num_layers
        return (1 + k * n, 1 + k * n)
    left = 1 + sum(l for l, _ in _fixed_pairs(cfg))
    right = 1 + sum(r for _, r in _fixed_pairs(cfg))
    return (left, right)


def _fixed_pairs(cfg: DartsModelConfig):
    if cfg.fixed_strides:
        return cfg.fixed_strides
    return cfg.base.stride_pairs


def init_supernet(cfg: DartsModelConfig, key: jax.Array):
    """Returns (params, alphas, bn_state).

    alphas: {"offsets_linear": [L,K], "offsets_affine": [L,K],
             "bottleneck": [L,C]} (only the active search axes).
    Architecture logits are kept OUT of `params` so the two-stage pipeline
    (theta-only pretrain vs alpha-only cv-update) is a trivial optimizer
    partition instead of the reference's LearningRateFactor sed surgery
    (`run_TDNN_DARTSV3_fbk_stride_cvupdate.sh:128-142`).
    """
    b = cfg.base
    keys = iter(jax.random.split(key, 8 + 4 * cfg.num_layers))
    params = {}
    params["lda"] = {
        "w": jnp.eye(b.lda_dim, dtype=jnp.float32),
        "b": jnp.zeros((b.lda_dim,), jnp.float32),
    }
    params["tdnn1"] = {
        "w": base._linear_init(next(keys), (b.lda_dim, b.hidden_dim), b.lda_dim),
        "b": jnp.zeros((b.hidden_dim,), jnp.float32),
    }
    bdim = cfg.supernet_bottleneck
    k = cfg.num_candidates if cfg.search_offsets else None
    for i in range(cfg.num_layers):
        if cfg.search_offsets:
            lin_shape = (k, b.hidden_dim, bdim)
            aff_shape = (k, bdim, b.hidden_dim)
            lin_fan = b.hidden_dim * 2  # ~2 active branches at a time
            aff_fan = bdim * 2
        else:
            l, r = _fixed_pairs(cfg)[i]
            lin_shape = ((2 if l > 0 else 1), b.hidden_dim, bdim)
            aff_shape = ((2 if r > 0 else 1), bdim, b.hidden_dim)
            lin_fan = lin_shape[0] * b.hidden_dim
            aff_fan = aff_shape[0] * bdim
        params[f"tdnnf{i + 2}"] = {
            "linear": base._linear_init(next(keys), lin_shape, lin_fan),
            "affine": base._linear_init(next(keys), aff_shape, aff_fan),
            "affine_b": jnp.zeros((b.hidden_dim,), jnp.float32),
        }
    params["prefinal_l"] = base._linear_init(
        next(keys), (b.hidden_dim, b.prefinal_small), b.hidden_dim
    )
    for head in ("chain", "xent"):
        params[f"prefinal_{head}"] = {
            "affine_w": base._linear_init(
                next(keys), (b.prefinal_small, b.prefinal_big), b.prefinal_small
            ),
            "affine_b": jnp.zeros((b.prefinal_big,), jnp.float32),
            "linear": base._linear_init(
                next(keys), (b.prefinal_big, b.prefinal_small), b.prefinal_big
            ),
        }
        params[f"output_{head}"] = {
            "w": jnp.zeros((b.prefinal_small, b.num_pdfs), jnp.float32),
            "b": jnp.zeros((b.num_pdfs,), jnp.float32),
        }
    alphas = {}
    if cfg.search_offsets:
        alphas["offsets_linear"] = jnp.zeros((cfg.num_layers, cfg.num_candidates))
        alphas["offsets_affine"] = jnp.zeros((cfg.num_layers, cfg.num_candidates))
    if cfg.search_bottleneck:
        alphas["bottleneck"] = jnp.zeros((cfg.num_layers, len(cfg.bottleneck_groups)))
    bn_state = {}
    for name, dim in base._bn_dims(b):
        bn_state[name] = {
            "mean": jnp.zeros((dim,), jnp.float32),
            "var": jnp.ones((dim,), jnp.float32),
        }
    return params, alphas, bn_state


def branch_coefs(
    alpha: jax.Array,
    mode: str,
    tau,
    key: Optional[jax.Array],
    share_index: Optional[int],
    batch: Optional[int] = None,
) -> jax.Array:
    """Per-branch mixing coefficients for one DARTS sublayer.

    alpha: [K] logits.  Returns [K] (or [B,K] when batch is not None).
    Faithful to TdnnDARTSV3Component::Propagate (`.cc:256-289`), with the
    share branch (offset 0) forced to 1 except in free/uniform modes.
    """
    k = alpha.shape[-1]
    shape = (batch, k) if batch is not None else (k,)
    if mode == SearchMode.FIXED:
        coef = jnp.zeros(shape).at[..., share_index].set(1.0)
        return coef
    if mode == SearchMode.UNIFORM:
        assert key is not None
        idx = jax.random.randint(key, shape[:-1], 0, k)
        coef = jax.nn.one_hot(idx, k)
        if share_index is not None:  # share always on (union with sample)
            coef = jnp.maximum(coef, jax.nn.one_hot(jnp.full(shape[:-1], share_index), k))
        return coef
    if mode == SearchMode.ARGMAX_ST:
        # hard one-hot forward, softmax gradient (straight-through) —
        # the ArgmaxOnehotFunctionComponent (`nnet-simple-component.h:2830`,
        # `.cc:9859-9928`)
        soft = jnp.broadcast_to(jax.nn.softmax(alpha / tau, axis=-1), shape)
        hard = jax.nn.one_hot(jnp.argmax(alpha, axis=-1), k)
        hard = jnp.broadcast_to(hard, shape)
        coef = hard + soft - jax.lax.stop_gradient(soft)
    elif mode == SearchMode.GUMBEL:
        assert key is not None
        u = jax.random.uniform(key, shape, minval=1e-8, maxval=1.0 - 1e-8)
        g = -jnp.log(-jnp.log(u))
        coef = jax.nn.softmax((alpha + g) / tau, axis=-1)
    elif mode == SearchMode.SOFTMAX:
        coef = jax.nn.softmax(alpha / tau, axis=-1)
        coef = jnp.broadcast_to(coef, shape)
    elif mode == SearchMode.FREE:
        coef = jnp.broadcast_to(jax.nn.sigmoid(alpha), shape)
        return coef  # no special share branch in free-select
    else:
        raise ValueError(f"unknown mode {mode}")
    if mode != SearchMode.ARGMAX_ST:  # floor would kill the ST gradient
        coef = jnp.maximum(coef, 1e-20)
    if share_index is not None:
        coef = coef.at[..., share_index].set(1.0)
    return coef


def _bottleneck_mask(coef: jax.Array, groups: Tuple[int, ...]) -> jax.Array:
    """coef [..., C] candidate weights -> [..., sum(groups)] activation mask.

    Group g's mask = sum_{j>=g} coef_j (nested candidates: candidate j
    activates groups 0..j), mirroring the CopyN nested-sum construction
    (`generate_bottleneckCB8share_onehottrain_config.py:22-37`).
    """
    # reverse-cumsum over candidates, then repeat per group width
    rc = jnp.flip(jnp.cumsum(jnp.flip(coef, axis=-1), axis=-1), axis=-1)
    return jnp.repeat(rc, np.asarray(groups), axis=-1, total_repeat_length=int(sum(groups)))


def expected_flops(alphas_bottleneck: jax.Array, cfg: DartsModelConfig, tau=1.0) -> jax.Array:
    """Differentiable expected bottleneck cost, sum over layers of
    E_coef[dim] with coef = softmax(alpha/tau).  The analytic version of the
    SoftmaxFlopsComponent penalty (costs = candidate dims,
    `nnet-simple-component.cc:10144-10152`)."""
    dims = jnp.asarray(cfg.bottleneck_candidates, jnp.float32)
    coef = jax.nn.softmax(alphas_bottleneck / tau, axis=-1)
    return jnp.sum(coef * dims)


def _scan_offset_stack(
    cfg: DartsModelConfig, params, alphas, bn_state, x, mode, tau, key,
    train, bn_frozen, dropout_key, dropout_p=None,
):
    """The tdnnf-DARTS stack as one lax.scan over layers.

    All offsets-supernet layers are structurally identical (K branches,
    same dims), so the layer body compiles ONCE.  The time axis shrinks by
    span=2(K-1) per layer; to keep the scan carry static-shaped, x stays at
    its input length with a left-aligned valid region (frame t of layer i's
    input = original position t + i*(K-1) + ...), garbage beyond it, and BN
    statistics masked to the valid frames — bit-identical to the unrolled
    stack (tested) because valid outputs only consume valid inputs.

    Returns (x_valid, new_bn_dict, coefs_dict).
    """
    b_cfg = cfg.base
    dt = b_cfg.dtype
    l_num = cfg.num_layers
    k = cfg.num_candidates
    span = 2 * (k - 1)
    t0 = x.shape[1]
    bn_train = train and not bn_frozen
    batch = x.shape[0] if cfg.sample_per_sequence else None

    w_lin = jnp.stack([params[f"tdnnf{i + 2}"]["linear"] for i in range(l_num)])
    w_aff = jnp.stack([params[f"tdnnf{i + 2}"]["affine"] for i in range(l_num)])
    w_b = jnp.stack([params[f"tdnnf{i + 2}"]["affine_b"] for i in range(l_num)])
    bn_mean = jnp.stack([bn_state[f"tdnnf{i + 2}"]["mean"] for i in range(l_num)])
    bn_var = jnp.stack([bn_state[f"tdnnf{i + 2}"]["var"] for i in range(l_num)])
    a_lin = alphas["offsets_linear"]
    a_aff = alphas["offsets_affine"]
    a_bot = alphas.get("bottleneck") if cfg.search_bottleneck else None
    groups = cfg.bottleneck_groups
    lin_off = tuple(range(-(k - 1), 1))
    aff_off = tuple(range(0, k))
    t_out0 = t0 - span
    frame_idx = jnp.arange(t_out0)

    def body(x, inputs):
        (i, wl, wa, wb, al, aa, bm, bv, ab) = inputs
        lk = jax.random.fold_in(key, i) if key is not None else None
        lk1, lk2, lk3, lkd = (jax.random.split(lk, 4) if lk is not None
                              else (None, None, None, None))
        c_lin = branch_coefs(al, mode, tau, lk1, k - 1, batch)
        c_aff = branch_coefs(aa, mode, tau, lk2, 0, batch)
        w_lin_o = jnp.flip(wl, axis=0)
        c_lin_o = jnp.flip(c_lin, axis=-1)
        bottleneck = spliced_linear(x, w_lin_o, lin_off, coef=c_lin_o,
                                    compute_dtype=dt).astype(dt)
        if ab is not None:
            c_bn = branch_coefs(ab, mode, tau, lk3, None, batch)
            m = _bottleneck_mask(c_bn, groups).astype(dt)
            bottleneck = bottleneck * (m[None, None, :] if m.ndim == 1
                                       else m[:, None, :])
        cur = spliced_linear(bottleneck, wa, aff_off, bias=wb, coef=c_aff,
                             compute_dtype=dt).astype(dt)
        cur = jax.nn.relu(cur)
        # masked batchnorm over the valid frames of this layer's output
        # (stats accumulate f32; activations stay in compute dtype)
        valid = (frame_idx < (t0 - (i + 1) * span))[None, :, None]
        if bn_train:
            vm = valid.astype(jnp.float32)
            cnt = jnp.maximum(cur.shape[0] * jnp.sum(vm), 1.0)
            cur32 = cur.astype(jnp.float32)
            mean = jnp.sum(cur32 * vm, axis=(0, 1)) / cnt
            var = jnp.sum(jnp.square(cur32) * vm, axis=(0, 1)) / cnt - mean**2
            new_bm = base.BN_DECAY * bm + (1 - base.BN_DECAY) * mean
            new_bv = base.BN_DECAY * bv + (1 - base.BN_DECAY) * var
        else:
            mean, var = bm, bv
            new_bm, new_bv = bm, bv
        cur = ((cur - mean)
               * jax.lax.rsqrt(jnp.maximum(var, 0.0) + base.BN_EPS)).astype(dt)
        cur = base._dropout(
            cur,
            b_cfg.dropout_proportion if dropout_p is None else dropout_p,
            lkd, train)
        prev = x[:, (k - 1): (k - 1) + t_out0]
        out = cur + jnp.asarray(b_cfg.bypass_scale, cur.dtype) * prev
        # zero the garbage region: otherwise it grows unboundedly across
        # layers (frozen BN doesn't tame it) and an inf there turns the
        # backward's 0-cotangent products into NaN weight/alpha gradients
        out = out * valid.astype(out.dtype)
        # pad back to t0 (valid region shrinks by span per layer)
        out = jnp.pad(out, ((0, 0), (0, span), (0, 0)))
        return out, (new_bm, new_bv, c_lin, c_aff)

    xs = (jnp.arange(l_num), w_lin, w_aff, w_b, a_lin, a_aff, bn_mean, bn_var,
          (a_bot if a_bot is not None else jnp.zeros((l_num, 0))))
    if a_bot is None:
        # avoid passing an unused 0-width array through branch_coefs
        xs = (jnp.arange(l_num), w_lin, w_aff, w_b, a_lin, a_aff, bn_mean,
              bn_var)

        def body_nb(x, inputs):
            (i, wl, wa, wb, al, aa, bm, bv) = inputs
            return body(x, (i, wl, wa, wb, al, aa, bm, bv, None))

        x, (nbm, nbv, cl, ca) = jax.lax.scan(body_nb, x, xs)
    else:
        x, (nbm, nbv, cl, ca) = jax.lax.scan(body, x, xs)
    x = x[:, : t0 - l_num * span]
    new_bn = {}
    coefs = {}
    for i in range(l_num):
        name = f"tdnnf{i + 2}"
        new_bn[name] = {"mean": nbm[i], "var": nbv[i]}
        coefs[f"{name}_linear"] = cl[i]
        coefs[f"{name}_affine"] = ca[i]
    return x, new_bn, coefs


def apply_supernet(
    cfg: DartsModelConfig,
    params,
    alphas,
    bn_state,
    feats: jax.Array,
    ivectors: Optional[jax.Array] = None,
    mode: str = SearchMode.UNIFORM,
    tau=1.0,
    key: Optional[jax.Array] = None,
    train: bool = False,
    bn_frozen: bool = False,
    dropout_key: Optional[jax.Array] = None,
    dropout_p=None,
):
    """Supernet forward.

    mode/tau: search mode and Gumbel/softmax temperature (annealed by the
    trainer per `temperature_schedule.py:34-67`).
    bn_frozen: use stored BN stats even in training — the cv-update stage's
    BatchNormTestComponent equivalent (`cvupdate.sh:133`).

    Returns (chain_logits, xent_logits, new_bn_state, coef_tree) where
    coef_tree records the sampled/relaxed branch weights per sublayer (the
    reference's memo, useful for diagnostics).
    """
    b = cfg.base
    dt = b.dtype
    bn_train = train and not bn_frozen
    new_bn = {}
    coefs = {}
    n_keys = 4 * cfg.num_layers + 2
    keys = iter(jax.random.split(key, n_keys)) if key is not None else None
    dk = iter(jax.random.split(dropout_key, 32)) if dropout_key is not None else None
    batch = feats.shape[0] if cfg.sample_per_sequence else None

    t_spliced = feats.shape[1] - 2
    spl = jnp.concatenate(
        [feats[:, o + 1 : o + 1 + t_spliced] for o in (-1, 0, 1)], axis=-1
    )
    if b.ivector_dim:
        iv = jnp.broadcast_to(
            ivectors[:, None, :], (spl.shape[0], t_spliced, b.ivector_dim)
        )
        spl = jnp.concatenate([spl, iv], axis=-1)
    x = (
        jnp.matmul(spl.astype(dt), params["lda"]["w"].astype(dt),
                   preferred_element_type=jnp.float32)
        + params["lda"]["b"]
    ).astype(dt)
    x = (jnp.matmul(x, params["tdnn1"]["w"].astype(dt),
                    preferred_element_type=jnp.float32)
         + params["tdnn1"]["b"]).astype(dt)
    x = jax.nn.relu(x)
    x, new_bn["tdnn1"] = base._batchnorm(x, bn_state["tdnn1"], bn_train)
    x = base._dropout(x, b.dropout_proportion if dropout_p is None else dropout_p,
                      next(dk) if dk else None, train)

    if cfg.search_offsets and cfg.scan_layers:
        x, stack_bn, stack_coefs = _scan_offset_stack(
            cfg, params, alphas, bn_state, x, mode, tau, key, train,
            bn_frozen, dropout_key, dropout_p=dropout_p,
        )
        new_bn.update(stack_bn)
        coefs.update(stack_coefs)
        return _supernet_heads(cfg, params, bn_state, new_bn, x, bn_train,
                               coefs)

    kcand = cfg.num_candidates
    groups = cfg.bottleneck_groups
    for i in range(cfg.num_layers):
        name = f"tdnnf{i + 2}"
        p = params[name]
        if cfg.search_offsets:
            # linear branch offsets -(K-1)..0 (share = offset 0 = last),
            # affine branch offsets 0..K-1 (share = first)
            lin_off = tuple(range(-(kcand - 1), 1))
            aff_off = tuple(range(0, kcand))
            c_lin = branch_coefs(alphas["offsets_linear"][i], mode, tau,
                                 next(keys) if keys else None, kcand - 1, batch)
            c_aff = branch_coefs(alphas["offsets_affine"][i], mode, tau,
                                 next(keys) if keys else None, 0, batch)
            # weights are stored candidate-major [K] with index j = |offset|;
            # linear offsets ascend from -(K-1) so flip the coef/weight order
            w_lin = jnp.flip(p["linear"], axis=0)
            c_lin_o = jnp.flip(c_lin, axis=-1)
            bottleneck = spliced_linear(x, w_lin, lin_off, coef=c_lin_o,
                                        compute_dtype=dt).astype(dt)
            coefs[f"{name}_linear"] = c_lin
        else:
            l, r = _fixed_pairs(cfg)[i]
            lin_off = (-l, 0) if l > 0 else (0,)
            aff_off = (0, r) if r > 0 else (0,)
            bottleneck = spliced_linear(x, p["linear"], lin_off,
                                        compute_dtype=dt).astype(dt)
        if cfg.search_bottleneck:
            c_bn = branch_coefs(alphas["bottleneck"][i], mode, tau,
                                next(keys) if keys else None, None, batch)
            mask = _bottleneck_mask(c_bn, groups).astype(bottleneck.dtype)
            if mask.ndim == 1:
                bottleneck = bottleneck * mask[None, None, :]
            else:
                bottleneck = bottleneck * mask[:, None, :]
            coefs[f"{name}_bottleneck"] = c_bn
        if cfg.search_offsets:
            cur = spliced_linear(bottleneck, p["affine"], aff_off, bias=p["affine_b"],
                                 coef=c_aff, compute_dtype=dt).astype(dt)
            coefs[f"{name}_affine"] = c_aff
        else:
            cur = spliced_linear(bottleneck, p["affine"], aff_off, bias=p["affine_b"],
                                 compute_dtype=dt).astype(dt)
        cur = jax.nn.relu(cur)
        cur, new_bn[name] = base._batchnorm(cur, bn_state[name], bn_train)
        cur = base._dropout(cur,
                            b.dropout_proportion if dropout_p is None else dropout_p,
                            next(dk) if dk else None, train)
        lspan = -lin_off[0]
        rspan = aff_off[-1]
        prev = x[:, lspan : x.shape[1] - rspan] if (lspan or rspan) else x
        x = cur + jnp.asarray(b.bypass_scale, cur.dtype) * prev

    return _supernet_heads(cfg, params, bn_state, new_bn, x, bn_train, coefs)


def _supernet_heads(cfg, params, bn_state, new_bn, x, bn_train, coefs):
    """Subsample + prefinal/output heads (shared by scan and unrolled paths)."""
    b = cfg.base
    dt = b.dtype
    x = base.subsample_time(x, 0, b.frame_subsampling_factor)
    pl = jnp.matmul(x.astype(dt), params["prefinal_l"].astype(dt),
                    preferred_element_type=jnp.float32)
    outs = []
    for head in ("chain", "xent"):
        hp = params[f"prefinal_{head}"]
        h = jnp.matmul(pl.astype(dt), hp["affine_w"].astype(dt),
                       preferred_element_type=jnp.float32) + hp["affine_b"]
        h = jax.nn.relu(h)
        h, new_bn[f"prefinal_{head}_big"] = base._batchnorm(
            h, bn_state[f"prefinal_{head}_big"], bn_train
        )
        h = jnp.matmul(h.astype(dt), hp["linear"].astype(dt),
                       preferred_element_type=jnp.float32)
        h, new_bn[f"prefinal_{head}_small"] = base._batchnorm(
            h, bn_state[f"prefinal_{head}_small"], bn_train
        )
        op = params[f"output_{head}"]
        outs.append(
            jnp.matmul(h.astype(dt), op["w"].astype(dt),
                       preferred_element_type=jnp.float32) + op["b"]
        )
    return outs[0], outs[1], new_bn, coefs
