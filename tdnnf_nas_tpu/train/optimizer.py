"""Optimizer: exponential LR schedule, max-change clipping, weight decay.

Replaces the reference training stack's update rule (Kaldi NG-SGD with
per-component + global max-param-change, exponential LR schedule
`steps/libs/nnet3/train/common.py:606`, per-component l2 from the xconfig
opts `run_tdnn_7q_fbk_40_manual.sh:119-123`).  With exact per-step psum
data-parallelism the natural-gradient-for-averaging machinery is
unnecessary (SURVEY.md §2.5); Adam (default) or plain SGD both carry the
max-change safety net, which is what actually stabilizes chain training.
kind="ng" provides a full OnlineNaturalGradient equivalent — Kronecker-
factored both-side covariance preconditioning (`nnet-tdnn-component.cc:
592-624`), with full covariances + periodic eigh instead of Kaldi's
low-rank online updates (full factored covariances are cheap MXU matmuls;
the inverse amortizes over ng_update_period steps).

Architecture logits get their own LR scale (``alpha_lr_scale``) — the
explicit, documented version of the reference's x10000 alpha-grad scale
paired with LearningRateFactor 1e-4 (`nnet-tdnn-component.cc:588-590` +
`run_TDNN_DARTSV3_fbk_stride_cvupdate.sh:130`).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import numpy as np
import jax.numpy as jnp

from tdnnf_nas_tpu.core.config import Config


@dataclasses.dataclass(frozen=True)
class OptimizerConfig(Config):
    kind: str = "adam"  # adam | sgd | adafactor | ng
    lr_initial: float = 1e-3
    lr_final: float = 1e-4
    num_steps: int = 1000
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-8
    momentum: float = 0.0  # sgd only
    max_change_per_leaf: float = 0.75  # Kaldi per-component max-change
    max_change_global: float = 2.0  # Kaldi --trainer.max-param-change
    l2_regularize: float = 0.0  # decoupled weight decay (per-leaf scalable)
    alpha_lr_scale: float = 1.0
    # kind="ng": Kronecker-factored natural-gradient SGD — the TPU-native
    # equivalent of Kaldi's OnlineNaturalGradient (both-side gradient-
    # covariance preconditioning, `nnet-tdnn-component.cc:592-624`).  Kaldi
    # keeps low-rank online estimates because full covariances are expensive
    # on GPU; on TPU the full factored covariances are cheap matmuls and the
    # inverse is amortized over ng_update_period steps.
    ng_alpha: float = 4.0        # trace-smoothing R = F + alpha*(trF/dim)*I
                                 # (Kaldi's alpha, online-natural-gradient default)
    ng_decay: float = 0.95       # covariance EMA (num-samples-history analog)
    ng_update_period: int = 10   # recompute the inverse roots every N steps
    ng_max_dim: int = 2048       # sides larger than this use identity


def learning_rate_at(step, cfg: OptimizerConfig):
    """Exponential decay lr_initial -> lr_final over num_steps
    (`common.py:606` get_learning_rate)."""
    frac = jnp.clip(step / max(cfg.num_steps, 1), 0.0, 1.0)
    return cfg.lr_initial * (cfg.lr_final / cfg.lr_initial) ** frac


def make_optimizer(
    cfg: OptimizerConfig,
    wd_scale_fn: Optional[Callable[[tuple], float]] = None,
):
    """Returns (init_fn, update_fn).

    init_fn(params) -> opt_state
    update_fn(grads, opt_state, params, step, lr_scale=1.0)
        -> (new_params, new_opt_state)

    wd_scale_fn(path) -> relative weight-decay multiplier per leaf (1.0
    default); effective decay = l2_regularize * scale * lr.
    """

    def _ng_sides(p):
        """Static decision: which sides of a leaf get preconditioned."""
        if p.ndim < 2:
            return False, False
        m = int(np.prod(p.shape[:-1]))
        n = int(p.shape[-1])
        return m <= cfg.ng_max_dim, n <= cfg.ng_max_dim

    def init_fn(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        if cfg.kind == "adam":
            return {"m": zeros, "v": jax.tree.map(jnp.zeros_like, params)}
        if cfg.kind == "ng":
            def ng_zeros(p):
                use_l, use_r = _ng_sides(p)
                m = int(np.prod(p.shape[:-1])) if p.ndim >= 2 else 0
                n = int(p.shape[-1]) if p.ndim >= 2 else 0
                s = {}
                if use_l:
                    s["cl"] = jnp.zeros((m, m))
                    s["pl"] = jnp.eye(m)
                if use_r:
                    s["cr"] = jnp.zeros((n, n))
                    s["pr"] = jnp.eye(n)
                return s
            return {"ng": jax.tree.map(ng_zeros, params,
                                       is_leaf=lambda x: hasattr(x, "ndim"))}
        if cfg.kind == "adafactor":
            def factored_zeros(p):
                if p.ndim >= 2:
                    rows = int(np.prod(p.shape[:-1]))
                    return {"vr": jnp.zeros((rows,)), "vc": jnp.zeros((p.shape[-1],))}
                return {"v": jnp.zeros_like(p)}
            return {"f": jax.tree.map(factored_zeros, params,
                                      is_leaf=lambda x: hasattr(x, "ndim"))}
        if cfg.momentum > 0:
            return {"m": zeros}
        return {}

    def update_fn(grads, opt_state, params, step, lr_scale=1.0):
        lr = learning_rate_at(step, cfg) * lr_scale
        if cfg.kind == "adam":
            t = step.astype(jnp.float32) + 1.0
            m = jax.tree.map(lambda m_, g: cfg.beta1 * m_ + (1 - cfg.beta1) * g,
                             opt_state["m"], grads)
            v = jax.tree.map(lambda v_, g: cfg.beta2 * v_ + (1 - cfg.beta2) * g * g,
                             opt_state["v"], grads)
            bc1 = 1.0 - cfg.beta1**t
            bc2 = 1.0 - cfg.beta2**t
            deltas = jax.tree.map(
                lambda m_, v_: -lr * (m_ / bc1) / (jnp.sqrt(v_ / bc2) + cfg.eps), m, v
            )
            new_state = {"m": m, "v": v}
        elif cfg.kind == "adafactor":
            # Factored second-moment preconditioning (Adafactor; the
            # Kronecker-factored cousin of Kaldi's in/out-side natural
            # gradient, OnlineNaturalGradient — nnet-tdnn-component.cc:
            # 592-624): per 2-D weight keep row/col EMAs of g^2 and
            # precondition by their rank-1 reconstruction.
            b2 = cfg.beta2

            def upd(f, g):
                if g.ndim >= 2:
                    g2d = g.reshape(-1, g.shape[-1])
                    g2 = g2d * g2d + 1e-30
                    vr = b2 * f["vr"] + (1 - b2) * jnp.mean(g2, axis=1)
                    vc = b2 * f["vc"] + (1 - b2) * jnp.mean(g2, axis=0)
                    vhat = jnp.outer(vr, vc) / jnp.maximum(jnp.mean(vr), 1e-30)
                    d = (-lr * g2d / (jnp.sqrt(vhat) + cfg.eps)).reshape(g.shape)
                    return {"vr": vr, "vc": vc}, d
                v = b2 * f["v"] + (1 - b2) * g * g
                return {"v": v}, -lr * g / (jnp.sqrt(v) + cfg.eps)

            flat_f, treedef = jax.tree_util.tree_flatten(
                opt_state["f"], is_leaf=lambda x: isinstance(x, dict) and
                ("vr" in x or "v" in x))
            flat_g = jax.tree_util.tree_leaves(grads)
            pairs = [upd(f, g) for f, g in zip(flat_f, flat_g)]
            new_state = {"f": jax.tree_util.tree_unflatten(
                treedef, [p[0] for p in pairs])}
            deltas = jax.tree_util.tree_unflatten(
                jax.tree_util.tree_structure(grads), [p[1] for p in pairs])
        elif cfg.kind == "ng":
            # Kronecker-factored NG: G' = Rl^{-1} G Rr^{-1} with
            # R = C + alpha*(trC/dim)*I (heavy damping, Kaldi's alpha), C the
            # EMA of the per-side gradient covariance; G' rescaled to ||G||
            # (Kaldi likewise rescales the preconditioned direction).  The
            # inverses are recomputed every ng_update_period steps (eigh),
            # identity in between updates of the covariances themselves.
            recompute = (step % cfg.ng_update_period) == 0

            def inv_smoothed(c):
                d = c.shape[0]
                damp = cfg.ng_alpha * (jnp.trace(c) / d) + 1e-8
                w, v = jnp.linalg.eigh(c + damp * jnp.eye(d))
                return (v / jnp.maximum(w, 1e-12)) @ v.T

            def upd(s, g):
                use_l = "cl" in s
                use_r = "cr" in s
                if not (use_l or use_r):
                    return s, -lr * g
                g2d = g.reshape(-1, g.shape[-1])
                ns = dict(s)
                pre = g2d
                if use_l:
                    cl = cfg.ng_decay * s["cl"] + (1 - cfg.ng_decay) * (
                        g2d @ g2d.T / g2d.shape[1])
                    pl = jax.lax.cond(recompute, inv_smoothed, lambda c: s["pl"], cl)
                    ns["cl"], ns["pl"] = cl, pl
                    pre = pl @ pre
                if use_r:
                    cr = cfg.ng_decay * s["cr"] + (1 - cfg.ng_decay) * (
                        g2d.T @ g2d / g2d.shape[0])
                    pr = jax.lax.cond(recompute, inv_smoothed, lambda c: s["pr"], cr)
                    ns["cr"], ns["pr"] = cr, pr
                    pre = pre @ pr
                norm_g = jnp.sqrt(jnp.sum(jnp.square(g2d)) + 1e-30)
                norm_p = jnp.sqrt(jnp.sum(jnp.square(pre)) + 1e-30)
                pre = pre * (norm_g / norm_p)
                return ns, (-lr * pre).reshape(g.shape)

            is_ng_leaf = lambda x: isinstance(x, dict) and (
                "cl" in x or "cr" in x or not x)
            flat_s, s_treedef = jax.tree_util.tree_flatten(
                opt_state["ng"], is_leaf=is_ng_leaf)
            flat_g = jax.tree_util.tree_leaves(grads)
            pairs = [upd(s, g) for s, g in zip(flat_s, flat_g)]
            new_state = {"ng": jax.tree_util.tree_unflatten(
                s_treedef, [p[0] for p in pairs])}
            deltas = jax.tree_util.tree_unflatten(
                jax.tree_util.tree_structure(grads), [p[1] for p in pairs])
        elif cfg.momentum > 0:
            m = jax.tree.map(lambda m_, g: cfg.momentum * m_ + g, opt_state["m"], grads)
            deltas = jax.tree.map(lambda m_: -lr * m_, m)
            new_state = {"m": m}
        else:
            deltas = jax.tree.map(lambda g: -lr * g, grads)
            new_state = opt_state

        # per-leaf max-change (Kaldi per-component max-change 0.75)
        def clip_leaf(d):
            n = jnp.sqrt(jnp.sum(jnp.square(d)) + 1e-20)
            return d * jnp.minimum(1.0, cfg.max_change_per_leaf / n)

        if cfg.max_change_per_leaf > 0:
            deltas = jax.tree.map(clip_leaf, deltas)
        # global max-change (Kaldi --trainer.max-param-change 2.0)
        if cfg.max_change_global > 0:
            gn = jnp.sqrt(
                sum(jnp.sum(jnp.square(d)) for d in jax.tree.leaves(deltas)) + 1e-20
            )
            scale = jnp.minimum(1.0, cfg.max_change_global / gn)
            deltas = jax.tree.map(lambda d: d * scale, deltas)

        # decoupled weight decay
        if cfg.l2_regularize > 0:
            paths_leaves = jax.tree_util.tree_flatten_with_path(params)[0]
            scales = [
                (wd_scale_fn(tuple(str(k) for k in path)) if wd_scale_fn else 1.0)
                for path, _ in paths_leaves
            ]
            flat_deltas, treedef = jax.tree_util.tree_flatten(deltas)
            flat_params = [leaf for _, leaf in paths_leaves]
            flat_deltas = [
                d - lr * cfg.l2_regularize * s * p
                for d, p, s in zip(flat_deltas, flat_params, scales)
            ]
            deltas = jax.tree_util.tree_unflatten(treedef, flat_deltas)

        new_params = jax.tree.map(lambda p, d: p + d, params, deltas)
        return new_params, new_state

    return init_fn, update_fn
