"""LHUC speaker adaptation (Learning Hidden Unit Contributions).

Equivalent of the reference's LHUC adaptation results (+LHUC rows of
`img/search_result.png`, BASELINE.md rows 5-8; the Bayesian variants live in
the fork's BLHUC components, `nnet-simple-component.h:2295-2692`): a
per-speaker scale on each hidden layer's activations,

    h_l <- (2 * sigmoid(a_l[speaker])) * h_l

with only the a_l trained on the speaker's adaptation data (acoustic model
frozen).  Logits start at 0 => scale 1 (identity).  The scales are applied
after each layer's batchnorm, before the bypass sum (see
tdnnf.apply_model's ``post_bn_scales``).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from tdnnf_nas_tpu.models import tdnnf as base


def init_lhuc(cfg: base.TdnnfModelConfig) -> Dict[str, jax.Array]:
    """Zero logits => identity scaling."""
    out = {"tdnn1": jnp.zeros((cfg.hidden_dim,))}
    for i in range(cfg.num_tdnnf):
        out[f"tdnnf{i + 2}"] = jnp.zeros((cfg.hidden_dim,))
    return out


def lhuc_scales(lhuc: Dict[str, jax.Array]) -> Dict[str, jax.Array]:
    return {k: 2.0 * jax.nn.sigmoid(v) for k, v in lhuc.items()}


def apply_model_lhuc(
    cfg: base.TdnnfModelConfig,
    params,
    bn_state,
    lhuc,
    feats: jax.Array,
    ivectors: Optional[jax.Array] = None,
    train: bool = False,
):
    """Forward with LHUC scaling (one speaker's logits; batch assumed
    speaker-homogeneous, as in per-speaker adaptation decoding).

    Returns (chain, xent, new_bn)."""
    return base.apply_model(cfg, params, bn_state, feats, ivectors,
                            train=train, post_bn_scales=lhuc_scales(lhuc))


from functools import partial


@partial(jax.jit, static_argnames=("cfg", "objective_cfg", "lr", "l2"))
def _lhuc_step(cfg, objective_cfg, lr, l2, params, bn_state, den_arrays,
               lhuc, batch):
    """One frozen-model SGD step on the LHUC logits.  Module-level jit so
    the compiled step is REUSED across speakers (a per-speaker closure
    would recompile for every speaker — minutes each through a remote
    compile service).

    ``l2`` is a decoupled decay of the logits toward 0 (= unity scales):
    enrollment regularization for the speaker-independent setting, where
    unregularized LHUC overfits the few enrollment utterances (round-4
    lhuc_noiv ablation went 8.52 -> 8.61; the reference's BLHUC line exists
    precisely because point-estimate LHUC overfits small enrollment sets —
    a prior toward identity is the non-Bayesian version of that fix)."""
    from tdnnf_nas_tpu.train.objective import chain_objective

    def loss_fn(lh):
        chain, xent, _ = apply_model_lhuc(
            cfg, params, bn_state, lh, batch["feats"],
            batch.get("ivectors"), train=False,
        )
        loss, metrics = chain_objective(chain, xent, den_arrays,
                                        batch["sup"], objective_cfg)
        return loss, metrics

    (loss, metrics), g = jax.value_and_grad(loss_fn, has_aux=True)(lhuc)
    new = jax.tree.map(lambda p, gr: (1.0 - lr * l2) * p - lr * gr, lhuc, g)
    return new, metrics


def adapt_lhuc(
    cfg: base.TdnnfModelConfig,
    params,
    bn_state,
    den_arrays,
    objective_cfg,
    batches,
    num_steps: int = 20,
    lr: float = 0.1,
    l2: float = 0.0,
):
    """Train LHUC logits on adaptation batches (model frozen), plain SGD.

    batches: iterable of {"feats", "sup", ["ivectors"]} from the speaker's
    adaptation data.  ``l2`` decays the logits toward identity scales (see
    _lhuc_step).  Returns the adapted logits.
    """
    lhuc = init_lhuc(cfg)
    it = iter(batches)
    metrics = None
    for i in range(num_steps):
        try:
            batch = next(it)
        except StopIteration:
            it = iter(batches)
            batch = next(it)
        lhuc, metrics = _lhuc_step(cfg, objective_cfg, lr, float(l2), params,
                                   bn_state, den_arrays, lhuc, batch)
    return lhuc, metrics
