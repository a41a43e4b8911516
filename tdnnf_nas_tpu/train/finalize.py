"""Model finalization utilities: BN stats recompute, checkpoint combination,
parameter shrinkage.

Equivalents of the reference's:
  * ``RecomputeStats`` before decode (`nnet-utils.cc:541-551`) —
    :func:`recompute_bn_stats` re-accumulates batchnorm statistics over egs
    with frozen params.
  * ``nnet3-chain-combine`` final model combination (`train.py:572-585`):
    objective-weighted selection/average over the last K checkpoints —
    :func:`combine_states`.  With exact-DP single-trajectory training the
    simple best-valid selection usually wins; averaging is kept as an option.
  * per-iteration shrinkage (`train.py:484-500` shrink-value on saturated
    models) — :func:`shrink_params` scales the nonlinearity-adjacent weights.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def recompute_bn_stats(apply_train_fn, state, batches, max_batches: int = 20):
    """Recompute BN stats by running forward in train mode over `batches`.

    apply_train_fn(params, bn_state, batch) -> new_bn_state (one forward in
    train mode).  Returns state with refreshed bn_state (EMA over batches,
    starting from the existing stats).
    """
    bn = state.bn_state
    for i, batch in enumerate(batches):
        if i >= max_batches:
            break
        bn = apply_train_fn(state.params, bn, batch)
    return state.replace_bn(bn) if hasattr(state, "replace_bn") else _with_bn(state, bn)


def _with_bn(state, bn):
    import dataclasses

    return dataclasses.replace(state, bn_state=bn)


def combine_states(
    states: Sequence,
    valid_objf_fn: Callable,
    mode: str = "best",
):
    """Final model combination over checkpoint states.

    mode="best": return the state with the highest validation objective
    (get_best_nnet_model, `common.py:167`).
    mode="average": uniform parameter average of all states
    (get_average_nnet_model, `common.py:144`), keeping the best state's
    BN/optimizer state.
    mode="weighted": greedy objective-driven combination — start from the
    best checkpoint and add others (objf order) to a uniform average while
    the validation objective improves.  The same semantics modern
    ``nnet3-chain-combine`` converges to (`train.py:572-585`): it never
    returns a model worse on the validation objective than the best single
    checkpoint.
    """
    import dataclasses

    objfs = [float(valid_objf_fn(s)) for s in states]
    best = int(np.argmax(objfs))
    if mode == "best":
        return states[best], objfs

    def avg(param_sets):
        return jax.tree.map(
            lambda *xs: sum(x.astype(jnp.float32) for x in xs) / len(xs),
            *param_sets,
        )

    if mode == "average":
        out = _with_bn(states[best], states[best].bn_state)
        return dataclasses.replace(out, params=avg([s.params
                                                    for s in states])), objfs

    assert mode == "weighted", mode
    order = list(np.argsort(objfs)[::-1])
    chosen = [states[order[0]].params]
    cur = states[order[0]]
    cur_objf = objfs[order[0]]
    for idx in order[1:]:
        cand_params = avg(chosen + [states[idx].params])
        cand = dataclasses.replace(_with_bn(states[best],
                                            states[best].bn_state),
                                   params=cand_params)
        cand_objf = float(valid_objf_fn(cand))
        if cand_objf > cur_objf:
            chosen.append(states[idx].params)
            cur, cur_objf = cand, cand_objf
    return cur, objfs


def shrink_params(params, shrink: float, skip_substrings=("lda", "output_")):
    """Scale parameters by `shrink` (<1), skipping fixed/output layers —
    the chain shrinkage trick for saturated ReLU models."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = []
    for path, leaf in flat:
        name = "/".join(str(p) for p in path)
        if any(s in name for s in skip_substrings):
            out.append(leaf)
        else:
            out.append(leaf * shrink)
    return jax.tree_util.tree_unflatten(treedef, [l for l in out])
