"""Batched Viterbi decoding over dense StateGraphs.

Round-1 decoder (diagnostic/phone decode + forced alignment): max-product
recursion with backpointers over the same dense state-emitting graphs the
training objective uses — one [B,S,S] max-plus step per frame under
`lax.scan`, batched on TPU.  The full WFST lattice decoder with word-level
LMs and rescoring (the reference's `steps/nnet3/decode.sh` /
``nnet3-latgen-faster`` path, SURVEY.md §3.3) builds on this in later
rounds via composed HCLG graphs in the same dense/sparse array form.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_NEG = -1e30


@partial(jax.jit, static_argnames=())
def viterbi_decode(
    obs_logprob: jax.Array,
    log_trans: jax.Array,
    state_pdf: jax.Array,
    log_init: jax.Array,
    log_final: jax.Array,
):
    """Best state path per sequence.

    Args:
      obs_logprob: [B, T, P] log-outputs.
      log_trans: [S, S] log transition weights (-inf for absent arcs).
      state_pdf: [S], log_init/log_final: [S].

    Returns: (scores [B], paths [B, T] int32 state ids).
    """
    b, t, _ = obs_logprob.shape
    obs_s = jnp.take(obs_logprob, state_pdf, axis=-1)  # [B,T,S]

    delta0 = log_init[None, :] + obs_s[:, 0]

    def step(delta, obs_t):
        # cand[b, i, j] = delta[b, i] + log_trans[i, j]
        cand = delta[:, :, None] + log_trans[None, :, :]
        bp = jnp.argmax(cand, axis=1)  # [B, S]
        delta_new = jnp.max(cand, axis=1) + obs_t
        return delta_new, bp

    deltaT, bps = jax.lax.scan(step, delta0, jnp.moveaxis(obs_s[:, 1:], 1, 0))
    total = deltaT + log_final[None, :]
    last = jnp.argmax(total, axis=-1)  # [B]
    score = jnp.max(total, axis=-1)

    def backtrace(carry, bp_t):
        cur = carry
        prev = jnp.take_along_axis(bp_t, cur[:, None], axis=1)[:, 0]
        return prev, cur

    first, rest = jax.lax.scan(backtrace, last, bps, reverse=True)
    paths = jnp.concatenate([first[:, None], jnp.moveaxis(rest, 0, 1)], axis=1)
    return score, paths


def graph_log_arrays(g):
    """StateGraph -> (log_trans, state_pdf, log_init, log_final) jnp arrays."""
    with np.errstate(divide="ignore"):
        lt = np.where(g.trans > 0, np.log(np.maximum(g.trans, 1e-30)), _NEG)
        li = np.where(g.init > 0, np.log(np.maximum(g.init, 1e-30)), _NEG)
        lf = np.where(g.final > 0, np.log(np.maximum(g.final, 1e-30)), _NEG)
    return (jnp.asarray(lt, jnp.float32), jnp.asarray(g.state_pdf),
            jnp.asarray(li, jnp.float32), jnp.asarray(lf, jnp.float32))


def path_to_phones(path: np.ndarray, num_phones: int) -> list:
    """CI den-graph state path -> decoded phone sequence.

    Layout from graphs/den_graph.py: states [enter(0..P-1), loop(0..P-1)];
    a phone is emitted at each visit to an enter state (or at t=0 wherever
    the path starts, since chunks may begin mid-phone).
    """
    phones = []
    prev_state = -1
    for t, s in enumerate(np.asarray(path)):
        s = int(s)
        if s < num_phones:  # enter state => new phone
            phones.append(s)
        elif t == 0:  # start mid-phone in a loop state
            phones.append(s - num_phones)
        prev_state = s
    del prev_state
    return phones
