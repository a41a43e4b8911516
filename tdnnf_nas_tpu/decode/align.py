"""Forced alignment: Viterbi over the numerator (transcript) graph.

The TPU-native replacement for the reference's GMM-HMM alignment bootstrap
(`run.sh` mono->tri4 + fMLLR aligns, `Prepare_NAS_data.sh:66-75`): instead
of a GMM ladder, train a flat-start chain model with unaligned (full-mask)
numerator supervision, then force-align with it to produce the phone
begin/end frames that the tolerance-window supervision of the main training
stage consumes — the e2e-chain bootstrap, all on TPU.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from tdnnf_nas_tpu.decode.viterbi import viterbi_decode
from tdnnf_nas_tpu.graphs.phone_lm import PhoneLM
from tdnnf_nas_tpu.graphs.supervision import numerator_graph
from tdnnf_nas_tpu.graphs.topology import ChainTopology

_NEG = -1e30


def align_utterance(
    obs_logprob: np.ndarray,  # [T_out, P] chain log-output for ONE utterance
    phones: Sequence[int],
    lm: PhoneLM,
    topo: ChainTopology,
    tree,
) -> Tuple[List[int], List[int], float]:
    """Returns (begins, ends, score) at the output frame rate."""
    n = len(phones)
    max_states = 2 * n
    trans, state_pdf, init, final, _ = numerator_graph(phones, lm, topo, tree,
                                                    max_states)
    # force completion: final mass only on the LAST phone's states
    final = np.zeros_like(final)
    final[2 * n - 2 :] = 1.0
    with np.errstate(divide="ignore"):
        lt = np.where(trans > 0, np.log(np.maximum(trans, 1e-30)), _NEG)
        li = np.where(init > 0, np.log(np.maximum(init, 1e-30)), _NEG)
        lf = np.where(final > 0, 0.0, _NEG)
    score, paths = viterbi_decode(
        jnp.asarray(obs_logprob[None]), jnp.asarray(lt, jnp.float32),
        jnp.asarray(state_pdf), jnp.asarray(li, jnp.float32),
        jnp.asarray(lf, jnp.float32),
    )
    path = np.asarray(paths[0])
    begins = [-1] * n
    ends = [0] * n
    for t, s in enumerate(path):
        i = int(s) // 2
        if begins[i] < 0:
            begins[i] = t
        ends[i] = t
    # states are visited in order; fill any (impossible) gaps defensively
    for i in range(n):
        if begins[i] < 0:
            begins[i] = ends[i - 1] + 1 if i > 0 else 0
            ends[i] = max(ends[i], begins[i])
    return begins, ends, float(score[0])


def align_corpus(bundle, model_cfg, state, utts) -> list:
    """Force-align utterances with a trained model; returns new Utterance
    objects with refreshed begins/ends (for the aligned training stage)."""
    import dataclasses

    from tdnnf_nas_tpu.models import apply_model, model_context

    left, right = model_context(model_cfg)
    out = []
    for utt in utts:
        t_out = len(utt.pdf_align)
        feats = np.concatenate([
            np.repeat(utt.feats[:1], left, 0), utt.feats,
            np.repeat(utt.feats[-1:], right + 2, 0),
        ])[None]
        need = left + (t_out - 1) * model_cfg.frame_subsampling_factor + 1 + right
        chain, _, _ = apply_model(model_cfg, state.params, state.bn_state,
                                  jnp.asarray(feats[:, :need]), train=False)
        begins, ends, _ = align_utterance(
            np.asarray(chain[0]), utt.phones, bundle.lm, bundle.topo, bundle.tree
        )
        out.append(dataclasses.replace(utt, begins=begins, ends=ends))
    return out
