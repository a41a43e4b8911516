"""Denominator-graph compilation: phone LM x chain topology x tree -> StateGraph.

Equivalent of the reference pipeline's ``chain-make-den-fst`` stage (invoked
from `steps/nnet3/chain/train.py:338`, upstream `src/chain/chain-den-graph.cc`)
— but compiled to the dense state-emitting form of `graphs/fsa.py` so the TPU
forward-backward is matmul-shaped.

Construction (bigram LM): for each phone p two states,
  enter(p): emits the forward pdf of p,  loop(p): emits p's self-loop pdf.
Outgoing from either state of p:
  -> loop(p)   with self_loop_prob
  -> enter(q)  with (1 - self_loop_prob) * P_lm(q | p)
Initial probs = approximate stationary distribution (chunks are cut
mid-utterance); finals = 1 (chunked convention, see fsa.StateGraph).

With a left-biphone tree the enter states are split per left context:
enter(p_from_left_l), giving S = P*(P+1) + P states.
"""

from __future__ import annotations

import numpy as np

from tdnnf_nas_tpu.graphs.fsa import StateGraph, stationary_init
from tdnnf_nas_tpu.graphs.phone_lm import PhoneLM
from tdnnf_nas_tpu.graphs.topology import BiphoneTree, ChainTopology


def den_init_lookup(g: StateGraph, num_phones: int):
    """Map a numerator state (phone, kind, left) -> den-graph initial prob.

    kind 0 = enter, 1 = loop.  Layout must match build_denominator_graph:
    CI graphs index enter states by phone and loop states by P+phone; biphone
    graphs index enter states by (left+1)*P + phone.
    """
    s = g.num_states
    if s == 2 * num_phones:  # CI layout
        return lambda p, kind, left=-1: float(
            g.init[p] if kind == 0 else g.init[num_phones + p]
        )
    n_enter = (num_phones + 1) * num_phones
    assert s == n_enter + num_phones, "unknown den-graph layout"
    return lambda p, kind, left=-1: float(
        g.init[(left + 1) * num_phones + p] if kind == 0 else g.init[n_enter + p]
    )


def build_denominator_graph(lm: PhoneLM, topo: ChainTopology, tree) -> StateGraph:
    p_count = lm.num_phones
    if topo.num_phones != p_count:
        raise ValueError("phone count mismatch between LM and topology")
    a = topo.self_loop_prob
    if isinstance(tree, BiphoneTree):
        return _build_biphone(lm, topo, tree)
    # CI / shared-context tree: states [enter(0..P-1), loop(0..P-1)]
    s = 2 * p_count
    trans = np.zeros((s, s), dtype=np.float64)
    state_pdf = np.zeros((s,), dtype=np.int32)
    for p in range(p_count):
        state_pdf[p] = tree.forward_pdf(p)
        state_pdf[p_count + p] = tree.self_loop_pdf(p)
        for src in (p, p_count + p):
            trans[src, p_count + p] += a
            trans[src, :p_count] += (1.0 - a) * lm.probs[p + 1].astype(np.float64)
    g = StateGraph(
        trans=trans.astype(np.float32),
        state_pdf=state_pdf,
        init=np.full((s,), 1.0 / s, dtype=np.float32),
        final=np.ones((s,), dtype=np.float32),
        num_pdfs=tree.num_pdfs,
    ).normalize()
    g = StateGraph(
        trans=g.trans,
        state_pdf=g.state_pdf,
        init=stationary_init(g.trans),
        final=g.final,
        num_pdfs=g.num_pdfs,
    )
    g.validate()
    return g


def _build_biphone(lm: PhoneLM, topo: ChainTopology, tree: BiphoneTree) -> StateGraph:
    p_count = lm.num_phones
    a = topo.self_loop_prob
    # enter states indexed by (left in -1..P-1, phone), then loop states by phone
    def enter_idx(left: int, phone: int) -> int:
        return (left + 1) * p_count + phone

    n_enter = (p_count + 1) * p_count
    s = n_enter + p_count
    loop0 = n_enter
    trans = np.zeros((s, s), dtype=np.float64)
    state_pdf = np.zeros((s,), dtype=np.int32)
    for left in range(-1, p_count):
        for p in range(p_count):
            state_pdf[enter_idx(left, p)] = tree.forward_pdf(p, left)
    for p in range(p_count):
        state_pdf[loop0 + p] = tree.self_loop_pdf(p)
    lmp = lm.probs.astype(np.float64)
    for p in range(p_count):
        srcs = [enter_idx(left, p) for left in range(-1, p_count)] + [loop0 + p]
        for src in srcs:
            trans[src, loop0 + p] += a
            for q in range(p_count):
                trans[src, enter_idx(p, q)] += (1.0 - a) * lmp[p + 1, q]
    g = StateGraph(
        trans=trans.astype(np.float32),
        state_pdf=state_pdf,
        init=np.full((s,), 1.0 / s, dtype=np.float32),
        final=np.ones((s,), dtype=np.float32),
        num_pdfs=tree.num_pdfs,
    ).normalize()
    g = StateGraph(
        trans=g.trans,
        state_pdf=g.state_pdf,
        init=stationary_init(g.trans),
        final=g.final,
        num_pdfs=g.num_pdfs,
    )
    g.validate()
    return g
