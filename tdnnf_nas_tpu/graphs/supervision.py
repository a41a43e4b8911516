"""Numerator supervision: per-chunk linear phone graphs with tolerance masks.

Equivalent of the reference pipeline's chain numerator supervision (upstream
`src/chain/chain-supervision.*`, produced by `get_egs.sh` from tri4 fMLLR
lattices with ``--chain.left/right-tolerance 5`` — `train.py:79-82`,
`Prepare_NAS_data.sh:66-75`).  Kaldi encodes the tolerance window by
composing FSTs; here the same constraint is a **time-varying allow-mask**
over a linear phone graph — a [T, S] 0/1 array multiplied into alpha each
frame, which is exactly how the constraint acts and is free on the VPU.

States for a phone sequence p_1..p_N (chain topology, see graphs/topology.py):
  enter_i (emits forward pdf of p_i), loop_i (emits self-loop pdf of p_i).
Transitions carry the same self-loop and phone-LM probabilities as the
denominator graph, so numerator paths are a weight-preserving subset of
denominator paths (Z_num <= Z_den, objective <= 0) — the role of Kaldi's
normalization FST.

Mask semantics (tolerance ``tol`` in output frames): with aligned begin/end
output frames (b_i, e_i),
  enter_i allowed at t in [b_i - tol, b_i + tol]
  loop_i  allowed at t in [b_i - tol + 1, e_i + tol]
so every phone boundary may move by up to ±tol frames, matching Kaldi's
left/right-tolerance semantics.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax.tree_util
import numpy as np

from tdnnf_nas_tpu.graphs.phone_lm import PhoneLM
from tdnnf_nas_tpu.graphs.topology import ChainTopology


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class ChunkSupervision:
    """Dense per-chunk numerator graph, padded to a static state count.

    Built as numpy; batching = stacking along a leading axis.  Registered as
    a pytree so batched supervisions pass straight into jitted train steps.
    """

    trans: np.ndarray  # [S, S] float32
    state_pdf: np.ndarray  # [S] int32
    init: np.ndarray  # [S] float32
    final: np.ndarray  # [S] float32
    mask: np.ndarray  # [T, S] float32 (1 = state allowed at frame t)
    # compact linear-chain form: next_w[i] = weight of the arc into pair i+1
    # ((1-a) * P_lm(p_{i+1}|p_i)); lets the forward recursion run in O(S)
    # banded form instead of an [S,S] matmul (ops/fwdbwd.forward_score_linear)
    next_w: np.ndarray = None  # [S//2] float32
    self_loop_prob: float = 0.5

    def tree_flatten(self):
        return (
            (self.trans, self.state_pdf, self.init, self.final, self.mask,
             self.next_w),
            (self.self_loop_prob,),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, self_loop_prob=aux[0])


def numerator_graph(
    phones: Sequence[int],
    lm: PhoneLM,
    topo: ChainTopology,
    tree,
    max_states: int,
    init_ctx=None,
    init_left: tuple = (),
    next_phone: int = -1,
):
    """Linear chain graph over `phones`, padded to max_states (=2*max_phones).

    Returns (trans, state_pdf, init, final) with states laid out
    [enter_1, loop_1, enter_2, loop_2, ...].

    ``init_ctx``/``init_left``: LM walk state and most-recent-first left
    phone tuple BEFORE phones[0] — for chunks cut mid-utterance the egs
    builder passes the true utterance context (Kaldi gets the same effect
    by splitting the full-utterance supervision FST), so arc weights and
    pdfs match the denominator's along the true path exactly.
    """
    n = len(phones)
    s = 2 * n
    if s > max_states:
        raise ValueError(f"{n} phones needs {s} states > max_states={max_states}")
    a = topo.self_loop_prob
    trans = np.zeros((max_states, max_states), dtype=np.float32)
    state_pdf = np.zeros((max_states,), dtype=np.int32)
    init = np.zeros((max_states,), dtype=np.float32)
    final = np.zeros((max_states,), dtype=np.float32)
    next_w = np.zeros((max_states // 2,), dtype=np.float32)
    # LM context walks the same FSA as the denominator compiler (uniform
    # walk interface: bigram PhoneLM or pruned NGramPhoneLM), and the tree
    # left context is the running most-recent-first phone tuple — so
    # numerator arc weights/pdfs exactly match denominator arcs at any LM
    # order / tree context width.
    ctx = lm.walk_init() if init_ctx is None else init_ctx
    left: tuple = tuple(init_left)
    tctx = getattr(tree, "context_width", 1) - 1
    rctx = getattr(tree, "right_context", 0)
    for i, p in enumerate(phones):
        e, l = 2 * i, 2 * i + 1
        _, ctx_after = lm.walk(ctx, p)
        if rctx:
            # +-1 tree: pdf keyed on the successor; ``next_phone`` is the
            # true utterance successor of the chunk's last phone (-1 =
            # utterance end, matching the den's wildcard/EOS commitment)
            right = phones[i + 1] if i + 1 < n else next_phone
            state_pdf[e] = tree.forward_pdf_ctx(p, left, right=int(right))
        else:
            state_pdf[e] = tree.forward_pdf_ctx(p, left)
        state_pdf[l] = tree.self_loop_pdf(p)
        for src in (e, l):
            trans[src, l] = a
            if i + 1 < n:
                q = phones[i + 1]
                wq, ctx2 = lm.walk(ctx_after, q)
                if rctx:
                    # committed-successor semantics: the arc entering q
                    # pays q's OWN successor probability (den arc weight,
                    # den_graph._compile_den_fsa_committed)
                    commit = phones[i + 2] if i + 2 < n else next_phone
                    if commit == -1:
                        wq = max(lm.final_prob(ctx2), 1e-8)
                    else:
                        wq, _ = lm.walk(ctx2, int(commit))
                w = (1.0 - a) * wq
                trans[src, 2 * (i + 1)] = w
                next_w[i] = w
        ctx = ctx_after
        left = ((p,) + left)[:tctx]
    final[: s] = 1.0
    init[0] = 1.0
    return trans, state_pdf, init, final, next_w


def tolerance_mask(
    begins: Sequence[int],
    ends: Sequence[int],
    num_frames: int,
    max_states: int,
    tol: int,
) -> np.ndarray:
    """[T, S] allow-mask for the linear graph from aligned phone spans.

    begins[i]/ends[i]: first/last output frame of phone i within the chunk
    (clipped); phones crossing the chunk edge simply have spans clipped to
    [0, T-1], which lets the chunk start/end mid-phone.
    """
    n = len(begins)
    mask = np.zeros((num_frames, max_states), dtype=np.float32)
    for i in range(n):
        b, e = int(begins[i]), int(ends[i])
        ent_lo, ent_hi = max(b - tol, 0), min(b + tol, num_frames - 1)
        loop_lo, loop_hi = max(b - tol + 1, 0), min(e + tol, num_frames - 1)
        if i == 0 and b <= 0:  # chunk starts mid-phone: allow loop from t=0
            loop_lo = 0
        mask[ent_lo : ent_hi + 1, 2 * i] = 1.0
        if loop_hi >= loop_lo:
            mask[loop_lo : loop_hi + 1, 2 * i + 1] = 1.0
    return mask


def make_chunk_supervision(
    phones: Sequence[int],
    begins: Optional[Sequence[int]],
    ends: Optional[Sequence[int]],
    lm: PhoneLM,
    topo: ChainTopology,
    tree,
    num_frames: int,
    max_states: int,
    tol: int = 2,
    den_init_fn=None,
    den_init_seq=None,
    init_ctx=None,
    init_left: tuple = (),
    next_phone: int = -1,
) -> ChunkSupervision:
    """Build the full numerator supervision for one chunk.

    begins/ends None => unaligned (e2e flat-start style): all states allowed
    at all frames, init on the first phone, i.e. the pure transcript graph.

    den_init_fn(phone, kind, left_phone) -> float maps each numerator state
    (kind 0 = enter, 1 = loop) to the denominator graph's initial prob for
    the matching den state.  When given, numerator init weights are those
    (UN-normalized) den weights restricted to allowed start states — making
    numerator paths a weight-exact subset of denominator paths, the role of
    Kaldi's normalization FST (upstream chain-supervision.cc).  Without it,
    init is uniform over allowed start states (objective may exceed 0 by a
    bounded constant).
    """
    trans, state_pdf, init, final, next_w = numerator_graph(
        phones, lm, topo, tree, max_states,
        init_ctx=init_ctx, init_left=init_left, next_phone=next_phone)
    n = len(phones)
    if begins is None:
        mask = np.zeros((num_frames, max_states), dtype=np.float32)
        mask[:, : 2 * n] = 1.0
        allowed0 = np.zeros((max_states,), dtype=bool)
        allowed0[0] = True
    else:
        mask = tolerance_mask(begins, ends, num_frames, max_states, tol)
        # init mass on every state the mask allows at t=0 (chunk may start
        # mid-utterance; Kaldi gets this from splitting the supervision FST)
        allowed0 = mask[0] > 0
        if not allowed0.any():
            raise ValueError("tolerance mask leaves no allowed state at frame 0")
    if den_init_seq is not None:
        # (enter_init[i], loop_init[i]) arrays from the composed den FSA
        # (CompiledDenFsa.init_lookup_seq) — arbitrary LM order/tree context
        ent, loop = den_init_seq
        init = np.zeros((max_states,), dtype=np.float32)
        for i in range(n):
            if allowed0[2 * i]:
                init[2 * i] = ent[i]
            if allowed0[2 * i + 1]:
                init[2 * i + 1] = loop[i]
    elif den_init_fn is not None:
        init = np.zeros((max_states,), dtype=np.float32)
        prev = init_left[0] if len(init_left) else -1
        for i, p in enumerate(phones):
            if allowed0[2 * i]:
                init[2 * i] = den_init_fn(p, 0, prev)
            if allowed0[2 * i + 1]:
                init[2 * i + 1] = den_init_fn(p, 1, prev)
            prev = p
    else:
        init = allowed0.astype(np.float32)
        init /= init.sum()
    return ChunkSupervision(trans=trans, state_pdf=state_pdf, init=init, final=final,
                            mask=mask, next_w=next_w,
                            self_loop_prob=topo.self_loop_prob)


def stack_supervisions(sups: Sequence[ChunkSupervision]) -> ChunkSupervision:
    """Stack per-chunk supervisions into batched arrays [B, ...].

    When the compact linear-chain form (next_w) is present, the dense
    [S,S] trans is NOT shipped — the objective's numerator runs the O(S)
    banded recursion (ops/fwdbwd.forward_score_linear) and never reads it;
    dropping it cuts the per-batch host->device bytes by ~40% (decisive
    through a remote-device tunnel)."""
    compact = sups[0].next_w is not None
    return ChunkSupervision(
        trans=(np.zeros((len(sups), 1, 1), np.float32) if compact
               else np.stack([s.trans for s in sups])),
        state_pdf=np.stack([s.state_pdf for s in sups]),
        init=np.stack([s.init for s in sups]),
        final=np.stack([s.final for s in sups]),
        # 0/1 mask ships as uint8 (4x fewer host->device bytes; both
        # numerator kernels consume it via `mask > 0` / promotion)
        mask=(np.stack([s.mask for s in sups]) > 0).astype(np.uint8),
        next_w=(np.stack([s.next_w for s in sups])
                if sups[0].next_w is not None else None),
        self_loop_prob=sups[0].self_loop_prob,
    )
