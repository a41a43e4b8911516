"""Phone-level language model for the denominator graph.

Equivalent of the reference pipeline's ``chain-est-phone-lm`` stage (invoked
from `steps/nnet3/chain/train.py:332`): estimate an n-gram LM over the phone
sequences of the training alignments, which defines the competing-hypothesis
space of the LF-MMI denominator.

Round-1 scope: interpolated bigram (dense [P+1, P] matrix — for the dense
TPU denominator kernel a bigram already yields the phones x 2-state graph).
Higher-order contexts arrive as extra LM states later, same StateGraph form.
"""

from __future__ import annotations

import dataclasses
from typing import Iterable, Sequence

import numpy as np

BOS = -1  # beginning-of-sequence context


@dataclasses.dataclass
class PhoneLM:
    """Bigram phone LM.

    probs[p+1, q] = P(q | p), with row 0 the BOS context.  Rows sum to
    P(end | p) + sum_q P(q | p) = 1 where ``final[p+1] = P(end | p)``.
    """

    probs: np.ndarray  # [P+1, P] float32
    final: np.ndarray  # [P+1] float32
    num_phones: int

    def log_prob(self, seq: Sequence[int]) -> float:
        lp = 0.0
        prev = BOS
        for p in seq:
            lp += float(np.log(self.probs[prev + 1, p]))
            prev = p
        return lp + float(np.log(self.final[prev + 1]))


def estimate_phone_lm(
    phone_seqs: Iterable[Sequence[int]],
    num_phones: int,
    interp: float = 0.1,
) -> PhoneLM:
    """Count-based interpolated bigram over training phone sequences.

    ``interp`` interpolates with the unigram distribution so every phone pair
    has nonzero probability (keeps the denominator graph fully connected, the
    property Kaldi gets from its un-pruned phone LM).
    """
    counts = np.zeros((num_phones + 1, num_phones), dtype=np.float64)
    final_counts = np.zeros((num_phones + 1,), dtype=np.float64)
    uni = np.zeros((num_phones,), dtype=np.float64)
    n_seqs = 0
    for seq in phone_seqs:
        n_seqs += 1
        prev = BOS
        for p in seq:
            counts[prev + 1, p] += 1.0
            uni[p] += 1.0
            prev = p
        final_counts[prev + 1] += 1.0
    if n_seqs == 0:
        raise ValueError("no phone sequences")
    uni = (uni + 1.0) / (uni.sum() + num_phones)
    tot = counts.sum(axis=1) + final_counts
    # final prob: fraction of times the context ended a sequence (floored)
    final = (final_counts + 0.5) / (tot + 1.0)
    row = counts.sum(axis=1)
    cond = counts / np.maximum(row[:, None], 1.0)
    cond = np.where(row[:, None] > 0, cond, uni[None, :])
    probs = (1.0 - interp) * cond + interp * uni[None, :]
    # renormalize so probs-row + final == 1
    probs = probs * (1.0 - final[:, None]) / probs.sum(axis=1, keepdims=True)
    return PhoneLM(
        probs=probs.astype(np.float32),
        final=final.astype(np.float32),
        num_phones=num_phones,
    )
