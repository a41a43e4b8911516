"""Chain HMM topology and phonetic-context trees.

Equivalent of the reference pipeline's HMM topology + tree stage (upstream
Kaldi `steps/nnet3/chain/build_tree.sh`, referenced as
`exp/chain/tri5_7d_tree_sp` by e.g.
`local/chain_NAS/run_TDNN_DARTSV3_fbk_stride_pretrain.sh:75`).

The chain topology is Kaldi's 1-state-per-phone HMM with two pdf-classes:
the *forward* pdf emitted on entry to the phone and the *self-loop* pdf
emitted on each additional frame (minimum phone duration = 1 output frame).
Trees map (context, phone, pdf-class) -> pdf id.
"""

from __future__ import annotations

import dataclasses


import numpy as np

FORWARD = 0  # pdf-class emitted on entering a phone
SELF_LOOP = 1  # pdf-class emitted on the phone's self-loop


@dataclasses.dataclass(frozen=True)
class ChainTopology:
    """Chain topology constants.

    self_loop_prob: fixed transition prob of staying in the phone state
    (Kaldi chain topology uses untrained 0.5/0.5).
    """

    num_phones: int
    self_loop_prob: float = 0.5


class ContextIndependentTree:
    """CI tree: pdf = 2*phone + pdf_class.  num_pdfs = 2*num_phones."""

    def __init__(self, num_phones: int):
        self.num_phones = num_phones
        self.num_pdfs = 2 * num_phones
        self.context_width = 1

    def pdf(self, phone: int, pdf_class: int, left_phone: int = -1) -> int:
        return 2 * phone + pdf_class

    def forward_pdf(self, phone: int, left_phone: int = -1) -> int:
        return self.pdf(phone, FORWARD)

    def forward_pdf_ctx(self, phone: int, left=()) -> int:
        """Uniform context interface: ``left`` is the left-phone tuple,
        most-recent first (``left[0]`` = immediately preceding phone)."""
        return self.forward_pdf(phone)

    def self_loop_pdf(self, phone: int) -> int:
        return self.pdf(phone, SELF_LOOP)


class BiphoneTree:
    """Left-biphone tree (e2e-chain style).

    Forward pdfs depend on (left_phone, phone); self-loop pdfs on phone only
    — matching Kaldi's flat-start chain tree shape.  If ``num_leaves`` caps
    the forward-pdf count below num_phones^2, biphones are merged by a
    deterministic mixed-radix hash (placeholder for a stats-driven clustered
    tree; the reference uses a likelihood-clustered triphone tree with 6034
    leaves, `run_tdnn_7q_fbk_40_manual.sh:26`).
    """

    def __init__(self, num_phones: int, num_leaves: int | None = None):
        self.num_phones = num_phones
        self.context_width = 2
        n_biphones = num_phones * (num_phones + 1)  # left context incl. BOS (-1)
        if num_leaves is None or num_leaves >= n_biphones:
            self._fwd_table = np.arange(n_biphones, dtype=np.int64)
            n_fwd = n_biphones
        else:
            rng = np.random.RandomState(0)
            self._fwd_table = rng.randint(0, num_leaves, size=n_biphones).astype(np.int64)
            # ensure every phone keeps at least one distinct forward pdf
            self._fwd_table[: num_phones] = np.arange(num_phones) % num_leaves
            n_fwd = num_leaves
        self._n_fwd = n_fwd
        self.num_pdfs = n_fwd + num_phones  # + per-phone self-loop pdfs

    def forward_pdf(self, phone: int, left_phone: int = -1) -> int:
        idx = phone * (self.num_phones + 1) + (left_phone + 1)
        return int(self._fwd_table[idx])

    def forward_pdf_ctx(self, phone: int, left=()) -> int:
        return self.forward_pdf(phone, left[0] if len(left) else -1)

    def self_loop_pdf(self, phone: int) -> int:
        return self._n_fwd + phone

    def pdf(self, phone: int, pdf_class: int, left_phone: int = -1) -> int:
        if pdf_class == FORWARD:
            return self.forward_pdf(phone, left_phone)
        return self.self_loop_pdf(phone)


class CrossTriphoneTree:
    """Classic +-1 triphone tree: context window [l, p, r] (one LEFT and
    one RIGHT phone), the exact shape of the reference's `tri5_7d` tree
    (`run_tdnn_7q_fbk_40_manual.sh:26`, upstream build_tree.sh).

    Right-context dependence means the forward pdf of a phone is known only
    once its successor is; the denominator composition handles this with
    committed-successor positions (`den_graph.compile_denominator_fsa`),
    the numerator reads the successor off the known phone sequence, and
    decode graphs use the within-pronunciation successor (word-final
    phones fall back to the unseen-context class r=-1, documented
    approximation vs Kaldi's full C-composition cross-word splits).

    ``forward_pdf_lr(p, l, r)`` looks up a flat [P, P+1, P+1] table (-1 =
    BOS/EOS/unknown in either slot); self-loop pdfs per phone.
    """

    right_context = 1

    def __init__(self, num_phones: int, fwd_table, n_fwd: int):
        import numpy as _np

        self.num_phones = num_phones
        self.context_width = 2  # LEFT window incl. center (l, p)
        self._fwd_table = _np.asarray(fwd_table, _np.int64).reshape(
            num_phones, num_phones + 1, num_phones + 1)
        self._n_fwd = int(n_fwd)
        self.num_pdfs = self._n_fwd + num_phones

    def forward_pdf_lr(self, phone: int, left_phone: int = -1,
                       right_phone: int = -1) -> int:
        return int(self._fwd_table[phone, left_phone + 1, right_phone + 1])

    def forward_pdf_ctx(self, phone: int, left=(), right: int = -1) -> int:
        l1 = left[0] if len(left) else -1
        return self.forward_pdf_lr(phone, l1, right)

    def self_loop_pdf(self, phone: int) -> int:
        return self._n_fwd + phone

    def pdf(self, phone: int, pdf_class: int, left_phone: int = -1,
            right_phone: int = -1) -> int:
        if pdf_class == FORWARD:
            return self.forward_pdf_lr(phone, left_phone, right_phone)
        return self.self_loop_pdf(phone)


class TriphoneTree:
    """Two-left-phone context tree ("triphone" window [l2, l1, p]).

    The reference tree `tri5_7d` (6034 leaves,
    `run_tdnn_7q_fbk_40_manual.sh:26`) is a center-phone triphone tree with
    one left and one right phone of context.  Right-context dependence
    requires arc-lookahead composition (Kaldi's C transducer delays symbols)
    which buys nothing on TPU and complicates every graph; a two-LEFT-phone
    window gives the same context granularity and leaf-count scale while
    keeping every graph (den, numerator, decode) strictly causal — the same
    trade Kaldi's own e2e chain recipes make with left-biphone trees.

    ``forward_pdf_ctx(p, (l1, l2))`` looks up a flat [P, P+1, P+1] table
    (BOS = -1 in either slot); self-loop pdfs stay per-phone (pdf-class 1
    tied across contexts).  Built by likelihood clustering in
    `graphs/tree_cluster.py:build_clustered_triphone_tree`.
    """

    def __init__(self, num_phones: int, fwd_table, n_fwd: int):
        import numpy as _np

        self.num_phones = num_phones
        self.context_width = 3
        self._fwd_table = _np.asarray(fwd_table, _np.int64).reshape(
            num_phones, num_phones + 1, num_phones + 1)
        self._n_fwd = int(n_fwd)
        self.num_pdfs = self._n_fwd + num_phones

    def forward_pdf(self, phone: int, left_phone: int = -1,
                    left2_phone: int = -1) -> int:
        return int(self._fwd_table[phone, left_phone + 1, left2_phone + 1])

    def forward_pdf_ctx(self, phone: int, left=()) -> int:
        l1 = left[0] if len(left) >= 1 else -1
        l2 = left[1] if len(left) >= 2 else -1
        return self.forward_pdf(phone, l1, l2)

    def self_loop_pdf(self, phone: int) -> int:
        return self._n_fwd + phone

    def pdf(self, phone: int, pdf_class: int, left_phone: int = -1) -> int:
        if pdf_class == FORWARD:
            return self.forward_pdf(phone, left_phone)
        return self.self_loop_pdf(phone)
