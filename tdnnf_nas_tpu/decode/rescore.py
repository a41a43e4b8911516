"""N-best LM rescoring: swap first-pass graph LM scores for a bigger LM.

Equivalent of the reference's lattice rescoring stages
(`steps/lmrescore_const_arpa.sh` 4-gram rescore at
`run_tdnn_7q_fbk_40_manual.sh:226-228`; RNNLM n-best rescoring hooks into
the same interface later): for each hypothesis,

    new_score = (total - lm_scale_old * logP_G(words))
                + lm_scale_new * logP_big(words)

i.e. remove the decoding graph's word-LM contribution and add the
higher-order LM's, exactly the G-replacement semantics of lattice
rescoring.
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple


from tdnnf_nas_tpu.decode.wfst import WordLM
from tdnnf_nas_tpu.lm.ngram import NGramLM

_LN10 = math.log(10.0)


def graph_lm_logprob(words: Sequence[int], wlm: WordLM) -> float:
    """Natural-log score the decoding graph's bigram assigned to `words`
    (init + transitions + final), matching build_decoding_graph weights."""
    lp = 0.0
    prev = -1
    for w in words:
        lp += math.log(max(float(wlm.probs[prev + 1, w]), 1e-30))
        prev = w
    lp += math.log(max(float(wlm.final[prev + 1]), 1e-30))
    return lp


def rescore_nbest(
    nbest: List[Tuple[List[int], float]],
    old_lm: WordLM,
    new_lm: NGramLM,
    lm_scale: float = 1.0,
    word_to_token=str,
) -> List[Tuple[List[int], float]]:
    """Re-rank (words, score) hypotheses with `new_lm`; best first.

    new_lm scores are log10 (ARPA convention) over string tokens;
    word_to_token maps int word ids to those tokens.
    """
    out = []
    for words, total in nbest:
        am = total - graph_lm_logprob(words, old_lm)
        lm_new = new_lm.score([word_to_token(w) for w in words]) * _LN10
        out.append((words, am + lm_scale * lm_new))
    out.sort(key=lambda h: -h[1])
    return out
