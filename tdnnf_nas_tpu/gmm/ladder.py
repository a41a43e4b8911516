"""The GMM bootstrap ladder: mono -> tri -> LDA+MLLT -> SAT(fMLLR) -> aligns.

Orchestrates gmm.py + transforms.py into the reference's `run.sh` GMM
staircase (`run.sh:139-257`): mono; tri1/tri2 = context-dependent tied-state
GMMs (``tri_leaves > 0`` — likelihood-clustered (phone, state, left-phone)
tying, gmm.train_tri); tri3 = LDA+MLLT (re-tied in the transformed space,
like Kaldi's tree rebuild per stage); tri4 = SAT/fMLLR; then
`Prepare_NAS_data.sh:66-75`'s final fMLLR alignment pass.  Output:
per-utterance phone begin/end frames at the subsampled output rate,
ready for tolerance-window chain supervision (graphs/supervision.py) —
the same artifact the reference takes from tri4.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np

from tdnnf_nas_tpu.core.config import Config
from tdnnf_nas_tpu.gmm.gmm import (
    AmGmm, MonoHmmConfig, _linear_hmm_arrays, path_to_phone_bounds,
    train_mono, train_tri, viterbi_align_gmm,
)
from tdnnf_nas_tpu.gmm.transforms import (
    apply_fmllr, estimate_fmllr, estimate_lda, estimate_mllt, splice_frames,
)


@dataclasses.dataclass(frozen=True)
class GmmLadderConfig(Config):
    mono: MonoHmmConfig = MonoHmmConfig()
    # context-dependent tied-state budget (0 = skip the tri1/tri2 stages);
    # the reference's staircase ends in thousands of tied triphone states
    tri_leaves: int = 0
    tri_em_iters: int = 8
    tri_min_count: float = 3.0
    splice_context: int = 3
    lda_dim: int = 0  # 0 => keep the input feature dim
    mllt_iters: int = 6
    lda_mllt_em_iters: int = 8
    sat_em_iters: int = 6
    fmllr_iters: int = 5
    frame_subsampling_factor: int = 3
    # EM-stage training subset (0 = use every utterance).  Kaldi's run.sh
    # trains mono/tri1 on 30k-short/100k subsets and only ALIGNS the full
    # set with the final models (`run.sh:139-257`); this is the same
    # speed/statistical trade at corpus scale.  Selection is stratified
    # round-robin so every speaker keeps utterances in the subset.
    train_subset: int = 0


@dataclasses.dataclass
class GmmLadderResult:
    am: AmGmm
    transform: np.ndarray  # [D', spliced_D] LDA+MLLT feature transform
    fmllr: dict  # speaker -> [D', D'+1]
    begins: List[List[int]]  # per utt, OUTPUT-rate phone begins
    ends: List[List[int]]
    mono_ll: List[float]
    mllt_aux: List[float]
    fmllr_gain: float  # mean per-frame loglike gain from fMLLR


def _state_classes(
    am: AmGmm, phone_seqs, paths
) -> List[np.ndarray]:
    """Per-frame am-state ids from chain paths (LDA/MLLT classes)."""
    out = []
    for phones, path in zip(phone_seqs, paths):
        ids = _linear_hmm_arrays(phones, am)
        out.append(ids[path].astype(np.int64))
    return out


def _frame_gaussians(am: AmGmm, feats: np.ndarray, state_ids: np.ndarray):
    """Hard-assign each frame to the best mixture of its aligned state;
    returns ([T, D] means, [T, D] inv-vars) for fMLLR stats."""
    t, d = feats.shape
    mu = np.zeros((t, d))
    iv = np.zeros((t, d))
    for s in np.unique(state_ids):
        g = am.gmms[int(s)]
        sel = state_ids == s
        comp = np.argmax(g.component_loglike(feats[sel]), axis=1)
        mu[sel] = g.means[comp]
        iv[sel] = 1.0 / g.variances[comp]
    return mu, iv


def run_gmm_ladder(
    feats_list: Sequence[np.ndarray],  # INPUT-rate features per utt
    phone_seqs: Sequence[Sequence[int]],
    num_phones: int,
    cfg: GmmLadderConfig = GmmLadderConfig(),
    speakers: Optional[Sequence] = None,  # per-utt speaker id (None = one)
) -> GmmLadderResult:
    n = len(feats_list)
    speakers = list(speakers) if speakers is not None else [0] * n
    d_in = feats_list[0].shape[1]

    # EM-stage training subset (see GmmLadderConfig.train_subset): round-
    # robin over speakers so every speaker has fMLLR statistics
    if cfg.train_subset and cfg.train_subset < n:
        by_spk: dict = {}
        for i in range(n):
            by_spk.setdefault(speakers[i], []).append(i)
        sub: List[int] = []
        queues = list(by_spk.values())
        r = 0
        while len(sub) < cfg.train_subset:
            q = queues[r % len(queues)]
            if q:
                sub.append(q.pop(0))
            r += 1
        sub.sort()
    else:
        sub = list(range(n))
    sub_feats = [feats_list[i] for i in sub]
    sub_phones = [phone_seqs[i] for i in sub]

    # ---- stage 1: monophone flat-start EM -------------------------------
    am, paths, mono_ll = train_mono(sub_feats, sub_phones, num_phones,
                                    cfg.mono)

    # ---- stage 1.5: context-dependent tied-state GMM (tri1/tri2) --------
    if cfg.tri_leaves > 0:
        am, paths, _ = train_tri(
            sub_feats, sub_phones, num_phones,
            dataclasses.replace(cfg.mono, num_iters=cfg.tri_em_iters),
            am, cfg.tri_leaves, min_count=cfg.tri_min_count,
        )

    # ---- stage 2: LDA + MLLT on spliced features (tri3) -----------------
    spliced = [splice_frames(f, cfg.splice_context) for f in feats_list]
    sub_spliced = [spliced[i] for i in sub]
    classes = _state_classes(am, sub_phones, paths)
    num_classes = len(am.gmms)
    lda_dim = cfg.lda_dim or d_in
    lda = estimate_lda(sub_spliced, classes, num_classes, lda_dim)
    lda_feats = [x @ lda.T for x in sub_spliced]
    mllt, mllt_aux = estimate_mllt(lda_feats, classes, num_classes,
                                   cfg.mllt_iters)
    transform = mllt @ lda  # [lda_dim, spliced_D]
    tr_feats = [x @ transform.T for x in spliced]
    sub_tr = [tr_feats[i] for i in sub]
    # retrain the GMMs in the transformed space (warm-started alignments),
    # re-tying the context tree there like Kaldi's per-stage tree rebuild
    am2, paths, _ = train_mono(
        sub_tr, sub_phones, num_phones,
        dataclasses.replace(cfg.mono, num_iters=cfg.lda_mllt_em_iters),
    )
    if cfg.tri_leaves > 0:
        am2, paths, _ = train_tri(
            sub_tr, sub_phones, num_phones,
            dataclasses.replace(cfg.mono, num_iters=cfg.tri_em_iters),
            am2, cfg.tri_leaves, min_count=cfg.tri_min_count,
        )

    # ---- stage 3: SAT / per-speaker fMLLR (tri4) ------------------------
    spk_ids = sorted(set(speakers))
    classes = _state_classes(am2, sub_phones, paths)
    sub_of = {u: j for j, u in enumerate(sub)}
    fmllr = {}
    base_ll, adapt_ll = 0.0, 0.0
    frames = 0
    for spk in spk_ids:
        idx = [i for i in sub if speakers[i] == spk]
        if not idx:  # speaker absent from the subset: identity transform
            d = tr_feats[0].shape[1]
            fmllr[spk] = np.concatenate(
                [np.eye(d), np.zeros((d, 1))], axis=1)
            continue
        mus, ivs = [], []
        for i in idx:
            mu, iv = _frame_gaussians(am2, tr_feats[i], classes[sub_of[i]])
            mus.append(mu)
            ivs.append(iv)
        w = estimate_fmllr([tr_feats[i] for i in idx], mus, ivs,
                           cfg.fmllr_iters)
        fmllr[spk] = w
    adapted = [apply_fmllr(tr_feats[i], fmllr[speakers[i]]) for i in range(n)]
    # retrain on adapted features (SAT); the tied context tree carries into
    # tri4 via warm-started EM from am2
    am3, _, _ = train_mono(
        [adapted[i] for i in sub], sub_phones, num_phones,
        dataclasses.replace(cfg.mono, num_iters=cfg.sat_em_iters),
        init_am=am2,
    )
    # fMLLR-gain diagnostic on the training subset
    for i in sub:
        _, s0 = viterbi_align_gmm(tr_feats[i], phone_seqs[i], am2)
        _, s1 = viterbi_align_gmm(adapted[i], phone_seqs[i], am3)
        base_ll += s0
        adapt_ll += s1
        frames += tr_feats[i].shape[0]
    # final alignment pass over the FULL corpus with the SAT model
    # (`Prepare_NAS_data.sh:66-75` aligns everything with tri4)
    paths = [viterbi_align_gmm(adapted[i], phone_seqs[i], am3)[0]
             for i in range(n)]

    # ---- alignments at the output frame rate ----------------------------
    fs = cfg.frame_subsampling_factor
    begins_out, ends_out = [], []
    for i in range(n):
        b, e = path_to_phone_bounds(paths[i], phone_seqs[i],
                                    am3.states_per_phone)
        t_out = max(1, feats_list[i].shape[0] // fs)
        bb = [min(x // fs, t_out - 1) for x in b]
        ee = [min(x // fs, t_out - 1) for x in e]
        # keep begins strictly usable: end >= begin per phone
        ee = [max(be, en) for be, en in zip(bb, ee)]
        begins_out.append(bb)
        ends_out.append(ee)

    return GmmLadderResult(
        am=am3, transform=transform, fmllr=fmllr,
        begins=begins_out, ends=ends_out,
        mono_ll=mono_ll, mllt_aux=mllt_aux,
        fmllr_gain=(adapt_ll - base_ll) / max(frames, 1),
    )
