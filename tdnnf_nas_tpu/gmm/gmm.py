"""Diagonal-covariance GMM-HMM acoustic models: flat-start monophone
training by Viterbi EM with mixture splitting.

TPU-native-framework equivalent of the reference's GMM bootstrap ladder
(`run.sh:139-257`: steps/train_mono.sh -> train_deltas -> LDA+MLLT ->
SAT), which exists only to produce phone alignments/lattices for the
chain supervision (`Prepare_NAS_data.sh:66-75`).  The framework's default
bootstrap is the flat-start chain self-alignment (decode/align.py); this
module provides the classical GMM path for parity — alignments from
either feed the same tolerance-window supervision.

Everything is host-side numpy: GMM bootstrap is a tiny, one-off,
embarrassingly-parallel stage (Kaldi runs it on CPUs too); the TPU is
reserved for the neural training that dominates compute.

HMM: per phone, ``states_per_phone`` left-to-right states at the INPUT
frame rate (Kaldi mono default 3); alignment boundaries are converted to
the output (subsampled) rate by the ladder driver.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np

from tdnnf_nas_tpu.core.config import Config

_NEG = -1e30


@dataclasses.dataclass
class DiagGmm:
    """weights [M], means [M, D], variances [M, D] (diagonal)."""

    weights: np.ndarray
    means: np.ndarray
    variances: np.ndarray

    @property
    def num_mix(self) -> int:
        return int(self.weights.shape[0])

    def loglike(self, feats: np.ndarray) -> np.ndarray:
        """[T, D] -> [T] total log-likelihood (logsumexp over mixtures)."""
        return np.logaddexp.reduce(self.component_loglike(feats), axis=1)

    def component_loglike(self, feats: np.ndarray) -> np.ndarray:
        """[T, D] -> [T, M] per-mixture log p(x, m)."""
        d = feats.shape[1]
        inv_var = 1.0 / self.variances  # [M, D]
        log_det = np.log(self.variances).sum(axis=1)  # [M]
        # -(x-mu)^2 / (2 var) expanded for vectorization
        x2 = feats**2 @ inv_var.T  # [T, M]
        xm = feats @ (self.means * inv_var).T
        m2 = ((self.means**2) * inv_var).sum(axis=1)
        const = np.log(np.maximum(self.weights, 1e-30)) - 0.5 * (
            d * np.log(2 * np.pi) + log_det + m2
        )
        return const[None, :] + xm - 0.5 * x2

    def split(self, target: int, perturb: float = 0.1) -> "DiagGmm":
        """Mixture-up by splitting the heaviest components (Kaldi
        gmm-mixup semantics: perturb along the standard deviation)."""
        w = list(self.weights)
        mu = list(self.means)
        var = list(self.variances)
        rng = np.random.RandomState(len(w))
        while len(w) < target:
            i = int(np.argmax(w))
            d = perturb * np.sqrt(var[i]) * rng.choice([-1.0, 1.0],
                                                       size=var[i].shape)
            w_half = w[i] / 2.0
            w[i] = w_half
            w.append(w_half)
            mu.append(mu[i] + d)
            mu[i] = mu[i] - d
            var.append(var[i].copy())
        return DiagGmm(np.asarray(w), np.asarray(mu), np.asarray(var))


@dataclasses.dataclass
class AmGmm:
    """One DiagGmm per (tied) HMM state.

    Monophone: states indexed (phone, state_in_phone).  Context-dependent
    (the reference's tri1/tri2 stages, `run.sh:139-199`): ``tie_table``
    [P, S, P+1] maps (phone, state_in_phone, left_phone+1) -> tied gmm id
    (likelihood-clustered, gmm/gmm.py:train_tri).
    """

    gmms: List[DiagGmm]
    num_phones: int
    states_per_phone: int
    self_loop_prob: float = 0.7
    tie_table: Optional[np.ndarray] = None  # [P, S, P+1] int64

    def state_index(self, phone: int, state: int, left: int = -1) -> int:
        if self.tie_table is not None:
            return int(self.tie_table[phone, state, left + 1])
        return phone * self.states_per_phone + state

    def _packed(self):
        """All mixture components of all states packed into flat arrays so
        loglikes is one [T,D]x[D,C] BLAS pair + a segment logsumexp
        instead of a Python loop over states (removes per-state call
        overhead; flops unchanged).  Cached per AmGmm instance (EM builds
        a fresh instance per iteration)."""
        packed = getattr(self, "_packed_cache", None)
        if packed is None:
            iv = [1.0 / g.variances for g in self.gmms]
            means = np.concatenate([g.means for g in self.gmms])
            inv_var = np.concatenate(iv)
            d = means.shape[1]
            const = np.concatenate([
                np.log(np.maximum(g.weights, 1e-30))
                - 0.5 * (d * np.log(2 * np.pi)
                         + np.log(g.variances).sum(axis=1)
                         + ((g.means ** 2) / g.variances).sum(axis=1))
                for g in self.gmms])
            starts = np.cumsum([0] + [g.num_mix for g in self.gmms])
            packed = (means * inv_var, inv_var, const, starts)
            self._packed_cache = packed
        return packed

    def loglikes(self, feats: np.ndarray) -> np.ndarray:
        """[T, D] -> [T, num_states]."""
        mu_iv, inv_var, const, starts = self._packed()
        # per-component log p(x, m), all states at once
        scores = (const[None, :] + feats @ mu_iv.T
                  - 0.5 * (feats ** 2) @ inv_var.T)  # [T, C]
        # segment logsumexp over each state's components
        seg = starts[:-1]
        mx = np.maximum.reduceat(scores, seg, axis=1)
        s = np.add.reduceat(np.exp(scores - np.repeat(
            mx, np.diff(starts), axis=1)), seg, axis=1)
        return mx + np.log(s)


@dataclasses.dataclass(frozen=True)
class MonoHmmConfig(Config):
    states_per_phone: int = 3
    self_loop_prob: float = 0.7
    num_iters: int = 12
    max_mix: int = 4
    mix_up_iters: Tuple[int, ...] = (4, 8)  # iterations after which to split
    var_floor: float = 1e-3


def _linear_hmm_arrays(phones: Sequence[int], am: AmGmm):
    """Linear-chain HMM over the utterance transcript.

    Returns (state_ids [N] into am states, log transition (self, next) pair).
    Context-dependent models resolve tied states with the true left phone.
    """
    ids = []
    prev = -1
    for p in phones:
        for s in range(am.states_per_phone):
            ids.append(am.state_index(int(p), s, prev))
        prev = int(p)
    return np.asarray(ids, np.int32)


def viterbi_align_gmm(
    feats: np.ndarray,  # [T, D]
    phones: Sequence[int],
    am: AmGmm,
) -> Tuple[np.ndarray, float]:
    """Forced alignment: [T] linear-HMM state indices (into the transcript
    chain, NOT am state ids) + total log-likelihood."""
    ids = _linear_hmm_arrays(phones, am)
    n = len(ids)
    t_len = feats.shape[0]
    if t_len < n:
        raise ValueError("utterance shorter than its transcript HMM")
    ll = am.loglikes(feats)[:, ids]  # [T, N]
    log_self = np.log(am.self_loop_prob)
    log_next = np.log(1.0 - am.self_loop_prob)
    delta = np.full((n,), _NEG)
    delta[0] = ll[0, 0]
    bp = np.zeros((t_len, n), np.int8)  # 1 = came from previous state
    for t in range(1, t_len):
        stay = delta + log_self
        move = np.concatenate([[_NEG], delta[:-1] + log_next])
        take_move = move > stay
        bp[t] = take_move
        delta = np.where(take_move, move, stay) + ll[t]
    score = float(delta[-1])
    # backtrace
    path = np.zeros((t_len,), np.int32)
    cur = n - 1
    for t in range(t_len - 1, -1, -1):
        path[t] = cur
        if t > 0 and bp[t, cur]:
            cur -= 1
    return path, score


def _uniform_align(t_len: int, n_states: int) -> np.ndarray:
    """Flat-start: evenly split frames across the transcript chain."""
    edges = np.linspace(0, t_len, n_states + 1)
    path = np.zeros((t_len,), np.int32)
    for i in range(n_states):
        path[int(edges[i]) : max(int(edges[i + 1]), int(edges[i]) + 1)] = i
    # monotone non-decreasing and ends at n_states-1
    path = np.minimum.accumulate(path[::-1])[::-1]
    path[-1] = n_states - 1
    return path


def _accumulate_and_update(
    am: AmGmm,
    feats_list: Sequence[np.ndarray],
    phone_seqs: Sequence[Sequence[int]],
    paths: Sequence[np.ndarray],
    var_floor: float,
) -> AmGmm:
    """One EM step: hard-count mixture posteriors within aligned states."""
    k = len(am.gmms)
    new_gmms: List[DiagGmm] = []
    # gather frames per am-state
    frames_per_state: List[List[np.ndarray]] = [[] for _ in range(k)]
    for feats, phones, path in zip(feats_list, phone_seqs, paths):
        ids = _linear_hmm_arrays(phones, am)
        state_of_frame = ids[path]
        for s in np.unique(state_of_frame):
            frames_per_state[int(s)].append(feats[state_of_frame == s])
    for s in range(k):
        g = am.gmms[s]
        if not frames_per_state[s]:
            new_gmms.append(g)
            continue
        x = np.concatenate(frames_per_state[s], axis=0)
        # mixture posteriors (soft within the state)
        lp = g.component_loglike(x)  # [T, M]
        lp -= lp.max(axis=1, keepdims=True)
        post = np.exp(lp)
        post /= post.sum(axis=1, keepdims=True)
        gamma = post.sum(axis=0)  # [M]
        keep = gamma > 1e-2
        if not keep.any():
            new_gmms.append(g)
            continue
        gamma_k = gamma[keep]
        mu = (post[:, keep].T @ x) / gamma_k[:, None]
        ex2 = (post[:, keep].T @ (x**2)) / gamma_k[:, None]
        var = np.maximum(ex2 - mu**2, var_floor)
        w = gamma_k / gamma_k.sum()
        new_gmms.append(DiagGmm(w, mu, var))
    return AmGmm(new_gmms, am.num_phones, am.states_per_phone,
                 am.self_loop_prob, tie_table=am.tie_table)


def train_mono(
    feats_list: Sequence[np.ndarray],
    phone_seqs: Sequence[Sequence[int]],
    num_phones: int,
    cfg: MonoHmmConfig = MonoHmmConfig(),
    init_am: Optional[AmGmm] = None,
) -> Tuple[AmGmm, List[np.ndarray], List[float]]:
    """Flat-start Viterbi-EM monophone training.

    Returns (model, final alignments [T]-state-chain paths per utt,
    per-iteration mean log-likelihood — non-decreasing up to mixture
    splits).
    """
    d = feats_list[0].shape[1]
    if init_am is None:
        # global-stats single-Gaussian init
        allx = np.concatenate(feats_list, axis=0)
        g_mu = allx.mean(axis=0)
        g_var = np.maximum(allx.var(axis=0), cfg.var_floor)
        gmms = [
            DiagGmm(np.ones((1,)), g_mu[None].copy(), g_var[None].copy())
            for _ in range(num_phones * cfg.states_per_phone)
        ]
        am = AmGmm(gmms, num_phones, cfg.states_per_phone, cfg.self_loop_prob)
        # one flat-start update so states differ before the first alignment
        paths = [
            _uniform_align(f.shape[0], cfg.states_per_phone * len(p))
            for f, p in zip(feats_list, phone_seqs)
        ]
        am = _accumulate_and_update(am, feats_list, phone_seqs, paths,
                                    cfg.var_floor)
    else:
        am = init_am

    lls: List[float] = []
    paths = []
    mix = 1
    for it in range(cfg.num_iters):
        paths, total, frames = [], 0.0, 0
        for feats, phones in zip(feats_list, phone_seqs):
            path, score = viterbi_align_gmm(feats, phones, am)
            paths.append(path)
            total += score
            frames += feats.shape[0]
        lls.append(total / max(frames, 1))
        am = _accumulate_and_update(am, feats_list, phone_seqs, paths,
                                    cfg.var_floor)
        if it in cfg.mix_up_iters and mix < cfg.max_mix:
            mix = min(mix * 2, cfg.max_mix)
            am = AmGmm([g.split(mix) for g in am.gmms], am.num_phones,
                       am.states_per_phone, am.self_loop_prob,
                       tie_table=am.tie_table)
    return am, paths, lls


def train_tri(
    feats_list: Sequence[np.ndarray],
    phone_seqs: Sequence[Sequence[int]],
    num_phones: int,
    cfg: MonoHmmConfig,
    init_am: AmGmm,
    num_leaves: int,
    min_count: float = 3.0,
) -> Tuple[AmGmm, List[np.ndarray], List[float]]:
    """Context-dependent GMM training (the reference's tri1/tri2 stages,
    `run.sh:139-199` steps/train_deltas.sh): tie (phone, hmm-state,
    left-phone) triples by likelihood clustering of frame stats from the
    previous model's alignments, then Viterbi EM with mixture splitting.

    Returns (tied model, alignments, per-iter loglike).
    """
    from tdnnf_nas_tpu.graphs.tree_cluster import _cluster_contexts

    d = feats_list[0].shape[1]
    s_per = init_am.states_per_phone
    rows = num_phones * s_per  # cluster within each (phone, hmm-state)
    n_ctx = num_phones + 1
    counts = np.zeros((rows, n_ctx), np.float64)
    sums = np.zeros((rows, n_ctx, d), np.float64)
    sumsqs = np.zeros((rows, n_ctx, d), np.float64)
    for feats, phones in zip(feats_list, phone_seqs):
        path, _ = viterbi_align_gmm(feats, phones, init_am)
        # chain-state -> (phone idx, state-in-phone, left phone)
        phone_of = np.repeat(np.arange(len(phones)), s_per)[path]
        state_of = (path % s_per)
        lefts = np.asarray([-1] + list(phones[:-1]))
        for t in range(feats.shape[0]):
            pi = int(phone_of[t])
            r = int(phones[pi]) * s_per + int(state_of[t])
            c = int(lefts[pi]) + 1
            f = feats[t]
            counts[r, c] += 1.0
            sums[r, c] += f
            sumsqs[r, c] += f * f
    table, n_tied = _cluster_contexts(counts, sums, sumsqs, num_leaves,
                                      min_count=min_count)
    tie_table = np.asarray(table, np.int64).reshape(num_phones, s_per, n_ctx)

    # initialize tied GMMs from their cluster stats (single Gaussian)
    flat = tie_table.reshape(rows, n_ctx)
    gmms: List[DiagGmm] = []
    for g in range(n_tied):
        sel = flat == g
        n = counts[sel].sum()
        if n < 1e-8:
            gmms.append(DiagGmm(np.ones((1,)),
                                np.zeros((1, d)), np.ones((1, d))))
            continue
        mu = sums[sel].sum(axis=0) / n
        var = np.maximum(sumsqs[sel].sum(axis=0) / n - mu * mu,
                         cfg.var_floor)
        gmms.append(DiagGmm(np.ones((1,)), mu[None], var[None]))
    am = AmGmm(gmms, num_phones, s_per, init_am.self_loop_prob,
               tie_table=tie_table)
    return train_mono(feats_list, phone_seqs, num_phones, cfg, init_am=am)


def corpus_loglike(
    am: AmGmm,
    feats_list: Sequence[np.ndarray],
    phone_seqs: Sequence[Sequence[int]],
) -> float:
    """Mean per-frame forced-alignment log-likelihood over the corpus."""
    total, frames = 0.0, 0
    for feats, phones in zip(feats_list, phone_seqs):
        _, score = viterbi_align_gmm(feats, phones, am)
        total += score
        frames += feats.shape[0]
    return total / max(frames, 1)


def path_to_phone_bounds(
    path: np.ndarray, phones: Sequence[int], states_per_phone: int
) -> Tuple[List[int], List[int]]:
    """Chain-state path -> (begins, ends) per phone, input-frame rate."""
    phone_of_chain = np.repeat(np.arange(len(phones)), states_per_phone)
    phone_idx = phone_of_chain[path]
    begins, ends = [], []
    for i in range(len(phones)):
        where = np.nonzero(phone_idx == i)[0]
        begins.append(int(where[0]))
        ends.append(int(where[-1]))
    return begins, ends
