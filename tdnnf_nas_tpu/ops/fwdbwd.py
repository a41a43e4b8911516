"""LF-MMI forward(-backward) in scaled probability space.

TPU-native equivalent of the reference pipeline's chain computation
(upstream `src/chain/chain-denominator.cc` / `chain-numerator.cc`, driven by
``nnet3-chain-train`` — `steps/nnet3/chain/train.py:515`).  Same numerics as
Kaldi: probability-space recursion with per-frame renormalization (the
"arbitrary scale") plus leaky-HMM interpolation toward the initial
distribution — but expressed as one batched recursion

    alpha' = ((alpha + leaky*init) @ trans) * obs[t] * mask[t]

so each frame is a single [B,S]x[S,S] MXU matmul + VPU elementwise work,
vectorized over the whole minibatch under `lax.scan`.  The backward pass (=
occupancy posteriors, which Kaldi hand-codes) comes from JAX autodiff
through the scan; `occupancy_posteriors` exposes them for the xent head.

Log-normalizer exactness: per-frame max-subtraction of the nnet log-output
is added back into logZ, so `forward_score` is exact regardless of output
scale.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tdnnf_nas_tpu.graphs.fsa import StateGraph

_TINY = 1e-30
# Emission floor: max-normalized log-observations are clamped at this value
# so the per-frame probability mass can never underflow (c >= e^-30 >> TINY),
# which keeps the backward's 1/c terms finite even for wildly confident
# outputs.  (Kaldi instead relies on bounded outputs via l2/xent; a floor on
# emission probabilities is the numerically explicit version.)
_MIN_LOG_OBS = -30.0


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class DenGraphArrays:
    """Device-resident denominator graph (shared across the batch)."""

    trans: jax.Array  # [S, S] f32
    trans_T: jax.Array  # [S, S] f32 (transpose, for Viterbi/backward uses)
    state_pdf: jax.Array  # [S] int32
    init: jax.Array  # [S] f32
    final: jax.Array  # [S] f32

    @classmethod
    def from_graph(cls, g: StateGraph) -> "DenGraphArrays":
        return cls(
            trans=jnp.asarray(g.trans),
            trans_T=jnp.asarray(g.trans.T.copy()),
            state_pdf=jnp.asarray(g.state_pdf),
            init=jnp.asarray(g.init),
            final=jnp.asarray(g.final),
        )

    def tree_flatten(self):
        return (self.trans, self.trans_T, self.state_pdf, self.init, self.final), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def _bmm_split(x: jax.Array, m: jax.Array) -> jax.Array:
    """Batched f32 x [B,T,K] @ 0/1 bf16 m [B,K,N] with ~f32 exactness via a
    hi/lo bf16 two-pass (each output selects exactly-representable terms,
    accumulated f32)."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return (jnp.einsum("btk,bkn->btn", hi, m,
                       preferred_element_type=jnp.float32)
            + jnp.einsum("btk,bkn->btn", lo, m,
                         preferred_element_type=jnp.float32))


@jax.custom_vjp
def _onehot_gather_batched(x, onehot):
    """Per-sequence pdf->state expansion x [B,T,P] @ onehot [B,P,S].

    A minor-axis take_along_axis lowers to per-index dynamic fetches and its
    transpose to a sort-based scatter — measured as the largest single cost
    of the whole train step (the numerator supervision gather).  This runs
    one batched MXU dot each way, hi/lo-split for ~f32 exactness.
    """
    return _bmm_split(x, onehot)


def _onehot_gather_batched_fwd(x, onehot):
    return _bmm_split(x, onehot), onehot


def _onehot_gather_batched_bwd(onehot, g):
    return _bmm_split(g, jnp.swapaxes(onehot, 1, 2)), None


_onehot_gather_batched.defvjp(_onehot_gather_batched_fwd,
                              _onehot_gather_batched_bwd)


def _gather_obs(obs_exp: jax.Array, state_pdf: jax.Array) -> jax.Array:
    """obs_exp [B,T,P] -> per-state obs [B,T,S].

    state_pdf is either [S] (shared graph) or [B,S] (per-utterance graphs).
    The per-utterance case runs as a one-hot MXU matmul (see
    _onehot_gather_batched); the shared case keeps the plain take (the hot
    den path uses the Pallas wrapper's own one-hot expansion).
    """
    if state_pdf.ndim == 1:
        return jnp.take(obs_exp, state_pdf, axis=-1)
    p = obs_exp.shape[-1]
    onehot = (state_pdf[:, None, :]
              == jnp.arange(p, dtype=state_pdf.dtype)[None, :, None]
              ).astype(jnp.bfloat16)  # [B, P, S]
    return _onehot_gather_batched(obs_exp.astype(jnp.float32), onehot)


def _step_matmul(alpha: jax.Array, trans: jax.Array) -> jax.Array:
    if trans.ndim == 2:
        return jnp.matmul(alpha, trans, preferred_element_type=jnp.float32)
    return jnp.einsum("bs,bsr->br", alpha, trans, preferred_element_type=jnp.float32)


@partial(jax.jit, static_argnames=("leaky_coef_static",))
def _forward_score_impl(
    obs_logprob, trans, state_pdf, init, final, mask, leaky_coef_static
):
    b, t, _ = obs_logprob.shape
    obs_logprob = obs_logprob.astype(jnp.float32)
    mx = jax.lax.stop_gradient(jnp.max(obs_logprob, axis=-1, keepdims=True))
    obs_exp = jnp.exp(jnp.maximum(obs_logprob - mx, _MIN_LOG_OBS))
    obs_state = _gather_obs(obs_exp, state_pdf)  # [B,T,S]
    if mask is not None:
        obs_state = obs_state * mask
    init_b = init if init.ndim == 2 else init[None, :]

    a0 = init_b * obs_state[:, 0]
    c0 = jnp.maximum(jnp.sum(a0, axis=-1), _TINY)
    alpha0 = a0 / c0[:, None]

    obs_rest = jnp.moveaxis(obs_state[:, 1:], 1, 0)  # [T-1, B, S]

    def step(alpha, obs_t):
        if leaky_coef_static > 0.0:
            alpha = alpha + leaky_coef_static * init_b
        a = _step_matmul(alpha, trans) * obs_t
        c = jnp.maximum(jnp.sum(a, axis=-1), _TINY)
        return a / c[:, None], jnp.log(c)

    alpha_last, logcs = jax.lax.scan(step, alpha0, obs_rest)
    final_b = final if final.ndim == 2 else final[None, :]
    log_final = jnp.log(jnp.maximum(jnp.sum(alpha_last * final_b, axis=-1), _TINY))
    return jnp.log(c0) + jnp.sum(logcs, axis=0) + log_final + jnp.sum(mx[:, :, 0], axis=1)


def forward_score(
    obs_logprob: jax.Array,
    trans: jax.Array,
    state_pdf: jax.Array,
    init: jax.Array,
    final: jax.Array,
    mask: Optional[jax.Array] = None,
    leaky_coef: float = 0.0,
) -> jax.Array:
    """Total (log) graph score per sequence.

    Args:
      obs_logprob: [B, T, P] nnet log-outputs (chain convention: treated as
        unnormalized log-likelihoods, exponentiated inside).
      trans: [S, S] shared or [B, S, S] per-sequence transition probs.
      state_pdf: [S] or [B, S] pdf emitted by each state.
      init/final: [S] or [B, S].
      mask: optional [B, T, S] allow-mask (numerator tolerance windows).
      leaky_coef: leaky-HMM coefficient (denominator only; reference default
        0.1, `run_tdnn_7q_fbk_40_manual.sh:184` --chain.leaky-hmm-coefficient).

    Returns: [B] logZ.
    """
    return _forward_score_impl(
        obs_logprob, trans, state_pdf, init, final, mask, float(leaky_coef)
    )


def occupancy_posteriors(
    obs_logprob: jax.Array,
    trans: jax.Array,
    state_pdf: jax.Array,
    init: jax.Array,
    final: jax.Array,
    mask: Optional[jax.Array] = None,
    leaky_coef: float = 0.0,
):
    """(logZ [B], gamma [B,T,P]): per-frame pdf occupancy posteriors.

    gamma = d logZ / d obs_logprob; each frame's posteriors sum to 1.  Used
    as soft targets for the cross-entropy regularizer head (the quantity
    Kaldi's numerator forward-backward produces for xent —
    `train.py` --chain.xent-regularize, upstream chain-training.cc).
    """

    def tot(o):
        scores = forward_score(o, trans, state_pdf, init, final, mask, leaky_coef)
        return jnp.sum(scores), scores

    (_, per_seq), grad = jax.value_and_grad(tot, has_aux=True)(obs_logprob)
    return per_seq, grad


_NEG_LOG = -1e30


@partial(jax.jit, static_argnames=("self_loop_prob",))
def forward_score_linear(
    obs_logprob: jax.Array,
    next_w: jax.Array,
    state_pdf: jax.Array,
    init: jax.Array,
    final: jax.Array,
    mask: jax.Array,
    self_loop_prob: float = 0.5,
) -> jax.Array:
    """forward_score specialized to the linear-chain numerator graph.

    The numerator's transition matrix is banded (pair i -> its own loop
    state with prob a; pair i -> pair i+1's enter state with next_w[i]), so
    the recursion is O(S) elementwise work instead of an [S,S] matmul —
    and it runs in LOG space (2-term logaddexp band):

      pair[i]           = logaddexp(la[enter_i], la[loop_i])
      la'[loop_i]       = pair[i]   + log a      + logobs[loop_i]
      la'[enter_i]      = pair[i-1] + log w[i-1] + logobs[enter_i]

    Log space matters here: with tolerance masks the per-frame allowed
    probability mass can underflow f32 for badly-matched models (early
    supernet cv-updates), which made the scaled-probability formulation's
    backward blow up.  Kaldi's numerator computation is log-space for the
    same reason (chain-numerator.cc); the denominator keeps the matmul-
    friendly scaled-probability kernel.

    Identical result to forward_score on the dense trans (tested), ~20x
    cheaper for the numerator half of the chain objective.

    Args: obs_logprob [B,T,P]; next_w [B, S//2]; state_pdf/init/final
    [B, S]; mask [B, T, S] (probability space, logs taken inside).
    """
    b, t, _ = obs_logprob.shape
    s = state_pdf.shape[-1]
    n = s // 2
    obs_logprob = obs_logprob.astype(jnp.float32)
    obs_state = _gather_obs(obs_logprob, state_pdf)  # [B,T,S] log-space
    log_mask = jnp.where(mask > 0, 0.0, _NEG_LOG)
    obs_state = jnp.maximum(obs_state + log_mask, _NEG_LOG)
    log_init = jnp.where(init > 0, jnp.log(jnp.maximum(init, _TINY)), _NEG_LOG)
    log_final = jnp.where(final > 0, jnp.log(jnp.maximum(final, _TINY)), _NEG_LOG)
    log_w = jnp.where(next_w > 0, jnp.log(jnp.maximum(next_w, _TINY)), _NEG_LOG)
    log_a = float(np.log(self_loop_prob))

    la0 = jnp.maximum(log_init + obs_state[:, 0], _NEG_LOG)
    obs_rest = jnp.moveaxis(obs_state[:, 1:], 1, 0)  # [T-1, B, S]

    def step(la, obs_t):
        p = la.reshape(b, n, 2)
        pair = jnp.logaddexp(p[..., 0], p[..., 1])  # [B, N]
        nxt_l = pair + log_a
        nxt_e = jnp.pad((pair + log_w)[:, :-1], ((0, 0), (1, 0)),
                        constant_values=_NEG_LOG)
        la_new = jnp.stack([nxt_e, nxt_l], axis=-1).reshape(b, s) + obs_t
        return jnp.maximum(la_new, _NEG_LOG), None

    la_last, _ = jax.lax.scan(step, la0, obs_rest)
    return jax.nn.logsumexp(la_last + log_final, axis=-1)


def forward_score_reference(
    obs_logprob: np.ndarray,
    trans: np.ndarray,
    state_pdf: np.ndarray,
    init: np.ndarray,
    final: np.ndarray,
    mask: Optional[np.ndarray] = None,
    leaky_coef: float = 0.0,
) -> float:
    """Slow log-semiring numpy reference for one sequence (tests only)."""
    t_len = obs_logprob.shape[0]
    with np.errstate(divide="ignore"):
        log_trans = np.log(trans.astype(np.float64))
        log_init = np.log(init.astype(np.float64))
        log_final = np.log(final.astype(np.float64))
        log_mask = None if mask is None else np.log(mask.astype(np.float64))
    obs_s = obs_logprob.astype(np.float64)[:, state_pdf]  # [T, S]
    if log_mask is not None:
        obs_s = obs_s + log_mask
    log_alpha = log_init + obs_s[0]
    for t in range(1, t_len):
        if leaky_coef > 0.0:
            tot = np.logaddexp.reduce(log_alpha)
            leak = np.log(leaky_coef) + log_init + tot
            log_alpha = np.logaddexp(log_alpha, leak)
        log_alpha = np.logaddexp.reduce(log_alpha[:, None] + log_trans, axis=0) + obs_s[t]
    return float(np.logaddexp.reduce(log_alpha + log_final))


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class SparseDenGraph:
    """Padded-CSR denominator graph for triphone-scale state spaces.

    The dense [S,S] transition matrix is quadratic in states — fine for the
    biphone den graph (S=2208 at the flagship) but infeasible for
    triphone-clustered dens (S in the tens of thousands, where the
    reference's `chain-make-den-fst` output is sparse).  Here each state
    keeps its in-arcs padded to the graph's max in-degree K:

      in_src [S, K] int32  source state per in-arc (self-padded)
      in_w   [S, K] f32    arc probability (0 for padding)

    and the recursion becomes a gather + weighted sum (VPU) instead of an
    MXU matmul — O(S*K) per frame instead of O(S^2).
    """

    in_src: jax.Array  # [S, K] int32
    in_w: jax.Array  # [S, K] f32
    state_pdf: jax.Array  # [S] int32
    init: jax.Array  # [S] f32
    final: jax.Array  # [S] f32

    @classmethod
    def from_graph(cls, g: StateGraph) -> "SparseDenGraph":
        trans = np.asarray(g.trans)
        s = trans.shape[0]
        cols = [np.nonzero(trans[:, j])[0] for j in range(s)]
        k = max(1, max(len(c) for c in cols))
        in_src = np.zeros((s, k), np.int32)
        in_w = np.zeros((s, k), np.float32)
        for j, c in enumerate(cols):
            in_src[j, : len(c)] = c
            in_w[j, : len(c)] = trans[c, j]
        return cls(
            in_src=jnp.asarray(in_src),
            in_w=jnp.asarray(in_w),
            state_pdf=jnp.asarray(g.state_pdf),
            init=jnp.asarray(g.init),
            final=jnp.asarray(g.final),
        )

    @classmethod
    def from_arcs(cls, num_states: int, src, dst, weight, state_pdf, init,
                  final) -> "SparseDenGraph":
        """Build from flat arc lists (the natural output of a den-FST
        compiler) without materializing the dense matrix."""
        src = np.asarray(src, np.int32)
        dst = np.asarray(dst, np.int32)
        weight = np.asarray(weight, np.float32)
        order = np.argsort(dst, kind="stable")
        src, dst, weight = src[order], dst[order], weight[order]
        counts = np.bincount(dst, minlength=num_states)
        k = max(1, int(counts.max()))
        in_src = np.zeros((num_states, k), np.int32)
        in_w = np.zeros((num_states, k), np.float32)
        pos = np.zeros(num_states, np.int64)
        starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
        for a in range(len(src)):
            j = dst[a]
            in_src[j, pos[j]] = src[a]
            in_w[j, pos[j]] = weight[a]
            pos[j] += 1
        del starts
        return cls(
            in_src=jnp.asarray(in_src),
            in_w=jnp.asarray(in_w),
            state_pdf=jnp.asarray(np.asarray(state_pdf, np.int32)),
            init=jnp.asarray(np.asarray(init, np.float32)),
            final=jnp.asarray(np.asarray(final, np.float32)),
        )

    def tree_flatten(self):
        return (self.in_src, self.in_w, self.state_pdf, self.init,
                self.final), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@partial(jax.jit, static_argnames=("leaky_coef_static",))
def _forward_score_sparse_impl(obs_logprob, in_src, in_w, state_pdf, init,
                               final, leaky_coef_static):
    b, t, _ = obs_logprob.shape
    obs_logprob = obs_logprob.astype(jnp.float32)
    mx = jax.lax.stop_gradient(jnp.max(obs_logprob, axis=-1, keepdims=True))
    obs_exp = jnp.exp(jnp.maximum(obs_logprob - mx, _MIN_LOG_OBS))
    obs_state = _gather_obs(obs_exp, state_pdf)  # [B,T,S]
    init_b = init[None, :]

    a0 = init_b * obs_state[:, 0]
    c0 = jnp.maximum(jnp.sum(a0, axis=-1), _TINY)
    alpha0 = a0 / c0[:, None]

    obs_rest = jnp.moveaxis(obs_state[:, 1:], 1, 0)  # [T-1, B, S]

    def step(alpha, obs_t):
        if leaky_coef_static > 0.0:
            alpha = alpha + leaky_coef_static * init_b
        gathered = alpha[:, in_src]  # [B, S, K]
        a = jnp.sum(gathered * in_w, axis=-1) * obs_t
        c = jnp.maximum(jnp.sum(a, axis=-1), _TINY)
        return a / c[:, None], jnp.log(c)

    alpha_last, logcs = jax.lax.scan(step, alpha0, obs_rest)
    log_final = jnp.log(jnp.maximum(jnp.sum(alpha_last * final[None, :],
                                            axis=-1), _TINY))
    return jnp.log(c0) + jnp.sum(logcs, axis=0) + log_final + jnp.sum(
        mx[:, :, 0], axis=1)


def forward_score_sparse(
    obs_logprob: jax.Array,
    g: "SparseDenGraph",
    leaky_coef: float = 0.0,
) -> jax.Array:
    """forward_score over a SparseDenGraph — identical math to the dense
    kernel (tested bit-close), O(S*K) gathers per frame instead of the
    [S,S] matmul."""
    return _forward_score_sparse_impl(
        obs_logprob, g.in_src, g.in_w, g.state_pdf, g.init, g.final,
        float(leaky_coef),
    )


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class FactoredDenGraph:
    """Position-factored denominator graph for triphone/4-gram-scale spaces.

    The composed den graph (n-gram phone LM x chain topology x context tree,
    `graphs/den_graph.py:compile_denominator_fsa`) has a special structure:
    every state belongs to a *position* (LM state x carried phone context)
    and **all states of a position share identical out-arcs** (the emitted
    pdf is the only thing that splits them).  So the forward recursion
    factors:

        beta[pos]    = sum of alpha over the position's states
        alpha'[s]    = (sum_k beta[in_pos[s,k]] * in_w[s,k]) * obs[s]

    States are laid out contiguously per position (``seg_bounds``), so the
    aggregation is two gathers into an exclusive cumsum — O(S) — and the
    transition is a K-wide gather with K ~ #positions that can precede a
    state (~P+1), instead of the raw in-degree (~P x #splits).  Total work
    per frame is O(S*(K+1)) on the VPU; at S~30k, K~50 that is ~100x less
    than the dense [S,S] matmul and ~10x less than the unfactored CSR form.
    """

    seg_bounds: jax.Array  # [Npos+1] int32; states of pos p are [b[p], b[p+1])
    in_pos: jax.Array  # [S, K] int32 source-position ids (0-padded)
    in_w: jax.Array  # [S, K] f32 arc probability (0 for padding)
    state_pdf: jax.Array  # [S] int32
    init: jax.Array  # [S] f32
    final: jax.Array  # [S] f32
    # dense [Npos, S] position->state transition (built when Npos*S fits a
    # memory budget): the K-wide gather lowers to scalar loads on TPU, but
    # Npos stays small (~P x LM states) so beta @ W rides the MXU instead —
    # measured ~50x faster at the flagship triphone scale.  None => gather.
    trans_pos: Optional[jax.Array] = None
    # hi/lo bf16 split of trans_pos, PRECOMPUTED so the scan body doesn't
    # re-split the [Npos, S] matrix every frame (~270 MB of HBM traffic
    # per frame at the flagship shape — measured as most of the den
    # kernel's cost, round-4 profile)
    trans_pos_hi: Optional[jax.Array] = None
    trans_pos_lo: Optional[jax.Array] = None
    # states sorted by pdf: perm [S] + bounds [P+1] — lets the obs-gather
    # BACKWARD run as gather+cumsum segment sums instead of a sort-based
    # scatter (see _gather_obs_shared)
    pdf_perm: Optional[jax.Array] = None
    pdf_bounds: Optional[jax.Array] = None

    @property
    def num_states(self) -> int:
        return self.state_pdf.shape[0]

    def tree_flatten(self):
        return (self.seg_bounds, self.in_pos, self.in_w, self.state_pdf,
                self.init, self.final, self.trans_pos, self.trans_pos_hi,
                self.trans_pos_lo, self.pdf_perm, self.pdf_bounds), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@jax.custom_vjp
def _gather_obs_sorted(obs_exp, state_pdf, pdf_perm, pdf_bounds):
    """Shared-graph obs expansion [B,T,P] -> [B,T,S] with a segment-sum
    backward.

    Forward is a constant-index gather (fast on TPU); its autodiff VJP is
    a sort-based scatter-add — measured as the bulk of the den obs cost.
    With states pre-sorted by pdf (``pdf_perm``; runs of equal pdfs bounded
    by ``pdf_bounds``), the backward is gather + exclusive-cumsum segment
    sums: g_obs[..., p] = sum over the pdf-p run of g_state[..., perm].
    """
    return jnp.take(obs_exp, state_pdf, axis=-1)


def _gather_obs_sorted_fwd(obs_exp, state_pdf, pdf_perm, pdf_bounds):
    return jnp.take(obs_exp, state_pdf, axis=-1), (pdf_perm, pdf_bounds)


def _gather_obs_sorted_bwd(res, g):
    pdf_perm, pdf_bounds = res
    gs = jnp.take(g, pdf_perm, axis=-1)  # [B,T,S] sorted by pdf
    zero = jnp.zeros(gs.shape[:-1] + (1,), gs.dtype)
    cs = jnp.concatenate([zero, jnp.cumsum(gs, axis=-1)], axis=-1)
    g_obs = (jnp.take(cs, pdf_bounds[1:], axis=-1)
             - jnp.take(cs, pdf_bounds[:-1], axis=-1))
    return g_obs, None, None, None


_gather_obs_sorted.defvjp(_gather_obs_sorted_fwd, _gather_obs_sorted_bwd)


@partial(jax.jit, static_argnames=("leaky_coef_static",))
def _forward_score_factored_impl(obs_logprob, seg_bounds, in_pos, in_w,
                                 state_pdf, init, final, trans_pos,
                                 trans_pos_hi, trans_pos_lo, pdf_perm,
                                 pdf_bounds, leaky_coef_static):
    b, t, _ = obs_logprob.shape
    obs_logprob = obs_logprob.astype(jnp.float32)
    mx = jax.lax.stop_gradient(jnp.max(obs_logprob, axis=-1, keepdims=True))
    obs_exp = jnp.exp(jnp.maximum(obs_logprob - mx, _MIN_LOG_OBS))
    if pdf_perm is not None:
        obs_state = _gather_obs_sorted(obs_exp, state_pdf, pdf_perm,
                                       pdf_bounds)
    else:
        obs_state = _gather_obs(obs_exp, state_pdf)  # [B,T,S]
    init_b = init[None, :]

    a0 = init_b * obs_state[:, 0]
    c0 = jnp.maximum(jnp.sum(a0, axis=-1), _TINY)
    alpha0 = a0 / c0[:, None]

    obs_rest = jnp.moveaxis(obs_state[:, 1:], 1, 0)  # [T-1, B, S]
    zero = jnp.zeros((b, 1), jnp.float32)

    def step(alpha, obs_t):
        if leaky_coef_static > 0.0:
            alpha = alpha + leaky_coef_static * init_b
        # position aggregation: exclusive cumsum + two gathers (empty
        # segments — e.g. BOS-context positions with no states — yield 0)
        cs = jnp.concatenate([zero, jnp.cumsum(alpha, axis=-1)], axis=-1)
        beta = cs[:, seg_bounds[1:]] - cs[:, seg_bounds[:-1]]  # [B, Npos]
        if trans_pos_hi is not None:
            # MXU path with the weight split hoisted out of the scan
            # (re-splitting [Npos,S] every frame cost ~270 MB HBM traffic
            # per frame at the flagship shape)
            a = _bmm_presplit(beta, trans_pos_hi, trans_pos_lo) * obs_t
        elif trans_pos is not None:
            # MXU path: alpha' = beta @ W, exact-ish f32 via hi/lo split
            a = _bmm_shared_split(beta, trans_pos) * obs_t
        else:
            gathered = beta[:, in_pos]  # [B, S, K]
            a = jnp.sum(gathered * in_w, axis=-1) * obs_t
        c = jnp.maximum(jnp.sum(a, axis=-1), _TINY)
        return a / c[:, None], jnp.log(c)

    alpha_last, logcs = jax.lax.scan(step, alpha0, obs_rest)
    log_final = jnp.log(jnp.maximum(jnp.sum(alpha_last * final[None, :],
                                            axis=-1), _TINY))
    return jnp.log(c0) + jnp.sum(logcs, axis=0) + log_final + jnp.sum(
        mx[:, :, 0], axis=1)


def _bmm_shared_split(x: jax.Array, m: jax.Array) -> jax.Array:
    """x [B,P] @ m [P,S] with both operands hi/lo bf16-split, f32 accumulate
    — ~f32-exact (error ~2^-16 relative) at full MXU rate."""
    mh = m.astype(jnp.bfloat16)
    ml = (m - mh.astype(jnp.float32)).astype(jnp.bfloat16)
    return _bmm_presplit(x, mh, ml)


def _bmm_presplit(x: jax.Array, mh: jax.Array, ml: jax.Array) -> jax.Array:
    """x [B,P] @ (mh + ml) with the weight split PRECOMPUTED (bf16 pair);
    x is hi/lo split per call (tiny vs the weight matrix)."""
    xh = x.astype(jnp.bfloat16)
    xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
    f32 = jnp.float32
    return (jnp.einsum("bp,ps->bs", xh, mh, preferred_element_type=f32)
            + jnp.einsum("bp,ps->bs", xh, ml, preferred_element_type=f32)
            + jnp.einsum("bp,ps->bs", xl, mh, preferred_element_type=f32))


def forward_score_factored(
    obs_logprob: jax.Array,
    g: "FactoredDenGraph",
    leaky_coef: float = 0.0,
) -> jax.Array:
    """forward_score over a FactoredDenGraph — identical math to the dense
    and CSR kernels (tested bit-close)."""
    return _forward_score_factored_impl(
        obs_logprob, g.seg_bounds, g.in_pos, g.in_w, g.state_pdf, g.init,
        g.final, g.trans_pos, g.trans_pos_hi, g.trans_pos_lo, g.pdf_perm,
        g.pdf_bounds, float(leaky_coef),
    )


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class BlockedDenGraph:
    """Class-blocked denominator graph — the production den kernel.

    The composed den FSA (`graphs/den_graph.compile_denominator_fsa`) has a
    second factorization beyond positions: the sources that can reach any
    given destination position always share an equivalence class (for the
    left-context composition this is "most recent phone" — a De Bruijn-graph
    property of context shifting; discovered generically by union-find over
    sources sharing a destination).  So the [Npos, S] position->state
    transition, whose per-frame HBM re-streaming dominated the round-4 train
    step (~137 MB/frame as a bf16 hi/lo pair), is really block-diagonal.
    The raw classes (47 blocks of 84x201 at the flagship 4-gram x 6k-pdf
    scale, 3 MB total) are merged into ~8 superblocks because XLA runs a
    few [B,512]x[512,2k] matmuls an order of magnitude faster than 47 tiny
    ones (measured 3.3 ms vs 62 ms for the 49-frame fwd+bwd chain).

    Layout (single plane, one superblock row each):

        [ R*NDP enter slots | NSRC loop slots ]  x  C superblocks

    Every position's enter states are padded into runs of R ("subpositions";
    positions with more than R enter pdfs split into several subpositions —
    sound because sub-slots carry identical out-rows and their masses add).
    Per-frame work is then three dense ops and ONE static gather:

        beta_dst = alpha_enters.reshape(B, C*NDP, R).sum(-1)   (VPU)
        beta     = beta_dst[perm] + alpha_loops (+ leaky*init) (gather)
        alpha'   = einsum('bcs,csd->bcd', beta, W) * obs       (MXU)

    with topology self-loops folded into W as diagonal loop columns and
    renormalization fused behind.  Sources with identical out-arc lists
    spanning many classes (the committed +-1 composition's wildcard/EOS
    positions) factor as rank-R broadcast terms.

    Same math as Kaldi's chain denominator (upstream
    `src/chain/chain-denominator.cc`), exact f32 weights (no hi/lo splits
    needed at this size), identical results to the factored/dense kernels.
    Pad slots carry zero in-weight so they hold no mass and their obs
    gradients are exactly zero.
    """

    w_blocks: jax.Array  # [C, NSRC, NDp] f32 (NDp = R*NDP + NSRC)
    perm: jax.Array  # [C*NSRC] int32 into beta_dst padded (last = zero slot)
    perm_inv: jax.Array  # [C*NDPOS] int32 inverse (C*NSRC = no source)
    init_pos: jax.Array  # [C*NSRC] f32 per-subposition init sums (leaky)
    pdf_virtual: jax.Array  # [C*NDp] int32
    init_virtual: jax.Array  # [C*NDp] f32
    final_virtual: jax.Array  # [C*NDp] f32
    pdf_perm: jax.Array  # [C*NDp] int32 (segment-sum obs backward)
    pdf_bounds: jax.Array  # [P+1] int32
    bcast_sel: Optional[jax.Array]  # [C*NSRC, R] f32 or None
    bcast_vec: Optional[jax.Array]  # [R, C*NDp] f32 or None
    # static aux (not traced)
    enter_pad: int = dataclasses.field(default=4)  # R
    num_states: int = dataclasses.field(default=0)
    num_pdfs: int = dataclasses.field(default=0)
    state_to_virtual: Optional[np.ndarray] = dataclasses.field(default=None)

    @property
    def shape(self):
        c, nsrc, ndp = self.w_blocks.shape
        return c, nsrc, ndp

    def tree_flatten(self):
        return (self.w_blocks, self.perm, self.perm_inv, self.init_pos,
                self.pdf_virtual, self.init_virtual, self.final_virtual,
                self.pdf_perm, self.pdf_bounds, self.bcast_sel,
                self.bcast_vec), (
                    self.enter_pad, self.num_states, self.num_pdfs)

    @classmethod
    def tree_unflatten(cls, aux, children):
        enter_pad, num_states, num_pdfs = aux
        return cls(*children, enter_pad=enter_pad, num_states=num_states,
                   num_pdfs=num_pdfs, state_to_virtual=None)


@jax.custom_vjp
def _perm_gather(x, perm, inv):
    """Injective static-permutation gather with a gather backward.

    x [B, N] -> y [B, M] = x_pad[:, perm] (index N = appended zero slot).
    XLA's autodiff transpose of a gather is a sort-based scatter-add; for a
    permutation the adjoint is simply a gather by the inverse (``inv`` [N],
    sentinel M = no source -> zero) — measured meaningfully faster inside
    the den scan.
    """
    xp = jnp.concatenate([x, jnp.zeros_like(x[:, :1])], axis=-1)
    return xp[:, perm]


def _perm_gather_fwd(x, perm, inv):
    return _perm_gather(x, perm, inv), inv


def _perm_gather_bwd(inv, g):
    gp = jnp.concatenate([g, jnp.zeros_like(g[:, :1])], axis=-1)
    return gp[:, inv], None, None


_perm_gather.defvjp(_perm_gather_fwd, _perm_gather_bwd)


def _blk_step_fwd(alpha, obs_t, w_blocks, perm, perm_inv, init_pos,
                  bcast_sel, bcast_vec, leaky, r):
    """One blocked-den frame: alpha [B,V] -> (alpha' [B,V], cnorm [B])."""
    b = alpha.shape[0]
    c, nsrc, ndp = w_blocks.shape
    ndpos = (ndp - nsrc) // r
    v = c * ndp
    a3 = alpha.reshape(b, c, ndp)
    # r-major enter runs: sum R contiguous ndpos-wide slices
    beta_dst = a3[:, :, : r * ndpos].reshape(b, c, r, ndpos).sum(2)
    beta_dst = beta_dst.reshape(b, c * ndpos)
    a_loop = a3[:, :, r * ndpos:].reshape(b, c * nsrc)
    beta = _perm_gather(beta_dst, perm, perm_inv) + a_loop
    if leaky > 0.0:
        beta = beta + leaky * init_pos[None, :]
    a = jnp.einsum(
        "bcs,csd->bcd", beta.reshape(b, c, nsrc), w_blocks,
        preferred_element_type=jnp.float32).reshape(b, v)
    if bcast_sel is not None:
        wm = jnp.matmul(beta, bcast_sel,
                        preferred_element_type=jnp.float32)  # [B, R]
        a = a + jnp.matmul(wm, bcast_vec,
                           preferred_element_type=jnp.float32)
    a = a * obs_t
    cnorm = jnp.maximum(jnp.sum(a, axis=-1), _TINY)
    return a / cnorm[:, None], cnorm


def _blocked_core_scan(obs_virtual, w_blocks, perm, perm_inv, init_pos,
                       init_virtual, final_virtual, bcast_sel, bcast_vec,
                       leaky, r):
    """Forward recursion; returns (logz [B], alphas [T,B,V], cs [T,B])."""
    a0 = init_virtual[None, :] * obs_virtual[:, 0]
    c0 = jnp.maximum(jnp.sum(a0, axis=-1), _TINY)
    alpha0 = a0 / c0[:, None]
    obs_rest = jnp.moveaxis(obs_virtual[:, 1:], 1, 0)  # [T-1, B, V]

    def step(alpha, obs_t):
        a, cn = _blk_step_fwd(alpha, obs_t, w_blocks, perm, perm_inv,
                              init_pos, bcast_sel, bcast_vec, leaky, r)
        return a, (a, cn)

    alpha_last, (alphas_rest, cs_rest) = jax.lax.scan(step, alpha0, obs_rest)
    alphas = jnp.concatenate([alpha0[None], alphas_rest], axis=0)
    cs = jnp.concatenate([c0[None], cs_rest], axis=0)
    zfin = jnp.maximum(
        jnp.sum(alpha_last * final_virtual[None, :], axis=-1), _TINY)
    logz = jnp.log(c0) + jnp.sum(jnp.log(cs_rest), axis=0) + jnp.log(zfin)
    return logz, alphas, cs


@partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def _blocked_score_core(obs_virtual, w_blocks, perm, perm_inv, init_pos,
                        init_virtual, final_virtual, bcast_sel, bcast_vec,
                        leaky, enter_pad):
    """logZ [B] of the blocked den from prob-space virtual obs [B,T,V].

    Custom VJP implementing the exact adjoint recurrence (the XLA mirror
    of ops/pallas_fwdbwd._blk_bwd_kernel):

        bar_t   = g_t - (g_t . alpha_t) + gbar
        dL/dobs = alpha_t * bar_t / obs_t
        v_{t-1} = L^T((bar_t / c_t) * obs_t)

    with L = blockmm . (perm + rsum + loop (+ bcast)).  Autodiff through
    the fwd scan saves every intermediate ([B,V]-sized beta/dst/pre-norm
    products per frame); the custom backward needs only the normalized
    alphas + scales — several hundred MB/step less HBM traffic at the
    flagship shape.
    """
    logz, _, _ = _blocked_core_scan(obs_virtual, w_blocks, perm, perm_inv,
                                    init_pos, init_virtual, final_virtual,
                                    bcast_sel, bcast_vec, leaky, enter_pad)
    return logz


def _blocked_core_vjp_fwd(obs_virtual, w_blocks, perm, perm_inv, init_pos,
                          init_virtual, final_virtual, bcast_sel, bcast_vec,
                          leaky, enter_pad):
    logz, alphas, cs = _blocked_core_scan(
        obs_virtual, w_blocks, perm, perm_inv, init_pos, init_virtual,
        final_virtual, bcast_sel, bcast_vec, leaky, enter_pad)
    return logz, (obs_virtual, w_blocks, perm_inv, final_virtual,
                  bcast_sel, bcast_vec, alphas, cs)


def _blocked_core_vjp_bwd(leaky, enter_pad, res, gbar):
    (obs_virtual, w_blocks, perm_inv, final_virtual, bcast_sel, bcast_vec,
     alphas, cs) = res
    b, t, v = obs_virtual.shape
    c, nsrc, ndp = w_blocks.shape
    r = enter_pad
    ndpos = (ndp - nsrc) // r
    gb = gbar.astype(jnp.float32)[:, None]
    obs_tm = jnp.moveaxis(obs_virtual.astype(jnp.float32), 1, 0)  # [T,B,V]

    def l_transpose(vv):
        """u = L^T(v): adjoint of the beta->a block matmul, then the
        perm/rsum/loop (+ bcast) assembly back to alpha slots."""
        u = jnp.einsum("bcd,csd->bcs", vv.reshape(b, c, ndp), w_blocks,
                       preferred_element_type=jnp.float32
                       ).reshape(b, c * nsrc)
        if bcast_sel is not None:
            u = u + jnp.matmul(
                jnp.matmul(vv, bcast_vec.T,
                           preferred_element_type=jnp.float32),
                bcast_sel.T, preferred_element_type=jnp.float32)
        up = jnp.concatenate([u, jnp.zeros_like(u[:, :1])], axis=-1)
        gbd = up[:, perm_inv].reshape(b, c, ndpos)
        ent = jnp.broadcast_to(gbd[:, :, None, :], (b, c, r, ndpos)
                               ).reshape(b, c, r * ndpos)
        lop = u.reshape(b, c, nsrc)
        return jnp.concatenate([ent, lop], axis=-1).reshape(b, v)

    out_dt = obs_virtual.dtype

    def g_obs_frame(alpha_t, bar_t, obs_t):
        # prob-space obs gradient, divided per frame inside the scan (one
        # fused pass; a post-scan [T,B,V] division costs a full extra
        # read+write of the gradient tensor)
        return (alpha_t * bar_t / jnp.maximum(obs_t, 1e-30)).astype(out_dt)

    alpha_last = alphas[-1]
    zfin = jnp.maximum(jnp.sum(alpha_last * final_virtual[None, :], axis=-1,
                               keepdims=True), _TINY)
    g = gb * final_virtual[None, :] / zfin
    bar = g - jnp.sum(g * alpha_last, axis=-1, keepdims=True) + gb
    grad_last = g_obs_frame(alpha_last, bar, obs_tm[-1])
    vcar = (bar / cs[-1][:, None]) * obs_tm[-1]

    def bstep(vc, inp):
        alpha_t, obs_t, c_t = inp
        gg = l_transpose(vc)
        bar_t = gg - jnp.sum(gg * alpha_t, axis=-1, keepdims=True) + gb
        return ((bar_t / c_t[:, None]) * obs_t,
                g_obs_frame(alpha_t, bar_t, obs_t))

    _, grads_rest = jax.lax.scan(
        bstep, vcar, (alphas[:-1], obs_tm[:-1], cs[:-1]), reverse=True)
    g_obs = jnp.moveaxis(
        jnp.concatenate([grads_rest, grad_last[None]], axis=0), 0, 1)
    return (g_obs, None, None, None, None, None, None, None, None)


_blocked_score_core.defvjp(_blocked_core_vjp_fwd, _blocked_core_vjp_bwd)


@partial(jax.jit, static_argnames=("leaky_coef_static", "enter_pad",
                                   "obs_bf16"))
def _forward_score_blocked_impl(obs_logprob, w_blocks, perm, perm_inv,
                                init_pos, pdf_virtual, init_virtual,
                                final_virtual, pdf_perm, pdf_bounds,
                                bcast_sel, bcast_vec, leaky_coef_static,
                                enter_pad, obs_bf16=False):
    b, t, _ = obs_logprob.shape
    c, nsrc, ndp = w_blocks.shape
    r = enter_pad
    ndpos = (ndp - nsrc) // r  # subpositions per superblock
    v = c * ndp
    obs_logprob = obs_logprob.astype(jnp.float32)
    mx = jax.lax.stop_gradient(jnp.max(obs_logprob, axis=-1, keepdims=True))
    obs_exp = jnp.exp(jnp.maximum(obs_logprob - mx, _MIN_LOG_OBS))
    # plain take: at the blocked kernel's virtual width (~1.8x S) the
    # autodiff scatter backward measures FASTER than the sorted segment-sum
    # backward (whose cumsum spans the whole padded axis) — 12 vs 24 ms at
    # the flagship shape.  obs_bf16 halves the expanded-observation traffic
    # (gather, scan reads, backward scatter); the recursion itself stays
    # f32 (upcast in-register at the multiply).
    if obs_bf16:
        obs_exp = obs_exp.astype(jnp.bfloat16)
    obs_virtual = jnp.take(obs_exp, pdf_virtual, axis=-1)  # [B,T,V]
    logz = _blocked_score_core(
        obs_virtual, w_blocks, perm, perm_inv, init_pos, init_virtual,
        final_virtual, bcast_sel, bcast_vec, float(leaky_coef_static),
        int(enter_pad))
    return logz + jnp.sum(mx[:, :, 0], axis=1)


def forward_score_blocked_pallas(
    obs_logprob: jax.Array,
    g: "BlockedDenGraph",
    leaky_coef: float = 0.0,
    obs_bf16: bool = False,
) -> jax.Array:
    """Fused Pallas variant of :func:`forward_score_blocked`: the whole
    T-frame scan runs as one TPU kernel with the superblocks AND the bf16
    one-hot permutation VMEM-resident (ops/pallas_fwdbwd), plus a fused
    adjoint kernel for the backward.  Falls back to the XLA path when the
    graph carries a broadcast (wildcard) term."""
    from tdnnf_nas_tpu.ops.pallas_fwdbwd import pallas_blocked_den_score

    if g.bcast_sel is not None:
        return forward_score_blocked(obs_logprob, g, leaky_coef, obs_bf16)
    c, nsrc, ndp = g.shape
    r = int(g.enter_pad)
    cnd = c * ((ndp - nsrc) // r)
    cs = c * nsrc
    obs_logprob = obs_logprob.astype(jnp.float32)
    mx = jax.lax.stop_gradient(jnp.max(obs_logprob, axis=-1, keepdims=True))
    obs_exp = jnp.exp(jnp.maximum(obs_logprob - mx, _MIN_LOG_OBS))
    if obs_bf16:
        obs_exp = obs_exp.astype(jnp.bfloat16)
    obs_virtual = jnp.take(obs_exp, g.pdf_virtual, axis=-1)  # [B,T,V]
    # one-hot permutation (bf16, exact selection): row k selects the
    # dest subposition k for every source slot with perm == k; pad slots
    # (perm == cnd) match no row -> zero
    p1 = (g.perm[None, :] == jnp.arange(cnd, dtype=g.perm.dtype)[:, None]
          ).astype(jnp.bfloat16)  # [CND, CS]
    p1t = p1.T
    logz = pallas_blocked_den_score(
        obs_virtual, g.w_blocks, p1, p1t, g.init_virtual, g.final_virtual,
        g.init_pos, float(leaky_coef), r)
    return logz + jnp.sum(mx[:, :, 0], axis=1)


def forward_score_blocked(
    obs_logprob: jax.Array,
    g: "BlockedDenGraph",
    leaky_coef: float = 0.0,
    obs_bf16: bool = False,
) -> jax.Array:
    """forward_score over a BlockedDenGraph — identical math to the
    factored/dense kernels (tested bit-close), with the transition as
    VMEM-scale class blocks instead of the [Npos, S] matmul.

    ``obs_bf16`` keeps the EXPANDED (state-indexed) observations in bf16 —
    the transition recursion stays f32; only the per-state emission factor
    is rounded.  Halves the dominant obs gather/scatter traffic; measured
    objf delta at the flagship shape ~1e-4/frame (see bench notes)."""
    return _forward_score_blocked_impl(
        obs_logprob, g.w_blocks, g.perm, g.perm_inv, g.init_pos,
        g.pdf_virtual, g.init_virtual, g.final_virtual, g.pdf_perm,
        g.pdf_bounds, g.bcast_sel, g.bcast_vec, float(leaky_coef),
        int(g.enter_pad), bool(obs_bf16),
    )
