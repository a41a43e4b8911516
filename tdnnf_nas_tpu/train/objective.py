"""The LF-MMI (chain) objective with cross-entropy regularizer.

TPU-native equivalent of the reference pipeline's chain objective (upstream
`src/chain/chain-training.cc`, invoked per minibatch by ``nnet3-chain-train``
— call stack SURVEY.md §3.1):

  objf = (1/N) * sum_b [ logZ_num(b) - logZ_den(b) ]
         - l2 * ||chain_out||^2 / (2N)
         + xent_scale * (1/N) * sum gamma_num * log_softmax(xent_out)

with N = total supervised frames, leaky-HMM on the denominator only, and
the numerator posteriors gamma_num (stop-gradient) as the soft targets of
the xent head.  Returned loss = -objf (minimize).

Reference constants: xent-regularize 0.1, leaky-hmm-coefficient 0.1
(`run_tdnn_7q_fbk_40_manual.sh:183-185`).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tdnnf_nas_tpu.core.config import Config
from tdnnf_nas_tpu.graphs.supervision import ChunkSupervision
from tdnnf_nas_tpu.ops.fwdbwd import (
    BlockedDenGraph,
    DenGraphArrays,
    FactoredDenGraph,
    SparseDenGraph,
    forward_score,
    forward_score_blocked,
    forward_score_factored,
    forward_score_linear,
    forward_score_sparse,
)


@dataclasses.dataclass(frozen=True)
class ChainObjectiveConfig(Config):
    xent_regularize: float = 0.1
    leaky_hmm_coef: float = 0.1
    out_l2_regularize: float = 0.0  # Kaldi --chain.l2-regularize (on outputs)
    # use the fused Pallas denominator kernel (ops/pallas_fwdbwd.py);
    # TPU-only — leave False for CPU/interpret runs
    pallas_den: bool = False
    # blocked den: keep the expanded per-state observations in bf16 (the
    # recursion stays f32) — halves the dominant obs traffic; objf delta
    # ~1e-4/frame at the flagship shape
    den_obs_bf16: bool = False


def chain_objective(
    chain_out: jax.Array,
    xent_out: jax.Array,
    den: DenGraphArrays,
    sup: ChunkSupervision,
    cfg: ChainObjectiveConfig,
):
    """Compute (loss, metrics).

    chain_out/xent_out: [B, T, P] log-output of the two heads at the
    subsampled frame rate; sup arrays are batched [B, ...] device arrays.
    """
    b, t, p = chain_out.shape
    n_frames = b * t

    if isinstance(den, BlockedDenGraph):
        # class-blocked den (production composed graphs; VMEM-scale blocks)
        logz_den = forward_score_blocked(
            chain_out, den, leaky_coef=cfg.leaky_hmm_coef,
            obs_bf16=cfg.den_obs_bf16,
        )
    elif isinstance(den, FactoredDenGraph):
        # position-factored den (composed 4-gram/triphone graphs)
        logz_den = forward_score_factored(
            chain_out, den, leaky_coef=cfg.leaky_hmm_coef,
        )
    elif isinstance(den, SparseDenGraph):
        # padded-CSR den (triphone-scale state spaces)
        logz_den = forward_score_sparse(
            chain_out, den, leaky_coef=cfg.leaky_hmm_coef,
        )
    elif cfg.pallas_den:
        from tdnnf_nas_tpu.ops.pallas_fwdbwd import pallas_forward_score

        logz_den = pallas_forward_score(
            chain_out, den.trans, den.state_pdf, den.init, den.final,
            leaky_coef=cfg.leaky_hmm_coef,
        )
    else:
        logz_den = forward_score(
            chain_out, den.trans, den.state_pdf, den.init, den.final,
            leaky_coef=cfg.leaky_hmm_coef,
        )

    # Numerator: one fwd+bwd total.  The linear-chain kernel computes
    # logZ_num and its gradient gamma (= occupancy posteriors) on a
    # stop-gradient copy; a first-order surrogate re-attaches the exact
    # gradient (d logZ / d out == gamma) to the graph so the MMI term
    # backpropagates correctly without a second numerator pass, and the
    # same gamma serves as the xent soft targets.
    def num_tot(o):
        if sup.next_w is not None:
            z = forward_score_linear(o, sup.next_w, sup.state_pdf, sup.init,
                                     sup.final, sup.mask, sup.self_loop_prob)
        else:
            z = forward_score(o, sup.trans, sup.state_pdf, sup.init, sup.final,
                              mask=sup.mask)
        return jnp.sum(z), z

    out_sg = jax.lax.stop_gradient(chain_out)
    (_, logz_num), gamma = jax.value_and_grad(num_tot, has_aux=True)(out_sg)
    gamma = jax.lax.stop_gradient(gamma)
    logz_num_sur = (
        jnp.sum(gamma * chain_out, axis=(1, 2))
        + jax.lax.stop_gradient(logz_num - jnp.sum(gamma * out_sg, axis=(1, 2)))
    )

    mmi = (jnp.sum(logz_num_sur) - jnp.sum(logz_den)) / n_frames
    loss = -mmi
    metrics = {
        "objf_mmi": mmi,
        "logz_num": jnp.mean(logz_num) / t,
        "logz_den": jnp.mean(logz_den) / t,
    }

    if cfg.out_l2_regularize > 0.0:
        l2 = jnp.sum(jnp.square(chain_out)) / (2.0 * n_frames)
        loss = loss + cfg.out_l2_regularize * l2
        metrics["out_l2"] = l2

    if cfg.xent_regularize > 0.0:
        logp = jax.nn.log_softmax(xent_out, axis=-1)
        xent_objf = jnp.sum(gamma * logp) / n_frames
        loss = loss - cfg.xent_regularize * xent_objf
        metrics["objf_xent"] = xent_objf

    metrics["loss"] = loss
    return loss, metrics
