"""Jitted LF-MMI train/valid steps for TDNN-F models and DARTS supernets.

The TPU-native replacement for the reference's iteration loop
(`steps/nnet3/chain/train.py:473-570` + ``nnet3-chain-train``): one jitted
function = forward, chain objective, backward, optimizer update,
semi-orthogonal constraint (every 4 steps, `nnet-utils.cc:1062`), BN stat
update — the whole per-minibatch pipeline fused by XLA.  The two-stage NAS
pipeline is expressed as optimizer partitions (``train_theta`` /
``train_alpha``) + ``bn_frozen`` instead of the reference's
LearningRateFactor/sed model surgery (`cvupdate.sh:128-142`).

Data parallelism: run the same step under `jax.jit` with the batch sharded
over a mesh 'dp' axis and state replicated — XLA inserts the psum gradient
all-reduce over ICI (see parallel/mesh.py), replacing Kaldi's per-job
model averaging (`common.py:108-190`).
"""

from __future__ import annotations

import dataclasses

from typing import Any

import jax
import jax.numpy as jnp

from tdnnf_nas_tpu.core.config import Config
from tdnnf_nas_tpu.graphs.supervision import ChunkSupervision
from tdnnf_nas_tpu.models import nas as nas_mod
from tdnnf_nas_tpu.models import tdnnf as tdnnf_mod
from tdnnf_nas_tpu.ops.fwdbwd import DenGraphArrays
from tdnnf_nas_tpu.ops.semiorth import semi_orthogonal_step, semi_orthogonal_step_3d
from tdnnf_nas_tpu.train.objective import ChainObjectiveConfig, chain_objective
from tdnnf_nas_tpu.train.optimizer import OptimizerConfig, make_optimizer


@dataclasses.dataclass(frozen=True)
class TrainerConfig(Config):
    objective: ChainObjectiveConfig = dataclasses.field(default_factory=ChainObjectiveConfig)
    optimizer: OptimizerConfig = dataclasses.field(default_factory=OptimizerConfig)
    semiorth_interval: int = 4  # reference: ~every 4 minibatches
    train_theta: bool = True
    train_alpha: bool = False
    bn_frozen: bool = False
    search_mode: str = nas_mod.SearchMode.FIXED  # supernet only
    tau_max: float = 1.0  # temperature anneal (temperature_schedule.py:34-67)
    tau_min: float = 0.03
    flops_coef: float = 0.0  # bottleneck FLOPs penalty (add_flopsconstraint.py)
    alpha_entropy_coef: float = 0.0  # explicit version of the x5 entropy hack
    # dropout schedule: ((data_fraction, proportion), ...) breakpoints,
    # piecewise-linear in training fraction — `--trainer.dropout-schedule`
    # ('0,0@0.20,0.5@0.50,0' style) in steps/libs/nnet3/train/common.py.
    # Empty => the model config's constant dropout_proportion.
    dropout_schedule: tuple = ()


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class TrainState:
    params: Any
    alphas: Any  # {} for plain models
    bn_state: Any
    opt_state: Any
    alpha_opt_state: Any
    step: jax.Array

    def tree_flatten(self):
        return (
            (self.params, self.alphas, self.bn_state, self.opt_state,
             self.alpha_opt_state, self.step),
            None,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def _wd_scale(path) -> float:
    """Relative weight-decay per param (xconfig l2 opts: 0.01 hidden,
    0.002 output, 0 for the fixed lda — `run_tdnn_7q_fbk_40_manual.sh:119-123`)."""
    name = "/".join(path)
    if "lda" in name:
        return 0.0
    if "output_" in name:
        return 0.2  # 0.002 when l2_regularize=0.01
    return 1.0


def init_train_state(
    model_cfg,
    trainer_cfg: TrainerConfig,
    key: jax.Array,
    supernet: bool = False,
):
    if supernet:
        params, alphas, bn_state = nas_mod.init_supernet(model_cfg, key)
    else:
        params, bn_state = tdnnf_mod.init_model(model_cfg, key)
        alphas = {}
    opt_init, _ = make_optimizer(trainer_cfg.optimizer, _wd_scale)
    a_init, _ = make_optimizer(trainer_cfg.optimizer)
    return TrainState(
        params=params,
        alphas=alphas,
        bn_state=bn_state,
        opt_state=opt_init(params),
        alpha_opt_state=a_init(alphas),
        step=jnp.zeros((), jnp.int32),
    )


def _tau_at(step, cfg: TrainerConfig, num_steps: int):
    f = jnp.clip(step.astype(jnp.float32) / max(num_steps, 1), 0.0, 1.0)
    return (1.0 - f) * (cfg.tau_max - cfg.tau_min) + cfg.tau_min


def _dropout_at(step, cfg: TrainerConfig, num_steps: int):
    """Piecewise-linear dropout proportion at the training fraction."""
    if not cfg.dropout_schedule:
        return None
    xs = jnp.asarray([x for x, _ in cfg.dropout_schedule], jnp.float32)
    ys = jnp.asarray([y for _, y in cfg.dropout_schedule], jnp.float32)
    f = jnp.clip(step.astype(jnp.float32) / max(num_steps, 1), 0.0, 1.0)
    return jnp.interp(f, xs, ys)


def _apply_semiorth(params, model_cfg, supernet: bool):
    """Constraint step on all semi-orthogonal factors."""
    base_cfg = model_cfg.base if supernet else model_cfg
    new = dict(params)
    for i in range(base_cfg.num_tdnnf):
        name = f"tdnnf{i + 2}"
        layer = dict(new[name])
        layer["linear"] = semi_orthogonal_step_3d(layer["linear"])
        new[name] = layer
    new["prefinal_l"] = semi_orthogonal_step(new["prefinal_l"])
    for head in ("chain", "xent"):
        hp = dict(new[f"prefinal_{head}"])
        hp["linear"] = semi_orthogonal_step(hp["linear"])
        new[f"prefinal_{head}"] = hp
    return new


def make_train_step(
    model_cfg,
    trainer_cfg: TrainerConfig,
    den: DenGraphArrays,
    supernet: bool = False,
    donate: bool = True,
):
    """Build the jitted train step.

    step(state, batch, key) -> (state, metrics)
    batch: {"feats": [B,T_in,F], "ivectors": [B,D]|None, "sup": ChunkSupervision}
    """
    _, opt_update = make_optimizer(trainer_cfg.optimizer, _wd_scale)
    _, alpha_update = make_optimizer(trainer_cfg.optimizer)
    num_steps = trainer_cfg.optimizer.num_steps

    def loss_fn(params, alphas, bn_state, batch, key, dropout_key, tau,
                dropout_p, den):
        feats = batch["feats"]
        ivectors = batch.get("ivectors")
        sup: ChunkSupervision = batch["sup"]
        if supernet:
            chain_out, xent_out, new_bn, _ = nas_mod.apply_supernet(
                model_cfg, params, alphas, bn_state, feats, ivectors,
                mode=trainer_cfg.search_mode,
                tau=tau, key=key, train=True,
                bn_frozen=trainer_cfg.bn_frozen, dropout_key=dropout_key,
                dropout_p=dropout_p,
            )
        else:
            chain_out, xent_out, new_bn = tdnnf_mod.apply_model(
                model_cfg, params, bn_state, feats, ivectors, train=True,
                dropout_key=dropout_key, dropout_p=dropout_p,
            )
        loss, metrics = chain_objective(
            chain_out, xent_out, den, sup, trainer_cfg.objective
        )
        if supernet and trainer_cfg.flops_coef > 0.0 and "bottleneck" in alphas:
            ef = nas_mod.expected_flops(alphas["bottleneck"], model_cfg, tau)
            loss = loss + trainer_cfg.flops_coef * ef
            metrics["expected_bottleneck"] = ef / model_cfg.num_layers
        if supernet and trainer_cfg.alpha_entropy_coef > 0.0:
            ent = 0.0
            for a in jax.tree.leaves(alphas):
                p = jax.nn.softmax(a, axis=-1)
                ent = ent + jnp.sum(-p * jnp.log(p + 1e-20))
            loss = loss + trainer_cfg.alpha_entropy_coef * ent
            metrics["alpha_entropy"] = ent
        return loss, (metrics, new_bn)

    def step_fn(state: TrainState, batch, key, den_arg):
        tau = _tau_at(state.step, trainer_cfg, num_steps)
        dropout_p = _dropout_at(state.step, trainer_cfg, num_steps)
        step_key = jax.random.fold_in(key, state.step)
        k_model, k_dropout = jax.random.split(step_key)
        grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)
        (loss, (metrics, new_bn)), (g_params, g_alphas) = grad_fn(
            state.params, state.alphas, state.bn_state, batch, k_model,
            k_dropout, tau, dropout_p, den_arg
        )
        new_params, new_opt = state.params, state.opt_state
        if trainer_cfg.train_theta:
            new_params, new_opt = opt_update(
                g_params, state.opt_state, state.params, state.step
            )
            if trainer_cfg.semiorth_interval > 0:
                new_params = jax.lax.cond(
                    state.step % trainer_cfg.semiorth_interval == 0,
                    lambda p: _apply_semiorth(p, model_cfg, supernet),
                    lambda p: p,
                    new_params,
                )
        new_alphas, new_aopt = state.alphas, state.alpha_opt_state
        if trainer_cfg.train_alpha and state.alphas:
            new_alphas, new_aopt = alpha_update(
                g_alphas, state.alpha_opt_state, state.alphas, state.step,
                lr_scale=trainer_cfg.optimizer.alpha_lr_scale,
            )
        if trainer_cfg.bn_frozen:
            new_bn = state.bn_state
        metrics["tau"] = tau
        if dropout_p is not None:
            metrics["dropout_p"] = dropout_p
        metrics["grad_norm"] = jnp.sqrt(
            sum(jnp.sum(jnp.square(g)) for g in jax.tree.leaves(g_params)) + 1e-20
        )
        return (
            TrainState(new_params, new_alphas, new_bn, new_opt, new_aopt,
                       state.step + 1),
            metrics,
        )

    # the den graph rides the jit boundary as an ARGUMENT: closed-over
    # arrays are baked into the lowered module as constants, and at
    # composed-den scale (S ~ 50k+, padded in-arc tables) the serialized
    # module exceeded the remote compile service's request limit (HTTP 413)
    jitted = jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    def step(state: TrainState, batch, key):
        return jitted(state, batch, key, den)

    # expose the jit + den for AOT cost analysis (bench.py FLOPs/MFU)
    step._jitted = jitted
    step._den = den
    return step


def make_valid_step(model_cfg, trainer_cfg: TrainerConfig, den: DenGraphArrays,
                    supernet: bool = False):
    """Eval-mode objective (stored BN stats, no sampling: fixed/softmax path),
    the compute_prob_valid equivalent (`train.py:590-627` diagnostics)."""

    def valid_fn(state: TrainState, batch, den_arg):
        feats = batch["feats"]
        ivectors = batch.get("ivectors")
        sup = batch["sup"]
        if supernet:
            mode = (nas_mod.SearchMode.SOFTMAX
                    if trainer_cfg.search_mode != nas_mod.SearchMode.FIXED
                    else nas_mod.SearchMode.FIXED)
            chain_out, xent_out, _, _ = nas_mod.apply_supernet(
                model_cfg, state.params, state.alphas, state.bn_state, feats,
                ivectors, mode=mode, tau=trainer_cfg.tau_min,
                key=jax.random.PRNGKey(0), train=False,
            )
        else:
            chain_out, xent_out, _ = tdnnf_mod.apply_model(
                model_cfg, state.params, state.bn_state, feats, ivectors,
                train=False,
            )
        _, metrics = chain_objective(chain_out, xent_out, den_arg, sup,
                                     trainer_cfg.objective)
        return metrics

    jitted = jax.jit(valid_fn)

    def valid(state: TrainState, batch):
        return jitted(state, batch, den)

    return valid
