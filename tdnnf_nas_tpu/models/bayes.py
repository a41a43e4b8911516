"""Bayesian / Gaussian-process TDNN-F variants — the reference's fork-extra
component family, realized as variational JAX models.

Reference behavior being reproduced (capability, not code):

- `BayesAffineComponent` / `NaturalGradientBayesAffineComponent`
  (`nnet-simple-component.h:2338-2512`): an affine whose weight matrix is
  variational — stored as [mean; std-param] stacked rows; forward draws
  W = mean + std * eps with eps ~ N(0,1) (reparameterization), std = exp(rho)
  when `use-exp-std`, noise shared across the output dim when
  `share-std-output-sampling`; test mode uses the mean weights; a KL to an
  isotropic Gaussian prior is added to the objective with weight `KL-scale`.
  Used as the `.affine` factor of `bayestdnnf-layer`
  (`steps/libs/nnet3/xconfig/composite_layers.py:850-1005`).
- `GPActivationComponent` / `NaturalGradientGPActivationComponent`
  (`nnet-simple-component.h:2514-2690`, impl `.cc:7011-7131`): a learned
  per-dim activation = convex mixture of {sigmoid, relu, tanh} basis
  functions; mixture logits are variational (mean+std rows, reparameterized
  sample), normalized by a softmax over the basis axis per dim, floored at
  1e-20.  Used as the `.gpact` of `gptdnnf-layer`
  (`composite_layers.py:1063-1228`).
- `KLGaussianComponent` (`nnet-simple-component.h:2230-2290`) — the KL term
  is computed analytically here (`gaussian_kl`) instead of through a graph
  component.
- Supporting fork primitives (`NormalRandComponent`, `ExpComponent`,
  `MinValueComponent`, …) live in `ops/extras.py`.

Layer shape (both variants, `composite_layers.py:948-1005`, `:1166-1228`):
  linear (deterministic TDNN, semi-orth) -> Bayes affine -> ReLU | GP-act
  -> BatchNorm -> dropout -> 0.66 bypass,
i.e. the plain tdnnf layer with a variational second factor — so the forward
delegates to `models/tdnnf.apply_model` after sampling effective weights,
and the GP activations ride the `layer_activations` hook.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from tdnnf_nas_tpu.core.config import Config
from tdnnf_nas_tpu.models import tdnnf as tdnnf_mod
from tdnnf_nas_tpu.models.tdnnf import TdnnfModelConfig

# exp(rho) ceiling — the reference caps the pre-exp std-param at 46.05
# (`nnet-simple-component.cc:7064`) purely to avoid inf; we keep a saner cap.
RHO_MAX = 10.0
COEF_FLOOR = 1e-20  # `.cc:7074`


@dataclasses.dataclass(frozen=True)
class BayesTdnnfModelConfig(Config):
    """`bayestdnnf-layer` (gp_activation=False) / `gptdnnf-layer` (True)
    networks — defaults mirror the xconfig defaults
    (`composite_layers.py:857-873`, `:1070-1086`)."""

    base: TdnnfModelConfig = dataclasses.field(default_factory=TdnnfModelConfig)
    kl_scale: float = 1e-4        # KL-scale
    prior_std: float = 1.0        # weight prior N(0, prior_std^2)
    rho_init: float = -5.0        # initial std-param (std = exp(rho) ~ 0.007)
    use_exp_std: bool = True      # use-exp-std
    share_std_output_sampling: bool = True  # share-std-output-sampling
    gp_activation: bool = False   # gptdnnf-layer when True
    gpact_kl_scale: float = 1e-4  # gpact-KL-scale
    gpact_prior_std: float = 1e-3  # prior-std of the GP mixture logits


def variational_sample(mu, rho, key, *, use_exp_std: bool = True,
                       share_last_axis: bool = False, test_mode: bool = False):
    """Reparameterized draw W = mu + std(rho) * eps.

    share_last_axis: one eps broadcast over the last (output) axis — the
    `share-std-output-sampling` behavior (`nnet-simple-component.cc:7025-7038`,
    weight rows there == our last axis).
    """
    if test_mode:
        return mu
    std = jnp.exp(jnp.minimum(rho, RHO_MAX)) if use_exp_std else rho
    shape = mu.shape[:-1] + (1,) if share_last_axis else mu.shape
    eps = jax.random.normal(key, shape, mu.dtype)
    return mu + std * eps


def gaussian_kl(mu, rho, prior_std: float, *, prior_mean: float = 0.0,
                use_exp_std: bool = True):
    """Analytic KL( N(mu, std^2) || N(prior_mean, prior_std^2) ), summed.

    Replaces the graph-side `KLGaussianComponent`
    (`nnet-simple-component.h:2230-2290`) with the closed form.
    """
    if use_exp_std:
        rho = jnp.minimum(rho, RHO_MAX)
        log_std = rho
        var = jnp.exp(2.0 * rho)
    else:
        std = jnp.abs(rho) + 1e-12
        log_std = jnp.log(std)
        var = std * std
    log_prior = jnp.log(prior_std)
    return jnp.sum(
        (log_prior - log_std)
        + (var + jnp.square(mu - prior_mean)) / (2.0 * prior_std**2)
        - 0.5
    )


def gp_activation_coefs(logits):
    """Basis mixture coefficients from (sampled) logits [3, D]: softmax over
    the basis axis per dim, floored (`nnet-simple-component.cc:7071-7075`)."""
    return jnp.maximum(jax.nn.softmax(logits, axis=0), COEF_FLOOR)


def gp_activation(x, coefs):
    """out = c_sig*sigmoid(x) + c_relu*relu(x) + c_tanh*tanh(x)
    (`nnet-simple-component.cc:7077-7114`).  coefs: [3, D], x: [..., D]."""
    return (coefs[0] * jax.nn.sigmoid(x)
            + coefs[1] * jax.nn.relu(x)
            + coefs[2] * jnp.tanh(x))


def init_bayes_model(cfg: BayesTdnnfModelConfig, key: jax.Array):
    """(params, bn_state): tdnnf params with each tdnnf affine factor
    replaced by a variational {mu, rho} pair (+ per-layer gpact logits when
    gp_activation)."""
    k_base, k_gp = jax.random.split(key)
    params, bn_state = tdnnf_mod.init_model(cfg.base, k_base)
    for i in range(cfg.base.num_tdnnf):
        name = f"tdnnf{i + 2}"
        layer = dict(params[name])
        mu = layer.pop("affine")
        layer["affine_mu"] = mu
        layer["affine_rho"] = jnp.full_like(mu, cfg.rho_init)
        if cfg.gp_activation:
            # mean logits 0 => uniform 1/3 mixture at init
            layer["gpact_mu"] = jnp.zeros((3, cfg.base.hidden_dim), jnp.float32)
            layer["gpact_rho"] = jnp.full((3, cfg.base.hidden_dim),
                                          cfg.rho_init, jnp.float32)
        params[name] = layer
    return params, bn_state


def apply_bayes_model(
    cfg: BayesTdnnfModelConfig,
    params,
    bn_state,
    feats: jax.Array,
    ivectors: Optional[jax.Array] = None,
    key: Optional[jax.Array] = None,
    train: bool = False,
    dropout_key: Optional[jax.Array] = None,
):
    """Forward pass.  Samples the variational weights (train mode; test mode
    == mean weights, the `test-flag`/`test-mode` behavior), then delegates to
    the plain TDNN-F forward.

    Returns (chain_logits, xent_logits, new_bn_state, kl) where kl is the
    total weighted KL regularizer (add to the loss; weights already include
    kl_scale / gpact_kl_scale).
    """
    test_mode = not train
    if not test_mode and key is None:
        raise ValueError("training-mode Bayes forward needs a PRNG key")
    eff = dict(params)
    activations = {} if cfg.gp_activation else None
    kl = jnp.zeros((), jnp.float32)
    keys = (jax.random.split(key, 2 * cfg.base.num_tdnnf)
            if key is not None else None)
    for i in range(cfg.base.num_tdnnf):
        name = f"tdnnf{i + 2}"
        layer = dict(params[name])
        mu, rho = layer.pop("affine_mu"), layer.pop("affine_rho")
        layer["affine"] = variational_sample(
            mu, rho, keys[2 * i] if keys is not None else None,
            use_exp_std=cfg.use_exp_std,
            share_last_axis=cfg.share_std_output_sampling,
            test_mode=test_mode,
        )
        kl = kl + cfg.kl_scale * gaussian_kl(
            mu, rho, cfg.prior_std, use_exp_std=cfg.use_exp_std
        )
        if cfg.gp_activation:
            g_mu, g_rho = layer.pop("gpact_mu"), layer.pop("gpact_rho")
            logits = variational_sample(
                g_mu, g_rho, keys[2 * i + 1] if keys is not None else None,
                use_exp_std=cfg.use_exp_std,
                share_last_axis=cfg.share_std_output_sampling,
                test_mode=test_mode,
            )
            coefs = gp_activation_coefs(logits)
            activations[name] = lambda x, c=coefs: gp_activation(x, c)
            kl = kl + cfg.gpact_kl_scale * gaussian_kl(
                g_mu, g_rho, cfg.gpact_prior_std, use_exp_std=cfg.use_exp_std
            )
        eff[name] = layer
    chain, xent, new_bn = tdnnf_mod.apply_model(
        cfg.base, eff, bn_state, feats, ivectors, train=train,
        dropout_key=dropout_key, layer_activations=activations,
    )
    return chain, xent, new_bn, kl


def semiorth_param_paths(cfg: BayesTdnnfModelConfig):
    """Same constraint set as the plain model: the deterministic `linear`
    factors and prefinal linears (the Bayes affine is NOT constrained)."""
    return tdnnf_mod.semiorth_param_paths(cfg.base)
