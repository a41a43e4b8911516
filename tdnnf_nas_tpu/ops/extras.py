"""Fork-extra primitive ops — JAX equivalents of the reference's secondary
nnet3 components (SURVEY.md §2.1 "secondary fork components": the author's
BLHUC/Bayes adaptation line, registered at `nnet-component-itf.cc:224-274`
but off the NAS path).  Each is a small pure function; the Bayes/GP model
family (`models/bayes.py`) composes the variational ones.

Mapping:
  NormalRandComponent        -> normal_rand
  MinValueComponent          -> min_value
  ExpComponent               -> jnp.exp (trivial; listed for inventory)
  SoftmaxgradnormComponent   -> softmax_gradnorm
  InputVectorLinearComponent -> input_vector_linear
  LinearSelectColComponent   -> linear_select_col
  BayesVecKLGaussianComponent-> sample_vec_and_kl
  KLGaussianComponent        -> models/bayes.gaussian_kl (analytic)
  GumbelSoftmaxComponent     -> gumbel_softmax (also models/nas.branch_coefs)
  ArgmaxOnehotFunctionComponent -> argmax_onehot_st (straight-through; also
                                   the supernet "argmax" mode)
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def normal_rand(key: jax.Array, batch: int, dim: int,
                rand_per_frame: bool = True) -> jax.Array:
    """`NormalRandComponent` (`nnet-simple-component.h:2077-2115`): emit
    N(0,1) noise, ignoring the input; one shared row when not per-frame."""
    if rand_per_frame:
        return jax.random.normal(key, (batch, dim))
    row = jax.random.normal(key, (1, dim))
    return jnp.broadcast_to(row, (batch, dim))


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def min_value(x: jax.Array, scale: float = 1.0) -> jax.Array:
    """`MinValueComponent` (`nnet-simple-component.cc:4872-4891`): forward is
    scale*x; the gradient to x is the CONSTANT -scale — attaching this to a
    graph output makes training minimize x directly (an objective injector,
    like the FLOPs components)."""
    return scale * x


def _min_value_fwd(x, scale):
    return scale * x, x


def _min_value_bwd(scale, x, g):
    del g  # the reference ignores the incoming deriv and sets -scale
    return (jnp.full_like(x, -scale),)


min_value.defvjp(_min_value_fwd, _min_value_bwd)


@jax.custom_vjp
def softmax_gradnorm(x: jax.Array) -> jax.Array:
    """`SoftmaxgradnormComponent` (`nnet-simple-component.cc:9684-9736`):
    row softmax whose input-gradient is rescaled by 100/num_cols."""
    return jax.nn.softmax(x, axis=-1)


def _sgn_fwd(x):
    y = jax.nn.softmax(x, axis=-1)
    return y, y


def _sgn_bwd(y, g):
    d = y * (g - jnp.sum(y * g, axis=-1, keepdims=True))
    return (d * (100.0 / y.shape[-1]),)


softmax_gradnorm.defvjp(_sgn_fwd, _sgn_bwd)


def input_vector_linear(linear: jax.Array, gains: jax.Array,
                        sizes: Sequence[int]) -> jax.Array:
    """`InputVectorLinearComponent` (`nnet-simple-component.cc:5379-5420`):
    per-frame gains (tiled across the linear features) multiply the linear
    part elementwise; output dim j sums a contiguous column range of size
    sizes[j].

    linear: [..., sum(sizes)]; gains: [..., G] with G dividing sum(sizes).
    """
    total = int(np.sum(sizes))
    assert linear.shape[-1] == total
    reps = total // gains.shape[-1]
    tiled = jnp.tile(gains, (1,) * (gains.ndim - 1) + (reps,))
    prod = linear * tiled
    bounds = np.concatenate([[0], np.cumsum(sizes)])
    segs = np.repeat(np.arange(len(sizes)), np.asarray(sizes))
    onehot = jnp.asarray(
        (segs[:, None] == np.arange(len(sizes))[None, :]).astype(np.float32)
    )
    del bounds
    return prod @ onehot


def linear_select_col(ids: jax.Array, params: jax.Array) -> jax.Array:
    """`LinearSelectColComponent` (`nnet-simple-component.cc:10355-10390`):
    per-frame integer id selects a column of the trainable matrix (an
    embedding lookup along columns, trained by scatter-add of out-derivs).

    ids: [B] int; params: [D, N] -> out [B, D]."""
    return jnp.take(params, ids.astype(jnp.int32), axis=1).T


def gumbel_softmax(logits: jax.Array, key: jax.Array, tau) -> jax.Array:
    """`GumbelSoftmaxComponent` (`nnet-simple-component.cc:9738-9855`):
    softmax((logits + G)/tau), G = -log(-log U)."""
    u = jax.random.uniform(key, logits.shape, minval=1e-20, maxval=1.0)
    g = -jnp.log(-jnp.log(u))
    return jax.nn.softmax((logits + g) / tau, axis=-1)


def argmax_onehot_st(logits: jax.Array) -> jax.Array:
    """`ArgmaxOnehotFunctionComponent` (`nnet-simple-component.cc:9859-9928`):
    hard argmax one-hot forward, straight-through (identity) gradient."""
    hard = jax.nn.one_hot(jnp.argmax(logits, axis=-1), logits.shape[-1],
                          dtype=logits.dtype)
    return logits + jax.lax.stop_gradient(hard - logits)


def sample_vec_and_kl(
    post_mean: jax.Array,
    post_std: jax.Array,
    prior_mean: jax.Array,
    prior_std: jax.Array,
    key: jax.Array,
    rand_per_frame: bool = False,
    test_mode: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """`BayesVecKLGaussianComponent` (`nnet-simple-component.cc:10536-10640`):
    per-frame latent draw z = post_mean + post_std*eps (eps shared across
    frames unless rand_per_frame; z = post_mean in test mode) plus the
    per-frame KL(q||p) of diagonal Gaussians:
      0.5 * sum_d [ (m_q-m_p)^2/s_p^2 + s_q^2/s_p^2 - log(s_q^2/s_p^2) - 1 ].

    All args [..., D]; returns (z [..., D], kl [...]).
    """
    std = jnp.maximum(post_std, 1e-20)
    pstd = jnp.maximum(prior_std, 1e-20)
    if test_mode:
        z = post_mean
    else:
        if rand_per_frame:
            eps = jax.random.normal(key, post_mean.shape)
        else:
            eps = jnp.broadcast_to(
                jax.random.normal(key, post_mean.shape[-1:]), post_mean.shape
            )
        z = post_mean + std * eps
    rate2 = jnp.square(std / pstd)
    diff2 = jnp.square((post_mean - prior_mean) / pstd)
    kl = 0.5 * jnp.sum(diff2 + rate2 - jnp.log(rate2 + 1e-20) - 1.0, axis=-1)
    return z, kl
