"""Semi-orthogonal constraint for TDNN-F bottleneck factors.

TPU-native re-implementation of the reference's `ConstrainOrthonormal` /
`ConstrainOrthonormalInternal` (`src/nnet3/nnet-utils.cc:914-1077`):
periodically (every ~4 steps) nudge the constrained weight toward
M M^T = scale^2 I via

    M <- M - 4 * speed * (1/scale^2) * (M M^T - scale^2 I) M

with the floating-scale case (orthonormal_constraint < 0, as used by the
TDNN-F linear factor, `steps/libs/nnet3/xconfig/composite_layers.py:156`)
choosing scale^2 = tr((MM^T)^2)/tr(MM^T) and halving the update speed when
far from orthonormal, exactly mirroring the reference logic.

A pure jitted function of the weight; the trainer applies it under
`lax.cond(step % 4 == 0, ...)` (reference applies on RandInt(0,3)==0,
`nnet-utils.cc:1062`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def semi_orthogonal_step(w: jax.Array, scale: float = -1.0) -> jax.Array:
    """One constraint update on a 2-D weight.

    w: [in_dim, out_dim] (our convention: y = x @ w).  Kaldi constrains the
    [out, in] parameter matrix with rows <= cols; equivalently we constrain
    M = w^T, transposing further if needed so M has rows <= cols.
    """
    assert w.ndim == 2
    transposed = w.shape[0] >= w.shape[1]
    m = w.T if transposed else w  # rows <= cols
    m = m.astype(jnp.float32)

    p = jnp.matmul(m, m.T, preferred_element_type=jnp.float32)
    rows = p.shape[0]
    trace_p = jnp.trace(p)
    trace_p_p = jnp.sum(p * p)
    if scale < 0.0:  # floating scale (orthonormal-constraint = -1.0)
        scale2 = trace_p_p / trace_p
        ratio = trace_p_p * rows / (trace_p * trace_p)
        speed = jnp.where(ratio > 1.1, 0.125 * 0.125, jnp.where(ratio > 1.02, 0.5 * 0.125, 0.125))
    else:
        scale2 = jnp.asarray(scale * scale, jnp.float32)
        speed = jnp.asarray(0.125, jnp.float32)
    p_minus = p - scale2 * jnp.eye(rows, dtype=jnp.float32)
    m_new = m - (4.0 * speed / scale2) * jnp.matmul(
        p_minus, m, preferred_element_type=jnp.float32
    )
    return (m_new.T if transposed else m_new).astype(w.dtype)


def semi_orthogonal_step_3d(w: jax.Array, scale: float = -1.0) -> jax.Array:
    """Apply to a [K, F, D] spliced weight, treated as one [K*F, D] matrix
    (the splice dims together form the input dim, as in TdnnComponent)."""
    k, f, d = w.shape
    return semi_orthogonal_step(w.reshape(k * f, d), scale).reshape(k, f, d)


def orthonormality_error(w: jax.Array) -> jax.Array:
    """||M M^T / scale^2 - I||_F / rows diagnostic (floating scale)."""
    m = w.T if w.shape[0] >= w.shape[1] else w
    m = m.astype(jnp.float32)
    p = m @ m.T
    scale2 = jnp.sum(p * p) / jnp.trace(p)
    eye = jnp.eye(p.shape[0], dtype=jnp.float32)
    return jnp.sqrt(jnp.mean((p / scale2 - eye) ** 2))
