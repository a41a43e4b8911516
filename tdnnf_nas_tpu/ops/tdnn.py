"""Time-delay (spliced) linear ops — the TDNN hot path.

TPU-native equivalent of the reference's `TdnnComponent` /
`TdnnDARTSV3Component` propagate math (`src/nnet3/nnet-tdnn-component.cc:
214-333`): y[t] = sum_k coef_k * x[t + offset_k] @ W_k + b.  Kaldi realizes
the splice with strided sub-matrix views + K separate `AddMatMat` GEMMs; here
the K shifted time-slices (static offsets => static slices) are concatenated
on the feature axis and hit the MXU as ONE large [B*T, K*F] x [K*F, D]
matmul, which XLA fuses with the slice/scale producers.

Valid-convolution semantics: outputs are produced only where all offsets are
in range, so each layer shrinks time by (max_offset - min_offset) — matching
nnet3's exact index computation (chunks carry their own context frames).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def splice(x: jax.Array, offsets: Sequence[int]) -> jax.Array:
    """[B, T, F] -> [B, T - span, K*F] by stacking shifted slices.

    offsets must be sorted ascending; span = offsets[-1] - offsets[0].
    Output frame t corresponds to input frame t - offsets[0].
    """
    offsets = tuple(offsets)
    span = offsets[-1] - offsets[0]
    t_out = x.shape[1] - span
    if t_out <= 0:
        raise ValueError(f"time dim {x.shape[1]} too short for offsets {offsets}")
    parts = [x[:, (o - offsets[0]) : (o - offsets[0]) + t_out] for o in offsets]
    return jnp.concatenate(parts, axis=-1)


def spliced_linear(
    x: jax.Array,
    w: jax.Array,
    offsets: Sequence[int],
    bias: Optional[jax.Array] = None,
    coef: Optional[jax.Array] = None,
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    """Spliced (time-delay) linear layer.

    Args:
      x: [B, T, F] input.
      w: [K, F, D] per-offset weights (K = len(offsets)).
      offsets: sorted time offsets (e.g. (-3, 0)).
      bias: optional [D].
      coef: optional per-offset mixing coefficients — [K] shared or [B, K]
        per-sequence (the DARTS branch weights, reference
        `nnet-tdnn-component.cc:292-328`).  Applied to the activations before
        the matmul so the whole thing stays one GEMM.
      compute_dtype: MXU dtype (bf16); accumulation/output is f32.

    Returns: [B, T - span, D] float32.
    """
    offsets = tuple(offsets)
    k, f, d = w.shape
    assert k == len(offsets), (w.shape, offsets)
    span = offsets[-1] - offsets[0]
    t_out = x.shape[1] - span
    xc = x.astype(compute_dtype)
    parts = [xc[:, (o - offsets[0]) : (o - offsets[0]) + t_out] for o in offsets]
    if coef is not None:
        coef = coef.astype(compute_dtype)
        if coef.ndim == 1:
            parts = [p * coef[i] for i, p in enumerate(parts)]
        else:
            parts = [p * coef[:, i][:, None, None] for i, p in enumerate(parts)]
    spliced = jnp.concatenate(parts, axis=-1)  # [B, T_out, K*F]
    out = jnp.matmul(
        spliced, w.reshape(k * f, d).astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out
