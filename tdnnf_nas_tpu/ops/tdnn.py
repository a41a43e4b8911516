"""Time-delay (spliced) linear ops — the TDNN hot path.

TPU-native equivalent of the reference's `TdnnComponent` /
`TdnnDARTSV3Component` propagate math (`src/nnet3/nnet-tdnn-component.cc:
214-333`): y[t] = sum_k coef_k * x[t + offset_k] @ W_k + b.  Like Kaldi's
strided sub-matrix views + K separate `AddMatMat` GEMMs, the K shifted
time-slices each hit the MXU as their own [B*T, F] x [F, D] matmul, summed
on the output.  Each slice is a contiguous view of x (offset on the T axis),
so XLA aliases it into the dot with no copy — measured ~an order of
magnitude faster fwd+bwd than concatenating the slices into one
[B*T, K*F] x [K*F, D] GEMM, whose concat materialization degrades the MXU
pipeline in both directions.

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
        `nnet-tdnn-component.cc:292-328`).  By linearity applied to each
        offset's GEMM output: y = sum_k coef_k * (x_k @ W_k).
      compute_dtype: MXU dtype (bf16); accumulation/output is f32.

    Returns: [B, T - span, D] float32.
    """
    offsets = tuple(offsets)
    k, f, d = w.shape
    assert k == len(offsets), (w.shape, offsets)
    span = offsets[-1] - offsets[0]
    t_out = x.shape[1] - span
    xc = x.astype(compute_dtype)
    wc = w.astype(compute_dtype)
    if coef is not None and coef.ndim == 2:
        coef = coef[:, :, None, None]  # [B, K, 1, 1]
    out = None
    for i, o in enumerate(offsets):
        part = xc[:, (o - offsets[0]) : (o - offsets[0]) + t_out]
        y = jnp.matmul(part, wc[i], preferred_element_type=jnp.float32)
        if coef is not None:
            y = y * (coef[i] if coef.ndim == 1 else coef[:, i])
        out = y if out is None else out + y
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out
