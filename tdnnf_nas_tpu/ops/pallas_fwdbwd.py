"""Pallas TPU kernel: fused denominator forward-backward.

The make-or-break hot op of LF-MMI training (SURVEY.md §7.3.1).  The XLA
path (`ops/fwdbwd.forward_score`) runs the T-step scan as T separate
dispatches, re-streaming the [S,S] transition matrix from HBM every frame
and materializing per-step residuals for autodiff.  This kernel instead:

  * holds the transition matrix in VMEM for the WHOLE scan (grid=(T,) —
    TPU grid steps run sequentially on the core, constant-index blocks are
    fetched once, scratch persists, and the per-frame obs blocks
    auto-pipeline HBM->VMEM),
  * keeps alpha resident in VMEM across the time loop,
  * runs one [B,S] x [S,S] MXU matmul + VPU renormalize per frame,
  * saves the normalized alphas + per-frame scales for an equally fused
    backward kernel (custom_vjp) implementing the exact adjoint:

        abar_t      = g_t - (g_t . alpha_t) + gbar
        dL/dlogobs_t = alpha_t * abar_t              (posterior * gbar)
        g_{t-1}     = ((abar_t / c_t) * obs_t) @ M^T

    (per-frame posteriors sum to gbar — exactness tested against the XLA
    autodiff path).

Numerics match Kaldi's scaled-probability scheme (leaky-HMM included).
The kernel works on state-indexed, max-subtracted LOG observations; the
pdf gather and max-subtraction stay outside (XLA fuses them) so gradients
flow through them automatically.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TINY = 1e-30


def _mm_split(x, m):
    """f32 x [.., K] @ bf16 0/1 matrix m [K, N] with ~f32 exactness: hi/lo
    bf16 two-pass (each output is a selection/sum of exactly-representable
    terms, accumulated f32)."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return (jnp.matmul(hi, m, preferred_element_type=jnp.float32)
            + jnp.matmul(lo, m, preferred_element_type=jnp.float32))


@jax.custom_vjp
def _onehot_expand(x, onehot):
    """pdf->state expansion x @ onehot as MXU matmuls both ways.

    A minor-axis `take` lowers to thousands of dynamic slices and its
    transpose to a scatter into the [B,T,P] logits; this runs one big MXU
    dot each way, with hi/lo splits keeping both directions ~f32-exact.
    """
    return _mm_split(x, onehot)


def _onehot_expand_fwd(x, onehot):
    return _mm_split(x, onehot), onehot


def _onehot_expand_bwd(onehot, g):
    return _mm_split(g, onehot.T), None


_onehot_expand.defvjp(_onehot_expand_fwd, _onehot_expand_bwd)


def _fwd_kernel(obs_ref, trans_ref, init_ref, final_ref,
                alphas_ref, logz_ref, cs_ref,
                alpha_scr, acc_scr, *, leaky: float, t_total: int):
    t = pl.program_id(0)
    obs = jnp.exp(obs_ref[0])  # [B, S]

    @pl.when(t == 0)
    def _():
        a0 = init_ref[:] * obs  # [1,S]*[B,S]
        c0 = jnp.maximum(jnp.sum(a0, axis=-1, keepdims=True), _TINY)
        alpha_scr[:] = a0 / c0
        acc_scr[:] = jnp.log(c0)
        cs_ref[0, 0] = c0[:, 0]

    @pl.when(t > 0)
    def _():
        alpha = alpha_scr[:]
        if leaky > 0.0:
            alpha = alpha + leaky * init_ref[:]
        a = jnp.dot(alpha.astype(trans_ref.dtype), trans_ref[:],
                    preferred_element_type=jnp.float32) * obs
        c = jnp.maximum(jnp.sum(a, axis=-1, keepdims=True), _TINY)
        alpha_scr[:] = a / c
        acc_scr[:] = acc_scr[:] + jnp.log(c)
        cs_ref[0, 0] = c[:, 0]

    alphas_ref[0] = alpha_scr[:]

    @pl.when(t == t_total - 1)
    def _():
        zfin = jnp.maximum(
            jnp.sum(alpha_scr[:] * final_ref[:], axis=-1, keepdims=True), _TINY
        )
        logz_ref[:] = acc_scr[:] + jnp.log(zfin)


def _bwd_kernel(obs_ref, trans_t_ref, alphas_ref, cs_ref, final_ref, gbar_ref,
                grad_ref, g_scr, *, t_total: int):
    """Grid over reversed time: rt = 0 is frame T-1."""
    rt = pl.program_id(0)
    alpha_t = alphas_ref[0]
    gbar = gbar_ref[:]  # [B, 1]

    @pl.when(rt == 0)
    def _():
        zfin = jnp.maximum(
            jnp.sum(alpha_t * final_ref[:], axis=-1, keepdims=True), _TINY
        )
        g = gbar * (final_ref[:] / zfin)
        bar_a = g - jnp.sum(g * alpha_t, axis=-1, keepdims=True) + gbar
        grad_ref[0] = alpha_t * bar_a
        g_scr[:] = bar_a

    @pl.when(rt > 0)
    def _():
        g = jnp.dot(g_scr[:].astype(trans_t_ref.dtype), trans_t_ref[:],
                    preferred_element_type=jnp.float32)
        bar_a = g - jnp.sum(g * alpha_t, axis=-1, keepdims=True) + gbar
        grad_ref[0] = alpha_t * bar_a
        g_scr[:] = bar_a

    # carrier for the next (older) frame: v = (abar_t / c_t) * obs_t
    c = cs_ref[0, 0][:, None]
    g_scr[:] = (g_scr[:] / c) * jnp.exp(obs_ref[0])


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def pallas_den_score_state(obs_log_state, trans, init, final, leaky: float):
    """logZ [B] from state-indexed log-observations [B, T, S].

    obs_log_state must be pre-normalized (e.g. max-subtracted) so exp() is
    in range; the caller re-adds the normalizer to logZ.
    """
    logz, _, _ = _fwd_call(obs_log_state, trans, init, final, leaky)
    return logz


def _mm_dtype(s: int):
    """Transition-matrix VMEM dtype: f32 when it fits (<12MB incl. headroom),
    bf16 for big graphs (e.g. S=2208 biphone: 19.5MB f32 > 16MB VMEM)."""
    return jnp.float32 if s * s * 4 <= 12 * 2**20 else jnp.bfloat16


def _fwd_call(obs_log_state, trans, init, final, leaky):
    b, t, s = obs_log_state.shape
    obs_tm = jnp.moveaxis(obs_log_state.astype(jnp.float32), 1, 0)  # [T,B,S]
    kernel = functools.partial(_fwd_kernel, leaky=float(leaky), t_total=t)
    alphas, logz, cs = pl.pallas_call(
        kernel,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, b, s), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((s, s), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, b, s), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, b), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, b, s), jnp.float32),
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
            jax.ShapeDtypeStruct((t, 1, b), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, s), jnp.float32),
            pltpu.VMEM((b, 1), jnp.float32),
        ],
    )(obs_tm, trans.astype(_mm_dtype(s)), init.astype(jnp.float32)[None, :],
      final.astype(jnp.float32)[None, :])
    return logz[:, 0], alphas, cs


def _vjp_fwd(obs_log_state, trans, init, final, leaky):
    logz, alphas, cs = _fwd_call(obs_log_state, trans, init, final, leaky)
    return logz, (obs_log_state, trans, alphas, cs, final)


def _vjp_bwd(leaky, res, gbar):
    obs_log_state, trans, alphas, cs, final = res
    b, t, s = obs_log_state.shape
    obs_rev = jnp.flip(jnp.moveaxis(obs_log_state.astype(jnp.float32), 1, 0),
                       axis=0)
    alphas_rev = jnp.flip(alphas, axis=0)
    cs_rev = jnp.flip(cs, axis=0)
    gbar_b = gbar.astype(jnp.float32)[:, None]
    kernel = functools.partial(_bwd_kernel, t_total=t)
    grad_rev, = pl.pallas_call(
        kernel,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, b, s), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((s, s), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, s), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, b), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, b, s), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((t, b, s), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((b, s), jnp.float32)],
    )(obs_rev, trans.T.astype(_mm_dtype(s)), alphas_rev, cs_rev,
      final.astype(jnp.float32)[None, :], gbar_b)
    grad_log = jnp.moveaxis(jnp.flip(grad_rev, axis=0), 0, 1)  # [B,T,S]
    return (grad_log, None, None, None)


pallas_den_score_state.defvjp(_vjp_fwd, _vjp_bwd)


def pallas_forward_score(
    obs_logprob: jax.Array,
    trans: jax.Array,
    state_pdf: jax.Array,
    init: jax.Array,
    final: jax.Array,
    leaky_coef: float = 0.0,
) -> jax.Array:
    """Drop-in fused replacement for ops.fwdbwd.forward_score (shared dense
    graph, no mask — the denominator case)."""
    obs_logprob = obs_logprob.astype(jnp.float32)
    mx = jax.lax.stop_gradient(jnp.max(obs_logprob, axis=-1, keepdims=True))
    # emission floor — see ops/fwdbwd._MIN_LOG_OBS
    obs_norm = jnp.maximum(obs_logprob - mx, -30.0)
    # pdf -> state expansion as a one-hot MXU matmul: a minor-axis take
    # lowers to thousands of dynamic slices (and its transpose to a
    # scatter into the [B,T,P] logits) — the one-hot dot is one big MXU op
    # each way.  onehot is built from the static state_pdf every step
    # (13M-element compare, negligible) and contributes no gradient.
    p = obs_logprob.shape[-1]
    onehot = (state_pdf[None, :] == jnp.arange(p, dtype=state_pdf.dtype)[:, None]
              ).astype(jnp.bfloat16)
    obs_log_state = _onehot_expand(obs_norm, onehot)
    logz = pallas_den_score_state(obs_log_state, trans, init, final,
                                  float(leaky_coef))
    return logz + jnp.sum(mx[:, :, 0], axis=1)
