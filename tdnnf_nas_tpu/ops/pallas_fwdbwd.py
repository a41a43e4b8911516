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


# ---------------------------------------------------------------------------
# Fused superblocked denominator scan (the production composed-graph den).
#
# The XLA path (`ops/fwdbwd.forward_score_blocked`) runs the T-frame scan as
# T dispatch rounds, re-streaming the block weights and carrying residuals
# through HBM.  This kernel holds BOTH constant operands in VMEM for the
# whole scan — the [C, NSRC, NDP] f32 superblocks AND the bf16 one-hot
# permutation matrix (the dest->source subposition relabeling, exact via an
# in-kernel hi/lo split of the f32 operand) — and fuses the per-frame
# reshape-sum, permutation matmul, block matmuls, obs multiply and
# renormalization into one grid step.  The backward kernel implements the
# exact adjoint with the transposed constants (same recurrence as
# `_bwd_kernel` above, with the linear map L = blockmm . (perm . rsum (+)
# loop-slice)).
#
# Limitations (callers fall back to the XLA path): no broadcast (wildcard)
# term — the committed +-1 graphs use XLA — and constants must fit VMEM
# (~70-90 MB at the flagship shape; v5e has 128 MB).
# ---------------------------------------------------------------------------


def _blocked_shapes(c, nsrc, ndp, r):
    ndpos = (ndp - nsrc) // r
    return ndpos, c * ndpos, c * nsrc


def _blk_fwd_kernel(obs_ref, w_ref, p1hi_ref, initv_ref, finalv_ref,
                    initpos_ref, alphas_ref, logz_ref, cs_ref,
                    alpha_scr, acc_scr, *, leaky: float, t_total: int,
                    c: int, nsrc: int, ndp: int, r: int):
    ndpos, cnd, cs = _blocked_shapes(c, nsrc, ndp, r)
    t = pl.program_id(0)
    obs = obs_ref[0]  # [B, V] probability-space observations

    @pl.when(t == 0)
    def _():
        a0 = initv_ref[:] * obs
        c0 = jnp.maximum(jnp.sum(a0, axis=-1, keepdims=True), _TINY)
        alpha_scr[:] = a0 / c0
        acc_scr[:] = jnp.log(c0)
        cs_ref[0, 0] = c0[:, 0]

    @pl.when(t > 0)
    def _():
        alpha = alpha_scr[:]
        # per-subposition enter sums (r-major runs: slot j*ndpos+i)
        parts = []
        for ci in range(c):
            base = ci * ndp
            acc = alpha[:, base: base + ndpos]
            for j in range(1, r):
                acc = acc + alpha[:, base + j * ndpos: base + (j + 1) * ndpos]
            parts.append(acc)
        beta_dst = jnp.concatenate(parts, axis=-1)  # [B, CND]
        # dest -> source subposition permutation as an exact one-hot matmul
        hi = beta_dst.astype(jnp.bfloat16)
        lo = (beta_dst - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        beta = (jnp.dot(hi, p1hi_ref[:], preferred_element_type=jnp.float32)
                + jnp.dot(lo, p1hi_ref[:],
                          preferred_element_type=jnp.float32))  # [B, CS]
        # add loop-plane mass + leaky target mass
        loops = [alpha[:, ci * ndp + r * ndpos: (ci + 1) * ndp]
                 for ci in range(c)]
        beta = beta + jnp.concatenate(loops, axis=-1)
        if leaky > 0.0:
            beta = beta + leaky * initpos_ref[:]
        outs = []
        for ci in range(c):
            outs.append(jnp.dot(beta[:, ci * nsrc: (ci + 1) * nsrc],
                                w_ref[ci],
                                preferred_element_type=jnp.float32))
        a = jnp.concatenate(outs, axis=-1) * obs
        cn = jnp.maximum(jnp.sum(a, axis=-1, keepdims=True), _TINY)
        alpha_scr[:] = a / cn
        acc_scr[:] = acc_scr[:] + jnp.log(cn)
        cs_ref[0, 0] = cn[:, 0]

    alphas_ref[0] = alpha_scr[:]

    @pl.when(t == t_total - 1)
    def _():
        zfin = jnp.maximum(
            jnp.sum(alpha_scr[:] * finalv_ref[:], axis=-1, keepdims=True),
            _TINY)
        logz_ref[:] = acc_scr[:] + jnp.log(zfin)


def _blk_bwd_kernel(obs_ref, wt_ref, p1t_ref, finalv_ref, initpos_ref,
                    alphas_ref, cs_ref, gbar_ref, grad_ref, g_scr,
                    *, t_total: int, c: int, nsrc: int, ndp: int, r: int):
    """Grid over reversed time; grad_ref gets d logZ / d obs (prob space)
    TIMES obs (i.e. the log-space gradient alpha*bar_a); the wrapper
    divides by obs outside."""
    ndpos, cnd, cs = _blocked_shapes(c, nsrc, ndp, r)
    rt = pl.program_id(0)
    alpha_t = alphas_ref[0]
    gbar = gbar_ref[:]  # [B, 1]

    def l_transpose(v):
        """u = L^T(v): adjoint of beta->a blockmm, then perm/rsum/loop."""
        us = []
        for ci in range(c):
            us.append(jnp.dot(v[:, ci * ndp: (ci + 1) * ndp], wt_ref[ci],
                              preferred_element_type=jnp.float32))
        u = jnp.concatenate(us, axis=-1)  # [B, CS] = grad wrt beta
        # perm adjoint: g_betad = u @ P1^T (exact hi/lo one-hot)
        hi = u.astype(jnp.bfloat16)
        lo = (u - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        gbd = (jnp.dot(hi, p1t_ref[:], preferred_element_type=jnp.float32)
               + jnp.dot(lo, p1t_ref[:],
                         preferred_element_type=jnp.float32))  # [B, CND]
        # rsum adjoint: broadcast each subposition grad to its r slots;
        # loop-slice adjoint: u lands on the loop region directly
        parts = []
        for ci in range(c):
            gb = gbd[:, ci * ndpos: (ci + 1) * ndpos]
            for _ in range(r):
                parts.append(gb)
            parts.append(u[:, ci * nsrc: (ci + 1) * nsrc])
        return jnp.concatenate(parts, axis=-1)  # [B, V]

    @pl.when(rt == 0)
    def _():
        zfin = jnp.maximum(
            jnp.sum(alpha_t * finalv_ref[:], axis=-1, keepdims=True), _TINY)
        g = gbar * (finalv_ref[:] / zfin)
        bar_a = g - jnp.sum(g * alpha_t, axis=-1, keepdims=True) + gbar
        grad_ref[0] = alpha_t * bar_a
        g_scr[:] = bar_a

    @pl.when(rt > 0)
    def _():
        g = l_transpose(g_scr[:])
        bar_a = g - jnp.sum(g * alpha_t, axis=-1, keepdims=True) + gbar
        grad_ref[0] = alpha_t * bar_a
        g_scr[:] = bar_a

    # carrier for the next (older) frame: v = (bar_a_t / c_t) * obs_t
    cn = cs_ref[0, 0][:, None]
    g_scr[:] = (g_scr[:] / cn) * obs_ref[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def pallas_blocked_den_score(obs_virtual, w_blocks, p1, p1t, init_v,
                             final_v, init_pos, leaky: float, enter_pad: int):
    """logZ [B] from probability-space virtual observations [B, T, V].

    obs_virtual = exp(max-normalized log-out) gathered to the blocked
    layout; the caller re-adds the normalizer and owns the gather/exp
    autodiff.  p1/p1t: bf16 one-hot [CND+1, CS] / [CS, CND+1] permutation
    (extra zero row/col absorbs pad slots).
    """
    logz, _, _ = _blk_fwd_call(obs_virtual, w_blocks, p1, init_v, final_v,
                               init_pos, leaky, enter_pad)
    return logz


def _blk_fwd_call(obs_virtual, w_blocks, p1, init_v, final_v, init_pos,
                  leaky, enter_pad):
    b, t, v = obs_virtual.shape
    c, nsrc, ndp = w_blocks.shape
    obs_tm = jnp.moveaxis(obs_virtual.astype(jnp.float32), 1, 0)
    kernel = functools.partial(_blk_fwd_kernel, leaky=float(leaky),
                               t_total=t, c=c, nsrc=nsrc, ndp=ndp,
                               r=int(enter_pad))
    cnd = c * ((ndp - nsrc) // int(enter_pad))
    alphas, logz, cs = pl.pallas_call(
        kernel,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, b, v), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, nsrc, ndp), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(p1.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, v), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, v), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c * nsrc), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, b, v), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, b), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, b, v), jnp.float32),
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
            jax.ShapeDtypeStruct((t, 1, b), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, v), jnp.float32),
            pltpu.VMEM((b, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 2**20),
    )(obs_tm, w_blocks, p1, init_v[None, :], final_v[None, :],
      init_pos[None, :])
    return logz[:, 0], alphas, cs


def _blk_vjp_fwd(obs_virtual, w_blocks, p1, p1t, init_v, final_v, init_pos,
                 leaky, enter_pad):
    logz, alphas, cs = _blk_fwd_call(obs_virtual, w_blocks, p1, init_v,
                                     final_v, init_pos, leaky, enter_pad)
    return logz, (obs_virtual, w_blocks, p1t, final_v, init_pos, alphas, cs)


def _blk_vjp_bwd(leaky, enter_pad, res, gbar):
    obs_virtual, w_blocks, p1t, final_v, init_pos, alphas, cs = res
    b, t, v = obs_virtual.shape
    c, nsrc, ndp = w_blocks.shape
    obs_f32 = obs_virtual.astype(jnp.float32)
    obs_rev = jnp.flip(jnp.moveaxis(obs_f32, 1, 0), axis=0)
    alphas_rev = jnp.flip(alphas, axis=0)
    cs_rev = jnp.flip(cs, axis=0)
    gbar_b = gbar.astype(jnp.float32)[:, None]
    w_t = jnp.swapaxes(w_blocks, 1, 2)  # [C, NDP, NSRC]
    kernel = functools.partial(_blk_bwd_kernel, t_total=t, c=c, nsrc=nsrc,
                               ndp=ndp, r=int(enter_pad))
    grad_rev, = pl.pallas_call(
        kernel,
        grid=(t,),
        in_specs=[
            pl.BlockSpec((1, b, v), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, ndp, nsrc), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(p1t.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, v), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c * nsrc), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, v), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, b), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, b, v), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((t, b, v), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((b, v), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 2**20),
    )(obs_rev, w_t, p1t, final_v[None, :], init_pos[None, :], alphas_rev,
      cs_rev, gbar_b)
    grad_log = jnp.moveaxis(jnp.flip(grad_rev, axis=0), 0, 1)  # [B,T,V]
    # grad wrt probability-space obs: divide the log-space gradient by obs
    # (pads carry exactly-zero alpha => zero gradient; real slots are
    # floored at exp(_MIN_LOG_OBS))
    g_obs = (grad_log / jnp.maximum(obs_f32, 1e-30)).astype(
        obs_virtual.dtype)
    return (g_obs, None, None, None, None, None, None)


pallas_blocked_den_score.defvjp(_blk_vjp_fwd, _blk_vjp_bwd)
