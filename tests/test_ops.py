"""TDNN splice op + semi-orthogonal constraint tests."""

import numpy as np
import jax
import jax.numpy as jnp

from tdnnf_nas_tpu.ops.tdnn import splice, spliced_linear
from tdnnf_nas_tpu.ops.semiorth import (
    semi_orthogonal_step,
    semi_orthogonal_step_3d,
    orthonormality_error,
)


def _ref_spliced(x, w, offsets, bias=None, coef=None):
    b, t, f = x.shape
    k, _, d = w.shape
    span = offsets[-1] - offsets[0]
    t_out = t - span
    out = np.zeros((b, t_out, d), dtype=np.float64)
    for i, o in enumerate(offsets):
        c = 1.0 if coef is None else coef[..., i]
        xs = x[:, (o - offsets[0]) : (o - offsets[0]) + t_out].astype(np.float64)
        if np.ndim(c) == 1:  # per-batch coef
            xs = xs * np.asarray(c)[:, None, None]
        else:
            xs = xs * c
        out += xs @ w[i].astype(np.float64)
    if bias is not None:
        out += bias
    return out


def test_splice_shapes():
    x = jnp.arange(2 * 7 * 3, dtype=jnp.float32).reshape(2, 7, 3)
    s = splice(x, (-2, 0, 1))
    assert s.shape == (2, 4, 9)
    # frame 0 of output sees input frames (0, 2, 3)
    np.testing.assert_allclose(np.asarray(s[0, 0]),
                               np.concatenate([np.asarray(x[0, 0]), np.asarray(x[0, 2]),
                                               np.asarray(x[0, 3])]))


def test_spliced_linear_matches_reference():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 10, 6).astype(np.float32)
    w = (rng.randn(3, 6, 4) * 0.1).astype(np.float32)
    bias = rng.randn(4).astype(np.float32)
    offsets = (-3, 0, 2)
    out = np.asarray(spliced_linear(jnp.asarray(x), jnp.asarray(w), offsets,
                                    bias=jnp.asarray(bias), compute_dtype=jnp.float32))
    ref = _ref_spliced(x, w, offsets, bias=bias)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_spliced_linear_with_coefs():
    rng = np.random.RandomState(1)
    x = rng.randn(2, 8, 5).astype(np.float32)
    w = (rng.randn(4, 5, 3) * 0.1).astype(np.float32)
    offsets = (0, 1, 2, 3)
    coef_shared = rng.rand(4).astype(np.float32)
    out = np.asarray(spliced_linear(jnp.asarray(x), jnp.asarray(w), offsets,
                                    coef=jnp.asarray(coef_shared),
                                    compute_dtype=jnp.float32))
    ref = _ref_spliced(x, w, offsets, coef=coef_shared[None].repeat(1, axis=0).squeeze(0))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)
    coef_batch = rng.rand(2, 4).astype(np.float32)
    out2 = np.asarray(spliced_linear(jnp.asarray(x), jnp.asarray(w), offsets,
                                     coef=jnp.asarray(coef_batch),
                                     compute_dtype=jnp.float32))
    ref2 = np.zeros_like(out2, dtype=np.float64)
    for i, o in enumerate(offsets):
        xs = x[:, (o - offsets[0]):(o - offsets[0]) + x.shape[1] - 3].astype(np.float64)
        ref2 += (xs * coef_batch[:, i][:, None, None]) @ w[i].astype(np.float64)
    np.testing.assert_allclose(out2, ref2, rtol=1e-4, atol=1e-4)


def test_semiorth_converges():
    rng = np.random.RandomState(2)
    w = jnp.asarray(rng.randn(160, 320).astype(np.float32) * 0.2)  # in > out? no: [in,out]
    # [in=160, out=320]: M = w (rows<cols after internal transpose handling)
    step = jax.jit(semi_orthogonal_step)
    for _ in range(30):
        w = step(w)
    assert float(orthonormality_error(w)) < 1e-3


def test_semiorth_fixed_scale():
    rng = np.random.RandomState(3)
    # init near the target scale — the fixed-scale update (like Kaldi's) is
    # a local iteration and diverges from far-away starts
    w = jnp.asarray(rng.randn(96, 48).astype(np.float32) * 0.1)
    for _ in range(40):
        w = semi_orthogonal_step(w, scale=1.0)
    m = np.asarray(w).T  # rows<cols
    p = m @ m.T
    np.testing.assert_allclose(p, np.eye(48), atol=1e-2)


def test_semiorth_3d():
    rng = np.random.RandomState(4)
    w = jnp.asarray((rng.randn(2, 64, 32) * 0.3).astype(np.float32))
    for _ in range(30):
        w = semi_orthogonal_step_3d(w)
    assert float(orthonormality_error(np.asarray(w).reshape(128, 32))) < 1e-3
