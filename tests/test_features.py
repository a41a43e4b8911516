"""Frontend tests: fbank/MFCC vs an independent numpy reference."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tdnnf_nas_tpu.frontend import (
    FbankConfig,
    MfccConfig,
    compute_fbank,
    compute_mfcc,
    mel_filterbank,
    num_frames,
    cmvn,
    sliding_cmn,
)
from tdnnf_nas_tpu.frontend.speed_perturb import speed_perturb, perturbed_length


def _ref_fbank_frame(frame, cfg, mel):
    """Loop-based reference for a single frame (independent of features.py)."""
    x = frame.astype(np.float64).copy()
    x -= x.mean()
    # preemphasis
    y = np.empty_like(x)
    y[0] = x[0] - cfg.preemph_coeff * x[0]
    for i in range(1, len(x)):
        y[i] = x[i] - cfg.preemph_coeff * x[i - 1]
    n = len(y)
    w = 0.54 - 0.46 * np.cos(2 * math.pi * np.arange(n) / (n - 1))
    y = y * w
    spec = np.fft.rfft(y, n=cfg.fft_size)
    power = np.abs(spec) ** 2
    return np.log(np.maximum(mel @ power, 1e-15))


def test_fbank_matches_reference():
    cfg = FbankConfig(dither=0.0)
    rng = np.random.RandomState(0)
    wav = (rng.randn(4000) * 1000).astype(np.float32)
    t = num_frames(len(wav), cfg)
    assert t == 1 + (4000 - 200) // 80
    feats = np.asarray(compute_fbank(jnp.asarray(wav), cfg, t))
    assert feats.shape == (t, cfg.num_mel_bins)
    mel = mel_filterbank(cfg)
    for fi in [0, 5, t - 1]:
        frame = wav[fi * cfg.frame_shift : fi * cfg.frame_shift + cfg.frame_length]
        ref = _ref_fbank_frame(frame, cfg, mel.astype(np.float64))
        np.testing.assert_allclose(feats[fi], ref, rtol=1e-3, atol=1e-3)


def test_fbank_batched_and_dither():
    cfg = FbankConfig()
    rng = np.random.RandomState(1)
    wav = jnp.asarray(rng.randn(3, 2400).astype(np.float32) * 500)
    t = num_frames(2400, cfg)
    f1 = compute_fbank(wav, cfg, t, key=jax.random.PRNGKey(0))
    f2 = compute_fbank(wav, cfg, t, key=jax.random.PRNGKey(1))
    assert f1.shape == (3, t, 40)
    assert not np.allclose(f1, f2)  # dither differs per key
    assert np.isfinite(np.asarray(f1)).all()


def test_mel_filterbank_properties():
    cfg = FbankConfig()
    mel = mel_filterbank(cfg)
    assert mel.shape == (40, cfg.fft_size // 2 + 1)
    assert (mel >= 0).all()
    # bins outside [low, high] get no weight
    freqs = np.arange(mel.shape[1]) * cfg.sample_freq / cfg.fft_size
    outside = (freqs < cfg.low_freq) | (freqs > cfg.high_freq)
    assert mel[:, outside].sum() == 0
    # every filter has some support
    assert (mel.sum(axis=1) > 0).all()


def test_mfcc_shapes_and_dct():
    cfg = MfccConfig(dither=0.0)
    rng = np.random.RandomState(2)
    wav = jnp.asarray(rng.randn(2000).astype(np.float32) * 300)
    t = num_frames(2000, cfg)
    ceps = compute_mfcc(wav, cfg, t)
    assert ceps.shape == (t, 40)
    assert np.isfinite(np.asarray(ceps)).all()
    # full-dim orthonormal DCT preserves energy of the log-mel vector
    from tdnnf_nas_tpu.frontend.features import _dct_matrix

    d = _dct_matrix(40, 40)
    np.testing.assert_allclose(d @ d.T, np.eye(40), atol=1e-5)


def test_cmvn():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 50, 8).astype(np.float32) * 3 + 5)
    y = np.asarray(cmvn(x, norm_vars=True))
    np.testing.assert_allclose(y.mean(axis=1), 0.0, atol=1e-4)
    np.testing.assert_allclose(y.var(axis=1), 1.0, atol=1e-3)
    # masked variant ignores padding
    mask = np.ones((2, 50), np.float32)
    mask[:, 40:] = 0
    y2 = np.asarray(cmvn(x, mask=jnp.asarray(mask)))
    np.testing.assert_allclose((y2[:, :40]).mean(axis=1), 0.0, atol=1e-4)


def test_sliding_cmn_matches_naive():
    rng = np.random.RandomState(4)
    x = rng.randn(30, 4).astype(np.float32)
    out = np.asarray(sliding_cmn(jnp.asarray(x), window=10, center=True))
    t = 30
    for i in [0, 7, 15, 29]:
        lo, hi = max(i - 5, 0), min(i + 5, t)
        lo = min(lo, max(hi - 10, 0))
        hi = max(hi, min(lo + 10, t))
        np.testing.assert_allclose(out[i], x[i] - x[lo:hi].mean(axis=0), atol=1e-4)


def test_speed_perturb():
    rng = np.random.RandomState(5)
    wav = jnp.asarray(rng.randn(1000).astype(np.float32))
    for f in (0.9, 1.1):
        out_len = perturbed_length(1000, f)
        out = np.asarray(speed_perturb(wav, f, out_len))
        assert out.shape == (out_len,)
        # identity factor reproduces the signal
    out = np.asarray(speed_perturb(wav, 1.0, 1000))
    np.testing.assert_allclose(out, np.asarray(wav), atol=1e-6)
