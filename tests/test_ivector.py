"""UBM + i-vector extractor tests on synthetic speaker-shifted data."""

import numpy as np
import pytest

from tdnnf_nas_tpu.data.ivector import (
    UbmConfig, IvectorConfig, train_ubm, train_ivector_extractor,
    extract_ivectors,
)
from tdnnf_nas_tpu.frontend.specaug import SpecAugmentConfig, spec_augment

import jax
import jax.numpy as jnp


def _speaker_corpus(num_spk=4, utts_per_spk=6, d=12, seed=0):
    rng = np.random.RandomState(seed)
    centers = rng.randn(8, d) * 2.0  # shared phonetic content
    spk_shift = rng.randn(num_spk, d) * 1.5
    utts, labels = [], []
    for s in range(num_spk):
        for _ in range(utts_per_spk):
            t = rng.randint(40, 80)
            comp = rng.randint(0, 8, t)
            utts.append((centers[comp] + spk_shift[s]
                         + rng.randn(t, d) * 0.4).astype(np.float32))
            labels.append(s)
    return utts, np.asarray(labels)


def test_ubm_trains():
    utts, _ = _speaker_corpus()
    pooled = np.concatenate(utts)
    ubm = train_ubm(pooled, UbmConfig(num_gauss=16, em_iters=4))
    assert ubm["means"].shape == (16, 12)
    np.testing.assert_allclose(ubm["weights"].sum(), 1.0, atol=1e-4)
    assert (ubm["vars"] > 0).all()


def test_ivectors_separate_speakers():
    utts, labels = _speaker_corpus()
    pooled = np.concatenate(utts)
    ubm = train_ubm(pooled, UbmConfig(num_gauss=16, em_iters=4))
    t_mat = train_ivector_extractor(utts, ubm, IvectorConfig(dim=8, em_iters=3))
    ivecs = extract_ivectors(utts, ubm, t_mat)
    assert ivecs.shape == (len(utts), 8)
    # same-speaker i-vectors closer than cross-speaker on average
    d_in, d_out = [], []
    for i in range(len(utts)):
        for j in range(i + 1, len(utts)):
            dist = np.linalg.norm(ivecs[i] - ivecs[j])
            (d_in if labels[i] == labels[j] else d_out).append(dist)
    assert np.mean(d_in) < np.mean(d_out), (np.mean(d_in), np.mean(d_out))


def test_spec_augment():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(3, 50, 20).astype(np.float32) + 5.0)
    cfg = SpecAugmentConfig(num_freq_masks=1, freq_mask_width=4,
                            num_time_masks=1, time_mask_width=10)
    y = np.asarray(spec_augment(x, cfg, jax.random.PRNGKey(0)))
    assert y.shape == x.shape
    # some entries masked to 0, most untouched
    masked = (y == 0.0).mean()
    assert 0.0 < masked < 0.5
    # different key => different mask
    y2 = np.asarray(spec_augment(x, cfg, jax.random.PRNGKey(1)))
    assert not np.array_equal(y, y2)
