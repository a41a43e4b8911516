"""Real-audio ingestion path: wav write/read -> features."""

import os
import wave

import numpy as np
import jax

from tdnnf_nas_tpu.data.audio import read_wav, featurize_batch
from tdnnf_nas_tpu.frontend import FbankConfig, MfccConfig


def _write_wav(path, samples, sr=8000):
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(np.asarray(samples, "<i2").tobytes())


def test_wav_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    x = (rng.randn(8000) * 1000).astype(np.int16)
    p = str(tmp_path / "a.wav")
    _write_wav(p, x)
    y, sr = read_wav(p)
    assert sr == 8000
    np.testing.assert_array_equal(y, x.astype(np.float32))


def test_featurize_batch(tmp_path):
    rng = np.random.RandomState(1)
    wavs = [rng.randn(n).astype(np.float32) * 500 for n in (8000, 6000, 7200)]
    cfg = FbankConfig(dither=0.0)
    feats, counts = featurize_batch(wavs, cfg)
    assert feats.shape[0] == 3 and feats.shape[2] == 40
    assert counts == [1 + (n - 200) // 80 for n in (8000, 6000, 7200)]
    # CMVN applied over valid frames
    for i, c in enumerate(counts):
        np.testing.assert_allclose(feats[i, :c].mean(axis=0), 0.0, atol=1e-3)
    # speed perturb variant has different frame counts
    f2, c2 = featurize_batch(wavs, cfg, speed_factor=0.9)
    assert c2[0] > counts[0]
    # mfcc path
    f3, _ = featurize_batch(wavs, MfccConfig(dither=0.0), mfcc=True)
    assert f3.shape[2] == 40
