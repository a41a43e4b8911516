"""Real-audio ingestion: wav files -> batched features on TPU.

The entry point for real corpora (Switchboard-style): reads PCM wav
(stdlib, no external deps), batches utterances to a static length, and runs
the jitted fbank/MFCC pipeline (+ optional speed perturb) on device — the
role of the reference's `steps/make_fbank_40.sh` / `compute-fbank-feats`
per-utterance C++ jobs, but as one fused device computation per batch.
"""

from __future__ import annotations

import wave
from typing import List, Optional, Sequence, Tuple

import jax
import numpy as np

from tdnnf_nas_tpu.frontend.features import (
    FbankConfig,
    MfccConfig,
    compute_fbank,
    compute_mfcc,
    cmvn,
    num_frames,
)
from tdnnf_nas_tpu.frontend.speed_perturb import perturbed_length, speed_perturb


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    """Read a PCM wav file -> (float32 samples in int16 range, sample_rate)."""
    with wave.open(path, "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        width = w.getsampwidth()
        raw = w.readframes(n)
        ch = w.getnchannels()
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32)
    elif width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) * 256.0
    else:
        raise ValueError(f"unsupported sample width {width}")
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return x, sr


def featurize_batch(
    wavs: Sequence[np.ndarray],
    cfg: FbankConfig,
    key: Optional[jax.Array] = None,
    mfcc: bool = False,
    apply_cmvn: bool = True,
    speed_factor: Optional[float] = None,
) -> Tuple[np.ndarray, List[int]]:
    """Pad a list of waveforms to one static length, featurize on device.

    Returns (feats [B, T_max, D], frame_counts) — callers mask/slice with
    frame_counts.
    """
    if speed_factor and speed_factor != 1.0:
        out = []
        for w in wavs:
            ol = perturbed_length(len(w), speed_factor)
            out.append(np.asarray(speed_perturb(np.asarray(w, np.float32),
                                                speed_factor, ol)))
        wavs = out
    n_max = max(len(w) for w in wavs)
    batch = np.zeros((len(wavs), n_max), np.float32)
    counts = []
    for i, w in enumerate(wavs):
        batch[i, : len(w)] = w
        counts.append(num_frames(len(w), cfg))
    t_max = num_frames(n_max, cfg)
    fn = compute_mfcc if mfcc else compute_fbank
    feats = fn(batch, cfg, t_max, key)
    if apply_cmvn:
        mask = (np.arange(t_max)[None, :] < np.asarray(counts)[:, None])
        feats = cmvn(feats, mask=jax.numpy.asarray(mask.astype(np.float32)))
    return np.asarray(feats), counts
