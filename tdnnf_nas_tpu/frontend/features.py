"""Feature frontend: Kaldi-compatible log-mel filterbank (fbank) and MFCC.

TPU-native equivalent of the reference's feature extraction
(`steps/make_fbank_40.sh` over ``compute-fbank-feats`` with
`conf/fbank_40.conf`: 8 kHz, 40 mel bins, hamming window, 64–3800 Hz, dither;
and `conf/mfcc_hires.conf`: 40-dim high-res MFCC).  Everything is batched,
static-shape jnp: framing is a gather, the spectrum is XLA's rfft, the mel
projection is a single dense matmul (MXU), so a whole batch of utterances is
one fused pipeline under jit instead of a per-utterance C++ binary.

Pipeline per frame (matching Kaldi's compute-fbank-feats defaults):
  dither -> remove DC -> (optional raw-energy) -> preemphasis -> window
  -> pad to FFT size -> |rfft|^2 -> mel filterbank -> log.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tdnnf_nas_tpu.core.config import Config


@dataclasses.dataclass(frozen=True)
class FbankConfig(Config):
    """Matches `conf/fbank_40.conf` defaults (reference `conf/fbank_40.conf:1-8`)."""

    sample_freq: int = 8000
    frame_length_ms: float = 25.0
    frame_shift_ms: float = 10.0
    num_mel_bins: int = 40
    low_freq: float = 64.0
    high_freq: float = 3800.0  # absolute; <=0 means offset from Nyquist
    dither: float = 1.0
    preemph_coeff: float = 0.97
    remove_dc_offset: bool = True
    window_type: str = "hamming"  # hamming | povey | hanning | rectangular
    round_to_power_of_two: bool = True
    use_log_fbank: bool = True
    use_energy: bool = False
    energy_floor: float = 0.0
    snip_edges: bool = True

    @property
    def frame_length(self) -> int:
        return int(self.sample_freq * self.frame_length_ms / 1000.0)

    @property
    def frame_shift(self) -> int:
        return int(self.sample_freq * self.frame_shift_ms / 1000.0)

    @property
    def fft_size(self) -> int:
        n = self.frame_length
        if self.round_to_power_of_two:
            return 1 << (n - 1).bit_length()
        return n


@dataclasses.dataclass(frozen=True)
class MfccConfig(FbankConfig):
    """Matches `conf/mfcc_hires.conf` (8 kHz, 40 bins, 40 cepstra, 40–3800 Hz)."""

    num_ceps: int = 40
    num_mel_bins: int = 40
    low_freq: float = 40.0
    high_freq: float = -200.0
    cepstral_lifter: float = 22.0
    use_energy: bool = False


@dataclasses.dataclass(frozen=True)
class FrontendConfig(Config):
    fbank: FbankConfig = dataclasses.field(default_factory=FbankConfig)
    cmvn: str = "utterance"  # none | utterance | sliding
    cmvn_window: int = 600
    norm_vars: bool = False


def num_frames(num_samples: int, cfg: FbankConfig) -> int:
    """Number of frames for snip-edges=true framing."""
    if num_samples < cfg.frame_length:
        return 0
    return 1 + (num_samples - cfg.frame_length) // cfg.frame_shift


def _mel_scale(freq):
    return 1127.0 * np.log1p(np.asarray(freq) / 700.0)


def mel_filterbank(cfg: FbankConfig) -> np.ndarray:
    """[num_mel_bins, fft_size//2+1] triangular mel weights, Kaldi-style.

    Bin m has a triangle between mel centers m-1 .. m+1 over the mel-warped
    FFT bin frequencies; low/high cutoffs per config (high<=0 interpreted as
    Nyquist+high, as in Kaldi and `conf/mfcc_hires.conf:8`).
    """
    nyquist = cfg.sample_freq / 2.0
    high = cfg.high_freq if cfg.high_freq > 0 else nyquist + cfg.high_freq
    low = cfg.low_freq
    if not (0 <= low < high <= nyquist):
        raise ValueError(f"bad mel range [{low}, {high}] for nyquist {nyquist}")
    nfft = cfg.fft_size
    nbins = nfft // 2 + 1
    mel_low, mel_high = _mel_scale(low), _mel_scale(high)
    # M+2 edge points -> M triangles
    edges = np.linspace(mel_low, mel_high, cfg.num_mel_bins + 2)
    fft_freqs = np.arange(nbins) * (cfg.sample_freq / nfft)
    mel_freqs = _mel_scale(fft_freqs)
    weights = np.zeros((cfg.num_mel_bins, nbins), dtype=np.float32)
    for m in range(cfg.num_mel_bins):
        left, center, right = edges[m], edges[m + 1], edges[m + 2]
        up = (mel_freqs - left) / (center - left)
        down = (right - mel_freqs) / (right - center)
        weights[m] = np.maximum(0.0, np.minimum(up, down))
    return weights


def _window(cfg: FbankConfig) -> np.ndarray:
    n = cfg.frame_length
    a = 2.0 * math.pi / (n - 1)
    i = np.arange(n)
    if cfg.window_type == "hamming":
        w = 0.54 - 0.46 * np.cos(a * i)
    elif cfg.window_type == "hanning":
        w = 0.5 - 0.5 * np.cos(a * i)
    elif cfg.window_type == "povey":
        w = (0.5 - 0.5 * np.cos(a * i)) ** 0.85
    elif cfg.window_type == "rectangular":
        w = np.ones(n)
    else:
        raise ValueError(f"unknown window {cfg.window_type}")
    return w.astype(np.float32)


def frame_signal(wav: jax.Array, cfg: FbankConfig, n_frames: int) -> jax.Array:
    """[..., N] samples -> [..., n_frames, frame_length] (snip-edges framing)."""
    idx = np.arange(n_frames)[:, None] * cfg.frame_shift + np.arange(cfg.frame_length)[None, :]
    return wav[..., idx]


def _power_spectrum(frames: jax.Array, cfg: FbankConfig, key: Optional[jax.Array]):
    """Shared fbank/mfcc front: returns (power_spec [...,T,nfft//2+1], log_energy)."""
    frames = frames.astype(jnp.float32)
    if cfg.dither > 0.0 and key is not None:
        frames = frames + cfg.dither * jax.random.normal(key, frames.shape, jnp.float32)
    if cfg.remove_dc_offset:
        frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    log_energy = jnp.log(jnp.maximum(jnp.sum(frames * frames, axis=-1), 1e-15))
    if cfg.preemph_coeff > 0.0:
        first = frames[..., :1] * (1.0 - cfg.preemph_coeff)
        rest = frames[..., 1:] - cfg.preemph_coeff * frames[..., :-1]
        frames = jnp.concatenate([first, rest], axis=-1)
    frames = frames * jnp.asarray(_window(cfg))
    nfft = cfg.fft_size
    spec = jnp.fft.rfft(frames, n=nfft, axis=-1)
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    return power, log_energy


@partial(jax.jit, static_argnames=("cfg", "n_frames"))
def compute_fbank(
    wav: jax.Array, cfg: FbankConfig, n_frames: int, key: Optional[jax.Array] = None
) -> jax.Array:
    """Log-mel filterbank features.

    Args:
      wav: [..., N] waveform (any float/int scale; Kaldi uses int16 range).
      cfg: FbankConfig.
      n_frames: static frame count (pad/truncate host-side; see num_frames).
      key: PRNG key for dither; None disables dither (deterministic eval).

    Returns:
      [..., n_frames, num_mel_bins] float32 (+1 col of log-energy if
      cfg.use_energy, prepended as Kaldi does).
    """
    frames = frame_signal(wav, cfg, n_frames)
    power, log_energy = _power_spectrum(frames, cfg, key)
    mel = jnp.asarray(mel_filterbank(cfg))
    feats = jnp.einsum("...tf,mf->...tm", power, mel)
    if cfg.use_log_fbank:
        feats = jnp.log(jnp.maximum(feats, 1e-15))
    if cfg.use_energy:
        feats = jnp.concatenate([log_energy[..., None], feats], axis=-1)
    return feats


def _dct_matrix(num_ceps: int, num_bins: int) -> np.ndarray:
    """DCT-II with orthonormal scaling, rows = cepstra (Kaldi ComputeDctMatrix)."""
    m = np.zeros((num_ceps, num_bins), dtype=np.float64)
    m[0, :] = math.sqrt(1.0 / num_bins)
    for k in range(1, num_ceps):
        m[k, :] = math.sqrt(2.0 / num_bins) * np.cos(
            math.pi / num_bins * (np.arange(num_bins) + 0.5) * k
        )
    return m.astype(np.float32)


def _lifter_coeffs(q: float, num_ceps: int) -> np.ndarray:
    i = np.arange(num_ceps)
    return (1.0 + 0.5 * q * np.sin(math.pi * i / q)).astype(np.float32)


@partial(jax.jit, static_argnames=("cfg", "n_frames"))
def compute_mfcc(
    wav: jax.Array, cfg: MfccConfig, n_frames: int, key: Optional[jax.Array] = None
) -> jax.Array:
    """High-resolution MFCC (`conf/mfcc_hires.conf`): log-mel -> DCT -> lifter."""
    frames = frame_signal(wav, cfg, n_frames)
    power, log_energy = _power_spectrum(frames, cfg, key)
    mel = jnp.asarray(mel_filterbank(cfg))
    logmel = jnp.log(jnp.maximum(jnp.einsum("...tf,mf->...tm", power, mel), 1e-15))
    dct = jnp.asarray(_dct_matrix(cfg.num_ceps, cfg.num_mel_bins))
    ceps = jnp.einsum("...tm,cm->...tc", logmel, dct)
    if cfg.cepstral_lifter > 0:
        ceps = ceps * jnp.asarray(_lifter_coeffs(cfg.cepstral_lifter, cfg.num_ceps))
    if cfg.use_energy:
        ceps = ceps.at[..., 0].set(log_energy)
    return ceps


def cmvn(feats: jax.Array, norm_vars: bool = False, mask: Optional[jax.Array] = None):
    """Per-utterance cepstral mean (and optional variance) normalization.

    mask: optional [..., T] validity mask for padded frames.
    """
    if mask is None:
        mean = jnp.mean(feats, axis=-2, keepdims=True)
        var = jnp.mean(feats**2, axis=-2, keepdims=True) - mean**2
    else:
        m = mask[..., None].astype(feats.dtype)
        denom = jnp.maximum(jnp.sum(m, axis=-2, keepdims=True), 1.0)
        mean = jnp.sum(feats * m, axis=-2, keepdims=True) / denom
        var = jnp.sum(feats**2 * m, axis=-2, keepdims=True) / denom - mean**2
    out = feats - mean
    if norm_vars:
        out = out * jax.lax.rsqrt(jnp.maximum(var, 1e-10))
    return out


def sliding_cmn(feats: jax.Array, window: int = 600, center: bool = True) -> jax.Array:
    """Sliding-window cepstral mean normalization (apply-cmvn-sliding equivalent).

    Uses a cumulative-sum formulation -> O(T) and static-shape friendly.
    feats: [..., T, D].
    """
    t = feats.shape[-2]
    cs = jnp.cumsum(feats, axis=-2)
    cs = jnp.concatenate([jnp.zeros_like(cs[..., :1, :]), cs], axis=-2)  # [..., T+1, D]
    idx = np.arange(t)
    if center:
        lo = np.maximum(idx - window // 2, 0)
        hi = np.minimum(idx + (window + 1) // 2, t)
        # widen truncated edge windows to min(window, t) frames, like Kaldi
        lo = np.minimum(lo, np.maximum(hi - window, 0))
        hi = np.maximum(hi, np.minimum(lo + window, t))
    else:
        lo = np.maximum(idx + 1 - window, 0)
        hi = idx + 1
    count = (hi - lo).astype(np.float32)[:, None]
    mean = (cs[..., hi, :] - cs[..., lo, :]) / count
    return feats - mean
