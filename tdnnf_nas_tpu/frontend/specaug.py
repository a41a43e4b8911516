"""SpecAugment-style on-the-fly time/frequency masking.

Equivalent of the reference fork's `SpecMaskOnlineComponent`
(`nnet-simple-component.h:3244` — on-the-fly freq/time masking inside the
network).  Here it is a pure functional transform on feature batches under
jit, applied by the data pipeline or the train step.
"""

from __future__ import annotations

import dataclasses
from functools import partial


import jax
import jax.numpy as jnp

from tdnnf_nas_tpu.core.config import Config


@dataclasses.dataclass(frozen=True)
class SpecAugmentConfig(Config):
    num_freq_masks: int = 2
    freq_mask_width: int = 8  # max bins per mask
    num_time_masks: int = 2
    time_mask_width: int = 20  # max frames per mask
    mask_value: float = 0.0


@partial(jax.jit, static_argnames=("cfg",))
def spec_augment(feats: jax.Array, cfg: SpecAugmentConfig, key: jax.Array):
    """[B, T, F] -> masked copy; masks drawn independently per sequence."""
    b, t, f = feats.shape
    keys = jax.random.split(key, 4)

    def band_mask(starts, widths, size):
        # [B, M] starts/widths -> [B, size] multiplicative keep-mask
        idx = jnp.arange(size)[None, None, :]
        inside = (idx >= starts[..., None]) & (idx < (starts + widths)[..., None])
        return ~jnp.any(inside, axis=1)

    fw = jax.random.randint(keys[0], (b, cfg.num_freq_masks), 0,
                            cfg.freq_mask_width + 1)
    fs = jax.random.randint(keys[1], (b, cfg.num_freq_masks), 0,
                            jnp.maximum(f - fw, 1))
    keep_f = band_mask(fs, fw, f)  # [B, F]

    tw = jax.random.randint(keys[2], (b, cfg.num_time_masks), 0,
                            cfg.time_mask_width + 1)
    ts = jax.random.randint(keys[3], (b, cfg.num_time_masks), 0,
                            jnp.maximum(t - tw, 1))
    keep_t = band_mask(ts, tw, t)  # [B, T]

    keep = keep_t[:, :, None] & keep_f[:, None, :]
    return jnp.where(keep, feats, cfg.mask_value)
