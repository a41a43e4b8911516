"""3-way speed perturbation (0.9 / 1.0 / 1.1), TPU-side.

Equivalent of the reference's `utils/data/perturb_data_dir_speed_3way.sh` step
(`Prepare_NAS_data.sh:10-30`), which resamples audio with sox.  Here the
resample is a linear-interpolation gather under jit so augmented copies never
touch the host.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def speed_perturb(wav: jax.Array, factor: float, out_len: int) -> jax.Array:
    """Resample [..., N] waveform by `factor` (playback speed).

    factor=0.9 -> slower/longer, 1.1 -> faster/shorter (matches sox `speed`).
    out_len is the static output length; callers pad/trim around
    int(N / factor).  Linear interpolation; for 8 kHz speech and factors near
    1.0 this matches polyphase resampling to well under feature noise floor.
    """
    n = wav.shape[-1]
    pos = jnp.arange(out_len, dtype=jnp.float32) * factor
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n - 1)
    hi = jnp.clip(lo + 1, 0, n - 1)
    frac = pos - lo.astype(jnp.float32)
    out = wav[..., lo] * (1.0 - frac) + wav[..., hi] * frac
    valid = (pos <= (n - 1)).astype(wav.dtype)
    return out * valid


def perturbed_length(n: int, factor: float) -> int:
    return int(np.floor(n / factor))
