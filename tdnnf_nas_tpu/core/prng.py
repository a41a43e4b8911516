"""PRNG discipline.

All stochasticity in the framework (dither, dropout, Gumbel noise, uniform
path sampling, egs shuffling) flows from explicit `jax.random` keys.  This
replaces the reference's global C++ RNG (`RandInt`, `kaldi::RandUniform` used
for e.g. the every-~4-minibatches semi-orthogonal step, `nnet-utils.cc:1062`,
and Gumbel sampling, `nnet-tdnn-component.cc:256-268`) with reproducible,
jit-safe keys.
"""

from __future__ import annotations

from typing import Iterator

import jax


class KeySeq:
    """A mutable sequence of PRNG keys for host-side setup code.

    Inside jitted code, split keys functionally instead.
    """

    def __init__(self, seed_or_key):
        if isinstance(seed_or_key, int):
            self._key = jax.random.PRNGKey(seed_or_key)
        else:
            self._key = seed_or_key

    def next(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    def take(self, n: int) -> list:
        self._key, *subs = jax.random.split(self._key, n + 1)
        return list(subs)

    def __iter__(self) -> Iterator[jax.Array]:
        while True:
            yield self.next()


def fold_in_step(key: jax.Array, step) -> jax.Array:
    """Derive the per-step key used inside the jitted train step."""
    return jax.random.fold_in(key, step)
