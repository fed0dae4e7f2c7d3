"""RNG stream management.

Training needs several independent random streams per step (diffusion time
sampling, noise, CFG dropout, data augmentation).  Torch gets these from
global mutable state; here each step consumes a fold of a single root key so
runs are exactly reproducible and shardable.
"""

from __future__ import annotations

import jax


class RngStream:
    """Deterministic per-(step, name) key derivation from a root seed."""

    def __init__(self, seed: int):
        self._root = jax.random.key(seed)

    def step_key(self, step: int) -> jax.Array:
        return jax.random.fold_in(self._root, step)

    def keys(self, step: int, names: tuple[str, ...]) -> dict[str, jax.Array]:
        base = self.step_key(step)
        return {
            name: jax.random.fold_in(base, i) for i, name in enumerate(names)
        }


def split_like(key: jax.Array, names: tuple[str, ...]) -> dict[str, jax.Array]:
    keys = jax.random.split(key, len(names))
    return dict(zip(names, keys))
