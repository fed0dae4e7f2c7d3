"""int16 round-trip quantization helpers.

The reference CLAP path quantizes audio through int16 before embedding
(reference: main/utils.py:22-28, used at main/module_diffusion.py:64-67) —
this is load-bearing for embedding parity, so the exact clamp/scale rules are
reproduced.  Works on numpy and jax arrays alike.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def float32_to_int16(x):
    xp = jnp if isinstance(x, jnp.ndarray) else np
    x = xp.clip(x, -1.0, 1.0)
    return (x * 32767.0).astype(xp.int16)


def int16_to_float32(x):
    xp = jnp if isinstance(x, jnp.ndarray) else np
    return (x / 32767.0).astype(xp.float32)


def int16_round_trip(x):
    """The exact CLAP-input quantization used by the reference."""
    return int16_to_float32(float32_to_int16(x))
