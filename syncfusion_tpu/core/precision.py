"""Precision policy for TPU compute.

The reference trains in full fp32 (exp/train_diffusion_gh.yaml:86
``precision: 32``) with torch matmul precision "high"
(script/train_diffusion_model.py:18).  On TPU the MXU natively computes
bf16×bf16→f32; the right policy is bf16 compute with f32 parameters and
accumulation (the default here), with an f32 "parity" policy for numerical
comparison against reference checkpoints.
"""

from __future__ import annotations

import contextlib
import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Precision:
    param_dtype: Any = jnp.float32
    compute_dtype: Any = jnp.bfloat16
    output_dtype: Any = jnp.float32
    # jax matmul precision for parity-sensitive paths
    matmul_precision: str = "default"

    def cast_compute(self, tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(self.compute_dtype)
            if hasattr(x, "astype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )

    def cast_output(self, tree):
        return jax.tree_util.tree_map(
            lambda x: x.astype(self.output_dtype)
            if hasattr(x, "astype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )

    @contextlib.contextmanager
    def matmul_scope(self):
        with jax.default_matmul_precision(self.matmul_precision):
            yield


# Canonical policies.
DEFAULT = Precision()  # bf16 compute / f32 params: throughput
PARITY = Precision(compute_dtype=jnp.float32, matmul_precision="highest")
FULL_BF16 = Precision(param_dtype=jnp.bfloat16, output_dtype=jnp.bfloat16)

_POLICIES = {"default": DEFAULT, "parity": PARITY, "bf16": FULL_BF16}


def policy(name: str = "default") -> Precision:
    try:
        return _POLICIES[name]
    except KeyError:
        raise ValueError(f"unknown precision policy {name!r}; have {list(_POLICIES)}")
