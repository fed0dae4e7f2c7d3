"""Attention kernels.

The flagship UNet only attends at ≤2048 tokens (after ≥128× downsampling),
where XLA's fused attention is already MXU-bound — so the default model path
uses ``jax.nn.dot_product_attention``.  This module adds a Pallas
flash-attention kernel for the long-context regime (full-rate attention
levels, future variants with longer clips): O(L) memory via online softmax,
blocked over VMEM tiles.

``flash_attention(q, k, v)`` — (B, L, H, D) layout, optional causal mask.
Falls back to XLA attention on non-TPU backends (interpret mode is used in
tests).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 256


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k: int, causal: bool,
                  sm_scale: float):
    """One (batch·head, q_block) program: online-softmax over k blocks."""
    q = q_ref[0].astype(jnp.float32) * sm_scale  # (block_q, d)
    block_q, d = q.shape
    kv_len = k_ref.shape[1]
    num_kb = kv_len // block_k

    q_idx = pl.program_id(1)

    def body(kb, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (block_q, block_k)
        if causal:
            q_pos = q_idx * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0
            )
            k_pos = kb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            s = jnp.where(q_pos >= k_pos, s, -1e30)
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_cur)
        p = jnp.exp(s - m_cur)
        l_cur = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return acc, m_cur, l_cur

    init = (
        jnp.zeros((block_q, d), jnp.float32),
        jnp.full((block_q, 1), -jnp.inf, jnp.float32),
        jnp.zeros((block_q, 1), jnp.float32),
    )
    if causal:
        # only k blocks up to (and including) the diagonal contribute
        upper = jax.lax.div((q_idx + 1) * block_q + block_k - 1, block_k)
        upper = jnp.minimum(upper, num_kb)
    else:
        upper = num_kb
    acc, _, l = jax.lax.fori_loop(0, upper, body, init)
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("causal", "block_q", "block_k", "interpret")
)
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    causal: bool = False,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool = False,
) -> jax.Array:
    """(B, L, H, D) flash attention; L must be divisible by the block sizes."""
    b, lq, h, d = q.shape
    lk = k.shape[1]
    assert lq % block_q == 0 and lk % block_k == 0, "pad L to block multiple"
    sm_scale = 1.0 / math.sqrt(d)

    # (B, L, H, D) → (B·H, L, D)
    def fold(x):
        return jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, x.shape[1], d)

    qf, kf, vf = fold(q), fold(k), fold(v)

    grid = (b * h, lq // block_q)
    out = pl.pallas_call(
        functools.partial(
            _flash_kernel, block_k=block_k, causal=causal, sm_scale=sm_scale
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, lq, d), q.dtype),
        interpret=interpret,
    )(qf, kf, vf)
    return jnp.transpose(out.reshape(b, h, lq, d), (0, 2, 1, 3))


def attention_reference(q, k, v, causal: bool = False) -> jax.Array:
    """XLA attention in the same (B, L, H, D) layout, for fallback/tests."""
    return jax.nn.dot_product_attention(q, k, v, is_causal=causal)
