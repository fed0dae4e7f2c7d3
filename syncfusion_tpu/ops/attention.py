"""Attention kernels.

Pallas flash attention for the UNet's attention levels.  Round-2 HLO
inspection showed XLA attention materializing the f32 (B, H, T, T) score
tensor — 1.07 GB per call at T=2048/B=8 — so flash is the serving-path
default (models/blocks.py ``use_flash``) and, with the custom VJP below,
available to training too: O(L) memory via online softmax forward and a
recompute-based backward (dq / dkv kernels), the standard flash-attention-2
scheme.

``flash_attention(q, k, v)`` — (B, L, H, D) layout, optional causal mask,
differentiable.  Falls back to XLA attention on non-TPU backends (interpret
mode is used in tests).
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


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _flash_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, block_k: int,
                  causal: bool, sm_scale: float):
    """One (batch·head, q_block) program: online-softmax over k blocks.

    Also emits the row logsumexp of the scaled logits (needed by the
    backward pass).
    """
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
    acc, m, l = jax.lax.fori_loop(0, upper, body, init)
    l_safe = jnp.maximum(l, 1e-30)
    o_ref[0] = (acc / l_safe).astype(o_ref.dtype)
    # lse carried as (bh, lq, 1): Mosaic requires the last-two block dims be
    # (8k, 128k) or full -- (1, block_q, 1) satisfies it, (1, block_q) doesn't
    lse_ref[0] = m + jnp.log(l_safe)


def _fold_heads(x):
    b, l, h, d = x.shape
    return jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, l, d)


def _unfold_heads(x, b, h):
    bh, l, d = x.shape
    return jnp.transpose(x.reshape(b, h, l, d), (0, 2, 1, 3))


def _flash_fwd(qf, kf, vf, causal, block_q, block_k, sm_scale, interpret):
    bh, lq, d = qf.shape
    lk = kf.shape[1]
    grid = (bh, lq // block_q)
    out, lse = pl.pallas_call(
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
        out_specs=(
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, lq, d), qf.dtype),
            jax.ShapeDtypeStruct((bh, lq, 1), jnp.float32),
        ),
        interpret=interpret,
    )(qf, kf, vf)
    return out, lse


# ---------------------------------------------------------------------------
# backward (recompute-based, flash-attention-2 scheme)
# ---------------------------------------------------------------------------

def _flash_bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                         dq_ref, *, block_k: int, causal: bool,
                         sm_scale: float):
    q = q_ref[0].astype(jnp.float32) * sm_scale
    do = do_ref[0].astype(jnp.float32)          # (block_q, d)
    lse = lse_ref[0]                             # (block_q, 1)
    delta = delta_ref[0]                         # (block_q, 1)
    block_q, d = q.shape
    kv_len = k_ref.shape[1]
    num_kb = kv_len // block_k
    q_idx = pl.program_id(1)

    def body(kb, dq):
        k = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if causal:
            q_pos = q_idx * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0
            )
            k_pos = kb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            s = jnp.where(q_pos >= k_pos, s, -1e30)
        p = jnp.exp(s - lse)                     # (block_q, block_k)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta)
        return dq + jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    if causal:
        upper = jax.lax.div((q_idx + 1) * block_q + block_k - 1, block_k)
        upper = jnp.minimum(upper, num_kb)
    else:
        upper = num_kb
    dq = jax.lax.fori_loop(0, upper, body, jnp.zeros((block_q, d), jnp.float32))
    dq_ref[0] = (dq * sm_scale).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                          dk_ref, dv_ref, *, block_q: int, causal: bool,
                          sm_scale: float):
    k = k_ref[0].astype(jnp.float32)             # (block_k, d)
    v = v_ref[0].astype(jnp.float32)
    block_k, d = k.shape
    q_len = q_ref.shape[1]
    num_qb = q_len // block_q
    k_idx = pl.program_id(1)

    def body(qb, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(qb * block_q, block_q), :].astype(jnp.float32) * sm_scale
        do = do_ref[0, pl.ds(qb * block_q, block_q), :].astype(jnp.float32)
        lse = lse_ref[0, pl.ds(qb * block_q, block_q), :]
        delta = delta_ref[0, pl.ds(qb * block_q, block_q), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (block_q, block_k)
        if causal:
            q_pos = qb * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0
            )
            k_pos = k_idx * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            s = jnp.where(q_pos >= k_pos, s, -1e30)
        p = jnp.exp(s - lse)
        dv = dv + jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta)
        dk = dk + jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return dk, dv

    if causal:
        # q blocks strictly before the diagonal contribute nothing
        lower = jax.lax.div(k_idx * block_k, block_q)
    else:
        lower = 0
    dk, dv = jax.lax.fori_loop(
        lower, num_qb, body,
        (jnp.zeros((block_k, d), jnp.float32), jnp.zeros((block_k, d), jnp.float32)),
    )
    dk_ref[0] = dk.astype(dk_ref.dtype)  # q was pre-scaled -> dk already scaled
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _flash_bwd(qf, kf, vf, of, lse, dof, causal, block_q, block_k, sm_scale,
               interpret):
    bh, lq, d = qf.shape
    lk = kf.shape[1]
    delta = jnp.sum(
        dof.astype(jnp.float32) * of.astype(jnp.float32), axis=-1, keepdims=True
    )  # (bh, lq, 1)

    dq = pl.pallas_call(
        functools.partial(
            _flash_bwd_dq_kernel, block_k=block_k, causal=causal,
            sm_scale=sm_scale,
        ),
        grid=(bh, lq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, lq, d), qf.dtype),
        interpret=interpret,
    )(qf, kf, vf, dof, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(
            _flash_bwd_dkv_kernel, block_q=block_q, causal=causal,
            sm_scale=sm_scale,
        ),
        grid=(bh, lk // block_k),
        in_specs=[
            pl.BlockSpec((1, lq, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lq, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lq, 1), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lq, 1), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bh, lk, d), kf.dtype),
            jax.ShapeDtypeStruct((bh, lk, d), vf.dtype),
        ),
        interpret=interpret,
    )(qf, kf, vf, dof, lse, delta)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# public API (differentiable)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash(qf, kf, vf, causal, block_q, block_k, interpret):
    sm_scale = 1.0 / math.sqrt(qf.shape[-1])
    out, _ = _flash_fwd(qf, kf, vf, causal, block_q, block_k, sm_scale,
                        interpret)
    return out


def _flash_fwd_rule(qf, kf, vf, causal, block_q, block_k, interpret):
    sm_scale = 1.0 / math.sqrt(qf.shape[-1])
    out, lse = _flash_fwd(qf, kf, vf, causal, block_q, block_k, sm_scale,
                          interpret)
    return out, (qf, kf, vf, out, lse)


def _flash_bwd_rule(causal, block_q, block_k, interpret, res, dout):
    qf, kf, vf, of, lse = res
    sm_scale = 1.0 / math.sqrt(qf.shape[-1])
    return _flash_bwd(qf, kf, vf, of, lse, dout, causal, block_q, block_k,
                      sm_scale, interpret)


_flash.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    causal: bool = False,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool = False,
) -> jax.Array:
    """(B, L, H, D) flash attention; L must be divisible by the block sizes.
    Differentiable (custom VJP with recompute-based backward kernels)."""
    b, lq, h, d = q.shape
    lk = k.shape[1]
    assert lq % block_q == 0 and lk % block_k == 0, "pad L to block multiple"
    qf, kf, vf = _fold_heads(q), _fold_heads(k), _fold_heads(v)
    out = _flash(qf, kf, vf, causal, block_q, block_k, interpret)
    return _unfold_heads(out, b, h)


def attention_reference(q, k, v, causal: bool = False) -> jax.Array:
    """XLA attention in the same (B, L, H, D) layout, for fallback/tests."""
    return jax.nn.dot_product_attention(q, k, v, is_causal=causal)
