"""KV-cached autoregressive decoding for :class:`GPTFeats`.

``sample_tokens`` (mingpt.py) re-runs the full causal forward per sampled
token — simple and correct, but O(T²·L) per clip.  This module implements
the production decode path: one prefill pass computes the conditioning +
prefix keys/values, then a ``lax.scan`` of single-token steps attends
against the cache — O(T·L).  Pure functions over the GPTFeats parameter
tree; numerically identical to the uncached sampler (tested greedy-vs-greedy).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from syncfusion_tpu.models.mingpt import GPTConfig, top_k_filter


def _ln(p, x):
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + 1e-5) * p["scale"] + p["bias"]


def _split_heads(x, n_head):
    b, t, c = x.shape
    return x.reshape(b, t, n_head, c // n_head)


def _embed_inputs(p, tokens, feats):
    """Combined (feats ++ tokens) embedding with positions."""
    tok = p["tok_emb"]["embedding"][tokens]
    if feats is not None:
        femb = feats @ p["feat_proj"]["kernel"] + p["feat_proj"]["bias"]
        x = jnp.concatenate([femb, tok], axis=1)
    else:
        x = tok
    return x + p["pos_emb"][None, : x.shape[1]]


def _block_full(bp, x, n_head):
    """Full-sequence block forward returning (y, k, v) for caching."""
    h = _ln(bp["ln1"], x)
    qkv = h @ bp["attn"]["qkv"]["kernel"] + bp["attn"]["qkv"]["bias"]
    c = x.shape[-1]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    qh, kh, vh = (_split_heads(t, n_head) for t in (q, k, v))
    t = x.shape[1]
    logits = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / np.sqrt(c // n_head)
    mask = jnp.tril(jnp.ones((t, t), bool))
    logits = jnp.where(mask[None, None], logits, -1e10)
    att = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", att, vh).reshape(x.shape)
    x = x + out @ bp["attn"]["proj"]["kernel"] + bp["attn"]["proj"]["bias"]
    h = _ln(bp["ln2"], x)
    h = jax.nn.gelu(h @ bp["mlp_fc"]["kernel"] + bp["mlp_fc"]["bias"],
                    approximate=False)
    x = x + h @ bp["mlp_proj"]["kernel"] + bp["mlp_proj"]["bias"]
    return x, kh, vh


def _block_step(bp, x, k_cache, v_cache, pos, n_head):
    """One-token block step; x (B, 1, C). Returns (y, new_k, new_v)."""
    h = _ln(bp["ln1"], x)
    qkv = h @ bp["attn"]["qkv"]["kernel"] + bp["attn"]["qkv"]["bias"]
    c = x.shape[-1]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    qh = _split_heads(q, n_head)[:, 0]           # (B, H, hd)
    kh = _split_heads(k, n_head)[:, 0]
    vh = _split_heads(v, n_head)[:, 0]
    k_cache = jax.lax.dynamic_update_slice(k_cache, kh[:, None], (0, pos, 0, 0))
    v_cache = jax.lax.dynamic_update_slice(v_cache, vh[:, None], (0, pos, 0, 0))
    logits = jnp.einsum("bhd,bkhd->bhk", qh, k_cache) / np.sqrt(c // n_head)
    valid = jnp.arange(k_cache.shape[1]) <= pos
    logits = jnp.where(valid[None, None], logits, -1e10)
    att = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhk,bkhd->bhd", att, v_cache).reshape(x.shape[0], 1, c)
    x = x + out @ bp["attn"]["proj"]["kernel"] + bp["attn"]["proj"]["bias"]
    h = _ln(bp["ln2"], x)
    h = jax.nn.gelu(h @ bp["mlp_fc"]["kernel"] + bp["mlp_fc"]["bias"],
                    approximate=False)
    x = x + h @ bp["mlp_proj"]["kernel"] + bp["mlp_proj"]["bias"]
    return x, k_cache, v_cache


def _layer_params(p, i):
    return p[f"h_{i}"]


@partial(jax.jit, static_argnames=("config", "steps", "top_k", "temperature",
                                   "greedy"))
def sample_tokens_cached(
    params,
    feats: Optional[jax.Array],
    prefix: jax.Array,
    steps: int,
    key: jax.Array,
    config: GPTConfig,
    temperature: float = 1.0,
    top_k: Optional[int] = None,
    greedy: bool = False,
) -> jax.Array:
    """KV-cached equivalent of :func:`mingpt.sample_tokens`."""
    p = params["params"]
    n_head = config.n_head
    b, pre = prefix.shape
    cond = feats.shape[1] if feats is not None else 0
    total = cond + pre + steps
    assert total <= config.block_size

    # ---- prefill -----------------------------------------------------
    x = _embed_inputs(p, prefix, feats)
    hd = config.n_embd // n_head
    k_caches, v_caches = [], []
    for i in range(config.n_layer):
        x, kh, vh = _block_full(_layer_params(p, i), x, n_head)
        pad = total - kh.shape[1]
        k_caches.append(jnp.pad(kh, ((0, 0), (0, pad), (0, 0), (0, 0))))
        v_caches.append(jnp.pad(vh, ((0, 0), (0, pad), (0, 0), (0, 0))))
    k_cache = jnp.stack(k_caches)  # (L, B, total, H, hd)
    v_cache = jnp.stack(v_caches)

    logits0 = _ln(p["ln_f"], x[:, -1:]) @ p["head"]["kernel"]

    def sample_from(logits, key):
        logits = logits[:, 0] / temperature
        if top_k is not None:
            logits = top_k_filter(logits, top_k)
        if greedy:
            return jnp.argmax(logits, axis=-1)
        return jax.random.categorical(key, logits, axis=-1)

    key, sub = jax.random.split(key)
    first = sample_from(logits0, sub)

    buf = jnp.concatenate(
        [prefix, jnp.zeros((b, steps), prefix.dtype)], axis=1
    )
    buf = buf.at[:, pre].set(first.astype(buf.dtype))

    def step(carry, i):
        buf, k_cache, v_cache, key = carry
        token = jax.lax.dynamic_slice(buf, (0, pre + i), (b, 1))[:, 0]
        pos = cond + pre + i
        x = p["tok_emb"]["embedding"][token][:, None] + \
            jax.lax.dynamic_slice(p["pos_emb"], (pos, 0), (1, config.n_embd))[None]
        new_k, new_v = [], []
        for l in range(config.n_layer):
            x, kc, vc = _block_step(
                _layer_params(p, l), x, k_cache[l], v_cache[l], pos, n_head
            )
            new_k.append(kc)
            new_v.append(vc)
        k_cache = jnp.stack(new_k)
        v_cache = jnp.stack(new_v)
        logits = _ln(p["ln_f"], x) @ p["head"]["kernel"]
        key, sub = jax.random.split(key)
        nxt = sample_from(logits, sub)
        buf = jax.lax.dynamic_update_slice(
            buf, nxt[:, None].astype(buf.dtype), (0, pre + i + 1)
        )
        return (buf, k_cache, v_cache, key), None

    if steps > 1:
        (buf, _, _, _), _ = jax.lax.scan(
            step, (buf, k_cache, v_cache, key), jnp.arange(steps - 1)
        )
    return buf
