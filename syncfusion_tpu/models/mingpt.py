"""minGPT (Flax) + feature-conditioned variant + AR sampling.

The CondFoleyGen stage-2 transformer (reference
specvqgan/modules/transformer/mingpt.py): vanilla GPT — token embedding +
learned positions, pre-LN blocks (causal MHA, 4× GELU MLP), final LN +
untied head.  GH config: vocab 1024, block 160, 24 layers, 16 heads, 1024
width (config/greatesthit_transformer...yaml:63-68).

``GPTFeats`` semantics: video features (B, T_c, 512) are projected by a
k=1 Conv (== Dense) to the embedding width and PREPENDED to the token
embeddings; positions span the combined sequence
(reference mingpt.py:190-221).

Sampling: single compiled ``lax.scan`` over a static-length token buffer;
each step runs a full causal forward and samples position prefix+k.  At
this model's scale (≤512-token sequences, 1024-wide), the full forward per
step is a handful of GFLOPs — latency is dispatch-bound, not FLOP-bound, so
the scan (one compiled program for the whole loop) is the right TPU shape;
a KV-cache variant is a later optimization, not a correctness need.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class GPTConfig:
    vocab_size: int = 1024
    block_size: int = 160
    n_layer: int = 24
    n_head: int = 16
    n_embd: int = 1024
    embd_pdrop: float = 0.0
    attn_pdrop: float = 0.0
    resid_pdrop: float = 0.0


class CausalSelfAttention(nn.Module):
    config: GPTConfig

    @nn.compact
    def __call__(self, x: jax.Array, return_att: bool = False):
        cfg = self.config
        b, t, c = x.shape
        hd = cfg.n_embd // cfg.n_head
        qkv = nn.Dense(3 * cfg.n_embd, name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(b, t, 3, cfg.n_head, hd), 3, axis=2)
        q, k, v = q[:, :, 0], k[:, :, 0], v[:, :, 0]
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
        mask = jnp.tril(jnp.ones((t, t), bool))
        logits = jnp.where(mask[None, None], logits, -1e10)
        att = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(b, t, c)
        out = nn.Dense(cfg.n_embd, name="proj")(out)
        if return_att:
            return out, att
        return out


class Block(nn.Module):
    config: GPTConfig

    @nn.compact
    def __call__(self, x: jax.Array, return_att: bool = False):
        h = CausalSelfAttention(self.config, name="attn")(
            nn.LayerNorm(epsilon=1e-5, name="ln1")(x), return_att=return_att
        )
        att = None
        if return_att:
            h, att = h
        x = x + h
        h = nn.LayerNorm(epsilon=1e-5, name="ln2")(x)
        h = nn.Dense(4 * self.config.n_embd, name="mlp_fc")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.config.n_embd, name="mlp_proj")(h)
        x = x + h
        if return_att:
            return x, att
        return x


class GPTFeats(nn.Module):
    """GPT conditioned on prepended (video) feature embeddings."""

    config: GPTConfig = GPTConfig()

    @nn.compact
    def __call__(
        self,
        tokens: jax.Array,
        feats: Optional[jax.Array] = None,
        return_att: bool = False,
    ):
        """tokens (B, T_z) int32, feats (B, T_c, F) → logits (B, T_c+T_z, V).

        ``return_att=True`` additionally returns the LAST block's attention
        probabilities (B, H, T, T) — the reference GPT returns exactly this
        for the ImageLogger attention grids (reference mingpt.py:115-175,
        image_logger.py:51-61)."""
        cfg = self.config
        tok = nn.Embed(cfg.vocab_size, cfg.n_embd, name="tok_emb")(tokens)
        if feats is not None:
            # Conv1d(k=1) projection of features (reference GPTFeats embedder)
            femb = nn.Dense(cfg.n_embd, name="feat_proj")(feats)
            x = jnp.concatenate([femb, tok], axis=1)
        else:
            x = tok
        t = x.shape[1]
        assert t <= cfg.block_size, f"sequence {t} > block {cfg.block_size}"
        pos = self.param(
            "pos_emb", nn.initializers.normal(0.02), (cfg.block_size, cfg.n_embd)
        )
        x = x + pos[None, :t]
        att = None
        for i in range(cfg.n_layer):
            last = i == cfg.n_layer - 1
            out = Block(cfg, name=f"h_{i}")(x, return_att=return_att and last)
            x, att = out if (return_att and last) else (out, att)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_f")(x)
        logits = nn.Dense(cfg.vocab_size, use_bias=False, name="head")(x)
        if return_att:
            return logits, att
        return logits


def top_k_filter(logits: jax.Array, k: int) -> jax.Array:
    vals = jax.lax.top_k(logits, k)[0]
    thresh = vals[..., -1:]
    return jnp.where(logits < thresh, -jnp.inf, logits)


def sample_tokens(
    apply_fn,
    params,
    feats: jax.Array,
    prefix: jax.Array,
    steps: int,
    key: jax.Array,
    temperature: float = 1.0,
    top_k: Optional[int] = None,
    greedy: bool = False,
) -> jax.Array:
    """Autoregressive sampling (reference sample loop semantics:
    av_cond_transformer.py:207-277 — per-step temperature, top-k filter,
    multinomial, appended to the context).

    prefix: (B, P) conditioning tokens (e.g. cond-audio codes).
    Returns (B, P + steps) with the sampled continuation.
    """
    b, p = prefix.shape
    buf = jnp.concatenate(
        [prefix, jnp.zeros((b, steps), prefix.dtype)], axis=1
    )

    def step(carry, i):
        buf, key = carry
        logits = apply_fn(params, buf, feats)  # (B, T_c + P + steps, V)
        cond_len = feats.shape[1] if feats is not None else 0
        # logits for the next token after position (p + i − 1) in buf space
        nxt = logits[:, cond_len + p + i - 1, :] / temperature
        if top_k is not None:
            nxt = top_k_filter(nxt, top_k)
        key, sub = jax.random.split(key)
        if greedy:
            tok = jnp.argmax(nxt, axis=-1)
        else:
            tok = jax.random.categorical(sub, nxt, axis=-1)
        buf = jax.lax.dynamic_update_slice(
            buf, tok[:, None].astype(buf.dtype), (0, p + i)
        )
        return (buf, key), None

    (buf, _), _ = jax.lax.scan(step, (buf, key), jnp.arange(steps))
    return buf
