"""RoBERTa-base text encoder (Flax) for the CLAP text tower.

Standard post-LayerNorm BERT architecture with RoBERTa specifics: learned
positions offset by ``padding_idx + 1`` (positions start at 2), vocab 50265,
12 layers / 12 heads / hidden 768, GELU.  CLAP pools the text tower with
mean-over-tokens? No — LAION CLAP uses the <s> (CLS) token's last hidden
state through a projection MLP; we follow that.

Tokenization requires the RoBERTa BPE vocab files; ``tokenize`` loads them
through ``transformers`` from a local path/cache (hermetic images can't
download — tests gate on availability).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class RobertaEmbeddings(nn.Module):
    vocab_size: int = 50265
    hidden: int = 768
    max_positions: int = 514
    type_vocab: int = 1
    pad_token_id: int = 1

    @nn.compact
    def __call__(self, input_ids: jax.Array) -> jax.Array:
        mask = (input_ids != self.pad_token_id).astype(jnp.int32)
        positions = jnp.cumsum(mask, axis=1) * mask + self.pad_token_id

        words = nn.Embed(self.vocab_size, self.hidden, name="word_embeddings")(input_ids)
        pos = nn.Embed(self.max_positions, self.hidden, name="position_embeddings")(positions)
        types = nn.Embed(self.type_vocab, self.hidden, name="token_type_embeddings")(
            jnp.zeros_like(input_ids)
        )
        x = words + pos + types
        return nn.LayerNorm(epsilon=1e-5, name="LayerNorm")(x)


class RobertaLayer(nn.Module):
    hidden: int = 768
    heads: int = 12
    intermediate: int = 3072  # 4·hidden in roberta-base

    @nn.compact
    def __call__(self, x: jax.Array, attn_mask: jax.Array) -> jax.Array:
        head_dim = self.hidden // self.heads

        def proj(name):
            return nn.Dense(self.hidden, name=name)

        q = proj("attention_q")(x).reshape(*x.shape[:2], self.heads, head_dim)
        k = proj("attention_k")(x).reshape(*x.shape[:2], self.heads, head_dim)
        v = proj("attention_v")(x).reshape(*x.shape[:2], self.heads, head_dim)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(head_dim)
        logits = logits + attn_mask[:, None, None, :]
        probs = jax.nn.softmax(logits, axis=-1)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(*x.shape)
        attn_out = nn.Dense(self.hidden, name="attention_out")(ctx)
        x = nn.LayerNorm(epsilon=1e-5, name="attention_norm")(x + attn_out)

        h = nn.Dense(self.intermediate, name="intermediate")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.hidden, name="output")(h)
        return nn.LayerNorm(epsilon=1e-5, name="output_norm")(x + h)


class RobertaModel(nn.Module):
    num_layers: int = 12
    hidden: int = 768
    heads: int = 12
    intermediate: int = 3072
    vocab_size: int = 50265
    max_positions: int = 514

    @nn.compact
    def __call__(self, input_ids: jax.Array, attention_mask: jax.Array) -> jax.Array:
        """Returns last hidden states (B, L, H)."""
        x = RobertaEmbeddings(hidden=self.hidden, vocab_size=self.vocab_size,
                              max_positions=self.max_positions,
                              name="embeddings")(input_ids)
        bias = (1.0 - attention_mask.astype(jnp.float32)) * -1e9
        for i in range(self.num_layers):
            x = RobertaLayer(hidden=self.hidden, heads=self.heads,
                             intermediate=self.intermediate,
                             name=f"layer_{i}")(x, bias)
        return x


_TOKENIZER = None


def tokenize(
    texts: list[str],
    max_length: int = 77,
    tokenizer_path: Optional[str] = None,
) -> dict[str, np.ndarray]:
    """RoBERTa BPE tokenization with a hermetic fallback chain.

    1. transformers AutoTokenizer (``tokenizer_path`` or the local
       roberta-base cache) — the reference pins transformers for this exact
       coupling (README.md:44-45).
    2. Pure-python byte-level BPE (models/clap/bpe.py) reading
       ``vocab.json``/``merges.txt`` next to ``tokenizer_path`` — identical
       ids, no transformers needed.
    3. Deterministic hashed fallback — NO files required; the text path
       runs hermetically (correct specials/shape/mask) but ids are not
       roberta ids.  Logged loudly; smoke/throughput use only.
    """
    global _TOKENIZER
    from syncfusion_tpu.models.clap import bpe

    if _TOKENIZER is None:
        try:
            from transformers import AutoTokenizer

            hf = AutoTokenizer.from_pretrained(
                tokenizer_path or "roberta-base",
                local_files_only=tokenizer_path is None,
            )

            def _hf(texts, max_length):
                enc = hf(texts, padding="max_length", truncation=True,
                         max_length=max_length, return_tensors="np")
                return {
                    "input_ids": np.asarray(enc["input_ids"]),
                    "attention_mask": np.asarray(enc["attention_mask"]),
                }

            _TOKENIZER = _hf
        except Exception as e:
            files = bpe.find_bpe_files(tokenizer_path)
            if files is not None:
                tok = bpe.ByteLevelBPE(*files)

                def _pure(texts, max_length):
                    return bpe.encode_batch(tok, texts, max_length)

                _TOKENIZER = _pure
            else:
                import logging

                logging.getLogger("syncfusion_tpu.clap").warning(
                    "no roberta tokenizer files available (%s) — using the "
                    "deterministic HASHED fallback: text conditioning runs "
                    "but token ids are NOT roberta ids (models/clap/bpe.py)",
                    e,
                )
                tok = bpe.HashedFallback()

                def _hashed(texts, max_length):
                    return bpe.encode_batch(tok, texts, max_length)

                _TOKENIZER = _hashed
    return _TOKENIZER(texts, max_length)
