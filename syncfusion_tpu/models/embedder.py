"""Embedder facades with the reference CLAP call surface."""

from __future__ import annotations

import numpy as np


class ZeroEmbedder:
    """Zero-valued (B, 1, E) embeddings — for smoke tests and unconditional
    ablations; keeps the pipeline shape-identical without CLAP weights."""

    def __init__(self, embedding_features: int = 512):
        self.embedding_features = embedding_features

    def embed_audio(self, wav: np.ndarray) -> np.ndarray:
        return np.zeros((np.asarray(wav).shape[0], 1, self.embedding_features), np.float32)

    def embed_text(self, texts: list[str]) -> np.ndarray:
        return np.zeros((len(texts), 1, self.embedding_features), np.float32)


def build_embedder(model_cfg: dict):
    """embedder config node → embedder instance.

    ``embedder: null`` or ``amodel: none`` → ZeroEmbedder; otherwise CLAP
    (HTSAT-tiny) with the configured checkpoint."""
    node = model_cfg.get("embedder")
    features = model_cfg.get("model", {}).get("embedding_features", 512)
    if node is None or node.get("amodel") in (None, "none"):
        return ZeroEmbedder(features)
    from syncfusion_tpu.models.clap import ClapEmbedder

    return ClapEmbedder(
        checkpoint_path=model_cfg.get("embedder_checkpoint"),
        tokenizer_path=model_cfg.get("tokenizer_path"),
        enable_fusion=node.get("enable_fusion", False),
        amodel=node.get("amodel", "HTSAT-tiny"),
    )
