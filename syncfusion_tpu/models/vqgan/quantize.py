"""Vector quantizer with straight-through estimator (channels-last).

Loss semantics copied from the reference behaviorally
(specvqgan/modules/vqvae/quantize.py:80-87): ``||sg(e) − z||² +
β·||e − sg(z)||²`` with β=0.25, plus perplexity for codebook-usage logging.
Nearest-code search is a single (BHW, n_e) matmul — MXU-friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class VectorQuantizer(nn.Module):
    n_e: int = 1024
    e_dim: int = 256
    beta: float = 0.25

    @nn.compact
    def __call__(self, z: jax.Array):
        """z: (..., e_dim) channels-last. Returns (z_q, loss, info)."""
        def _init(key, shape, dtype=jnp.float32):
            # reference init: U(−1/n_e, 1/n_e)
            return jax.random.uniform(
                key, shape, dtype, -1.0 / self.n_e, 1.0 / self.n_e
            )

        codebook = self.param("embedding", _init, (self.n_e, self.e_dim))

        flat = z.reshape(-1, self.e_dim)
        d = (
            jnp.sum(flat**2, axis=1, keepdims=True)
            - 2.0 * flat @ codebook.T
            + jnp.sum(codebook**2, axis=1)[None, :]
        )
        indices = jnp.argmin(d, axis=1)
        z_q = codebook[indices].reshape(z.shape)

        loss = jnp.mean((jax.lax.stop_gradient(z_q) - z) ** 2) + self.beta * jnp.mean(
            (z_q - jax.lax.stop_gradient(z)) ** 2
        )
        z_q = z + jax.lax.stop_gradient(z_q - z)  # straight-through

        one_hot_mean = jnp.mean(
            jax.nn.one_hot(indices, self.n_e, dtype=jnp.float32), axis=0
        )
        perplexity = jnp.exp(
            -jnp.sum(one_hot_mean * jnp.log(one_hot_mean + 1e-10))
        )
        info = {
            "perplexity": perplexity,
            "indices": indices.reshape(z.shape[:-1]),
        }
        return z_q, loss, info

    def lookup(self, params, indices: jax.Array) -> jax.Array:
        """Code indices → embeddings (decode-from-indices path,
        reference get_codebook_entry)."""
        return params["params"]["embedding"][indices]
