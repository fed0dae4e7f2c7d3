"""AV-conditional transformer (CondFoleyGen stage 2).

Behavioral port of ``Net2NetTransformerAVCond``
(CondFoleyGen/specvqgan/models/av_cond_transformer.py): a frozen SpecVQGAN
tokenizes 2-s mel specs into 5×10 grids (column-major order so generation
proceeds in time), a frozen keep-temporal R(2+1)D-18 extracts per-frame
video features for the cond+ref 60-frame stack, and a trainable GPT models
p(ref tokens | cond tokens, video features).

Includes the patch-wise sliding-window sampler used for longer-than-2 s
generation (W_scale — reference audio_generation_scripts.py:238-309): the
5×(10·2W) grid is generated in column patches, each conditioned on a
window of previously generated columns.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from syncfusion_tpu.models.mingpt import GPTConfig, GPTFeats, sample_tokens
from syncfusion_tpu.models.mingpt_decode import sample_tokens_cached
from syncfusion_tpu.models.onset_net import R2Plus1D18KeepTemp
from syncfusion_tpu.models.vqgan.model import SpecVQGAN, VQModel

GRID_H, GRID_W = 5, 10  # token grid of one 2-s clip
CLIP = GRID_H * GRID_W  # 50


def column_major(indices: jax.Array) -> jax.Array:
    """(B, 5, 10) grid → (B, 50) column-major (time-major) sequence
    (reference permuter.py ColumnMajor)."""
    return jnp.swapaxes(indices, 1, 2).reshape(indices.shape[0], -1)


def column_major_inverse(seq: jax.Array, w: int = GRID_W) -> jax.Array:
    """(B, H·w) sequence → (B, 5, w) grid."""
    b = seq.shape[0]
    return jnp.swapaxes(seq.reshape(b, w, GRID_H), 1, 2)


@dataclasses.dataclass(frozen=True)
class AVCondTransformer:
    first_stage: SpecVQGAN = dataclasses.field(
        default_factory=lambda: SpecVQGAN(VQModel())
    )
    gpt: GPTFeats = dataclasses.field(default_factory=lambda: GPTFeats(GPTConfig()))
    clip: int = CLIP
    pkeep: float = 1.0

    # ------------------------------------------------------------- setup
    def init(self, key: jax.Array, n_frames: int = 60) -> dict:
        k1, k2, k3 = jax.random.split(key, 3)
        vq_params = self.first_stage.init(k1)
        video_net = R2Plus1D18KeepTemp()

        def _init_video():
            return video_net.init(
                k2, jnp.zeros((1, n_frames // 2, 112, 112, 3)), train=False
            )

        video_vars = jax.jit(_init_video)()

        def _init_gpt():
            toks = jnp.zeros((1, 2 * self.clip - 1), jnp.int32)
            feats = jnp.zeros((1, n_frames, 512))
            return self.gpt.init(k3, toks, feats)

        gpt_params = jax.jit(_init_gpt)()
        return {"vq": vq_params, "video": video_vars, "gpt": gpt_params}

    # ----------------------------------------------------------- encoders
    def encode_to_z(self, params: dict, spec: jax.Array) -> jax.Array:
        """(B, 80, 160, 1) → (B, 50) column-major token ids (frozen VQ)."""
        idx = self.first_stage.encode_indices(params["vq"], spec)
        return jax.lax.stop_gradient(column_major(idx))

    def encode_to_c(self, params: dict, frames: jax.Array) -> jax.Array:
        """(B, 2T, H, W, 3) cond+ref frame stack → (B, 2T, 512) features.

        The reference encodes each half separately then concatenates
        (specvqgan/modules/video_model/r2plus1d_18.py:66-79)."""
        video_net = R2Plus1D18KeepTemp()
        t_half = frames.shape[1] // 2
        f1 = video_net.apply(params["video"], frames[:, :t_half], train=False)
        f2 = video_net.apply(params["video"], frames[:, t_half:], train=False)
        return jax.lax.stop_gradient(jnp.concatenate([f1, f2], axis=1))

    # ------------------------------------------------------------- train
    def loss(self, params: dict, spec: jax.Array, cond_spec: jax.Array,
             frames: jax.Array, key: Optional[jax.Array] = None) -> jax.Array:
        """CE on the ref half (reference forward:151-199)."""
        z = self.encode_to_z(params, spec)[:, : self.clip]
        zp = self.encode_to_z(params, cond_spec)[:, : self.clip]
        feats = self.encode_to_c(params, frames)
        tokens = jnp.concatenate([zp, z], axis=1)

        if key is not None and self.pkeep < 1.0:
            k1, k2 = jax.random.split(key)
            mask = jax.random.bernoulli(k1, self.pkeep, tokens.shape)
            rand = jax.random.randint(
                k2, tokens.shape, 0, self.gpt.config.vocab_size, tokens.dtype
            )
            tokens = jnp.where(mask, tokens, rand)

        logits = self.gpt.apply(params["gpt"], tokens[:, :-1], feats)
        cond_size = feats.shape[1]
        logits = logits[:, cond_size - 1 :][:, self.clip :]
        target = z
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, target[..., None], axis=-1)
        return jnp.mean(nll)

    # ------------------------------------------------------------ sample
    def sample(
        self,
        params: dict,
        cond_spec: jax.Array,
        frames: jax.Array,
        key: jax.Array,
        temperature: float = 1.0,
        top_k: Optional[int] = 512,
    ) -> jax.Array:
        """Generate ref tokens given cond audio + video → (B, 5, 10) grid."""
        zp = self.encode_to_z(params, cond_spec)[:, : self.clip]
        feats = self.encode_to_c(params, frames)
        # KV-cached decode: O(T·L) vs the naive O(T²·L) re-forward loop
        buf = sample_tokens_cached(
            params["gpt"], feats, zp, self.clip, key,
            config=self.gpt.config, temperature=temperature, top_k=top_k,
        )
        return column_major_inverse(buf[:, self.clip :])

    def decode_grid(self, params: dict, grid: jax.Array) -> jax.Array:
        """(B, 5, W') token grid → (B, 80, 16·W', 1) spectrogram."""
        return self.first_stage.decode_indices(params["vq"], grid)

    # --------------------------------------------------- training media
    def log_images(
        self,
        params: dict,
        spec: jax.Array,
        cond_spec: jax.Array,
        frames: jax.Array,
        key: jax.Array,
        temperature: float = 1.0,
        top_k: Optional[int] = 100,
    ) -> dict:
        """Validation media dict (reference ``log_images``,
        av_cond_transformer.py:315-426): inputs, VQ reconstructions, a
        "half" sample (first half of ref tokens given), a from-scratch
        sample, a deterministic (greedy) sample — each as (B, 80, 160, 1)
        spectrograms in [-1, 1] — plus the GPT's last-layer attention
        probabilities (B, H, T, T) for each sampling variant."""
        z = self.encode_to_z(params, spec)[:, : self.clip]
        zp = self.encode_to_z(params, cond_spec)[:, : self.clip]
        feats = self.encode_to_c(params, frames)
        if top_k is not None:  # reference default 100; clamp for tiny vocabs
            top_k = min(top_k, self.gpt.config.vocab_size)

        def _run(prefix, steps, key, greedy=False):
            buf = sample_tokens_cached(
                params["gpt"], feats, prefix, steps, key,
                config=self.gpt.config, temperature=temperature,
                top_k=top_k, greedy=greedy,
            )
            sampled = buf[:, self.clip :]  # ref half of the token stream
            grid = column_major_inverse(sampled)
            # last-layer attention of the full forward over the final
            # sequence — what the last sampling step attends to
            _, att = self.gpt.apply(
                params["gpt"], buf, feats, return_att=True
            )
            return self.decode_grid(params, grid), att

        k1, k2, k3 = jax.random.split(key, 3)
        half = jnp.concatenate([zp, z[:, : self.clip // 2]], axis=1)
        x_half, att_half = _run(half, self.clip - self.clip // 2, k1)
        x_nopix, att_nopix = _run(zp, self.clip, k2)
        x_det, att_det = _run(zp, self.clip, k3, greedy=True)

        return {
            "inputs": spec,
            "reconstructions": self.decode_grid(
                params, column_major_inverse(z)
            ),
            "samples_half": x_half,
            "samples_nopix": x_nopix,
            "samples_det": x_det,
            "att_half": att_half,
            "att_nopix": att_nopix,
            "att_det": att_det,
        }

    # ------------------------------------- sliding-window long generation
    def sample_long(
        self,
        params: dict,
        cond_grid: np.ndarray,
        feats: np.ndarray,
        w_scale: int,
        key: jax.Array,
        patch_cols: int = 10,
        window_cols: int = 10,
        temperature: float = 1.0,
        top_k: Optional[int] = 512,
        frames_per_col: Optional[float] = None,
    ) -> np.ndarray:
        """Sliding-window generation of a (5, 10·w_scale) grid.

        Host loop over column patches; each patch is one compiled
        ``sample_tokens`` call conditioned on the last ``window_cols``
        generated columns (reference 'half'/'last' slide window,
        audio_generation_scripts.py:238-309) and the time-aligned slice of
        video features.
        """
        total_cols = GRID_W * w_scale
        fpc = frames_per_col if frames_per_col else feats.shape[1] / (2 * total_cols)
        out_cols: list[np.ndarray] = []
        gen_seq = np.asarray(cond_grid).transpose(0, 2, 1).reshape(cond_grid.shape[0], -1)
        context = gen_seq[:, -window_cols * GRID_H :]
        produced = 0
        while produced < total_cols:
            n_cols = min(patch_cols, total_cols - produced)
            # video features for [cond window + patch] time span
            f_start = int(max(0, (produced - window_cols) + total_cols) * fpc)
            f_len = int((window_cols + n_cols) * fpc)
            f_slice = feats[:, f_start : f_start + f_len]
            if f_slice.shape[1] == 0:
                f_slice = feats[:, -1:]
            key, sub = jax.random.split(key)
            buf = sample_tokens_cached(
                params["gpt"], jnp.asarray(f_slice), jnp.asarray(context),
                n_cols * GRID_H, sub, config=self.gpt.config,
                temperature=temperature, top_k=top_k,
            )
            new = np.asarray(buf[:, context.shape[1] :])
            out_cols.append(new)
            produced += n_cols
            context = np.asarray(buf)[:, -window_cols * GRID_H :]

        seq = np.concatenate(out_cols, axis=1)
        b = seq.shape[0]
        return seq.reshape(b, total_cols, GRID_H).transpose(0, 2, 1)
