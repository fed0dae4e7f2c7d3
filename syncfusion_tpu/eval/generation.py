"""Dataset generation + GT preparation (the reference's eval entry points).

``generate_dataset`` mirrors main/generation.py:11-123: iterate the test
stream, build noise, encode onsets + embedding (audio or text), run the
150-step CFG sampler, optionally zero the pre-first-onset prefix, crop to
``cut_length``, resample, and write wavs with the same skip-if-exists resume
semantics.  ``prepare_gt_for_fad`` mirrors dataset_diffusion.py:146-197.

TPU notes: the sampler is compiled once for a fixed (batch, length); ragged
final batches are padded to the compiled batch size and the padding rows are
dropped at save time.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Callable, Iterable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from syncfusion_tpu.core.logging import get_logger
from syncfusion_tpu.data.sfx_dataset import SfxItem, collate
from syncfusion_tpu.models.syncfusion import SyncFusionDiffusion
from syncfusion_tpu.ops.resample import resample
from syncfusion_tpu.ops.wav import write_wav

log = get_logger(__name__)

EmbedAudioFn = Callable[[np.ndarray], np.ndarray]  # (B, L, 1) -> (B, 1, E)
EmbedTextFn = Callable[[list[str]], np.ndarray]    # [str] -> (B, 1, E)


def _batches(dataset: Iterable[SfxItem], batch_size: int) -> Iterator[dict]:
    buf: list[SfxItem] = []
    for item in dataset:
        buf.append(item)
        if len(buf) == batch_size:
            yield collate(buf)
            buf = []
    if buf:
        yield collate(buf)


def generate_dataset(
    experiment_path: str | Path,
    model: SyncFusionDiffusion,
    params: dict,
    dataset: Iterable[SfxItem],
    embed_audio: Optional[EmbedAudioFn] = None,
    embed_text: Optional[EmbedTextFn] = None,
    batch_size: int = 16,
    sample_rate: int = 48000,
    num_steps: int = 150,
    length: int = 2**18,
    embedding_scale: float = 7.5,
    guidance_interval=None,
    sampler: str = "ddim",
    deep_cache_interval: int = 0,
    deep_split: int = 4,
    deep_cache_pow: float = 1.0,
    cut_prefix: bool = False,
    cond_text: bool = False,
    one_chunk_per_track: bool = False,
    cut_length: Optional[int] = None,
    downsample_rate: Optional[int] = None,
    save_cond: bool = False,
    seed: int = 0,
) -> None:
    cut_length = cut_length or length
    experiment_path = Path(experiment_path)
    experiment_path.mkdir(exist_ok=True, parents=True)
    emb_features = model.unet.embedding_features

    @jax.jit
    def _sample(params, noise, onsets, embedding):
        return model.sample(
            params, noise, onsets, embedding,
            num_steps=num_steps, embedding_scale=embedding_scale,
            guidance_interval=(tuple(guidance_interval)
                               if guidance_interval else None),
            sampler=sampler,
            deep_cache_interval=deep_cache_interval,
            deep_split=deep_split,
            deep_cache_pow=deep_cache_pow,
        )

    root_key = jax.random.key(seed)
    chunk_id = 0
    t_start, clips_done = time.perf_counter(), 0
    for batch_idx, batch in enumerate(_batches(dataset, batch_size)):
        n_valid = batch["wav"].shape[0]
        filenames = batch["filename"]

        # -------- resume: skip batches whose outputs already exist --------
        if not one_chunk_per_track:
            last_path = experiment_path / f"{chunk_id + n_valid - 1}.wav"
            if last_path.exists():
                log.info("Skipping batch ending at %s", last_path)
                chunk_id += n_valid
                continue
        else:
            last_name = filenames[-1].split("/")[-1]
            if (experiment_path / f"{last_name}.wav").exists():
                log.info("Skipping existing %s", last_name)
                continue

        # -------- pad ragged final batch to the compiled shape ------------
        def pad(x: np.ndarray) -> np.ndarray:
            if x.shape[0] == batch_size:
                return x
            reps = [(0, batch_size - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
            return np.pad(x, reps)

        onsets = pad(batch["onsets"])

        if cond_text and embed_text is not None:
            texts = list(batch["text"]) + [""] * (batch_size - n_valid)
            embedding = np.asarray(embed_text(texts))
        elif embed_audio is not None:
            embedding = np.asarray(embed_audio(pad(batch["cond"])))
        else:
            embedding = np.zeros((batch_size, 1, emb_features), np.float32)

        noise = jax.random.normal(
            jax.random.fold_in(root_key, batch_idx), (batch_size, length, 1)
        )
        gen = np.asarray(
            _sample(params, noise, jnp.asarray(onsets), jnp.asarray(embedding))
        )[:n_valid, :, 0]

        # -------- post-process + save --------------------------------------
        for i in range(n_valid):
            out = gen[i]
            if cut_prefix:
                nz = np.nonzero(batch["onsets"][i, :, 0])[0]
                if nz.size:
                    out = out.copy()
                    out[: nz[0]] = 0.0
            out = out[:cut_length]
            out_sr = sample_rate
            cond_wav = batch["cond"][i, :, 0]
            if downsample_rate:
                out = resample(out, sample_rate, downsample_rate)
                cond_wav = resample(cond_wav, sample_rate, downsample_rate)
                out_sr = downsample_rate

            if one_chunk_per_track:
                stem = filenames[i].split("/")[-1]
            else:
                stem = str(chunk_id)
                chunk_id += 1
            if save_cond and cond_text:
                stem = f"{stem}_{batch['text'][i]}"
            write_wav(experiment_path / f"{stem}.wav", out, out_sr)
            if save_cond and not cond_text:
                write_wav(experiment_path / f"{stem}_cond.wav", cond_wav, out_sr)
        clips_done += n_valid
        elapsed = time.perf_counter() - t_start
        log.info(
            "generated batch %d (%d clips) — %.1f clips/min (%.1f 8s-clips/min)",
            batch_idx, n_valid, clips_done / elapsed * 60.0,
            clips_done * (length / sample_rate / 8.0) / elapsed * 60.0,
        )


def prepare_gt_for_fad(
    experiment_path: str | Path,
    dataset: Iterable[SfxItem],
    batch_size: int = 16,
    sample_rate: int = 48000,
    one_chunk_per_track: bool = False,
    downsample_rate: Optional[int] = None,
) -> None:
    """Dump ground-truth chunks as wavs for FAD scoring
    (reference dataset_diffusion.py:146-197)."""
    experiment_path = Path(experiment_path)
    experiment_path.mkdir(exist_ok=True, parents=True)
    chunk_id = 0
    for batch in _batches(dataset, batch_size):
        wavs = batch["wav"][:, :, 0]
        for i in range(wavs.shape[0]):
            out, out_sr = wavs[i], sample_rate
            if downsample_rate:
                out = resample(out, sample_rate, downsample_rate)
                out_sr = downsample_rate
            if one_chunk_per_track:
                stem = batch["filename"][i].split("/")[-1]
            else:
                stem = str(chunk_id)
                chunk_id += 1
            path = experiment_path / f"{stem}.wav"
            if path.exists():
                continue
            write_wav(path, out, out_sr)
