"""CondFoleyGen baseline datasets on the processed Greatest Hits layout.

Behavioral port of CondFoleyGen/specvqgan/data/dataset_greatesthits.py:

  * ``GreatestHitsWaveDataset`` — one item per annotated onset: a 2-s
    22.05 kHz audio chunk starting at the onset time with optional random
    ±0.5 s shift (clamped to [0, duration − 2]); mono + zero-pad to the
    exact chunk length.
  * ``CondGreatestHitsWaveCondOnImage`` — additionally loads the 30 ref
    frames and a conditioning onset chunk from the same video (default) or a
    different one with probability ``p_outside_cond``; returns the stacked
    (cond+ref, H, W, 3) frame tensor.

Frames are channels-last float32; audio is (T,) float32 — the TPU layouts.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
from PIL import Image

from syncfusion_tpu.data.transforms import center_crop, normalize, resize
from syncfusion_tpu.ops.resample import resample
from syncfusion_tpu.ops.wav import read_wav


def _load_audio_chunk(path, sample_rate, offset_s, duration_s) -> np.ndarray:
    wav, sr = read_wav(path)
    y = wav.mean(axis=0)
    if sr != sample_rate:
        y = resample(y, sr, sample_rate)
    start = int(offset_s * sample_rate)
    target = int(duration_s * sample_rate)
    chunk = y[start : start + target]
    if chunk.shape[0] < target:  # Padding transform
        chunk = np.pad(chunk, (0, target - chunk.shape[0]))
    return chunk.astype(np.float32)


class GreatestHitsWaveDataset:
    def __init__(
        self,
        root_dir: str,
        split_file_path: str,
        data_to_use: float = 1.0,
        chunk_length_in_seconds: float = 2.0,
        sample_rate: int = 22050,
        rand_shift: bool = True,
        rand_shift_range=(-0.5, 0.5),
        audio_file_suffix: str = ".resampled.wav",
        annotations_file_suffix: str = ".times.csv",
        metadata_file_suffix: str = ".metadata.json",
        seed: int = 0,
    ):
        self.root = Path(root_dir)
        self.chunk_s = chunk_length_in_seconds
        self.sample_rate = sample_rate
        self.rand_shift = rand_shift
        self.shift_range = rand_shift_range
        self.audio_suffix = audio_file_suffix
        self.rng = np.random.default_rng(seed)

        samples = Path(split_file_path).read_text().splitlines()
        if data_to_use < 1.0:
            self.rng.shuffle(samples)
            samples = sorted(samples[: int(len(samples) * data_to_use)])
        self.list_samples = samples

        self.list_onsets: list[tuple[str, float, float]] = []
        self.dict_video_onsets: dict[str, list[int]] = {}
        self.video_fps: dict[str, float] = {}
        for sample in samples:
            ann = self.root / sample / f"{sample}{annotations_file_suffix}"
            meta = json.loads(
                (self.root / sample / f"{sample}{metadata_file_suffix}").read_text()
            )
            duration = meta["processed"]["video_duration"]
            # per-video fps (videos in one root can differ); frame_rate keeps
            # the last one for the common uniform-fps case
            self.video_fps[sample] = meta["processed"]["video_frame_rate"]
            self.frame_rate = self.video_fps[sample]
            for line in ann.read_text().splitlines():
                if not line.strip():
                    continue
                t = float(line.split(",")[0])
                self.dict_video_onsets.setdefault(sample, []).append(
                    len(self.list_onsets)
                )
                self.list_onsets.append((sample, t, duration))

    def __len__(self) -> int:
        return len(self.list_onsets)

    def _chunk_start(self, onset_time: float, duration: float) -> float:
        start = onset_time
        if self.rand_shift:
            start = max(start + self.rng.uniform(*self.shift_range), 0.0)
        return min(start, duration - self.chunk_s)

    def _audio(self, sample: str, start: float) -> np.ndarray:
        path = self.root / sample / "audio" / f"{sample}{self.audio_suffix}"
        return _load_audio_chunk(path, self.sample_rate, start, self.chunk_s)

    def __getitem__(self, idx: int) -> dict:
        sample, onset_time, duration = self.list_onsets[idx]
        start = self._chunk_start(onset_time, duration)
        audio = self._audio(sample, start)
        return {"image": audio, "file_path_wav_": str(self.root / sample)}

    def print(self) -> None:
        print(f"GreatestHitsWave: {len(self.list_samples)} videos, "
              f"{len(self.list_onsets)} onsets")


class CondGreatestHitsWaveCondOnImage(GreatestHitsWaveDataset):
    def __init__(self, *args, p_outside_cond: float = 0.0,
                 frame_file_suffix: str = ".jpg", frame_size: int = 112,
                 **kwargs):
        super().__init__(*args, **kwargs)
        self.p_outside_cond = p_outside_cond
        self.frame_file_suffix = frame_file_suffix
        self.frame_size = frame_size

    def _frames(self, sample: str, start_time: float) -> np.ndarray:
        fps = self.video_fps[sample]
        start_f = int(start_time * fps)
        end_f = int((start_time + self.chunk_s) * fps)
        frames_dir = self.root / sample / "frames"
        imgs = []
        for i in range(start_f, end_f):
            p = frames_dir / f"{sample}.frame_{i + 1:06d}{self.frame_file_suffix}"
            imgs.append(np.asarray(Image.open(p).convert("RGB"), np.float32) / 255.0)
        frames = np.stack(imgs)
        # default transform: Resize3D(128·s) → CenterCrop3D(112·s) → Normalize
        frames = resize(frames, round(self.frame_size * 128 / 112))
        frames = center_crop(frames, self.frame_size)
        return normalize(frames).astype(np.float32)

    def __getitem__(self, idx: int) -> dict:
        sample, onset_time, duration = self.list_onsets[idx]
        start = self._chunk_start(onset_time, duration)
        audio = self._audio(sample, start)
        frames = self._frames(sample, start)

        # conditioning chunk: different video w.p. p_outside_cond, else a
        # different onset of the same video
        if self.rng.random() < self.p_outside_cond:
            cond_idx = idx
            while self.list_onsets[cond_idx][0] == sample:
                cond_idx = int(self.rng.integers(0, len(self)))
        else:
            candidates = [i for i in self.dict_video_onsets[sample] if i != idx]
            cond_idx = int(self.rng.choice(candidates)) if candidates else idx
        cond_sample, cond_onset, cond_dur = self.list_onsets[cond_idx]
        cond_start = self._chunk_start(cond_onset, cond_dur)
        cond_audio = self._audio(cond_sample, cond_start)
        cond_frames = self._frames(cond_sample, cond_start)

        return {
            "image": audio,
            "cond_image": cond_audio,
            "feature": np.concatenate([cond_frames, frames], axis=0),
            "file_path_wav_": str(self.root / sample),
            "file_path_cond_wav_": str(self.root / cond_sample),
            # chunk start frames + per-video fps (reference
            # file_path_feats_[1] / file_path_cond_feats_[1],
            # dataset_greatesthits.py): the generation driver muxes output
            # videos from these offsets at each video's own frame rate.
            "start_frame_": int(start * self.video_fps[sample]),
            "cond_start_frame_": int(cond_start * self.video_fps[cond_sample]),
            "frame_rate_": float(self.video_fps[sample]),
            "cond_frame_rate_": float(self.video_fps[cond_sample]),
        }


def baseline_loader(dataset, batch_size: int, shuffle: bool = False,
                    drop_last: bool = False, seed: int = 0):
    """Simple batcher for the baseline datasets."""
    order = np.arange(len(dataset))
    if shuffle:
        np.random.default_rng(seed).shuffle(order)
    for s in range(0, len(order), batch_size):
        idx = order[s : s + batch_size]
        if len(idx) < batch_size and drop_last:
            return
        items = [dataset[int(i)] for i in idx]
        out = {}
        for k in items[0]:
            vals = [it[k] for it in items]
            out[k] = np.stack(vals) if isinstance(vals[0], np.ndarray) else vals
        yield out
