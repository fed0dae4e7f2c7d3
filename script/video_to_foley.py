#!/usr/bin/env python
"""End-to-end video → Foley audio (the reference's full pipeline:
onset model predictions → onset track → conditioned diffusion sampling).

    python script/video_to_foley.py \
        --video_dir data/.../mic-mp4-processed/VIDEO_NAME \
        --onset_ckpt LOGDIR/ckpts --diffusion_ckpt RUNDIR/ckpts \
        [--cond_wav some.wav | --text "hitting metal"] \
        --output out.wav

Mirrors the test_onset_preds.tar protocol (SURVEY §3.4 + BASELINE config
#4): per-2s-chunk onset logits → raw-logit>0.5 + consecutive dedup →
times → 48 kHz binary onset track → 150-step CFG sampling.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from syncfusion_tpu.core.cache import enable_compile_cache
enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from syncfusion_tpu.core.checkpoint import Checkpointer, CheckpointConfig
from syncfusion_tpu.core.config import load_config
from syncfusion_tpu.core.logging import get_logger
from syncfusion_tpu.data.onset_dataset import GreatestHitsDataset
from syncfusion_tpu.models.embedder import build_embedder
from syncfusion_tpu.models.syncfusion import SyncFusionDiffusion
from syncfusion_tpu.ops.resample import resample
from syncfusion_tpu.ops.wav import read_wav, write_wav
from syncfusion_tpu.train.onset_trainer import OnsetTrainer

log = get_logger("video_to_foley")

SR = 48000
LENGTH = 2**18


def predict_onset_times(video_dir: Path, onset_ckpt: str | None,
                        layers=(2, 2, 2, 2)) -> np.ndarray:
    """Frames dir → onset times in seconds (reference test_step protocol)."""
    root = video_dir.parent
    name = video_dir.name
    split = video_dir.parent / f".tmp_split_{name}.txt"
    split.write_text(name + "\n")
    try:
        from syncfusion_tpu.data.transforms import FrameTransform
        from syncfusion_tpu.models.onset_net import VideoOnsetNet

        ds = GreatestHitsDataset(str(root), str(split),
                                 frames_transforms=FrameTransform(augment=False))
        trainer = OnsetTrainer(model=VideoOnsetNet(layers=tuple(layers)))
        item0 = ds[0]
        state = trainer.init(jax.random.key(0),
                             frames_shape=(1, *item0["frames"].shape))
        if onset_ckpt:
            state = Checkpointer(CheckpointConfig(directory=onset_ckpt)).restore(state)
        else:
            log.warning("no onset checkpoint — predictions are random")
        times = []
        for i in range(len(ds)):
            item = ds[i]
            logits = np.asarray(trainer.forward(state, item["frames"][None]))[0]
            pred = (logits > 0.5).astype(int)
            idx = np.nonzero(pred)[0].tolist()
            j = 0
            while j < len(idx) - 1:  # consecutive dedup (module_onset.py:169-172)
                if idx[j + 1] == idx[j] + 1:
                    del idx[j + 1]
                else:
                    j += 1
            times += [
                (k + item["start_frame"]) / item["frame_rate"] for k in idx
            ]
        return np.asarray(sorted(times))
    finally:
        split.unlink(missing_ok=True)


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--video_dir", required=True,
                    help="preprocessed {video}/ dir with frames/ + metadata")
    ap.add_argument("--onset_ckpt", default=None)
    ap.add_argument("--diffusion_ckpt", default=None)
    ap.add_argument("--clap_ckpt", default=None)
    ap.add_argument("--cond_wav", default=None, help="timbre reference audio")
    ap.add_argument("--text", default=None, help="text condition instead of audio")
    ap.add_argument("--output", default="foley.wav")
    ap.add_argument("--num_steps", type=int, default=150)
    ap.add_argument("--sampler", choices=("ddim", "dpm"), default="ddim",
                    help="ddim = reference VSampler semantics; dpm = "
                         "DPM-Solver++(2M), holds quality at several-fold "
                         "fewer --num_steps (models/diffusion.dpm_sample)")
    ap.add_argument("--embedding_scale", type=float, default=2.0)
    ap.add_argument("--guidance_interval", type=float, nargs=2, default=(0.2, 0.8),
                    metavar=("LO", "HI"),
                    help="apply CFG only for LO <= sigma <= HI (serving "
                         "default; measured better FAD/onset metrics AND "
                         "faster than always-on CFG). Pass '-1 -1' to "
                         "disable (reference-parity always-on CFG).")
    ap.add_argument("--deep_cache_interval", type=int, default=0,
                    help="DeepCache: recompute the UNet's deep half only "
                         "every K-th sampler step (0/1 = off; quality-gated "
                         "two seeds each: K=4 at the 150-step default, K=2 "
                         "at the fast point — docs/REHEARSAL.md §11-§12). "
                         "THE validated fast-serving config is --sampler dpm "
                         "--num_steps 32 --embedding_scale 1.5 "
                         "--deep_cache_interval 2 (with the default band).")
    ap.add_argument("--deep_split", type=int, default=4,
                    help="DeepCache split level: UNet levels >= this are "
                         "cached (must be < the model's level count)")
    ap.add_argument("--onset_layers", type=int, nargs=4, default=(2, 2, 2, 2))
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--mux_video", default=None,
                    help="also write an .mp4 with the generated audio muxed "
                         "onto --source_video (ffmpeg; reference "
                         "attach_audio_to_video parity)")
    ap.add_argument("--source_video", default=None,
                    help="source video file for --mux_video")
    ap.add_argument("--mux_fps", type=int, default=15)
    ap.add_argument("--override", action="append", default=[],
                    help="config overrides, e.g. model.model.channels=[4,8]")
    args = ap.parse_args(argv)
    video_dir = Path(args.video_dir)

    # 1. onset prediction from frames
    times = predict_onset_times(video_dir, args.onset_ckpt, args.onset_layers)
    log.info("predicted %d onsets: %s", len(times), np.round(times, 2)[:12])

    # 2. binary onset track at 48 kHz, first LENGTH samples
    onsets = np.zeros((1, LENGTH, 1), np.float32)
    idx = (times * SR).astype(int)
    onsets[0, idx[idx < LENGTH], 0] = 1.0

    # 3. conditioning embedding
    cfg = load_config(Path(__file__).resolve().parents[1] / "config.yaml",
                      ["exp=train_diffusion_gh", *args.override])
    if args.clap_ckpt:
        cfg.model["embedder_checkpoint"] = args.clap_ckpt
    embedder = build_embedder(cfg.model)
    if args.text:
        embedding = embedder.embed_text([args.text])
    elif args.cond_wav:
        wav, sr = read_wav(args.cond_wav)
        y = wav.mean(axis=0)
        if sr != SR:
            y = resample(y, sr, SR)
        embedding = embedder.embed_audio(y[None, :, None])
    else:
        embedding = np.zeros((1, 1, cfg.model.model.embedding_features), np.float32)

    # 4. diffusion sampling
    model = SyncFusionDiffusion.from_config(cfg.model, dtype=jnp.bfloat16)
    params = model.init(jax.random.key(0), LENGTH, batch=1)
    if args.diffusion_ckpt:
        # Template-free: train checkpoints hold the full TrainState (a
        # partial {"params"} template raises a structure mismatch).
        ck = Checkpointer(CheckpointConfig(directory=args.diffusion_ckpt))
        params = ck.restore_params()
    else:
        log.warning("no diffusion checkpoint — output is noise-shaped")

    gi = tuple(args.guidance_interval)
    if gi[0] < 0:
        gi = None
    noise = jax.random.normal(jax.random.key(args.seed), (1, LENGTH, 1))
    wav = np.asarray(jax.jit(
        lambda p, n: model.sample(p, n, jnp.asarray(onsets), jnp.asarray(embedding),
                                  guidance_interval=gi,
                                  num_steps=args.num_steps,
                                  embedding_scale=args.embedding_scale,
                                  sampler=args.sampler,
                                  deep_cache_interval=args.deep_cache_interval,
                                  deep_split=args.deep_split)
    )(params, noise))[0, :, 0]
    write_wav(args.output, wav, SR)
    log.info("wrote %s (%.2f s @ %d Hz)", args.output, len(wav) / SR, SR)

    if args.mux_video:
        from syncfusion_tpu.eval.mux import attach_audio_to_video

        if not args.source_video:
            raise SystemExit("--mux_video requires --source_video")
        attach_audio_to_video(
            args.source_video, args.output, args.mux_video,
            fps=args.mux_fps, video_duration_in_seconds=len(wav) / SR,
        )
        log.info("muxed %s", args.mux_video)


if __name__ == "__main__":
    main()
