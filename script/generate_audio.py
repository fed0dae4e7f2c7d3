#!/usr/bin/env python
"""CondFoleyGen baseline generation on the GH test set
(reference CondFoleyGen/audio_generation.py --gh_testset).

    python script/generate_audio.py --gh_testset --config CONFIG \
        --transformer_ckpt_path DIR [--vq_ckpt DIR] [--W_scale 1] \
        --output_dir output/condfoleygen [--melgan_ckpt best_netG.pt]

Pipeline per item (p_outside_cond=1.0 — cond video ≠ ref video): frames →
R(2+1)D features, cond audio → mel → VQ tokens, autoregressive GPT sampling
(top n_e/2 multinomial), decode tokens → mel → MelGAN (or Griffin-Lim) → wav.

Writes the full reference artifact set (audio_generation_scripts.py:375-472):
``generated_audio/{ref}_to_{cond}_{i}.wav``, orig/cond VQ-reconstruction wavs,
three muxed videos (``generated_video/``, ``orig_video/``, ``cond_video/``)
and a spectrogram ``.jpg`` next to each video.  ``--audio_only`` skips
everything but the generated wavs.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from syncfusion_tpu.core.cache import enable_compile_cache
enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from syncfusion_tpu.core.checkpoint import Checkpointer, CheckpointConfig
from syncfusion_tpu.core.config import Config, yaml_load
from syncfusion_tpu.core.logging import get_logger
from syncfusion_tpu.data.baseline_dataset import (
    CondGreatestHitsWaveCondOnImage,
    baseline_loader,
)
from syncfusion_tpu.models.melgan import Vocoder
from syncfusion_tpu.models.vqgan.model import wav_to_spec
from syncfusion_tpu.ops.wav import write_wav

log = get_logger("generate_audio")


def main(argv=None) -> None:
    from train_transformer import build_model

    ap = argparse.ArgumentParser()
    ap.add_argument("--gh_testset", action="store_true")
    ap.add_argument("-c", "--config", required=True)
    ap.add_argument("--transformer_ckpt_path", default=None)
    ap.add_argument("--vq_ckpt", default=None)
    ap.add_argument("--melgan_ckpt", default=None)
    ap.add_argument("--output_dir", default="output/condfoleygen")
    ap.add_argument("--W_scale", type=int, default=1)
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--top_k", type=int, default=512)
    ap.add_argument("--temperature", type=float, default=1.0)
    ap.add_argument("--data_to_use", type=float, default=1.0)
    ap.add_argument(
        "--style_transfer", action="store_true",
        help="VGG19 gram-matrix style transfer between the VQ reconstructions "
        "instead of GPT sampling (reference gen_audio_condImage_fast"
        "(style_transfer=True), audio_generation_scripts.py:686-697)",
    )
    ap.add_argument("--vgg19_ckpt", default=None,
                    help="torchvision vgg19 state_dict (.pt) for --style_transfer")
    ap.add_argument("--style_steps", type=int, default=300)
    ap.add_argument(
        "--orig_videos_dir", default=None,
        help="folder of original unprocessed videos to mux output videos from "
        "(reference audio_generation.py:31); when absent the videos are "
        "rebuilt from the processed frames")
    ap.add_argument("--orig_videos_suffix", default="_mic.mp4")
    ap.add_argument(
        "--audio_only", action="store_true",
        help="write only generated_audio/*.wav (skip the muxed videos, "
        "orig/cond reconstructions and spectrogram jpgs)")
    args = ap.parse_args(argv)

    cfg = Config.wrap(yaml_load(open(args.config)))
    model = build_model(cfg)
    params = model.init(jax.random.key(0), n_frames=cfg.get("n_frames", 60))

    if args.vq_ckpt:
        from syncfusion_tpu.train.vqgan_trainer import VQGANTrainer

        vq_state = Checkpointer(CheckpointConfig(directory=args.vq_ckpt)).restore(
            VQGANTrainer().init(jax.random.key(0)))
        params["vq"] = vq_state.params
    if args.transformer_ckpt_path:
        from syncfusion_tpu.train.transformer_trainer import TransformerTrainer

        t_state = Checkpointer(
            CheckpointConfig(directory=args.transformer_ckpt_path)
        ).restore(TransformerTrainer(model).create_state(params))
        params["gpt"] = t_state.gpt_params
    else:
        log.warning("no transformer checkpoint — sampling with random weights")

    vocoder = Vocoder(args.melgan_ckpt) if args.melgan_ckpt else None

    d = cfg.data
    ds = CondGreatestHitsWaveCondOnImage(
        d.root_dir, d.test_split_file_path, data_to_use=args.data_to_use,
        chunk_length_in_seconds=d.get("chunk_length_in_seconds", 2.0),
        sample_rate=d.get("sample_rate", 22050), rand_shift=False,
        p_outside_cond=1.0, frame_size=d.get("frame_size", 112),
    )
    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)

    to_spec = jax.jit(lambda w: wav_to_spec(w)[..., None])

    @jax.jit
    def sample_batch(params, cond_spec, frames, key):
        grid = model.sample(params, cond_spec, frames, key,
                            temperature=args.temperature, top_k=args.top_k)
        spec01 = (model.decode_grid(params, grid)[..., 0] + 1.0) / 2.0
        return spec01  # (B, 80, 160) in [0,1]

    @jax.jit
    def recon01(params, spec):
        # VQ round-trip reconstruction, [0,1] mel panel (the reference's
        # mel_xrec/mel_xprec inputs to the style path).
        idx_grid = model.first_stage.encode_indices(params["vq"], spec)
        rec = model.first_stage.decode_indices(params["vq"], idx_grid)
        return (rec[..., 0] + 1.0) / 2.0

    vgg_vars = None
    if args.style_transfer:
        from syncfusion_tpu.eval.style_transfer import (
            Vgg19Prefix, convert_torch_vgg19, style_transfer_mel,
        )

        if args.vgg19_ckpt:
            import torch

            sd = torch.load(args.vgg19_ckpt, map_location="cpu")
            sd = sd.get("state_dict", sd)
            vgg_vars = convert_torch_vgg19(
                {k: v.numpy() for k, v in sd.items() if k.startswith("features.")}
            )
        else:
            log.warning(
                "--style_transfer without --vgg19_ckpt: using random VGG19 "
                "weights (env-gated, like LPAPS/MelGAN real-weight loads)"
            )
            vgg_vars = jax.jit(Vgg19Prefix().init)(
                jax.random.key(0), jnp.zeros((1, 80, 160, 3))
            )

    rng = jax.random.key(int(time.time()))
    idx = 0
    for batch in baseline_loader(ds, args.batch_size):
        rng, sub = jax.random.split(rng)
        cond_spec = to_spec(jnp.asarray(batch["cond_image"]))
        if args.style_transfer:
            ref_rec = np.asarray(recon01(params, to_spec(jnp.asarray(batch["image"]))))
            cond_rec = np.asarray(recon01(params, cond_spec))
            spec_w = ref_rec.shape[-1]
            spec01 = np.stack([
                style_transfer_mel(
                    vgg_vars, ref_rec[i], cond_rec[i],
                    spec_take_first=spec_w, num_steps=args.style_steps,
                )
                for i in range(ref_rec.shape[0])
            ])
        else:
            spec01 = np.asarray(
                sample_batch(params, cond_spec, jnp.asarray(batch["feature"]), sub)
            )
        def decode(s01):
            if vocoder is not None:
                return vocoder(s01)
            # Griffin-Lim through the exact inverse scaling chain
            from syncfusion_tpu.ops.mel import mel01_to_waveform_gl

            return np.asarray(mel01_to_waveform_gl(jnp.asarray(s01), 22050))

        wavs = decode(spec01)
        if args.audio_only:
            orig_wavs = cond_wavs = orig01 = cond01 = None
        else:
            # orig/cond VQ reconstructions — the reference decodes xrec/xprec
            # through the same vocoder and saves them alongside the generation
            # (audio_generation_scripts.py:341-359,423-455)
            if args.style_transfer:
                orig01, cond01 = ref_rec, cond_rec
            else:
                orig01 = np.asarray(
                    recon01(params, to_spec(jnp.asarray(batch["image"]))))
                cond01 = np.asarray(recon01(params, cond_spec))
            orig_wavs = decode(orig01)
            cond_wavs = decode(cond01)

        chunk_s = float(d.get("chunk_length_in_seconds", 2.0)) * args.W_scale
        n_samp = int(22050 * chunk_s)
        for i in range(wavs.shape[0]):
            # reference naming {ref}_to_{cond} — the eval protocol splits on
            # "_to_" and matches parts[0] against the target videos
            # (script/evaluate_onset_baseline.py:177-183); a _{idx} suffix on
            # the cond half keeps repeat pairs unique without breaking it.
            name = Path(batch["file_path_wav_"][i]).name
            cname = Path(batch["file_path_cond_wav_"][i]).name
            pair = f"{name}_to_{cname}_{idx}"
            gen_wav_path = out / "generated_audio" / f"{pair}.wav"
            gen_wav_path.parent.mkdir(parents=True, exist_ok=True)
            write_wav(gen_wav_path, wavs[i][:n_samp], 22050)
            if not args.audio_only:
                _write_item_artifacts(
                    args, out, ds, batch, i, pair, name, cname,
                    gen_wav_path, orig_wavs[i][:n_samp], cond_wavs[i][:n_samp],
                    spec01[i], orig01[i], cond01[i], chunk_s,
                )
            idx += 1
        log.info("generated %d clips", idx)


def _write_item_artifacts(args, out, ds, batch, i, pair, name, cname,
                          gen_wav_path, orig_wav, cond_wav,
                          gen01, orig01, cond01, chunk_s):
    """Full reference artifact set per item (audio_generation_scripts.py:
    375-472): orig/cond reconstruction wavs, three muxed videos
    (generated/orig/cond), and spectrogram jpgs next to each video."""
    from syncfusion_tpu.eval.mux import attach_audio_to_frames, attach_audio_to_video

    orig_wav_path = out / "orig_audio" / f"{name}.wav"
    cond_wav_path = out / "cond_audio" / f"{cname}.wav"
    orig_wav_path.parent.mkdir(parents=True, exist_ok=True)
    cond_wav_path.parent.mkdir(parents=True, exist_ok=True)
    write_wav(orig_wav_path, orig_wav, 22050)
    write_wav(cond_wav_path, cond_wav, 22050)

    ref_fps = float(batch["frame_rate_"][i])
    cond_fps = float(batch["cond_frame_rate_"][i])
    for vdir, vname, start_f, fps, wav_path, src in (
        ("generated_video", pair, batch["start_frame_"][i], ref_fps,
         gen_wav_path, name),
        ("orig_video", name, batch["start_frame_"][i], ref_fps,
         orig_wav_path, name),
        ("cond_video", cname, batch["cond_start_frame_"][i], cond_fps,
         cond_wav_path, cname),
    ):
        dest = out / vdir / f"{vname}.mp4"
        if args.orig_videos_dir:  # trim the real source video (needs ffmpeg)
            attach_audio_to_video(
                Path(args.orig_videos_dir) / f"{src}{args.orig_videos_suffix}",
                wav_path, dest, fps=fps,
                video_start_in_seconds=start_f / fps,
                video_duration_in_seconds=chunk_s,
            )
        else:  # rebuild from processed frames via the native BMFF muxer
            attach_audio_to_frames(
                Path(ds.root) / src / "frames", f"{src}.frame_%06d.jpg",
                wav_path, dest, fps=fps, start_frame=int(start_f),
                n_frames=int(round(chunk_s * fps)),
            )

    # spectrogram jpgs next to each video (reference draw_spec / plt.imshow
    # coolwarm origin-lower, audio_generation_scripts.py:457-472)
    _draw_spec(gen01, out / "generated_video" / f"{pair}.jpg")
    _draw_spec(orig01, out / "orig_video" / f"{name}.jpg")
    _draw_spec(cond01, out / "cond_video" / f"{cname}.jpg")


def _draw_spec(spec, dest, cmap="coolwarm"):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    dest.parent.mkdir(parents=True, exist_ok=True)
    plt.imshow(np.asarray(spec), cmap=cmap, origin="lower")
    plt.axis("off")
    plt.savefig(dest, bbox_inches="tight", pad_inches=0.0)
    plt.close()


if __name__ == "__main__":
    main()
