#!/usr/bin/env python
"""CondFoleyGen stage-2 transformer training
(reference CondFoleyGen/script/train-transformer.py).

    python script/train_transformer.py -c CONFIG --vq_ckpt DIR [--ckpt_path DIR]
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

from syncfusion_tpu.ops.augment import random_audio_augment

from syncfusion_tpu.core.checkpoint import Checkpointer, CheckpointConfig
from syncfusion_tpu.core.config import Config, merge, yaml_load
from syncfusion_tpu.core.logging import MetricLogger, get_logger
from syncfusion_tpu.data.baseline_dataset import (
    CondGreatestHitsWaveCondOnImage,
    baseline_loader,
)
from syncfusion_tpu.models.mingpt import GPTConfig, GPTFeats
from syncfusion_tpu.models.transformer_av import AVCondTransformer
from syncfusion_tpu.models.vqgan.model import SpecVQGAN, VQModel, wav_to_spec
from syncfusion_tpu.train.transformer_trainer import TransformerTrainer

log = get_logger("train_transformer")


def build_model(cfg) -> AVCondTransformer:
    from train_codebook import build_vq_model

    t = cfg.get("transformer", Config())
    gpt = GPTFeats(GPTConfig(
        vocab_size=t.get("vocab_size", 1024), block_size=t.get("block_size", 160),
        n_layer=t.get("n_layer", 24), n_head=t.get("n_head", 16),
        n_embd=t.get("n_embd", 1024),
    ))
    return AVCondTransformer(first_stage=SpecVQGAN(build_vq_model(cfg)), gpt=gpt,
                             pkeep=cfg.get("pkeep", 1.0))


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    # repeated -c composes configs in order (LightningCLI semantics, matches
    # the reference `fit -c a.yaml -c b.yaml` invocation UX)
    ap.add_argument("-c", "--config", action="append", required=True)
    ap.add_argument("--vq_ckpt", default=None, help="trained codebook run dir")
    ap.add_argument("--ckpt_path", default=None)
    args = ap.parse_args(argv)
    cfg = Config()
    for p in args.config:
        cfg = merge(cfg, Config.wrap(yaml_load(open(p))))

    model = build_model(cfg)
    params = model.init(jax.random.key(cfg.get("seed", 0)),
                        n_frames=cfg.get("n_frames", 60))
    if args.vq_ckpt:  # load the frozen first stage from a codebook run
        from syncfusion_tpu.train.vqgan_trainer import VQGANTrainer

        vq_trainer = VQGANTrainer()
        vq_state = Checkpointer(
            CheckpointConfig(directory=args.vq_ckpt)
        ).restore(vq_trainer.init(jax.random.key(0)))
        params["vq"] = vq_state.params
        log.info("loaded frozen VQGAN from %s", args.vq_ckpt)

    # Multi-chip: trainer.model_parallel=N carves a `model` mesh axis;
    # trainer.fsdp=true shards GPT+frozen params and Adam state over it
    # (docs/SCALING.md).  Plain multi-device runs get DP over `data`.
    tcfg = cfg.get("trainer", Config())
    tp = int(tcfg.get("model_parallel", 1))
    fsdp = bool(tcfg.get("fsdp", False))
    mesh = None
    if tp > 1 or fsdp or len(jax.devices()) > 1:
        from syncfusion_tpu.core.mesh import MeshSpec, create_mesh, mesh_for_batch

        mesh = (create_mesh(MeshSpec(data=-1, model=tp)) if tp > 1
                else mesh_for_batch(cfg.data.batch_size))
    trainer = TransformerTrainer(
        model,
        learning_rate=cfg.get("learning_rate", 1e-4),
        weight_decay=cfg.get("weight_decay", 0.01),
        mesh=mesh,
        fsdp=fsdp,
    )
    state = trainer.create_state(params)
    frozen = trainer.place_frozen({"vq": params["vq"], "video": params["video"]})

    run_dir = Path(cfg.get("logs_dir", "logs/transformer")) / time.strftime(
        "%Y-%m-%d-%H-%M-%S")
    metrics_logger = MetricLogger(run_dir)
    ckpt = Checkpointer(CheckpointConfig(directory=run_dir / "ckpts",
                                         monitor="val/loss", save_top_k=1,
                                         save_last=True))
    if args.ckpt_path:
        state = Checkpointer(CheckpointConfig(directory=args.ckpt_path)).restore(state)
        log.info("restored GPT train state from %s (step %d)",
                 args.ckpt_path, int(state.step))

    d = cfg.data
    mk = lambda split, shift: CondGreatestHitsWaveCondOnImage(
        d.root_dir, d[f"{split}_split_file_path"],
        data_to_use=d.get(f"{split}_data_to_use", 1.0),
        chunk_length_in_seconds=d.get("chunk_length_in_seconds", 2.0),
        sample_rate=d.get("sample_rate", 22050),
        rand_shift=shift, p_outside_cond=d.get("p_outside_cond", 0.0),
        frame_size=d.get("frame_size", 112),
    )
    train_ds, val_ds = mk("train", True), mk("val", False)
    train_ds.print()

    to_spec = jax.jit(lambda w: wav_to_spec(w)[..., None])
    # Media forwards (3 samplers + attention + decodes) as ONE jitted graph:
    # eager dispatch over the chip tunnel is ~100 ms/op (CLAUDE.md), so an
    # unjitted log_images stalls training for minutes every val epoch.
    log_images_jit = jax.jit(model.log_images)
    # Host-side seed chain — the trainer builds keys inside the jitted step
    # (no eager jax.random.split round trips; see diffusion_trainer.ensure_key).
    seed_rng = np.random.default_rng(cfg.get("seed", 0))
    step = 0
    for epoch in range(cfg.trainer.get("max_epochs", 100) if "trainer" in cfg else 100):
        aug_rng = np.random.default_rng(epoch)
        p_aug = d.get("p_audio_aug", 0.5)
        for batch in baseline_loader(train_ds, d.batch_size, shuffle=True,
                                     drop_last=True, seed=epoch):
            sub = np.uint32(seed_rng.integers(2**32))
            if p_aug > 0:  # reference train-time wav augment (NormalizeAudio+PitchShift)
                sr = d.get("sample_rate", 22050)
                batch["image"] = np.stack([
                    random_audio_augment(w, sr, aug_rng, p=p_aug)
                    for w in batch["image"]
                ])
            jb = {
                "spec": to_spec(jnp.asarray(batch["image"])),
                "cond_spec": to_spec(jnp.asarray(batch["cond_image"])),
                "frames": jnp.asarray(batch["feature"]),
            }
            state, metrics = trainer.train_step(state, frozen, jb, sub)
            step += 1
            if step % 50 == 0:
                metrics_logger.log({k: float(v) for k, v in metrics.items()}, step=step)
        vals = []
        for batch in baseline_loader(val_ds, d.batch_size, drop_last=True):
            jb = {
                "spec": to_spec(jnp.asarray(batch["image"])),
                "cond_spec": to_spec(jnp.asarray(batch["cond_image"])),
                "frames": jnp.asarray(batch["feature"]),
            }
            vals.append(float(trainer.eval_step(state, frozen, jb)["val/loss"]))
        if vals:
            v = float(np.mean(vals))
            metrics_logger.log({"val/loss": v}, step=step)
            log.info("epoch %d val/loss %.4f", epoch, v)
            # Media D2H pulls come BEFORE the async checkpoint dispatch:
            # tunnel transfers are FIFO, so the reverse order would stall
            # the pulls behind the ~GB state drain (CLAUDE.md).
            if cfg.get("log_media", True):
                # ImageLogger equivalent (reference image_logger.py:16-230 +
                # av_cond_transformer.log_images): sample panels, attention
                # grids, and vocoded sample wavs into run_dir/media.  Media
                # must never kill training (or the in-flight async ckpt).
                try:
                    from syncfusion_tpu.eval.panels import (
                        write_attention_panel, write_media_wavs, write_spec_panel,
                    )

                    sub = jax.random.key(int(seed_rng.integers(2**32)))
                    lp = {"vq": frozen["vq"], "video": frozen["video"],
                          "gpt": state.gpt_params}
                    media = log_images_jit(lp, jb["spec"], jb["cond_spec"],
                                           jb["frames"], sub)
                    spec_keys = ("inputs", "reconstructions", "samples_half",
                                 "samples_nopix", "samples_det")
                    write_spec_panel(
                        run_dir / "media", "val",
                        {k: np.asarray(media[k][0, :, :, 0]) for k in spec_keys},
                        step=step,
                    )
                    for k in ("att_half", "att_nopix", "att_det"):
                        write_attention_panel(run_dir / "media", f"val_{k}",
                                              np.asarray(media[k]), step=step)
                    write_media_wavs(
                        run_dir / "media", "val",
                        {"samples_nopix":
                             (np.asarray(media["samples_nopix"])[..., 0] + 1) / 2},
                        step=step, sample_rate=d.get("sample_rate", 22050),
                    )
                except Exception as e:
                    log.warning("media logging failed: %s", e)
            ckpt.save(step, state, {"val/loss": v})
    ckpt.wait()


if __name__ == "__main__":
    main()
