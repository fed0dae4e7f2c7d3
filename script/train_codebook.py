#!/usr/bin/env python
"""SpecVQGAN codebook training (reference CondFoleyGen/script/train-codebook.py).

    python script/train_codebook.py -c CondFoleyGen/config/greatesthit_codebook.yaml
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
from syncfusion_tpu.core.config import Config, merge, yaml_load
from syncfusion_tpu.core.logging import MetricLogger, get_logger
from syncfusion_tpu.data.baseline_dataset import GreatestHitsWaveDataset, baseline_loader
from syncfusion_tpu.models.vqgan.model import VQModel, wav_to_spec
from syncfusion_tpu.train.vqgan_trainer import VQGANLossConfig, VQGANTrainer

log = get_logger("train_codebook")


def build_vq_model(cfg) -> VQModel:
    """VQModel from a greatesthit_codebook-style config tree (also used by
    the stage-2/generation drivers so tiny configs stay consistent)."""
    m = cfg.get("model", Config())
    dd = m.get("ddconfig", Config())
    return VQModel(
        embed_dim=m.get("embed_dim", 256), n_embed=m.get("n_embed", 1024),
        ch=dd.get("ch", 128), ch_mult=tuple(dd.get("ch_mult", (1, 1, 2, 2, 4))),
        num_res_blocks=dd.get("num_res_blocks", 2),
        attn_resolutions=tuple(dd.get("attn_resolutions", (10,))),
        resolution=dd.get("resolution", 160), z_channels=dd.get("z_channels", 256),
    )


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    # repeated -c composes configs in order (LightningCLI semantics, matches
    # the reference `fit -c a.yaml -c b.yaml` invocation UX)
    ap.add_argument("-c", "--config", action="append", required=True)
    ap.add_argument("--ckpt_path", default=None)
    args = ap.parse_args(argv)
    cfg = Config()
    for p in args.config:
        cfg = merge(cfg, Config.wrap(yaml_load(open(p))))

    m = cfg.model
    loss_cfg = m.get("lossconfig", Config())
    model = build_vq_model(cfg)
    trainer = VQGANTrainer(
        model,
        VQGANLossConfig(
            disc_start=loss_cfg.get("disc_start", 30001),
            disc_weight=loss_cfg.get("disc_weight", 0.8),
            codebook_weight=loss_cfg.get("codebook_weight", 1.0),
            perceptual_weight=loss_cfg.get("perceptual_weight", 1.0),
            min_adapt_weight=loss_cfg.get("min_adapt_weight", 1.0),
            max_adapt_weight=loss_cfg.get("max_adapt_weight", 1.0),
        ),
        learning_rate=m.get("learning_rate", 4.5e-6),
    )
    dd = m.get("ddconfig", Config())
    spec_h = dd.get("mel_num", 80)
    spec_w = dd.get("spec_crop_len", 160)
    state = trainer.init(jax.random.key(cfg.get("seed", 0)),
                         spec_shape=(1, spec_h, spec_w, 1))
    run_dir = Path(cfg.get("logs_dir", "logs/specvqgan")) / time.strftime("%Y-%m-%d-%H-%M-%S")
    metrics_logger = MetricLogger(run_dir)
    ckpt = Checkpointer(CheckpointConfig(directory=run_dir / "ckpts",
                                         monitor="val/rec_loss", save_top_k=1,
                                         save_last=True))
    if args.ckpt_path:
        state = Checkpointer(CheckpointConfig(directory=args.ckpt_path)).restore(state)

    d = cfg.data
    train_ds = GreatestHitsWaveDataset(
        d.root_dir, d.train_split_file_path,
        data_to_use=d.get("train_data_to_use", 1.0),
        chunk_length_in_seconds=d.get("chunk_length_in_seconds", 2.0),
        sample_rate=d.get("sample_rate", 22050),
        rand_shift=d.get("rand_shift", True),
    )
    val_ds = GreatestHitsWaveDataset(
        d.root_dir, d.val_split_file_path,
        data_to_use=d.get("val_data_to_use", 1.0),
        chunk_length_in_seconds=d.get("chunk_length_in_seconds", 2.0),
        sample_rate=d.get("sample_rate", 22050), rand_shift=False,
    )
    train_ds.print()

    to_spec = jax.jit(lambda w: wav_to_spec(w)[..., None])
    step = 0
    for epoch in range(cfg.trainer.get("max_epochs", 1000)):
        for batch in baseline_loader(train_ds, d.batch_size, shuffle=True,
                                     drop_last=True, seed=epoch):
            spec = to_spec(jnp.asarray(batch["image"]))
            state, metrics = trainer.train_step(state, spec)
            step += 1
            if step % 50 == 0:
                metrics_logger.log({k: float(v) for k, v in metrics.items()}, step=step)
        # validation + checkpoint each epoch
        vals = []
        for batch in baseline_loader(val_ds, d.batch_size, drop_last=True):
            vals.append(trainer.eval_step(state, to_spec(jnp.asarray(batch["image"]))))
        if vals:
            rec = float(np.mean([float(v["val/rec_loss"]) for v in vals]))
            usage = float(np.mean([float(v["val/codebook_usage"]) for v in vals]))
            metrics_logger.log({"val/rec_loss": rec, "val/codebook_usage": usage},
                               step=step)
            log.info("epoch %d val/rec_loss %.4f", epoch, rec)
            # Media D2H pulls run BEFORE dispatching the async checkpoint
            # drain: transfers over the chip tunnel are FIFO, so pulling
            # after save() would block on the multi-GB state drain
            # (CLAUDE.md tunnel rules; train_diffusion_model.py does the
            # same).
            try:
                # recon panel + vocoded wavs (ImageLogger equivalent —
                # reference image_logger.py:63-80 logs input/rec audio too).
                # Media must NEVER kill training: a crash here also aborts
                # the in-flight async checkpoint drain (seen live when
                # Griffin-Lim hit a TPU-unsupported complex op).
                from syncfusion_tpu.eval.panels import (
                    write_media_wavs,
                    write_spec_panel,
                )

                val_spec = to_spec(jnp.asarray(batch["image"]))  # last val batch
                xrec, _, _ = jax.jit(lambda p, s: trainer.model.apply(p, s))(
                    state.params, val_spec
                )
                write_spec_panel(
                    run_dir / "media", "reconstructions",
                    {"inputs": np.asarray(val_spec[0, :, :, 0]),
                     "reconstructions": np.asarray(xrec[0, :, :, 0])},
                    step=step,
                )
                if cfg.get("log_media", True):
                    write_media_wavs(
                        run_dir / "media", "val",
                        {"inputs": (np.asarray(val_spec)[..., 0] + 1) / 2,
                         "reconstructions":
                             (np.clip(np.asarray(xrec), -1, 1)[..., 0] + 1) / 2},
                        step=step, sample_rate=d.get("sample_rate", 22050),
                    )
            except Exception as e:
                log.warning("media logging failed: %s", e)
            ckpt.save(step, state, {"val/rec_loss": rec})
    ckpt.wait()


if __name__ == "__main__":
    main()
