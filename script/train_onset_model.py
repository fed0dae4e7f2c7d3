#!/usr/bin/env python
"""Onset model train/test CLI (reference script/train_onset_model.py UX).

    python script/train_onset_model.py fit \
        -c cfg/data/data-onset-greatesthit.yaml \
        -c cfg/model/model-onset.yaml \
        -c cfg/trainer/trainer-onset.yaml
    python script/train_onset_model.py test -c CONFIG --ckpt_path DIR

The subcommand+repeated-``-c`` interface mirrors LightningCLI; configs are
the ``class_path``-free trees under cfg/.
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
import numpy as np
import yaml

from syncfusion_tpu.core.checkpoint import Checkpointer, CheckpointConfig
from syncfusion_tpu.core.config import Config, merge, to_plain, yaml_load
from syncfusion_tpu.core.logging import MetricLogger, get_logger
from syncfusion_tpu.core.mesh import mesh_for_batch, shard_batch
from syncfusion_tpu.data.onset_dataset import GreatestHitsDataset, loader
from syncfusion_tpu.data.transforms import FrameTransform
from syncfusion_tpu.eval.onset_annotations import (
    concat_annotations,
    write_chunk_annotations,
)
from syncfusion_tpu.train.diffusion_trainer import OptimizerConfig
from syncfusion_tpu.train.onset_trainer import OnsetTrainer, bc_loss, onset_metrics

log = get_logger("train_onset")


def parse_args(argv):
    ap = argparse.ArgumentParser()
    ap.add_argument("subcommand", choices=["fit", "test", "validate"])
    ap.add_argument("-c", "--config", action="append", default=[])
    ap.add_argument("--ckpt_path", default=None)
    return ap.parse_args(argv)


def load_cfgs(paths) -> Config:
    cfg = Config()
    for p in paths:
        with open(p) as f:
            cfg = merge(cfg, Config.wrap(yaml_load(f)))
    return cfg


def make_transform(cfg, augment: bool) -> FrameTransform:
    """Single source of truth for the frame transform (the trainer reads
    jitter strengths from the SAME instance the dataset uses).

    Wire format (``data.wire``): "uint8" (default) ships raw uint8 RGB —
    4x less H2D per clip batch than float; "yuv420" ships packed planar
    4:2:0 — HALF of uint8 again (the augment recipe is bound by the
    ~25 MB/s tunnel, docs/REHEARSAL.md §9, and the GH source JPEGs are
    4:2:0 already); "float" ships host-normalized float (reference
    semantics, debugging).  The trainer decodes+normalizes on device
    (OnsetTrainer._prep_frames).  device_jitter: ColorJitter runs
    inside the jitted train step (host jitter measured ~5 s/step at bs 16
    vs 164 ms step compute — the augment recipe was host-bound); the cheap
    RandomCrop stays host-side so the wire stays at crop size."""
    d = cfg.data
    size = d.get("frame_size", 112)
    wire = d.get("wire", "uint8")
    assert wire in ("uint8", "yuv420", "float"), wire
    return FrameTransform(
        augment=augment, size=size, resize_to=round(size * 128 / 112),
        wire_uint8=(wire != "float"), wire_yuv420=(wire == "yuv420"),
        device_jitter=d.get("device_jitter", True),
    )


def make_dataset(cfg, split: str, augment_override=None) -> GreatestHitsDataset:
    d = cfg.data
    augment = d.get("augment", False) if augment_override is None else augment_override
    return GreatestHitsDataset(
        root_dir=d.root_dir,
        split_file_path=d[f"{split}_split_file_path"],
        chunk_length_in_seconds=d.get("chunk_length_in_seconds", 2.0),
        frames_transforms=make_transform(cfg, augment),
        data_to_use=d.get(f"{split}_data_to_use", 1.0),
        # epochs ≥2 skip the JPEG decode hot loop (~0.4 s/item measured);
        # capped so the full GH train split can't OOM the host — beyond the
        # cap, chunks just stay on the decode path.
        cache_decoded=d.get("cache_decoded", True),
        cache_max_bytes=int(d.get("cache_decoded_mb", 8192)) << 20,
    )


def evaluate(trainer, state, dataset, cfg, mesh, annotations_dir=None,
             label_plots_dir=None, label_plot_batches=4):
    losses, all_metrics = [], []
    n_data = mesh.shape["data"]
    for batch_idx, batch in enumerate(
        loader(dataset, cfg.data.batch_size, num_workers=cfg.data.num_workers)
    ):
        n = batch["frames"].shape[0]
        if n % n_data == 0:
            logits = np.asarray(trainer.forward(state, shard_batch(batch["frames"], mesh)))
        else:  # ragged final batch: pad to the data axis, drop padding rows
            pad = ((0, -n % n_data),) + ((0, 0),) * (batch["frames"].ndim - 1)
            frames = np.pad(batch["frames"], pad)
            logits = np.asarray(trainer.forward(state, shard_batch(frames, mesh)))[:n]
        losses.append(float(bc_loss(logits, batch["label"])))
        all_metrics.append(onset_metrics(logits, batch["label"]))
        if annotations_dir is not None:
            write_chunk_annotations(annotations_dir, batch, logits)
        if label_plots_dir is not None and batch_idx < label_plot_batches:
            # target-vs-predicted-probability line plots per chunk (the
            # reference's wandb label plots, main/module_onset.py:231-261)
            from syncfusion_tpu.eval.panels import write_label_plot

            probs = 1.0 / (1.0 + np.exp(-logits))
            for i in range(len(probs)):
                name = batch.get("video_name", [f"item{i}"] * len(probs))[i]
                write_label_plot(
                    label_plots_dir, f"labels_b{batch_idx}-{i}_{name}",
                    batch["label"][i], probs[i],
                )
    agg = {k: float(np.nanmean([m[k] for m in all_metrics])) for k in all_metrics[0]}
    agg["loss"] = float(np.mean(losses))
    return agg


def main(argv=None) -> None:
    args = parse_args(argv if argv is not None else sys.argv[1:])
    cfg = load_cfgs(args.config)
    run_dir = Path(cfg.trainer.get("logs_dir", "logs/onset")) / time.strftime(
        "%Y-%m-%d-%H-%M-%S"
    )
    metrics_logger = MetricLogger(run_dir)
    (run_dir / "config.yaml").write_text(yaml.safe_dump(to_plain(cfg)))

    from syncfusion_tpu.models.onset_net import VideoOnsetNet

    mesh = mesh_for_batch(cfg.data.batch_size)
    # model.precision: 32 (default, reference-parity f32) or "bf16" — bf16
    # MXU compute measured 1.57x faster (257 -> 164 ms/step at bs16 on v5e)
    # with matching loss; BN stats stay f32 either way.
    import jax.numpy as jnp

    dtype = (
        jnp.bfloat16 if str(cfg.model.get("precision", 32)) == "bf16"
        else jnp.float32
    )
    train_tf = make_transform(cfg, augment=cfg.data.get("augment", False))
    use_device_jitter = (train_tf.augment and train_tf.device_jitter
                         and args.subcommand == "fit")
    trainer = OnsetTrainer(
        model=VideoOnsetNet(layers=tuple(cfg.model.get("layers", (2, 2, 2, 2))),
                            dtype=dtype),
        opt_cfg=OptimizerConfig(
            lr=cfg.model.lr, lr_beta1=cfg.model.lr_beta1,
            lr_beta2=cfg.model.lr_beta2, lr_eps=cfg.model.lr_eps,
            lr_weight_decay=cfg.model.lr_weight_decay,
            gradient_clip_val=1e9, accumulate_grad_batches=1,
        ),
        mesh=mesh,
        jitter=train_tf.jitter_params if use_device_jitter else None,
    )
    frame_size = cfg.data.get("frame_size", 112)
    n_frames = int(cfg.data.get("chunk_length_in_seconds", 2.0) * cfg.data.get("fps", 15))
    state = trainer.init(
        jax.random.key(cfg.trainer.get("seed", 12345)),
        frames_shape=(1, n_frames, frame_size, frame_size, 3),
    )
    if cfg.model.get("pretrained") and cfg.model.get("pretrained_path"):
        from syncfusion_tpu.core.checkpoint import load_torch_state_dict
        from syncfusion_tpu.models.onset_net import convert_torch_r2plus1d

        tree = convert_torch_r2plus1d(load_torch_state_dict(cfg.model.pretrained_path))
        state.params["backbone"] = tree["params"]["backbone"]
        state.batch_stats["backbone"] = tree["batch_stats"]["backbone"]
        log.info("loaded Kinetics init from %s", cfg.model.pretrained_path)

    ckpt = Checkpointer(CheckpointConfig(
        directory=run_dir / "ckpts", monitor="loss/val", save_top_k=1, save_last=True
    ))
    if args.ckpt_path:
        state = Checkpointer(
            CheckpointConfig(directory=args.ckpt_path)
        ).restore(state)
        log.info("restored checkpoint from %s", args.ckpt_path)

    if args.subcommand in ("test", "validate"):
        split = "test" if args.subcommand == "test" else "val"
        dataset = make_dataset(cfg, split, augment_override=False)
        ann_dir = run_dir / "media/annotations" if split == "test" else None
        plots_dir = run_dir / "media/labels" if split == "test" else None
        agg = evaluate(trainer, state, dataset, cfg, mesh,
                       annotations_dir=ann_dir, label_plots_dir=plots_dir)
        if ann_dir is not None:
            concat_annotations(ann_dir)
        metrics_logger.log({f"{k}/{split}": v for k, v in agg.items()})
        print({f"{k}/{split}": round(v, 4) for k, v in agg.items()})
        return

    train_ds = make_dataset(cfg, "train")
    val_ds = make_dataset(cfg, "val", augment_override=False)
    train_ds.print()
    step = 0
    step_rng = np.random.default_rng(cfg.trainer.get("seed", 12345) + 1)
    from syncfusion_tpu.data.prefetch import device_prefetch

    for epoch in range(cfg.trainer.get("max_epochs", 100)):
        epoch_t0 = time.perf_counter()
        epoch_steps = 0
        # Prefetch overlaps host video decode + the (uint8) H2D upload with
        # the running step; labels ride along on device and are pulled back
        # (a few KB) only at log intervals.
        stream = device_prefetch(
            loader(train_ds, cfg.data.batch_size, shuffle=True,
                   drop_last=True, num_workers=cfg.data.num_workers,
                   seed=epoch),
            mesh=mesh,
            transform=lambda b: {"frames": b["frames"], "label": b["label"]},
        )
        for b in stream:
            # per-step uint32 seed for the on-device augment; key built
            # in-jit (ensure_key) — zero eager device ops in the loop
            state, metrics, logits = trainer.train_step(
                state, b, np.uint32(step_rng.integers(2**32)))
            step += 1
            epoch_steps += 1
            if step % cfg.trainer.get("log_every_n_steps", 10) == 0:
                host_metrics = onset_metrics(np.asarray(logits),
                                             np.asarray(b["label"]))
                host_metrics["loss/train"] = float(metrics["loss/train"])
                metrics_logger.log(host_metrics, step=step)
        if epoch_steps:
            # sync before timing: over the chip tunnel block_until_ready can
            # return early — pull a scalar from the last step (CLAUDE.md rule)
            float(metrics["loss/train"])
            epoch_dt = time.perf_counter() - epoch_t0
            log.info("epoch %d: %d steps in %.1f s (%.3f s/step)",
                     epoch, epoch_steps, epoch_dt, epoch_dt / epoch_steps)
        if (epoch + 1) % cfg.trainer.get("check_val_every_n_epoch", 5) == 0:
            agg = evaluate(trainer, state, val_ds, cfg, mesh)
            metrics_logger.log({f"{k}/val": v for k, v in agg.items()}, step=step)
            ckpt.save(step, state, {"loss/val": agg["loss"]})
            log.info("epoch %d val %s", epoch, agg)
    ckpt.wait()


if __name__ == "__main__":
    main()
