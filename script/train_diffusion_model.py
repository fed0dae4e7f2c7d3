#!/usr/bin/env python
"""Diffusion training driver (reference script/train_diffusion_model.py UX).

    python script/train_diffusion_model.py exp=train_diffusion_gh \
        model.embedder_checkpoint=checkpoints/630k-audioset-best.pt \
        datamodule.batch_size=2 \
        datamodule.train_dataset.path="data/.../train_shard_{1..3}.tar" \
        datamodule.val_dataset.path="data/.../val_shard_1.tar" [+ckpt=DIR]
"""

from __future__ import annotations

import itertools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from syncfusion_tpu.core.cache import enable_compile_cache
enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from syncfusion_tpu.core.checkpoint import Checkpointer, CheckpointConfig
from syncfusion_tpu.core.config import instantiate, load_config
from syncfusion_tpu.core.logging import MetricLogger, get_logger
from syncfusion_tpu.core.mesh import mesh_for_batch, shard_batch
from syncfusion_tpu.core import precision as precision_lib
from syncfusion_tpu.data.prefetch import device_prefetch
from syncfusion_tpu.data.sfx_dataset import batched
from syncfusion_tpu.models.embedder import build_embedder
from syncfusion_tpu.models.syncfusion import SyncFusionDiffusion
from syncfusion_tpu.train.diffusion_trainer import DiffusionTrainer, OptimizerConfig
from syncfusion_tpu.utils.misc import load_dotenv

# Load `.env` credentials/paths (reference script/train_diffusion_model.py:15,
# consumed by ${oc.env:} interpolations and the wandb mirror).
load_dotenv(Path(__file__).resolve().parents[1] / ".env", override=True)
log = get_logger("train_diffusion")


def make_batches(dataset_fn, cfg, seed, embedder, length):
    """Dataset stream → model batches with CLAP embedding of the cond chunk.

    Wire formats (dequantized on device, diffusion_trainer._loss): onsets
    always ship uint8 (binary track — lossless, 4x fewer bytes); the wav
    ships int16 when ``datamodule.wire_int16=true`` (-90 dBFS quantization,
    exact for 16-bit-PCM sources; H2D is the step bottleneck over the chip
    tunnel)."""
    from syncfusion_tpu.ops.quantize import float32_to_int16

    wire_int16 = bool(cfg.datamodule.get("wire_int16", False))
    stream = batched(
        dataset_fn(seed=seed),
        batch_size=cfg.datamodule.batch_size,
        drop_last=True,
        shuffle_size=cfg.datamodule.get("shuffle_size", 0),
        seed=seed,
    )
    for b in stream:
        yield {
            "wav": float32_to_int16(b["wav"]) if wire_int16 else b["wav"],
            "onsets": b["onsets"].astype(np.uint8),
            "embedding": embedder.embed_audio(b["cond"]),
        }


def main(argv=None) -> None:
    # Long TPU jobs run detached: make `kill -USR1` dump all thread stacks
    # (diagnosis) and restore Ctrl-C semantics that `sh ... &` ignores.
    import faulthandler
    import signal

    faulthandler.register(signal.SIGUSR1, all_threads=True)
    if signal.getsignal(signal.SIGINT) is signal.SIG_IGN:
        signal.signal(signal.SIGINT, signal.default_int_handler)

    overrides = argv if argv is not None else sys.argv[1:]
    cfg = load_config(Path(__file__).resolve().parents[1] / "config.yaml", overrides)
    assert cfg.get("exp"), "pass exp=train_diffusion_gh"
    run_dir = Path(cfg.logs_dir) / "runs" / time.strftime("%Y-%m-%d-%H-%M-%S")
    metrics_logger = MetricLogger(run_dir, use_wandb=cfg.get("use_wandb", False))
    log.info("run dir: %s", run_dir)

    policy = precision_lib.policy(
        "parity" if cfg.trainer.get("precision") == 32 else cfg.get("precision", "default")
    )
    model = SyncFusionDiffusion.from_config(cfg.model, dtype=policy.compute_dtype)
    embedder = build_embedder(cfg.model)
    if not cfg.model.get("embedder_checkpoint"):
        log.warning("no CLAP checkpoint — embedder is zero/random-weight")

    # trainer.model_parallel=N carves an N-wide `model` axis out of the
    # device pool (data gets the rest); trainer.fsdp=true additionally shards
    # params/grads/Adam state over it (core.mesh.fsdp_param_specs — the
    # TPU-native ZeRO-3).  Default stays pure DP, the production sharding for
    # models that fit one chip.
    tp = int(cfg.trainer.get("model_parallel", 1))
    if tp > 1:
        from syncfusion_tpu.core.mesh import MeshSpec, create_mesh

        mesh = create_mesh(MeshSpec(data=-1, model=tp))
    else:
        mesh = mesh_for_batch(cfg.datamodule.batch_size)
    trainer = DiffusionTrainer(
        model,
        OptimizerConfig(
            lr=cfg.model.lr, lr_beta1=cfg.model.lr_beta1, lr_beta2=cfg.model.lr_beta2,
            lr_eps=cfg.model.lr_eps, lr_weight_decay=cfg.model.lr_weight_decay,
            gradient_clip_val=cfg.trainer.gradient_clip_val,
            accumulate_grad_batches=cfg.trainer.accumulate_grad_batches,
        ),
        mesh=mesh,
        embedding_mask_proba=cfg.get("embedding_mask_proba", 0.0),
        fsdp=bool(cfg.trainer.get("fsdp", False)),
    )
    params = model.init(jax.random.key(cfg.seed), cfg.length, batch=1)
    state = trainer.create_state(params)
    log.info("params: %.1fM over %d devices", model.param_count(params) / 1e6,
             len(jax.devices()))

    ckpt = Checkpointer(CheckpointConfig(
        directory=run_dir / "ckpts", monitor="valid_loss",
        save_top_k=cfg.callbacks.model_checkpoint.save_top_k,
        save_last=cfg.callbacks.model_checkpoint.save_last,
    ))
    if cfg.get("ckpt"):
        state = Checkpointer(
            CheckpointConfig(directory=cfg.ckpt)
        ).restore(state)
        log.info("resumed from %s at step %d", cfg.ckpt, int(state.step))

    if cfg.get("save"):
        # SavePytorchModelAndStopCallback equivalent (reference
        # main/utils.py:200-219 + train_diffusion_model.py:42-50): export any
        # (dotted) param subtree as a standalone orbax checkpoint, then stop —
        # e.g. +save=model, +save=onsets_encoder, +save=unet.net.inner.
        attr = str(cfg.save)
        key_map = {"model": "unet", "unet": "unet",
                   "onsets_encoder": "encoder", "encoder": "encoder"}
        parts = attr.split(".")
        assert parts[0] in key_map, (
            f"+save={attr}: unknown root '{parts[0]}' — the reference asserts "
            "the attribute exists on the module (main/utils.py:208); use one "
            f"of {sorted(key_map)}"
        )
        sub = state.params[key_map[parts[0]]]
        for seg in parts[1:]:
            if isinstance(sub, dict) and seg not in sub and "params" in sub:
                sub = sub["params"]  # flax variable-collection wrapper
            assert isinstance(sub, dict) and seg in sub, (
                f"+save={attr}: no subtree '{seg}'; available: "
                f"{sorted(sub)[:10] if isinstance(sub, dict) else type(sub)}"
            )
            sub = sub[seg]
        tag = attr.replace(".", "_")
        export = Checkpointer(CheckpointConfig(directory=run_dir / f"export_{tag}"))
        export.save(int(state.step), {tag: sub})
        export.wait()
        log.info("exported %s to %s and stopping", attr, run_dir / f"export_{tag}")
        return

    train_fn = instantiate(cfg.datamodule.train_dataset)
    val_fn = instantiate(cfg.datamodule.val_dataset)
    # Host-side seed chain: the trainer builds the PRNG key inside the jitted
    # step (DiffusionTrainer._ensure_key), so the loop issues ZERO eager
    # device ops — an eager jax.random.split costs ~100 ms/step over the
    # chip tunnel.
    seed_rng = np.random.default_rng(cfg.seed + 1)

    step = int(state.step)
    log_every = int(cfg.trainer.get("log_every_n_steps", 10))
    val_every = int(cfg.trainer.get("val_check_interval", 1000))
    max_steps = int(cfg.get("max_steps", 10**9))
    log.info("schedule: log_every=%d val_every=%d max_steps=%d", log_every,
             val_every, max_steps)
    t0 = time.time()
    for epoch in itertools.count():
        stream = device_prefetch(
            make_batches(train_fn, cfg, seed=cfg.seed + epoch, embedder=embedder,
                         length=cfg.length),
            mesh=mesh,
        )
        for batch in stream:
            sub = np.uint32(seed_rng.integers(2**32))
            state, metrics = trainer.train_step(state, batch, sub)
            step += 1
            if step == 1:
                log.info("first step done, train_loss=%.4f",
                         float(metrics["train_loss"]))
            if step % log_every == 0:
                dt = (time.time() - t0) / log_every
                metrics_logger.log(
                    {"train_loss": float(metrics["train_loss"]), "sec_per_step": dt},
                    step=step,
                )
                t0 = time.time()
            if step % val_every == 0:
                val_losses = []
                for vb in itertools.islice(
                    make_batches(val_fn, cfg, seed=0, embedder=embedder,
                                 length=cfg.length),
                    cfg.trainer.get("val_batches", 16),
                ):
                    m = trainer.eval_step(state, shard_batch(vb, mesh), np.uint32(0))
                    val_losses.append(float(m["valid_loss"]))
                valid_loss = float(np.mean(val_losses)) if val_losses else float("nan")
                metrics_logger.log({"valid_loss": valid_loss}, step=step)
                log.info("step %d valid_loss %.4f", step, valid_loss)
                # Sample BEFORE dispatching the checkpoint save: device→host
                # transfers are FIFO over the tunnel, so the small sample pull
                # must not queue behind the multi-GB async state drain — the
                # drain instead overlaps the next 500 training steps.
                _log_samples(cfg, model, state, embedder, metrics_logger, step)
                ckpt.save(step, state, {"valid_loss": valid_loss})
            if step >= max_steps:
                ckpt.wait()
                return
        log.info("epoch %d done at step %d", epoch, step)


def _log_samples(cfg, model, state, embedder, metrics_logger, step):
    """SampleLogger equivalent (reference main/module_diffusion.py:155-257):
    sample a couple of clips from the val stream each validation round."""
    sl = cfg.callbacks.get("audio_samples_logger")
    if not sl:
        return
    try:
        val_fn = instantiate(cfg.datamodule.val_dataset)
        items = list(itertools.islice(val_fn(seed=0), sl.num_items))
        if not items:
            return
        from syncfusion_tpu.data.sfx_dataset import collate

        b = collate(items)
        emb = embedder.embed_audio(b["cond"])
        noise = jax.random.normal(
            jax.random.key(step), (len(items), cfg.length, 1)
        )
        for steps in sl.sampling_steps:
            wavs = np.asarray(model.sample(
                state.params, noise, jnp.asarray(b["onsets"]), jnp.asarray(emb),
                num_steps=steps, embedding_scale=sl.embedding_scale,
            ))[:, :, 0]
            # mel panels next to the audio (reference SampleLogger logs
            # wandb.Audio + mel heatmaps, main/module_diffusion.py:120-152:
            # MelSpectrogram n_fft 1024 hop 512 n_mels 80 slaney-norm +
            # power_to_db)
            from syncfusion_tpu.eval.panels import write_spec_panel
            from syncfusion_tpu.ops.mel import mel_spectrogram, power_to_db

            mels = np.asarray(power_to_db(mel_spectrogram(
                jnp.asarray(wavs), sample_rate=cfg.sampling_rate,
                n_fft=1024, hop_length=512, n_mels=80, power=2.0,
                norm="slaney",
            )))
            for i, w in enumerate(wavs):
                metrics_logger.log_audio(f"sample_{i}", w, cfg.sampling_rate, step)
                write_spec_panel(
                    metrics_logger.run_dir / "media",
                    f"mel_spectrogram_{i}_{steps}steps",
                    {"sample": mels[i]},
                    step,
                )
    except Exception as e:  # sampling must never kill training
        log.warning("sample logging failed: %s", e)


if __name__ == "__main__":
    main()
