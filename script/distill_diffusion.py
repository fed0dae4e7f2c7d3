"""Distill a trained diffusion model to a few-step sampler.

Capability beyond the reference (which always samples 150 steps): progressive
distillation (train/distill.py) halves the sampler grid repeatedly —
64 → 32 → 16 → 8 by default — so serving runs ~8-19x fewer UNet forwards per
clip at near-teacher quality.  The distilled checkpoint drops into every
existing generation surface unchanged (same param tree); pass the matching
``experiment.num_steps`` at eval time.

Usage (same config UX as training):
    python script/distill_diffusion.py exp=train_diffusion_gh \
        ckpt=logs/runs/<ts>/ckpts \
        datamodule.train_dataset.path="data/.../train_shard_{1..3}.tar" \
        [+distill.start_steps=64 +distill.final_steps=8 \
         +distill.steps_per_round=400] [+out=DIR]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from syncfusion_tpu.core.cache import enable_compile_cache
enable_compile_cache()

import jax

from syncfusion_tpu.core.checkpoint import Checkpointer, CheckpointConfig
from syncfusion_tpu.core.config import instantiate, load_config
from syncfusion_tpu.core.logging import get_logger
from syncfusion_tpu.core import precision as precision_lib
from syncfusion_tpu.data.sfx_dataset import batched
from syncfusion_tpu.models.embedder import build_embedder
from syncfusion_tpu.models.syncfusion import SyncFusionDiffusion
from syncfusion_tpu.train.diffusion_trainer import DiffusionTrainer, OptimizerConfig
from syncfusion_tpu.train.distill import DistillConfig, ProgressiveDistiller

log = get_logger("distill_diffusion")


def main(argv=None) -> None:
    overrides = argv if argv is not None else sys.argv[1:]
    cfg = load_config(Path(__file__).resolve().parents[1] / "config.yaml", overrides)
    assert cfg.get("exp"), "pass exp=train_diffusion_gh"
    assert cfg.get("ckpt"), "pass ckpt=<trained checkpoint dir>"

    policy = precision_lib.policy(
        "parity" if cfg.trainer.get("precision") == 32 else cfg.get("precision", "default")
    )
    model = SyncFusionDiffusion.from_config(cfg.model, dtype=policy.compute_dtype)
    embedder = build_embedder(cfg.model)

    # same optimizer config as the train CLI so the checkpoint's state
    # template (incl. MultiSteps wrapping) matches for restore
    trainer = DiffusionTrainer(
        model,
        OptimizerConfig(
            lr=cfg.model.lr, lr_beta1=cfg.model.lr_beta1,
            lr_beta2=cfg.model.lr_beta2, lr_eps=cfg.model.lr_eps,
            lr_weight_decay=cfg.model.lr_weight_decay,
            gradient_clip_val=cfg.trainer.gradient_clip_val,
            accumulate_grad_batches=cfg.trainer.accumulate_grad_batches,
        ),
    )
    params = model.init(jax.random.key(cfg.seed), cfg.length, batch=1)
    state = Checkpointer(CheckpointConfig(directory=cfg.ckpt)).restore(
        trainer.create_state(params)
    )
    log.info("teacher restored from %s at step %d", cfg.ckpt, int(state.step))

    dnode = cfg.get("distill") or {}
    dcfg = DistillConfig(
        start_steps=int(dnode.get("start_steps", 64)),
        final_steps=int(dnode.get("final_steps", 8)),
        steps_per_round=int(dnode.get("steps_per_round", 400)),
        lr=float(dnode.get("lr", 1e-4)),
        # e.g. +distill.cfg_scale=2.0 bakes the eval guidance scale
        # (exp/evaluate_gh_gen.yaml:23) into a single-forward student
        cfg_scale=float(dnode.get("cfg_scale", 1.0)),
    )

    train_fn = instantiate(cfg.datamodule.train_dataset)

    def stream():
        epoch = 0
        while True:
            for b in batched(
                train_fn(seed=cfg.seed + epoch),
                batch_size=cfg.datamodule.batch_size,
                drop_last=True,
                shuffle_size=cfg.datamodule.get("shuffle_size", 0),
                seed=cfg.seed + epoch,
            ):
                yield {
                    "wav": b["wav"],
                    "onsets": b["onsets"],
                    "embedding": embedder.embed_audio(b["cond"]),
                }
            epoch += 1

    it = stream()
    t0 = time.time()
    distilled, n = ProgressiveDistiller(model, dcfg).distill(
        state.params,
        batch_fn=lambda step: next(it),
        key=jax.random.key(cfg.seed + 7),
        log_fn=lambda m: log.info(
            "distill %d-step round: step %d loss %.5f [%.0fs]",
            m["round_steps"], m["step"], m["distill_loss"], time.time() - t0,
        ),
    )

    out_dir = Path(cfg.get("out") or (Path(cfg.ckpt).parent / f"distilled_{n}step"))
    ckpt = Checkpointer(CheckpointConfig(directory=out_dir))
    ckpt.save(int(state.step), {"params": distilled, "num_steps": n})
    ckpt.wait()
    log.info("wrote %d-step distilled params to %s", n, out_dir)


if __name__ == "__main__":
    main()
