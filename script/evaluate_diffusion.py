#!/usr/bin/env python
"""Diffusion evaluation driver (reference script/evaluate_diffusion.py UX).

    python script/evaluate_diffusion.py exp=evaluate_gh_gen \
        experiment_path=./output/experiments/gh-gen \
        evaluation.gt_dir=./output/experiments/gh-gt \
        experiment.dataset.path="data/.../test_shard_1.tar" \
        model_path=checkpoints/run/ckpts  [model.embedder_checkpoint=...]

Runs ``experiment`` (generation or GT prep), then ``evaluation`` (FAD) and
writes metrics.csv into the experiment dir.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from syncfusion_tpu.core.cache import enable_compile_cache
enable_compile_cache()

import jax
import pandas as pd

from syncfusion_tpu.core.config import instantiate, load_config
from syncfusion_tpu.core.logging import get_logger
from syncfusion_tpu.models.embedder import build_embedder
from syncfusion_tpu.models.syncfusion import SyncFusionDiffusion
from syncfusion_tpu.utils.misc import load_dotenv

# Load `.env` credentials/paths (reference script/evaluate_diffusion.py:16).
load_dotenv(Path(__file__).resolve().parents[1] / ".env", override=True)
log = get_logger("evaluate_diffusion")


def load_params(model: SyncFusionDiffusion, model_path: str | None, length: int,
                model_cfg=None):
    """Init params, then restore from an orbax run dir or a torch .ckpt.

    ``.ckpt``/``.pt``/``.pth`` paths are the reference's Lightning
    checkpoints (e.g. the published ``epoch=784-valid_loss=0.008.ckpt``);
    they convert through models/adp_convert.py into the weight-compatible
    a-unet twin models (requires the model to be built with compat=True,
    which main() selects automatically for these suffixes).
    """
    if model_path and Path(model_path).suffix in (".ckpt", ".pt", ".pth"):
        from syncfusion_tpu.models.adp_convert import load_diffusion_ckpt
        from syncfusion_tpu.models.adp_torch_recon import (
            Encoder1dConfig,
            UNetV0Config,
        )

        ucfg = UNetV0Config.from_node(model_cfg["model"]) if model_cfg else None
        ecfg = (
            Encoder1dConfig.from_node(model_cfg["onsets_encoder"])
            if model_cfg else None
        )
        log.info("converting torch checkpoint %s (compat model)", model_path)
        return load_diffusion_ckpt(model_path, ucfg, ecfg)

    if not model_path:
        log.warning("no model_path — using randomly initialized model")
        return model.init(jax.random.key(0), length, batch=1)
    from syncfusion_tpu.core.checkpoint import Checkpointer, CheckpointConfig

    # Template-free restore: train checkpoints hold the full TrainState
    # (step/params/opt_state) — a partial {"params"} template raises a
    # structure mismatch.  Prefer the best-by-monitored-metric step (the
    # reference evaluates the best val checkpoint, README.md:168-217).
    ck = Checkpointer(CheckpointConfig(directory=Path(model_path)))
    params = ck.restore_params()
    log.info("restored best/latest step from %s", model_path)
    return params


def main(argv=None) -> None:
    overrides = argv if argv is not None else sys.argv[1:]
    cfg = load_config(Path(__file__).resolve().parents[1] / "config.yaml", overrides)
    assert cfg.get("exp"), "pass exp=evaluate_gh_gen / prepare_gh_gt / ..."

    exp_node = dict(cfg.experiment)
    target = exp_node.get("_target_", "")
    dataset_fn = instantiate(exp_node.pop("dataset"))
    exp_fn = instantiate(exp_node)

    if "generate_dataset" in target:
        model_path = cfg.get("model_path")
        is_torch_ckpt = bool(
            model_path and Path(model_path).suffix in (".ckpt", ".pt", ".pth")
        )
        # precision=bf16 runs the sampler in bfloat16 compute (~2x on the
        # MXU; bench.py serving default). f32 remains the default — it is
        # the reference's eval numerics.
        import jax.numpy as jnp

        dtype = (
            jnp.bfloat16 if str(cfg.get("precision", 32)) in ("bf16", "bfloat16")
            else jnp.float32
        )
        model = SyncFusionDiffusion.from_config(
            cfg.model, dtype=dtype, compat=True if is_torch_ckpt else None
        )
        embedder = build_embedder(cfg.model)
        params = load_params(model, model_path, cfg.gen_length, cfg.model)
        exp_fn(
            model=model,
            params=params,
            dataset=dataset_fn(),
            embed_audio=embedder.embed_audio,
            embed_text=embedder.embed_text,
        )
    else:  # prepare_gt_for_fad
        exp_fn(dataset=dataset_fn())

    if cfg.get("evaluation"):
        results = instantiate(cfg.evaluation)()
        df = pd.DataFrame([results])
        out = Path(cfg.experiment_path) / "metrics.csv"
        df.to_csv(out, index=False)
        log.info("metrics: %s → %s", results, out)
        print(df.to_string(index=False))


if __name__ == "__main__":
    main()
