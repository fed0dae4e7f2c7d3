"""Perf sweep for the serving path: plain vs folded layout vs param dtype.

Runs the full-size flagship sampler (150-step CFG, batch 8, 2^18 samples) on
the attached TPU chip under several execution configs and prints a JSON line
per variant.  Used to pick bench.py defaults; results recorded in README.

Usage: python script/perf_sweep.py [variant ...]
Variants: plain folded256 folded1024 plain_bf16p folded256_bf16p
(default: all).  Serialize against other TPU jobs — the tunnel is exclusive.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp

LENGTH = 2**18
NUM_STEPS = 150
BATCH = 8
SAMPLE_RATE = 48000
CLIP_SECONDS = 8.0
BASELINE = 50.0 / 8.0

VARIANTS = {
    "plain": dict(fold_cap=0, bf16_params=False),
    "folded256": dict(fold_cap=256, bf16_params=False),
    "folded1024": dict(fold_cap=1024, bf16_params=False),
    "plain_bf16p": dict(fold_cap=0, bf16_params=True),
    "folded256_bf16p": dict(fold_cap=256, bf16_params=True),
    "folded256_b16": dict(fold_cap=256, bf16_params=False, batch=16),
    "folded256_b4": dict(fold_cap=256, bf16_params=False, batch=4),
    "folded256_b2": dict(fold_cap=256, bf16_params=False, batch=2),
    "folded256_b4_bf16p": dict(fold_cap=256, bf16_params=True, batch=4),
    "folded256_b6": dict(fold_cap=256, bf16_params=False, batch=6),
    # producer-side GN stats fusion (ops/fused_resblock.fused_affine_silu_conv_stats)
    "folded256_b4_stats": dict(fold_cap=256, bf16_params=False, batch=4,
                               fused_stats=True),
    "folded256_stats": dict(fold_cap=256, bf16_params=False, fused_stats=True),
    # guidance interval (Kynkaanniemi 2024): CFG only for sigma in [lo, hi];
    # steps outside run the cond-only forward at half compute
    "folded256_b4_gi07": dict(fold_cap=256, bf16_params=False, batch=4,
                              guidance_interval=(0.0, 0.7)),
    "folded256_b4_gi0107": dict(fold_cap=256, bf16_params=False, batch=4,
                                guidance_interval=(0.1, 0.7)),
    "folded256_b4_gi0208": dict(fold_cap=256, bf16_params=False, batch=4,
                                guidance_interval=(0.2, 0.8)),
    # diagnostics: is the per-step cost batch-bound or floor-bound?
    "folded256_b4_s1": dict(fold_cap=256, bf16_params=False, batch=4,
                            embedding_scale=1.0),
    "folded256_b8_gi0107": dict(fold_cap=256, bf16_params=False, batch=8,
                                guidance_interval=(0.1, 0.7)),
    "folded256_b6_gi0107": dict(fold_cap=256, bf16_params=False, batch=6,
                                guidance_interval=(0.1, 0.7)),
    "folded256_b16_gi0107": dict(fold_cap=256, bf16_params=False, batch=16,
                                 guidance_interval=(0.1, 0.7)),
    # DPM-Solver++(2M) serving candidates at 32 steps.  The on-chip quality
    # curve (docs/REHEARSAL.md §7) measured DDIM better at every matched
    # step count on this model — these rows document that the second-order
    # update itself is throughput-free and the band adds +25%.  Throughput
    # rows only; NOT comparable to the 150-step headline protocol rows.
    "folded256_b8_ddim32": dict(fold_cap=256, bf16_params=False, batch=8,
                                num_steps=32),
    "folded256_b8_dpm32": dict(fold_cap=256, bf16_params=False, batch=8,
                               num_steps=32, sampler="dpm"),
    "folded256_b8_dpm32_s15_band": dict(fold_cap=256, bf16_params=False,
                                        batch=8, num_steps=32, sampler="dpm",
                                        embedding_scale=1.5,
                                        guidance_interval=(0.2, 0.8)),
    # symmetric DDIM cell for the REHEARSAL §7 serving-stack comparison
    "folded256_b8_ddim32_s15_band": dict(fold_cap=256, bf16_params=False,
                                         batch=8, num_steps=32,
                                         embedding_scale=1.5,
                                         guidance_interval=(0.2, 0.8)),
    # DeepCache deep-feature reuse (models/diffusion._cache_scan): deep half
    # of the UNet recomputed every K-th step.  dcK = interval K, sS = split
    # level S (levels >= S cached).  Quality curves ride REHEARSAL §11.
    "folded256_b8_dc2": dict(fold_cap=256, bf16_params=False, batch=8,
                             deep_cache_interval=2),
    "folded256_b8_dc3": dict(fold_cap=256, bf16_params=False, batch=8,
                             deep_cache_interval=3),
    "folded256_b8_dc3_s3": dict(fold_cap=256, bf16_params=False, batch=8,
                                deep_cache_interval=3, deep_split=3),
    "folded256_b8_band_dc2": dict(fold_cap=256, bf16_params=False, batch=8,
                                  guidance_interval=(0.2, 0.8),
                                  deep_cache_interval=2),
    "folded256_b8_band_dc3": dict(fold_cap=256, bf16_params=False, batch=8,
                                  guidance_interval=(0.2, 0.8),
                                  deep_cache_interval=3),
    "folded256_b8_band_dc4": dict(fold_cap=256, bf16_params=False, batch=8,
                                  guidance_interval=(0.2, 0.8),
                                  deep_cache_interval=4),
    "folded256_b8_band_dc5": dict(fold_cap=256, bf16_params=False, batch=8,
                                  guidance_interval=(0.2, 0.8),
                                  deep_cache_interval=5),
    "folded256_b8_band_dc6": dict(fold_cap=256, bf16_params=False, batch=8,
                                  guidance_interval=(0.2, 0.8),
                                  deep_cache_interval=6),
    "folded256_b8_dpm32_s15_band_dc2": dict(fold_cap=256, bf16_params=False,
                                            batch=8, num_steps=32,
                                            sampler="dpm",
                                            embedding_scale=1.5,
                                            guidance_interval=(0.2, 0.8),
                                            deep_cache_interval=2),
    "folded256_b8_dpm32_s15_band_dc3": dict(fold_cap=256, bf16_params=False,
                                            batch=8, num_steps=32,
                                            sampler="dpm",
                                            embedding_scale=1.5,
                                            guidance_interval=(0.2, 0.8),
                                            deep_cache_interval=3),
    # non-uniform cadence (deep_cache_refresh_mask pow=2: same refresh count
    # as dc3, spacing denser at low sigma) — throughput should match dc3
    "folded256_b8_band_nu3": dict(fold_cap=256, bf16_params=False, batch=8,
                                  guidance_interval=(0.2, 0.8),
                                  deep_cache_interval=3, deep_cache_pow=2.0),
    "train_plain": dict(fold_cap=0, train=True),
    "train_folded256": dict(fold_cap=256, train=True),
    "train_folded256_flash": dict(fold_cap=256, train=True, flash=True),
}


def run_train(name: str, fold_cap: int, flash: bool = False) -> None:
    """Full-size train step (reference recipe, batch 2, accum off) timing."""
    import dataclasses as dc

    from syncfusion_tpu.models.syncfusion import SyncFusionDiffusion
    from syncfusion_tpu.train.diffusion_trainer import DiffusionTrainer, OptimizerConfig

    b = 2
    model = SyncFusionDiffusion.from_config(None, dtype=jnp.bfloat16, fold_cap=fold_cap)
    if flash:
        model = dc.replace(model, unet=model.unet.clone(flash_attention=True))
    params = model.init(jax.random.key(0), LENGTH, batch=1)
    trainer = DiffusionTrainer(model, OptimizerConfig(accumulate_grad_batches=1))
    state = trainer.create_state(params)
    batch = {
        "wav": jax.random.normal(jax.random.key(1), (b, LENGTH, 1), jnp.float32),
        "onsets": jnp.zeros((b, LENGTH, 1), jnp.float32),
        "embedding": jax.random.normal(jax.random.key(2), (b, 1, 512), jnp.float32),
    }
    t0 = time.perf_counter()
    state, m = trainer.train_step(state, batch, jax.random.key(3))
    # scalar extraction is the only reliable device sync over this tunnel
    # (jax.block_until_ready on the metrics dict returns early - measured)
    float(m["train_loss"])
    compile_s = time.perf_counter() - t0
    n_runs = 10
    t0 = time.perf_counter()
    for i in range(n_runs):
        state, m = trainer.train_step(state, batch, jax.random.key(4 + i))
    float(m["train_loss"])
    dt = (time.perf_counter() - t0) / n_runs
    print(
        json.dumps(
            {
                "variant": name,
                "train_step_ms": round(dt * 1000, 1),
                "batch": b,
                "compile_s": round(compile_s, 1),
            }
        ),
        flush=True,
    )


def run(name: str, fold_cap: int, bf16_params: bool = False,
        batch: int = BATCH, train: bool = False, flash: bool = False,
        fused_stats: bool = False, guidance_interval=None,
        embedding_scale: float = 2.0, num_steps: int = NUM_STEPS,
        sampler: str = "ddim", deep_cache_interval: int = 0,
        deep_split: int = 4, deep_cache_pow: float = 1.0) -> None:
    if train:
        return run_train(name, fold_cap, flash)
    global BATCH
    BATCH = batch
    from syncfusion_tpu.models.syncfusion import SyncFusionDiffusion

    model = SyncFusionDiffusion.from_config(
        None, dtype=jnp.bfloat16, fold_cap=fold_cap, fused_stats=fused_stats
    )
    params = model.init(jax.random.key(0), LENGTH, batch=1)
    if bf16_params:
        params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            params,
        )

    noise = jax.random.normal(jax.random.key(1), (BATCH, LENGTH, 1), jnp.float32)
    onsets = jnp.zeros((BATCH, LENGTH, 1), jnp.float32)
    onsets = onsets.at[:, jnp.arange(BATCH) * 9600 + 4800, 0].set(1.0)
    embedding = jax.random.normal(jax.random.key(2), (BATCH, 1, 512), jnp.float32)

    @jax.jit
    def generate(params, noise):
        return model.sample(
            params, noise, onsets, embedding,
            num_steps=num_steps, embedding_scale=embedding_scale,
            guidance_interval=guidance_interval, sampler=sampler,
            deep_cache_interval=deep_cache_interval, deep_split=deep_split,
            deep_cache_pow=deep_cache_pow,
        )

    t0 = time.perf_counter()
    float(jnp.sum(generate(params, noise)))  # scalar sync (see run_train note)
    compile_s = time.perf_counter() - t0

    n_runs = 2
    t0 = time.perf_counter()
    for _ in range(n_runs):
        out = generate(params, noise)
    float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / n_runs

    audio_seconds = BATCH * LENGTH / SAMPLE_RATE
    clips_per_min = (audio_seconds / CLIP_SECONDS) / dt * 60.0
    print(
        json.dumps(
            {
                "variant": name,
                "clips_per_min_per_chip": round(clips_per_min, 2),
                "num_steps": num_steps,
                "sampler": sampler,
                "seconds_per_batch": round(dt, 3),
                "compile_s": round(compile_s, 1),
                "vs_baseline": round(clips_per_min / BASELINE, 3),
            }
        ),
        flush=True,
    )
    del params


def main() -> None:
    names = sys.argv[1:] or list(VARIANTS)
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}), flush=True)
    failed = []
    for name in names:
        # a transient tunnel error (e.g. remote_compile connection drop) on
        # one variant must not kill the rest of the sweep
        try:
            run(name, **VARIANTS[name])
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(json.dumps({"variant": name, "error": str(e)[:200]}),
                  flush=True)
    if failed:
        raise SystemExit(f"variants failed: {failed}")


if __name__ == "__main__":
    main()
