"""Overfit-to-quality integration proof for the diffusion stack.

With the reference's published checkpoints unfetchable in this environment,
this experiment is the in-env evidence that the training loop reaches
*quality*, not merely that the loss descends: a tiny synthetic foley set
(decaying noise bursts at known onset times) is overfit with the REAL
trainer (train/diffusion_trainer.py, reference recipe exp/model/
diffusion.yaml:5-9), and generation quality is scored at init / mid / final
with the REAL eval metrics:

  * FAD (mel-stats backend, eval/fad.py) between generated and training
    clips — reference protocol main/evaluation.py:17-24;
  * onset detection accuracy of the generated audio against the
    conditioning onsets (librosa-equivalent detector + NMS + greedy
    matching, script/evaluate_onset.py:127-191 semantics).

Both must improve monotonically from the init model.  Run on CPU (forces
the cpu platform); takes ~10-20 min.  Results are recorded in README.

Usage: python script/overfit_quality.py [--steps N] [--clips N] [--out FILE]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")
else:
    sys.argv.remove("--tpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
    )

import jax.numpy as jnp
import numpy as np

SR = 48000
LENGTH = 65536  # 1.37 s — one VGGish mel patch per clip
DETECT_SR = 22050


def make_clip(rng: np.random.RandomState, length: int) -> tuple[np.ndarray, np.ndarray]:
    """One synthetic foley clip: 2-4 decaying band-noise bursts + pings."""
    n_onsets = rng.randint(2, 5)
    onsets: list[int] = []
    while len(onsets) < n_onsets:
        cand = rng.randint(4096, length - 12000)
        if all(abs(cand - o) > 9600 for o in onsets):  # >=0.2 s apart
            onsets.append(cand)
    onsets = sorted(onsets)
    wav = np.zeros(length, np.float32)
    t = np.arange(12000, dtype=np.float32) / SR
    for o in onsets:
        tau = 0.02 + 0.03 * rng.rand()
        env = np.exp(-t / tau)
        noise = rng.randn(12000).astype(np.float32)
        # crude band shaping: difference filter ~ high-pass
        noise = np.diff(noise, prepend=0.0)
        ping = np.sin(2 * np.pi * (400 + 800 * rng.rand()) * t)
        burst = env * (0.6 * noise / max(1e-6, np.abs(noise).max()) + 0.4 * ping)
        wav[o : o + 12000] += 0.7 * burst
    track = np.zeros(length, np.float32)
    track[onsets] = 1.0
    return wav, track


def build_dataset(n_clips: int, seed: int = 0):
    rng = np.random.RandomState(seed)
    wavs, tracks = zip(*(make_clip(rng, LENGTH) for _ in range(n_clips)))
    return np.stack(wavs)[..., None], np.stack(tracks)[..., None]


def build_model():
    from syncfusion_tpu.models.encoder1d import Encoder1d
    from syncfusion_tpu.models.syncfusion import SyncFusionDiffusion
    from syncfusion_tpu.models.unet1d import UNet1d

    encoder = Encoder1d(
        channels=4, multipliers=(1, 2, 4, 8, 8), factors=(1, 4, 4, 4),
        num_blocks=(1, 1, 1, 1), resnet_groups=2,
    )
    unet = UNet1d(
        channels=(8, 32, 64, 128), factors=(1, 4, 4, 4), items=(1, 2, 2, 2),
        attentions=(0, 0, 0, 1), cross_attentions=(1, 1, 1, 1),
        context_channels=(8, 16, 32, 0), resnet_groups=8,
    )
    # fold_cap=0: the folded layout is a TPU-lane optimization; on the CPU
    # this proof runs on it only multiplies conv FLOPs (equivalence is
    # separately pinned by tests/test_unet_folded.py)
    return SyncFusionDiffusion(unet=unet, onsets_encoder=encoder, fold_cap=0)


def evaluate(model, params, wavs, tracks, key, num_steps=50):
    """Generate from the training onset tracks and score FAD + onset acc."""
    from syncfusion_tpu.eval.fad import MelStatsEmbedder, frechet_distance, gaussian_stats
    from syncfusion_tpu.eval.onset_detect import onset_detect
    from syncfusion_tpu.eval.onset_metrics import match_onsets
    from syncfusion_tpu.ops.resample import resample

    noise = jax.random.normal(key, wavs.shape, jnp.float32)
    gen = np.asarray(
        jax.jit(lambda p, n: model.sample(p, n, jnp.asarray(tracks), None,
                                          num_steps=num_steps))(params, noise)
    )[..., 0]

    emb = MelStatsEmbedder()
    e_gen = np.concatenate([emb.embed(g, SR) for g in gen])
    e_gt = np.concatenate([emb.embed(w, SR) for w in wavs[..., 0]])
    fad = frechet_distance(*gaussian_stats(e_gen), *gaussian_stats(e_gt))

    accs, matches = [], []
    y_true_all: list[int] = []
    y_score_all: list[float] = []
    for g, tr in zip(gen, tracks[..., 0]):
        g22 = resample(g, SR, DETECT_SR)
        pred = onset_detect(g22, sr=DETECT_SR)
        gt = np.flatnonzero(tr) * DETECT_SR // SR
        res = match_onsets(gt, pred, g22)
        accs.append(res["acc"])
        matches.append(res["count_match"])
        y_true_all += res["y_true"]
        y_score_all += res["y_score"]
    if len(set(y_true_all)) > 1:
        from sklearn.metrics import average_precision_score

        ap = float(average_precision_score(y_true_all, y_score_all))
    else:
        ap = float(np.mean(y_true_all)) if y_true_all else 0.0
    return {"fad_melstats": round(float(fad), 4),
            "onset_acc": round(float(np.mean(accs)), 4),
            "onset_ap": round(ap, 4),
            "onset_count_acc": round(float(np.mean(matches)), 4)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--clips", type=int, default=16)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--out", default=None)
    ap.add_argument("--distill", action="store_true",
                    help="after training, progressively distill 64->8 "
                         "sampler steps and score the student (few-step "
                         "serving capability demo)")
    ap.add_argument("--distill_steps", type=int, default=300,
                    help="optimizer steps per halving round")
    args = ap.parse_args()

    from syncfusion_tpu.train.diffusion_trainer import DiffusionTrainer, OptimizerConfig

    wavs, tracks = build_dataset(args.clips)
    model = build_model()
    params = model.init(jax.random.key(0), LENGTH, batch=1)
    n_params = model.param_count(params)
    trainer = DiffusionTrainer(
        model, OptimizerConfig(lr=args.lr, accumulate_grad_batches=1)
    )
    state = trainer.create_state(params)

    results = []

    def checkpoint(tag, state):
        r = {"tag": tag, "step": int(state.step)}
        r.update(evaluate(model, state.params, wavs, tracks, jax.random.key(999)))
        results.append(r)
        print(json.dumps(r), flush=True)

    print(json.dumps({"params": n_params, "clips": args.clips,
                      "length": LENGTH, "steps": args.steps}), flush=True)
    checkpoint("init", state)

    rng = np.random.RandomState(7)
    t0 = time.time()
    mid = args.steps // 2
    for step in range(1, args.steps + 1):
        idx = rng.choice(len(wavs), args.batch, replace=False)
        batch = {"wav": jnp.asarray(wavs[idx]), "onsets": jnp.asarray(tracks[idx])}
        state, metrics = trainer.train_step(state, batch, jax.random.key(step))
        if step % 50 == 0 or step == 5:
            print(json.dumps({"step": step,
                              "train_loss": round(float(metrics["train_loss"]), 5),
                              "wall_s": round(time.time() - t0, 1)}), flush=True)
        if step == mid:
            checkpoint("mid", state)
    checkpoint("final", state)

    # Onset metrics read as saturated even at init (the random-weight UNet
    # leaks onset-context structure the detector picks up), so improvement
    # is gated on FAD dropping hard while the onset metrics are absolutely
    # high.  Reference run (TPU, 2500 steps, recorded in README): FAD
    # 3551.6 -> 403.0 (8.8x), acc 1.0, AP 0.892, count-match 0.81.
    final = results[-1]
    improved = (
        final["fad_melstats"] < 0.25 * results[0]["fad_melstats"]
        and final["onset_acc"] >= 0.95
        and final["onset_ap"] >= 0.85
        and final["onset_count_acc"] >= 0.5
    )
    distill_report = None
    if args.distill:
        from syncfusion_tpu.train.distill import DistillConfig, ProgressiveDistiller

        rng2 = np.random.RandomState(11)

        def batch_fn(step):
            idx = rng2.choice(len(wavs), args.batch, replace=False)
            return {"wav": jnp.asarray(wavs[idx]), "onsets": jnp.asarray(tracks[idx])}

        dist = ProgressiveDistiller(
            model,
            DistillConfig(start_steps=64, final_steps=8,
                          steps_per_round=args.distill_steps),
        )
        distilled, n = dist.distill(
            state.params, batch_fn, jax.random.key(555),
            log_fn=lambda m: print(json.dumps(m), flush=True),
        )
        teacher64 = evaluate(model, state.params, wavs, tracks,
                             jax.random.key(999), num_steps=64)
        teacher8 = evaluate(model, state.params, wavs, tracks,
                            jax.random.key(999), num_steps=n)
        student8 = evaluate(model, distilled, wavs, tracks,
                            jax.random.key(999), num_steps=n)
        distill_report = {
            "teacher_64step": teacher64,
            f"teacher_{n}step_naive": teacher8,
            f"student_{n}step_distilled": student8,
        }
        print(json.dumps({"distill": distill_report}), flush=True)

    print(json.dumps({"quality_improved": improved, "results": results}), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"quality_improved": improved, "results": results,
                       "distill": distill_report}, f, indent=2)
    sys.exit(0 if improved else 1)


if __name__ == "__main__":
    main()
