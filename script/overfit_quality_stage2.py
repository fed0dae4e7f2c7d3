"""Overfit-to-quality proof for the stage-2 (CondFoleyGen GPT) path.

Companion to script/overfit_quality.py: shows the AV-conditional GPT
actually learns to *use its conditioning*, not merely that loss descends.
Synthetic task mirroring Net2NetTransformerAVCond's structure
(models/transformer_av.py:94-117, reference CondFoleyGen
specvqgan/models/cond_transformer.py forward:151-199):

  * each example has a class id c; the "video features" (the prepended
    conditioning, GPTFeats) deterministically encode c;
  * the token sequence is [cond-half z', ref-half z] where z is a fixed
    per-class pattern and z' comes from an INDEPENDENT random class — so the
    ref half is predictable only through the features, exactly the
    cross-modal skill stage 2 exists for;
  * training uses the real CE-on-ref-half slicing and the real optimizer
    recipe (train/transformer_trainer.py:50-57 — AdamW with minGPT selective
    decay mask, clip 1.0);
  * quality metric: greedy next-token accuracy on the ref half, and
    exact-token accuracy of KV-cached sampling (models/mingpt_decode.py)
    against the class pattern.  Chance is 1/vocab; learned is ~1.0.

Runs on CPU in a few minutes.  Results recorded in README.
"""

from __future__ import annotations

import argparse
import json
import sys
import os
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import optax

VOCAB = 128
CLIP = 10          # tokens per half (flagship uses 50 = 5x10 grid)
N_CLASSES = 8
FEAT_DIM = 64
N_FRAMES = 6


def make_dataset(rng: np.random.RandomState):
    patterns = rng.randint(0, VOCAB, size=(N_CLASSES, CLIP))
    protos = rng.randn(N_CLASSES, N_FRAMES, FEAT_DIM).astype(np.float32)

    def batch(n):
        c_ref = rng.randint(0, N_CLASSES, n)
        c_cond = rng.randint(0, N_CLASSES, n)
        feats = protos[c_ref]
        tokens = np.concatenate([patterns[c_cond], patterns[c_ref]], axis=1)
        return jnp.asarray(feats), jnp.asarray(tokens), c_ref

    return patterns, batch


def ce_on_ref_half(gpt, params, tokens, feats):
    """The stage-2 objective (transformer_av.py:108-117)."""
    logits = gpt.apply(params, tokens[:, :-1], feats)
    cond_size = feats.shape[1]
    logits = logits[:, cond_size - 1 :][:, CLIP:]
    target = tokens[:, CLIP:]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, target[..., None], axis=-1)
    return jnp.mean(nll), logits


def evaluate(gpt, params, batch_fn, patterns, key):
    from syncfusion_tpu.models.mingpt_decode import sample_tokens_cached

    feats, tokens, c_ref = batch_fn(64)
    _, logits = ce_on_ref_half(gpt, params, tokens, feats)
    greedy_acc = float(jnp.mean(jnp.argmax(logits, -1) == tokens[:, CLIP:]))

    # KV-cached sampling from the cond half, top_k=1 (greedy)
    out = sample_tokens_cached(
        params, feats, tokens[:, :CLIP], CLIP, key,
        config=gpt.config, temperature=1.0, top_k=1,
    )
    gen = np.asarray(out[:, CLIP:])
    sample_acc = float(np.mean(gen == patterns[c_ref]))
    return {"greedy_acc": round(greedy_acc, 4), "sample_acc": round(sample_acc, 4)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from syncfusion_tpu.models.mingpt import GPTConfig, GPTFeats
    from syncfusion_tpu.train.transformer_trainer import decay_mask

    cfg = GPTConfig(
        vocab_size=VOCAB, block_size=N_FRAMES + 2 * CLIP, n_layer=4, n_head=4,
        n_embd=128,
    )
    gpt = GPTFeats(cfg)
    rng = np.random.RandomState(0)
    patterns, batch_fn = make_dataset(rng)

    feats0, tokens0, _ = batch_fn(2)
    params = jax.jit(
        lambda: gpt.init(jax.random.key(0), tokens0[:, :-1], feats0)
    )()

    # real stage-2 recipe: AdamW + selective decay + clip 1.0
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(args.lr, b1=0.9, b2=0.95, weight_decay=0.01, mask=decay_mask),
    )
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, tokens, feats):
        (loss, _), grads = jax.value_and_grad(
            lambda p: ce_on_ref_half(gpt, p, tokens, feats), has_aux=True
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    results = [dict(tag="init", step=0,
                    **evaluate(gpt, params, batch_fn, patterns, jax.random.key(1)))]
    print(json.dumps(results[-1]), flush=True)

    t0 = time.time()
    for step in range(1, args.steps + 1):
        feats, tokens, _ = batch_fn(args.batch)
        params, opt_state, loss = train_step(params, opt_state, tokens, feats)
        if step % 100 == 0:
            print(json.dumps({"step": step, "loss": round(float(loss), 4),
                              "wall_s": round(time.time() - t0, 1)}), flush=True)
        if step == args.steps // 2:
            results.append(dict(tag="mid", step=step,
                                **evaluate(gpt, params, batch_fn, patterns,
                                           jax.random.key(2))))
            print(json.dumps(results[-1]), flush=True)

    results.append(dict(tag="final", step=args.steps,
                        **evaluate(gpt, params, batch_fn, patterns, jax.random.key(3))))
    print(json.dumps(results[-1]), flush=True)

    improved = (
        results[-1]["sample_acc"] > 0.9
        and results[-1]["sample_acc"] > results[0]["sample_acc"]
    )
    print(json.dumps({"quality_improved": improved, "results": results}), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"quality_improved": improved, "results": results}, f, indent=2)
    sys.exit(0 if improved else 1)


if __name__ == "__main__":
    main()
