#!/usr/bin/env python
"""Numerical parity checks against the reference implementation.

Builds the reference's OWN torch modules (from ``--reference_dir``, never
vendored here), pushes their state dicts through our converters, runs both
sides on identical inputs, and reports max deviation.  With the published
checkpoints present, pass ``--ckpt`` to check trained-weight parity instead
of random-init parity.

    python script/check_parity.py onset --reference_dir /root/reference
    python script/check_parity.py onset --reference_dir ... --ckpt onset.ckpt
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# Honor SYNCFUSION_PLATFORM=cpu + persistent compile cache — lets the parity
# gates (run_parity.py subprocesses) run while the exclusive TPU tunnel is
# busy, and in CI against synthesized weight files.
from syncfusion_tpu.core.cache import enable_compile_cache
enable_compile_cache()

import numpy as np


def check_onset(reference_dir: str, ckpt: str | None, tol: float) -> float:
    import torch

    sys.path.insert(0, reference_dir)
    from main.onset_net import VideoOnsetNet  # the reference's own code

    import jax.numpy as jnp

    from syncfusion_tpu.models.onset_net import (
        VideoOnsetNet as OurNet,
        convert_torch_r2plus1d,
    )

    ref = VideoOnsetNet(pretrained=False)
    if ckpt:
        blob = torch.load(ckpt, map_location="cpu", weights_only=False)
        sd = blob.get("state_dict", blob)
        remapped = {k.replace("model.", "", 1) if k.startswith("model.net") else k: v
                    for k, v in sd.items()}
        matched = set(remapped) & set(ref.state_dict())
        # strict=False must not become a silent no-op load: a ckpt whose keys
        # don't map onto the reference module (wrong file, wrong layout)
        # would otherwise "pass" the gate against random init
        assert matched, (
            f"--ckpt {ckpt}: ZERO keys matched the reference VideoOnsetNet "
            f"(first ckpt keys: {sorted(remapped)[:3]})"
        )
        ref.load_state_dict(remapped, strict=False)
        print(f"check_onset: loaded {len(matched)}/{len(ref.state_dict())} "
              f"reference keys from {ckpt}")
    ref.eval()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()
          if "num_batches_tracked" not in k}
    tree = convert_torch_r2plus1d(sd)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 8, 64, 64)).astype(np.float32)  # torch layout
    with torch.no_grad():
        out_ref = ref(torch.tensor(x)).numpy()

    ours = OurNet()
    out_ours = np.asarray(ours.apply(
        {"params": tree["params"], "batch_stats": tree["batch_stats"]},
        jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1))),  # → (B, T, H, W, C)
        train=False,
    ))
    dev = float(np.abs(out_ours - out_ref).max())
    rel = dev / max(float(np.abs(out_ref).max()), 1e-9)
    print(f"onset logits: max|Δ|={dev:.3e} (rel {rel:.3e}) "
          f"{'OK' if rel < tol else 'FAIL'}")
    return rel


def _report(name: str, out_ours: np.ndarray, out_ref: np.ndarray, tol: float) -> float:
    dev = float(np.abs(out_ours - out_ref).max())
    rel = dev / max(float(np.abs(out_ref).max()), 1e-9)
    print(f"{name}: max|Δ|={dev:.3e} (rel {rel:.3e}) {'OK' if rel < tol else 'FAIL'}")
    return rel


def _ref_path(reference_dir: str) -> None:
    sys.path.insert(0, reference_dir)                       # for CondFoleyGen.*
    sys.path.insert(0, str(Path(reference_dir) / "CondFoleyGen"))


def check_vqgan_autoencoder(reference_dir: str, ckpt: str | None, tol: float) -> float:
    import torch

    _ref_path(reference_dir)
    from specvqgan.modules.diffusionmodules.model import Decoder, Encoder

    import jax.numpy as jnp

    from syncfusion_tpu.models.vqgan.autoencoder import Decoder2d, Encoder2d
    from syncfusion_tpu.models.vqgan.convert import convert_torch_vqgan

    dd = dict(ch=32, ch_mult=(1, 2, 2), num_res_blocks=1, attn_resolutions=[10],
              resolution=40, in_channels=1, z_channels=32, double_z=False,
              out_ch=1, dropout=0.0)
    torch.manual_seed(0)
    enc_t = Encoder(**dd).eval()
    dec_t = Decoder(**dd).eval()
    sd = {f"encoder.{k}": v.detach().numpy() for k, v in enc_t.state_dict().items()}
    sd.update({f"decoder.{k}": v.detach().numpy() for k, v in dec_t.state_dict().items()})
    # dummy quantizer/conv entries so the converter runs whole
    sd["quantize.embedding.weight"] = np.zeros((4, 4), np.float32)
    for k in ("quant_conv", "post_quant_conv"):
        sd[f"{k}.weight"] = np.zeros((4, 4, 1, 1), np.float32)
        sd[f"{k}.bias"] = np.zeros((4,), np.float32)
    tree = convert_torch_vqgan(sd, ch_mult=(1, 2, 2), num_res_blocks=1)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 1, 20, 40)).astype(np.float32)
    with torch.no_grad():
        z_ref = enc_t(torch.tensor(x)).numpy()
        rec_ref = dec_t(torch.tensor(z_ref)).numpy()

    enc = Encoder2d(ch=32, ch_mult=(1, 2, 2), num_res_blocks=1,
                    attn_resolutions=(10,), resolution=40, z_channels=32)
    z_ours = np.asarray(enc.apply({"params": tree["params"]["encoder"]},
                                  jnp.asarray(np.transpose(x, (0, 2, 3, 1)))))
    rel1 = _report("vqgan encoder", np.transpose(z_ours, (0, 3, 1, 2)), z_ref, tol)

    dec = Decoder2d(ch=32, ch_mult=(1, 2, 2), num_res_blocks=1,
                    attn_resolutions=(10,), resolution=40, out_ch=1)
    rec_ours = np.asarray(dec.apply({"params": tree["params"]["decoder"]},
                                    jnp.asarray(np.transpose(z_ref, (0, 2, 3, 1)))))
    rel2 = _report("vqgan decoder", np.transpose(rec_ours, (0, 3, 1, 2)), rec_ref, tol)
    return max(rel1, rel2)


def check_quantizer(reference_dir: str, ckpt: str | None, tol: float) -> float:
    import torch

    _ref_path(reference_dir)
    from specvqgan.modules.vqvae.quantize import VectorQuantizer as RefVQ

    from syncfusion_tpu.models.vqgan.quantize import VectorQuantizer

    torch.manual_seed(0)
    ref = RefVQ(32, 8, beta=0.25)
    z = np.random.default_rng(0).normal(size=(2, 8, 5, 10)).astype(np.float32)
    with torch.no_grad():
        zq_ref, loss_ref, _ = ref(torch.tensor(z))

    import jax.numpy as jnp

    q = VectorQuantizer(n_e=32, e_dim=8)
    params = {"params": {"embedding": jnp.asarray(ref.embedding.weight.detach().numpy())}}
    zq_ours, loss_ours, _ = q.apply(params, jnp.asarray(np.transpose(z, (0, 2, 3, 1))))
    rel = _report("quantizer z_q", np.transpose(np.asarray(zq_ours), (0, 3, 1, 2)),
                  zq_ref.numpy(), tol)
    rel = max(rel, _report("quantizer loss", np.asarray(loss_ours),
                           loss_ref.numpy(), tol))
    return rel


def check_mingpt(reference_dir: str, ckpt: str | None, tol: float) -> float:
    import torch

    _ref_path(reference_dir)
    from specvqgan.modules.transformer.mingpt import GPTConfig as RefCfg, GPT as RefGPT

    import jax.numpy as jnp

    from syncfusion_tpu.models.mingpt import GPTConfig, GPTFeats
    from syncfusion_tpu.models.vqgan.convert import convert_torch_mingpt

    torch.manual_seed(0)
    ref = RefGPT(vocab_size=32, block_size=24, n_layer=2, n_head=2, n_embd=16,
                 embd_pdrop=0.0, attn_pdrop=0.0, resid_pdrop=0.0).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()
          if "attn.mask" not in k}
    tree = convert_torch_mingpt(sd, prefix="")

    toks = np.array([[1, 2, 3, 4, 5, 6]], np.int64)
    with torch.no_grad():
        logits_ref = ref(torch.tensor(toks))[0].numpy()

    ours = GPTFeats(GPTConfig(vocab_size=32, block_size=24, n_layer=2,
                              n_head=2, n_embd=16))
    logits_ours = np.asarray(ours.apply(tree, jnp.asarray(toks, jnp.int32), None))
    return _report("mingpt logits", logits_ours, logits_ref, tol)


def check_melgan(reference_dir: str, ckpt: str | None, tol: float) -> float:
    import torch

    _ref_path(reference_dir)
    from specvqgan.models.vocoder_melgan import Generator as RefGen

    import jax.numpy as jnp

    from syncfusion_tpu.models.melgan import MelGANGenerator, convert_melgan

    torch.manual_seed(0)
    ref = RefGen(80, ngf=32, n_residual_layers=3).eval()
    if ckpt:
        ref.load_state_dict(torch.load(ckpt, map_location="cpu"))
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    tree = convert_melgan(sd)

    mel = np.random.default_rng(0).normal(size=(1, 80, 20)).astype(np.float32)
    with torch.no_grad():
        wav_ref = ref(torch.tensor(mel)).numpy()[:, 0]

    ours = MelGANGenerator()
    wav_ours = np.asarray(
        ours.apply(tree, jnp.asarray(np.transpose(mel, (0, 2, 1))))
    )
    return _report("melgan waveform", wav_ours, wav_ref, tol)


def check_discriminator(reference_dir: str, ckpt: str | None, tol: float) -> float:
    import torch

    _ref_path(reference_dir)
    from specvqgan.modules.discriminator.model import (
        NLayerDiscriminator as RefDisc,
        weights_init,
    )

    import jax.numpy as jnp

    from syncfusion_tpu.core.checkpoint import t_conv2d
    from syncfusion_tpu.models.vqgan.discriminator import NLayerDiscriminator

    torch.manual_seed(0)
    ref = RefDisc(input_nc=1, ndf=8, n_layers=3).apply(weights_init).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    # reference Sequential: [conv, lrelu] + per-layer [conv, bn, lrelu] + final conv
    params: dict = {"conv0": {"kernel": t_conv2d(sd["main.0.weight"]),
                              "bias": sd["main.0.bias"]}}
    stats: dict = {}
    idx = 2
    for n in range(1, 4):
        params[f"conv{n}"] = {"kernel": t_conv2d(sd[f"main.{idx}.weight"])}
        params[f"bn{n}"] = {"scale": sd[f"main.{idx+1}.weight"],
                            "bias": sd[f"main.{idx+1}.bias"]}
        stats[f"bn{n}"] = {"mean": sd[f"main.{idx+1}.running_mean"],
                           "var": sd[f"main.{idx+1}.running_var"]}
        idx += 3
    params["conv_out"] = {"kernel": t_conv2d(sd[f"main.{idx}.weight"]),
                          "bias": sd[f"main.{idx}.bias"]}

    x = np.random.default_rng(0).normal(size=(2, 1, 80, 160)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.tensor(x)).numpy()
    ours = NLayerDiscriminator(ndf=8, n_layers=3)
    out_ours = np.asarray(ours.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))), train=False,
    ))
    return _report("discriminator logits",
                   np.transpose(out_ours, (0, 3, 1, 2)), out_ref, tol)


def check_adp_variant_sweep(ckpt: str, data: str | None, n_chunks: int = 8) -> dict:
    """D4 disambiguation gate (docs/AUNET_MANIFEST.md): requires the REAL
    published diffusion checkpoint (env-gated — Zenodo 12634630).

    The positional converter matches by order+shape, so a wrong cat-order /
    skip-scale guess loads cleanly but scrambles trained weights.  This
    sweep loads the ckpt into every (cat_order × skip_scale) variant of the
    compat model and computes the deterministic v-diffusion loss on test
    chunks: the correct wiring must land near the published valid_loss
    (0.008, reference README.md:192) and beat the alternatives decisively.
    Returns {variant: loss}, prints the winner.
    """
    import dataclasses
    import itertools

    import jax
    import jax.numpy as jnp

    from syncfusion_tpu.models.adp_compat import Encoder1dCompat, UNetV0Compat
    from syncfusion_tpu.models.adp_convert import load_diffusion_ckpt
    from syncfusion_tpu.models.adp_torch_recon import Encoder1dConfig, UNetV0Config
    from syncfusion_tpu.models.syncfusion import SyncFusionDiffusion

    if data:
        from syncfusion_tpu.data.sfx_dataset import collate, create_sfx_dataset

        items = list(itertools.islice(
            create_sfx_dataset(data, sample_rate=48000, chunk_size=2**18,
                               shift_augment=False, cut_prefix=True,
                               one_chunk_per_track=True, shardshuffle=False,
                               seed=0),
            n_chunks))
        batch = collate(items)                  # (B, L, 1) model-facing layout
        wav, onsets = batch["wav"], batch["onsets"]
    else:  # synthetic fallback — still discriminative, not the real gate
        rng = np.random.default_rng(0)
        wav = rng.normal(size=(n_chunks, 2**18, 1)).astype(np.float32) * 0.1
        onsets = np.zeros_like(wav)
        onsets[:, ::48000] = 1.0

    emb = np.zeros((wav.shape[0], 1, 512), np.float32)
    ecfg = Encoder1dConfig()
    losses: dict[str, float] = {}
    for cat, scale in itertools.product(("skip_first", "x_first"), (2.0**-0.5, 1.0)):
        ucfg = dataclasses.replace(UNetV0Config(), cat_order=cat, skip_scale=scale)
        params = load_diffusion_ckpt(ckpt, ucfg, ecfg)
        model = SyncFusionDiffusion(
            unet=UNetV0Compat(cfg=ucfg), onsets_encoder=Encoder1dCompat(cfg=ecfg)
        )
        loss = jax.jit(model.loss)(
            params, jax.random.key(0), jnp.asarray(wav), jnp.asarray(onsets),
            jnp.asarray(emb),
        )
        name = f"cat={cat},skip_scale={scale:.4f}"
        losses[name] = float(loss)
        print(f"adp_variant_sweep: {name}: v-loss {losses[name]:.6f}")

    best = min(losses, key=losses.get)
    ranked = sorted(losses.values())
    margin = ranked[1] / max(ranked[0], 1e-12)
    print(f"adp_variant_sweep: best = {best} "
          f"(margin vs runner-up {margin:.2f}x)")
    if best != "cat=skip_first,skip_scale=0.7071":
        print("adp_variant_sweep: WARNING — derivation default is NOT the "
              "best variant; update UNetV0Config defaults to the winner.")
    return losses


def main(argv=None) -> None:
    checks = {
        "onset": check_onset,
        "vqgan": check_vqgan_autoencoder,
        "quantizer": check_quantizer,
        "mingpt": check_mingpt,
        "melgan": check_melgan,
        "discriminator": check_discriminator,
    }
    ap = argparse.ArgumentParser()
    ap.add_argument("component", choices=[*checks, "adp_variant_sweep", "all"])
    ap.add_argument("--reference_dir", required=False, default=None)
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--data", default=None,
                    help="test shard .tar for the adp_variant_sweep gate")
    ap.add_argument("--tol", type=float, default=1e-4)
    args = ap.parse_args(argv)

    if args.component == "adp_variant_sweep":
        if not args.ckpt:
            sys.exit("adp_variant_sweep needs --ckpt <epoch=784...ckpt> "
                     "(published checkpoint, Zenodo 12634630 — env-gated)")
        check_adp_variant_sweep(args.ckpt, args.data)
        return

    assert args.reference_dir, "--reference_dir is required"
    names = list(checks) if args.component == "all" else [args.component]
    worst = 0.0
    for name in names:
        worst = max(worst, checks[name](args.reference_dir, args.ckpt, args.tol))
    sys.exit(0 if worst < args.tol else 1)


if __name__ == "__main__":
    main()
