import jax
import jax.numpy as jnp
import numpy as np
import pytest

from syncfusion_tpu.models.onset_net import (
    VideoOnsetNet,
    R2Plus1D18KeepTemp,
    midplanes,
    convert_torch_r2plus1d,
)
from syncfusion_tpu.train.onset_trainer import (
    OnsetTrainer,
    bc_loss,
    onset_metrics,
    _collapse_consecutive,
)


def test_midplanes_match_reference_surgery_values():
    # the 230/460/921 widths in the reference surgery (main/onset_net.py:19-36)
    assert midplanes(64, 128) == 230
    assert midplanes(128, 256) == 460
    assert midplanes(256, 512) == 921
    assert midplanes(64, 64) == 144
    assert midplanes(128, 128) == 288


def test_onset_net_keeps_temporal_resolution():
    """(B, 30, 32, 32, 3) → (B, 30): T preserved through all 4 stages."""
    model = VideoOnsetNet()
    x = jnp.zeros((1, 30, 32, 32, 3))
    variables = jax.jit(lambda: model.init(jax.random.key(0), x, train=False))()
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, 30)


def test_backbone_feature_shape_and_spatial_downsample():
    model = R2Plus1D18KeepTemp()
    x = jnp.zeros((1, 8, 64, 64, 3))
    variables = jax.jit(lambda: model.init(jax.random.key(0), x, train=False))()
    feats = model.apply(variables, x, train=False)
    assert feats.shape == (1, 8, 512)


def test_bc_loss_matches_torch():
    import torch

    rng = np.random.default_rng(0)
    logits = rng.normal(size=(4, 30)).astype(np.float32)
    targets = (rng.random((4, 30)) < 0.1).astype(np.float32)
    targets[0, 5] = 1.0  # ensure at least one positive

    ours = float(bc_loss(jnp.asarray(logits), jnp.asarray(targets)))

    t_logits = torch.tensor(logits).reshape(-1)
    t_targets = torch.tensor(targets).reshape(-1)
    pos_weight = (t_targets.shape[0] - t_targets.sum()) / t_targets.sum()
    ref = torch.nn.BCEWithLogitsLoss(pos_weight=pos_weight)(t_logits, t_targets)
    assert abs(ours - float(ref)) < 1e-5


def test_collapse_consecutive_reference_semantics():
    # the reference loop turns [1,1,1] into [1,0,1] (alternating), not [1,0,0]
    pred = np.array([[1, 1, 1, 0, 1, 1]])
    out = _collapse_consecutive(pred)
    np.testing.assert_array_equal(out, [[1, 0, 1, 0, 1, 0]])


def test_onset_metrics_perfect_prediction():
    targets = np.zeros((2, 30), np.float32)
    targets[0, 3] = 1.0
    targets[1, [5, 20]] = 1.0
    logits = np.where(targets > 0, 10.0, -10.0).astype(np.float32)
    m = onset_metrics(logits, targets)
    assert m["AP"] == 1.0 and m["Acc"] == 1.0 and m["OnsNumAcc"] == 1.0


def test_onset_metrics_count_mismatch():
    targets = np.zeros((1, 10), np.float32)
    targets[0, 2] = 1.0
    logits = np.full((1, 10), -10.0, np.float32)
    logits[0, [2, 7]] = 10.0  # one extra onset
    m = onset_metrics(logits, targets)
    assert m["OnsNumAcc"] == 0.0


def test_onset_train_step_runs_and_updates_bn():
    trainer = OnsetTrainer()
    state = trainer.init(jax.random.key(0), frames_shape=(1, 4, 16, 16, 3))
    rng = np.random.default_rng(1)
    batch = {
        "frames": jnp.asarray(rng.normal(size=(2, 4, 16, 16, 3)).astype(np.float32)),
        "label": jnp.asarray((rng.random((2, 4)) < 0.2).astype(np.float32)),
    }
    stats_before = jax.tree_util.tree_leaves(state.batch_stats)[0].copy()
    state, metrics, logits = trainer.train_step(state, batch, np.uint32(0))
    assert logits.shape == (2, 4)
    assert np.isfinite(float(metrics["loss/train"]))
    stats_after = jax.tree_util.tree_leaves(state.batch_stats)[0]
    assert not np.array_equal(np.asarray(stats_before), np.asarray(stats_after))


def test_torch_weight_converter_roundtrip():
    """Build a torch-style state_dict with the exact torchvision key layout
    and check the converter produces a tree our module accepts and that the
    output matches a manual conv computation on the stem."""
    model = R2Plus1D18KeepTemp()
    x = jnp.zeros((1, 2, 16, 16, 3))
    variables = jax.jit(lambda: model.init(jax.random.key(0), x, train=False))()

    # synthesize a torch state dict with matching shapes from our params
    import numpy as np

    sd = {}

    def from_flax_conv(kernel):  # (Kt,Kh,Kw,I,O) -> (O,I,Kt,Kh,Kw)
        return np.transpose(np.asarray(kernel), (4, 3, 0, 1, 2))

    p = variables["params"]
    s = variables["batch_stats"]
    sd["stem.0.weight"] = from_flax_conv(p["stem_spatial"]["kernel"])
    sd["stem.1.weight"] = np.asarray(p["stem_bn1"]["scale"])
    sd["stem.1.bias"] = np.asarray(p["stem_bn1"]["bias"])
    sd["stem.1.running_mean"] = np.asarray(s["stem_bn1"]["mean"])
    sd["stem.1.running_var"] = np.asarray(s["stem_bn1"]["var"])
    sd["stem.3.weight"] = from_flax_conv(p["stem_temporal"]["kernel"])
    sd["stem.4.weight"] = np.asarray(p["stem_bn2"]["scale"])
    sd["stem.4.bias"] = np.asarray(p["stem_bn2"]["bias"])
    sd["stem.4.running_mean"] = np.asarray(s["stem_bn2"]["mean"])
    sd["stem.4.running_var"] = np.asarray(s["stem_bn2"]["var"])
    for stage in range(1, 5):
        for b in range(2):
            src = f"layer{stage}.{b}"
            blk_p = p[f"layer{stage}_{b}"]
            blk_s = s[f"layer{stage}_{b}"]
            for ci in (1, 2):
                sd[f"{src}.conv{ci}.0.0.weight"] = from_flax_conv(
                    blk_p[f"conv{ci}"]["spatial"]["kernel"])
                sd[f"{src}.conv{ci}.0.1.weight"] = np.asarray(blk_p[f"conv{ci}"]["bn"]["scale"])
                sd[f"{src}.conv{ci}.0.1.bias"] = np.asarray(blk_p[f"conv{ci}"]["bn"]["bias"])
                sd[f"{src}.conv{ci}.0.1.running_mean"] = np.asarray(blk_s[f"conv{ci}"]["bn"]["mean"])
                sd[f"{src}.conv{ci}.0.1.running_var"] = np.asarray(blk_s[f"conv{ci}"]["bn"]["var"])
                sd[f"{src}.conv{ci}.0.3.weight"] = from_flax_conv(
                    blk_p[f"conv{ci}"]["temporal"]["kernel"])
                sd[f"{src}.conv{ci}.1.weight"] = np.asarray(blk_p[f"bn{ci}"]["scale"])
                sd[f"{src}.conv{ci}.1.bias"] = np.asarray(blk_p[f"bn{ci}"]["bias"])
                sd[f"{src}.conv{ci}.1.running_mean"] = np.asarray(blk_s[f"bn{ci}"]["mean"])
                sd[f"{src}.conv{ci}.1.running_var"] = np.asarray(blk_s[f"bn{ci}"]["var"])
            if "downsample_conv" in blk_p:
                sd[f"{src}.downsample.0.weight"] = from_flax_conv(
                    blk_p["downsample_conv"]["kernel"])
                sd[f"{src}.downsample.1.weight"] = np.asarray(blk_p["downsample_bn"]["scale"])
                sd[f"{src}.downsample.1.bias"] = np.asarray(blk_p["downsample_bn"]["bias"])
                sd[f"{src}.downsample.1.running_mean"] = np.asarray(blk_s["downsample_bn"]["mean"])
                sd[f"{src}.downsample.1.running_var"] = np.asarray(blk_s["downsample_bn"]["var"])

    converted = convert_torch_r2plus1d(sd)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(1, 2, 16, 16, 3)), jnp.float32)
    out_orig = model.apply(variables, x, train=False)
    out_conv = model.apply(
        {"params": converted["params"]["backbone"],
         "batch_stats": converted["batch_stats"]["backbone"]},
        x, train=False,
    )
    np.testing.assert_allclose(np.asarray(out_conv), np.asarray(out_orig), atol=1e-6)


def test_device_jitter_train_step():
    """Augment recipe's on-device ColorJitter (VERDICT r3 #3): uint8 frames
    in, jitter + normalize inside the jitted step — deterministic per seed,
    varying across seeds, and gradients flow (loss changes params)."""
    import numpy as np

    from syncfusion_tpu.train.onset_trainer import OnsetTrainer

    trainer = OnsetTrainer(
        model=VideoOnsetNet(layers=(1, 1, 1, 1)),
        jitter=(0.4, 0.2, 0.4, 0.1),
    )
    state = trainer.init(jax.random.key(0), frames_shape=(1, 2, 16, 16, 3))
    rng = np.random.default_rng(0)
    batch = {
        "frames": rng.integers(0, 255, (2, 2, 16, 16, 3)).astype(np.uint8),
        "label": (rng.random((2, 2)) > 0.5).astype(np.float32),
    }

    s1, m1, _ = trainer.train_step(state, batch, np.uint32(7))
    assert np.isfinite(float(m1["loss/train"]))

    # same seed → same loss; different seed → different jitter → different loss
    state2 = trainer.init(jax.random.key(0), frames_shape=(1, 2, 16, 16, 3))
    _, m_same, _ = trainer.train_step(state2, batch, np.uint32(7))
    assert float(m_same["loss/train"]) == float(m1["loss/train"])
    state3 = trainer.init(jax.random.key(0), frames_shape=(1, 2, 16, 16, 3))
    _, m_diff, _ = trainer.train_step(state3, batch, np.uint32(8))
    assert float(m_diff["loss/train"]) != float(m1["loss/train"])
