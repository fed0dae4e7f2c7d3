"""Golden tests against real torch modules (CPU): build the reference's
exact torch blocks, copy weights through our converters, require matching
outputs.  This pins down conv padding/layout and BatchNorm semantics — the
places where silent weight-import drift hides."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp


def test_strided_conv2plus1d_block_matches_torch():
    """A stride-2 (2+1)D factored conv + BN chain, torch vs flax, with
    converted weights — validates the explicit symmetric padding."""
    from syncfusion_tpu.core.checkpoint import t_conv3d
    from syncfusion_tpu.models.onset_net import Conv2Plus1D

    torch.manual_seed(0)
    mid, out_ch = 7, 6
    t_spatial = torch.nn.Conv3d(3, mid, (1, 3, 3), stride=(1, 2, 2),
                                padding=(0, 1, 1), bias=False)
    t_bn = torch.nn.BatchNorm3d(mid, eps=1e-5)
    t_temporal = torch.nn.Conv3d(mid, out_ch, (3, 1, 1), stride=1,
                                 padding=(1, 0, 0), bias=False)
    t_bn.eval()
    with torch.no_grad():
        t_bn.running_mean.normal_()
        t_bn.running_var.uniform_(0.5, 2.0)

    x = np.random.default_rng(0).normal(size=(2, 3, 4, 10, 10)).astype(np.float32)
    with torch.no_grad():
        ref = t_temporal(torch.relu(t_bn(t_spatial(torch.tensor(x)))))

    params = {
        "params": {
            "spatial": {"kernel": t_conv3d(t_spatial.weight.detach().numpy())},
            "temporal": {"kernel": t_conv3d(t_temporal.weight.detach().numpy())},
            "bn": {"scale": t_bn.weight.detach().numpy(),
                   "bias": t_bn.bias.detach().numpy()},
        },
        "batch_stats": {
            "bn": {"mean": t_bn.running_mean.numpy(),
                   "var": t_bn.running_var.numpy()},
        },
    }
    # flax layout: (B, T, H, W, C)
    x_flax = jnp.asarray(np.transpose(x, (0, 2, 3, 4, 1)))
    ours = Conv2Plus1D(out_ch, mid, stride=2).apply(params, x_flax, train=False)
    ours_torch_layout = np.transpose(np.asarray(ours), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(ours_torch_layout, ref.numpy(), atol=2e-5)


def test_dense_and_linear_match():
    from syncfusion_tpu.core.checkpoint import t_linear

    torch.manual_seed(1)
    lin = torch.nn.Linear(12, 5)
    x = np.random.default_rng(1).normal(size=(3, 12)).astype(np.float32)
    with torch.no_grad():
        ref = lin(torch.tensor(x))
    from flax import linen as nn

    params = {"params": {"kernel": t_linear(lin.weight.detach().numpy()),
                         "bias": lin.bias.detach().numpy()}}
    ours = nn.Dense(5).apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)


def test_melgan_convtranspose_matches_torch():
    """Our torch-semantics ConvTranspose1d (input-dilated conv) vs the real
    thing, for both even and odd ratios."""
    from syncfusion_tpu.models.melgan import _conv_transpose_torch

    for r in (8, 2):
        torch.manual_seed(r)
        t = torch.nn.ConvTranspose1d(
            6, 4, kernel_size=2 * r, stride=r,
            padding=r // 2 + r % 2, output_padding=r % 2,
        )
        x = np.random.default_rng(r).normal(size=(1, 6, 20)).astype(np.float32)
        with torch.no_grad():
            ref = t(torch.tensor(x))
        # torch weight (I, O, K) → ours (K, I, O)
        kernel = jnp.asarray(np.transpose(t.weight.detach().numpy(), (2, 0, 1)))
        ours = _conv_transpose_torch(
            jnp.asarray(np.transpose(x, (0, 2, 1))), kernel,
            jnp.asarray(t.bias.detach().numpy()),
            stride=r, padding=r // 2 + r % 2, output_padding=r % 2,
        )
        np.testing.assert_allclose(
            np.transpose(np.asarray(ours), (0, 2, 1)), ref.numpy(), atol=1e-5
        )


def test_groupnorm_matches_torch():
    from flax import linen as nn

    torch.manual_seed(2)
    gn_t = torch.nn.GroupNorm(4, 16, eps=1e-6)
    with torch.no_grad():
        gn_t.weight.normal_()
        gn_t.bias.normal_()
    x = np.random.default_rng(2).normal(size=(2, 16, 5, 6)).astype(np.float32)
    with torch.no_grad():
        ref = gn_t(torch.tensor(x))
    params = {"params": {"scale": gn_t.weight.detach().numpy(),
                         "bias": gn_t.bias.detach().numpy()}}
    ours = nn.GroupNorm(num_groups=4, epsilon=1e-6).apply(
        params, jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    )
    np.testing.assert_allclose(
        np.transpose(np.asarray(ours), (0, 3, 1, 2)), ref.numpy(), atol=2e-5
    )


def test_layernorm_gelu_match_torch():
    from flax import linen as nn

    torch.manual_seed(3)
    ln_t = torch.nn.LayerNorm(8)
    with torch.no_grad():
        ln_t.weight.normal_()
        ln_t.bias.normal_()
    x = np.random.default_rng(3).normal(size=(4, 8)).astype(np.float32)
    with torch.no_grad():
        ref = torch.nn.functional.gelu(ln_t(torch.tensor(x)))
    params = {"params": {"scale": ln_t.weight.detach().numpy(),
                         "bias": ln_t.bias.detach().numpy()}}
    ours = nn.gelu(nn.LayerNorm().apply(params, jnp.asarray(x)), approximate=False)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)
