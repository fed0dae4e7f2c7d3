"""LPAPS VGG trunk parity vs the reference's vggishish16 (random init).

Validates the conv stack and — critically — the five ReLU slice boundaries
(relu1_2/2_2/3_3/4_3/5_3) that the perceptual distance taps."""

import sys
from pathlib import Path

import numpy as np
import pytest

REFERENCE = Path("/root/reference")
pytestmark = pytest.mark.skipif(
    not REFERENCE.exists(), reason="reference tree not mounted"
)

torch = pytest.importorskip("torch")


def test_vggishish_slices_match_reference():
    sys.path.insert(0, str(REFERENCE / "CondFoleyGen"))
    sys.path.insert(0, str(REFERENCE))
    from specvqgan.modules.losses.lpaps import vggishish16 as RefTrunk

    import jax.numpy as jnp

    from syncfusion_tpu.core.checkpoint import t_conv2d
    from syncfusion_tpu.models.vqgan.lpaps import Vggishish16

    torch.manual_seed(0)
    ref = RefTrunk(requires_grad=False, pretrained=False).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    # reference keys: slice{n}.{feature_idx}.weight for conv layers
    conv_feature_indices = [
        ("slice1", (0, 2)), ("slice2", (5, 7)), ("slice3", (10, 12, 14)),
        ("slice4", (17, 19, 21)), ("slice5", (24, 26, 28)),
    ]
    params = {}
    ci = 0
    for slice_name, idxs in conv_feature_indices:
        for fi in idxs:
            params[f"conv_{ci}"] = {
                "kernel": t_conv2d(sd[f"{slice_name}.{fi}.weight"]),
                "bias": sd[f"{slice_name}.{fi}.bias"],
            }
            ci += 1
    assert ci == 13

    x = np.random.default_rng(0).normal(size=(1, 1, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref_slices = ref(torch.tensor(x))

    ours = Vggishish16()
    our_slices = ours.apply({"params": params},
                            jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    assert len(our_slices) == 5
    for i, (a, b) in enumerate(zip(our_slices, ref_slices)):
        np.testing.assert_allclose(
            np.transpose(np.asarray(a), (0, 3, 1, 2)), b.numpy(),
            atol=1e-5, err_msg=f"slice {i+1}",
        )
