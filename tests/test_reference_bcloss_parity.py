"""Live parity of the onset loss + metrics vs the reference's BCLoss.

Imports the reference's main/module_onset.py with its unused heavy deps
(pytorch_lightning/wandb/natsort) stubbed out — testing behavior of the
reference's own code, nothing vendored.
"""

import sys
import types
from pathlib import Path

import numpy as np
import pytest

REFERENCE = Path("/root/reference")
pytestmark = pytest.mark.skipif(
    not REFERENCE.exists(), reason="reference tree not mounted"
)


@pytest.fixture(scope="module")
def ref_bcloss():
    import importlib.machinery

    injected = []
    for name, attrs in [
        ("pytorch_lightning", {"LightningModule": object, "Callback": object,
                               "Trainer": object}),
        ("wandb", {}),
        ("natsort", {"natsorted": sorted}),
    ]:
        mod = types.ModuleType(name)
        # a real ModuleSpec so importlib.util.find_spec on the stub works
        # (transformers probes wandb this way in later tests)
        mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
        for k, v in attrs.items():
            setattr(mod, k, v)
        if name not in sys.modules:
            sys.modules[name] = mod
            injected.append(name)
    pl_loggers = types.ModuleType("pytorch_lightning.loggers")
    pl_loggers.__spec__ = importlib.machinery.ModuleSpec(
        "pytorch_lightning.loggers", None)
    pl_loggers.WandbLogger = object
    if "pytorch_lightning.loggers" not in sys.modules:
        sys.modules["pytorch_lightning.loggers"] = pl_loggers
        injected.append("pytorch_lightning.loggers")
    sys.path.insert(0, str(REFERENCE))
    from main.module_onset import BCLoss

    yield BCLoss()
    for name in injected:  # don't leak stubs into other test modules
        sys.modules.pop(name, None)


def _batch(seed=0):
    rng = np.random.default_rng(seed)
    logits = rng.normal(size=(4, 30)).astype(np.float32)
    target = (rng.random((4, 30)) < 0.15).astype(np.float32)
    target[0, 3] = 1.0
    return logits, target


def test_bc_loss_matches_reference(ref_bcloss):
    import torch

    from syncfusion_tpu.train.onset_trainer import bc_loss

    logits, target = _batch()
    ref = float(ref_bcloss(torch.tensor(logits), torch.tensor(target)))
    ours = float(bc_loss(logits, target))
    assert abs(ours - ref) < 1e-5


def test_metrics_match_reference(ref_bcloss):
    import torch

    from syncfusion_tpu.train.onset_trainer import onset_metrics

    for seed in range(3):
        logits, target = _batch(seed)
        ref = ref_bcloss.evaluate(torch.tensor(logits), torch.tensor(target))
        ours = onset_metrics(logits, target)
        assert abs(ours["AP"] - float(ref["AP"])) < 1e-6, seed
        assert abs(ours["Acc"] - float(ref["Acc"])) < 1e-6, seed
        assert abs(ours["OnsNumAcc"] - float(ref["OnsNumAcc"])) < 1e-6, seed
