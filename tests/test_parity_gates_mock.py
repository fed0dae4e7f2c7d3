"""Weights-mocked parity-gate integration tests (VERDICT r4 #7).

`script/run_parity.py` stages 10 numerical gates against the published
checkpoints, which this zero-egress environment cannot download — so in CI
the gates only ever exercised their SKIPPED path.  These tests synthesize
fake-but-shape-correct weight files for the two cheapest gates (kinetics,
melgan — reference counterparts main/resnet.py:8-12 and
specvqgan/models/vocoder_melgan.py) and run the gate BODIES end to end,
asserting both a PASS and a deliberate FAIL are reported correctly through
the runbook's JSON verdict.
"""

import json
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "script"))
sys.path.insert(0, str(REPO / "tests"))

import run_parity
from test_video_resnet import _synth_state_dict


def _run_gates(ckpt_dir, only, capsys):
    rc = run_parity.main(["--ckpt_dir", str(ckpt_dir), "--only", only])
    verdict = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    return rc, verdict


def _fake_kinetics_sd():
    """Shape-correct torchvision r2plus1d_18 state_dict with random values."""
    from syncfusion_tpu.models.video_resnet import r2plus1d_18

    model = r2plus1d_18()
    x = jnp.zeros((1, 4, 112, 112, 3))
    abstract = jax.eval_shape(
        lambda: model.init(jax.random.key(0), x, train=False))
    rng = np.random.default_rng(0)

    def fill(path, leaf):
        name = jax.tree_util.keystr(path)
        if name.endswith("['var']"):
            return np.ones(leaf.shape, np.float32)
        if name.endswith("['mean']"):
            return np.zeros(leaf.shape, np.float32)
        return (rng.normal(size=leaf.shape) * 0.05).astype(np.float32)

    variables = jax.tree_util.tree_map_with_path(fill, abstract)
    return _synth_state_dict(variables, "r2plus1d_18")


@pytest.mark.slow
def test_kinetics_gate_pass_and_fail(tmp_path, capsys):
    import torch

    sd = _fake_kinetics_sd()
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               tmp_path / "r2plus1d_18-fake.pth")
    rc, verdict = _run_gates(tmp_path, "kinetics_r2plus1d", capsys)
    gate = verdict["gates"]["kinetics_r2plus1d"]
    assert gate["status"] == "PASS", gate
    assert "forward finite" in gate["detail"]
    assert rc == 0 and verdict["ok"]

    # deliberate corruption: stem kernel with permuted dims must FAIL the
    # gate's shape check, not silently pass or crash the runbook
    bad = dict(sd)
    bad["stem.0.weight"] = np.transpose(bad["stem.0.weight"], (0, 1, 3, 4, 2))
    bad_dir = tmp_path / "bad"
    bad_dir.mkdir()
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in bad.items()},
               bad_dir / "r2plus1d_18-corrupt.pth")
    rc, verdict = _run_gates(bad_dir, "kinetics_r2plus1d", capsys)
    gate = verdict["gates"]["kinetics_r2plus1d"]
    assert gate["status"] == "FAIL", gate
    assert "shape-mismatch" in gate["detail"]
    assert rc == 1 and not verdict["ok"]


@pytest.mark.slow
def test_melgan_gate_pass_and_fail(tmp_path, capsys, monkeypatch):
    """The melgan gate body runs as a check_parity.py subprocess — force it
    onto CPU (SYNCFUSION_PLATFORM) so the gate runs while the exclusive TPU
    tunnel is busy, exactly as CI would."""
    import torch

    monkeypatch.setenv("SYNCFUSION_PLATFORM", "cpu")
    sys.path.insert(0, str(Path(run_parity.__file__).parents[1]))
    ref_dir = "/root/reference"
    sys.path.insert(0, str(Path(ref_dir) / "CondFoleyGen"))
    from specvqgan.models.vocoder_melgan import Generator as RefGen

    torch.manual_seed(1)
    ref = RefGen(80, ngf=32, n_residual_layers=3)
    torch.save(ref.state_dict(), tmp_path / "best_netG.pt")

    rc, verdict = _run_gates(tmp_path, "melgan", capsys)
    gate = verdict["gates"]["melgan"]
    assert gate["status"] == "PASS", gate
    assert rc == 0 and verdict["ok"]

    # wrong-shaped tensor → reference load_state_dict raises in the
    # subprocess → the gate must surface FAIL (nonzero exit), not PASS
    bad_sd = {k: (v[:1] if k == "model.1.weight_v" else v)
              for k, v in ref.state_dict().items()}
    bad_dir = tmp_path / "bad"
    bad_dir.mkdir()
    torch.save(bad_sd, bad_dir / "best_netG.pt")
    rc, verdict = _run_gates(bad_dir, "melgan", capsys)
    gate = verdict["gates"]["melgan"]
    assert gate["status"] == "FAIL", gate
    assert rc == 1 and not verdict["ok"]
