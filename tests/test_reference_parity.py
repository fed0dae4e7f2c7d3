"""Numerical parity vs the reference's OWN torch modules.

These tests import the reference code from /root/reference (never vendored),
build randomly-initialized torch modules, convert their state dicts with our
converters, and require float32-round-off agreement.  Skipped when the
reference tree isn't mounted.
"""

import sys
from pathlib import Path

import pytest

REFERENCE = Path("/root/reference")
pytestmark = pytest.mark.skipif(
    not REFERENCE.exists(), reason="reference tree not mounted"
)

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "script"))


@pytest.fixture(scope="module")
def parity():
    import check_parity

    return check_parity


def test_onset_net_matches_reference(parity):
    assert parity.check_onset(str(REFERENCE), None, 1e-4) < 1e-4


def test_vqgan_autoencoder_matches_reference(parity):
    assert parity.check_vqgan_autoencoder(str(REFERENCE), None, 1e-4) < 1e-4


def test_quantizer_matches_reference(parity):
    assert parity.check_quantizer(str(REFERENCE), None, 1e-4) < 1e-4


def test_mingpt_matches_reference(parity):
    assert parity.check_mingpt(str(REFERENCE), None, 1e-4) < 1e-4


def test_melgan_matches_reference(parity):
    assert parity.check_melgan(str(REFERENCE), None, 1e-4) < 1e-4


def test_discriminator_matches_reference(parity):
    assert parity.check_discriminator(str(REFERENCE), None, 1e-4) < 1e-4
