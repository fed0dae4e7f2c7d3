"""Native C++ I/O vs the pure-Python implementations (exact agreement)."""

import io
import tarfile
from pathlib import Path

import numpy as np
import pytest

from syncfusion_tpu.data import native
from syncfusion_tpu.ops.resample import resample
from syncfusion_tpu.ops.wav import read_wav, write_wav

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def test_native_tar_matches_python(tmp_path):
    p = tmp_path / "x.tar"
    payloads = {"a/file1.wav": b"12345", "b.times.csv": b"0.5,hit\n"}
    with tarfile.open(p, "w") as tf:
        for name, data in payloads.items():
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    got = dict(native.iter_tar_members(str(p)))
    assert got == payloads


def test_native_wav_decode_matches_python(tmp_path, rng):
    for fmt in ("f32", "pcm16"):
        wav = (rng.normal(size=(2, 1000)) * 0.3).astype(np.float32)
        path = tmp_path / f"{fmt}.wav"
        write_wav(path, wav, 48000, fmt=fmt)
        data = path.read_bytes()
        w_py, sr_py = read_wav(data)
        w_nat, sr_nat = native.decode_wav(data)
        assert sr_nat == sr_py
        np.testing.assert_array_equal(w_nat, w_py)


def test_native_resample_matches_python(rng):
    x = rng.normal(size=48000).astype(np.float32)
    y_py = resample(x, 48000, 22050)
    y_nat = native.resample_native(x, 48000, 22050)
    assert y_nat.shape == y_py.shape
    np.testing.assert_allclose(y_nat, y_py, atol=1e-5)


def test_native_resample_upsample(rng):
    x = rng.normal(size=8000).astype(np.float32)
    y_py = resample(x, 16000, 48000)
    y_nat = native.resample_native(x, 16000, 48000)
    np.testing.assert_allclose(y_nat, y_py, atol=1e-5)
