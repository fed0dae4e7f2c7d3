import jax.numpy as jnp
import numpy as np
import pytest
import scipy.signal

from syncfusion_tpu.ops.mel import (
    mel_filterbank,
    mel_spectrogram,
    specvqgan_scale,
    specvqgan_unscale,
)
from syncfusion_tpu.ops.quantize import int16_round_trip, float32_to_int16
from syncfusion_tpu.ops.resample import resample, resample_jax
from syncfusion_tpu.ops.stft import stft, spectrogram, istft, griffin_lim
from syncfusion_tpu.ops.wav import read_wav, write_wav


# ---------------------------------------------------------------- wav io
def test_wav_f32_roundtrip(tmp_path, rng):
    wav = rng.normal(size=(1, 4800)).astype(np.float32) * 0.5
    write_wav(tmp_path / "a.wav", wav, 48000, fmt="f32")
    back, sr = read_wav(tmp_path / "a.wav")
    assert sr == 48000
    np.testing.assert_array_equal(back, wav)


def test_wav_pcm16_roundtrip(tmp_path, rng):
    wav = np.clip(rng.normal(size=(2, 1000)).astype(np.float32) * 0.3, -1, 1)
    write_wav(tmp_path / "b.wav", wav, 22050, fmt="pcm16")
    back, sr = read_wav(tmp_path / "b.wav")
    assert sr == 22050 and back.shape == (2, 1000)
    assert np.abs(back - wav).max() < 1.0 / 32000


def test_int16_roundtrip_semantics():
    x = np.array([0.0, 0.5, -0.5, 1.5, -1.5], np.float32)
    q = int16_round_trip(x)
    # clamps to [-1, 1] and quantizes on a 32767 grid
    assert abs(q[3] - 1.0) < 1e-4 and abs(q[4] + 1.0) < 1e-4
    assert np.abs(q[:3] - x[:3]).max() < 1.0 / 32767
    assert float32_to_int16(np.float32(1.0)) == 32767


# ------------------------------------------------------------- resample
def test_resample_preserves_sine():
    sr_in, sr_out, f0 = 44100, 48000, 440.0
    t = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * f0 * t).astype(np.float32)
    y = resample(x, sr_in, sr_out)
    assert y.shape[-1] == sr_out
    t2 = np.arange(sr_out) / sr_out
    expected = np.sin(2 * np.pi * f0 * t2).astype(np.float32)
    mid = slice(1000, -1000)
    assert np.abs(y[mid] - expected[mid]).max() < 5e-3


def test_resample_downsample_matches_scipy_loosely():
    rng = np.random.default_rng(1)
    x = rng.normal(size=48000).astype(np.float32)
    # lowpass first so aliasing doesn't dominate comparison
    sos = scipy.signal.butter(8, 0.15, output="sos")
    x = scipy.signal.sosfilt(sos, x).astype(np.float32)
    y = resample(x, 48000, 22050)
    y_ref = scipy.signal.resample_poly(x, 22050 // 150, 48000 // 150).astype(np.float32)
    n = min(len(y), len(y_ref))
    err = np.abs(y[500 : n - 500] - y_ref[500 : n - 500]).max()
    assert err < 2e-2


def test_resample_jax_matches_numpy():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 9600)).astype(np.float32)
    y_np = resample(x, 48000, 22050)
    y_jax = np.asarray(resample_jax(jnp.asarray(x), 48000, 22050))
    assert y_jax.shape == y_np.shape
    np.testing.assert_allclose(y_jax, y_np, atol=2e-5)


def test_resample_identity():
    x = np.ones((3, 100), np.float32)
    assert resample(x, 48000, 48000) is not None
    np.testing.assert_array_equal(resample(x, 48000, 48000), x)


# ----------------------------------------------------------------- stft
def test_stft_shape_and_parseval():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 4096)).astype(np.float32)
    s = stft(jnp.asarray(x), n_fft=1024, hop_length=256)
    assert s.shape == (2, 513, 4096 // 256 + 1)


def test_stft_pure_tone_peak():
    sr, n_fft, hop = 22050, 1024, 256
    t = np.arange(sr) / sr
    f0 = 1000.0
    x = np.sin(2 * np.pi * f0 * t).astype(np.float32)
    s = np.asarray(spectrogram(jnp.asarray(x), n_fft=n_fft, hop_length=hop))
    peak_bin = s[:, s.shape[1] // 2].argmax()
    expected_bin = round(f0 * n_fft / sr)
    assert abs(int(peak_bin) - expected_bin) <= 1


def test_istft_reconstruction():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(1, 4096)).astype(np.float32)
    s = stft(jnp.asarray(x), n_fft=1024, hop_length=256)
    y = np.asarray(istft(s, n_fft=1024, hop_length=256, length=4096))
    np.testing.assert_allclose(y[0, 512:-512], x[0, 512:-512], atol=1e-4)


def test_griffin_lim_runs_and_reduces_error():
    sr = 22050
    t = np.arange(8192) / sr
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    mag = jnp.abs(stft(jnp.asarray(x), 1024, 256))
    y = griffin_lim(mag, 1024, 256, n_iter=32, length=8192)
    mag2 = jnp.abs(stft(y, 1024, 256))[..., : mag.shape[-1]]
    # interior frames only: OLA boundary frames can't be phase-consistent
    rel = float(
        jnp.linalg.norm(mag2[:, 4:-4] - mag[:, 4:-4]) / jnp.linalg.norm(mag[:, 4:-4])
    )
    assert rel < 0.1


# ------------------------------------------------------------------ mel
def test_mel_filterbank_shapes_and_norm():
    fb = mel_filterbank(22050, 1024, 80, 125, 7600, scale="slaney", norm="slaney")
    assert fb.shape == (80, 513)
    assert fb.min() >= 0
    # every filter has some support
    assert (fb.sum(axis=1) > 0).all()


def test_mel_filterbank_matches_librosa_formula():
    # slaney scale breakpoints: 1000 Hz maps to mel 15.0
    from syncfusion_tpu.ops.mel import _hz_to_mel, _mel_to_hz

    assert abs(_hz_to_mel(1000.0, "slaney") - 15.0) < 1e-9
    assert abs(_mel_to_hz(15.0, "slaney") - 1000.0) < 1e-6
    assert abs(_hz_to_mel(700.0, "htk") - 2595.0 * np.log10(2.0)) < 1e-9


def test_mel_spectrogram_shape():
    x = jnp.zeros((2, 22050))
    m = mel_spectrogram(x, 22050, 1024, 256, 80, 125, 7600, scale="slaney", norm="slaney")
    assert m.shape == (2, 80, 22050 // 256 + 1)


def test_specvqgan_scaling_chain_inverse():
    mel = jnp.asarray(10 ** np.random.default_rng(5).uniform(-4, 1, size=(80, 100)))
    scaled = specvqgan_scale(mel)
    assert float(scaled.min()) >= 0 and float(scaled.max()) <= 1
    recovered = specvqgan_unscale(scaled)
    interior = (mel > 1e-5) & (scaled < 1.0) & (scaled > 0.0)
    np.testing.assert_allclose(
        np.asarray(recovered)[np.asarray(interior)],
        np.asarray(mel)[np.asarray(interior)],
        rtol=1e-3,
    )


# ---------------------------------------------------------------- denoise
def test_spectral_gate_suppresses_noise_floor(rng):
    """Sparse 'hit'-like bursts over white noise: the gate must crush the
    noise floor in silent regions while keeping the burst energy."""
    from syncfusion_tpu.ops.denoise import spectral_gate

    sr = 48000
    t = np.arange(2 * sr) / sr
    clean = np.zeros_like(t, dtype=np.float32)
    for onset in (0.3, 0.9, 1.5):
        i = int(onset * sr)
        seg = np.sin(2 * np.pi * 880 * t[: sr // 4]) * np.exp(-t[: sr // 4] * 20)
        clean[i : i + len(seg)] += seg.astype(np.float32)
    noise = rng.normal(size=clean.shape).astype(np.float32) * 0.02
    noisy = (clean + noise)[None]

    out = np.asarray(spectral_gate(noisy, n_fft=1024, hop_length=256))
    assert out.shape == noisy.shape

    # >20 dB suppression in the leading silent region…
    sil = slice(0, int(0.25 * sr))
    assert np.sum(out[0, sil] ** 2) < 0.01 * np.sum(noisy[0, sil] ** 2)
    # …while the first burst keeps most of its energy.
    burst = slice(int(0.3 * sr), int(0.4 * sr))
    assert np.sum(out[0, burst] ** 2) > 0.5 * np.sum(clean[burst] ** 2)


def test_spectral_gate_noise_clip_improves_snr(rng):
    """With an explicit noise profile the gate improves waveform SNR."""
    from syncfusion_tpu.ops.denoise import spectral_gate

    sr = 48000
    t = np.arange(2 * sr) / sr
    clean = np.zeros_like(t, dtype=np.float32)
    for onset in (0.3, 0.9, 1.5):
        i = int(onset * sr)
        seg = np.sin(2 * np.pi * 880 * t[: sr // 4]) * np.exp(-t[: sr // 4] * 20)
        clean[i : i + len(seg)] += seg.astype(np.float32)
    noise = rng.normal(size=clean.shape).astype(np.float32) * 0.05
    noisy = (clean + noise)[None]

    def snr(x):
        err = x[0] - clean
        return 10 * np.log10(np.sum(clean**2) / np.sum(err**2))

    out = np.asarray(
        spectral_gate(noisy, noise_clip=jnp.asarray(noise[None][:, : sr // 2]))
    )
    assert snr(out) > snr(noisy) + 3.0


def test_griffin_lim_traces_without_complex_dtypes():
    """The TPU plugin backend lacks complex64 support at runtime (complex
    exp/broadcast hit UNIMPLEMENTED — crashed the codebook rehearsal's
    vocoded-wav logging); Griffin-Lim must stay real-arithmetic."""
    import jax
    import jax.numpy as jnp

    from syncfusion_tpu.ops.stft import griffin_lim

    jaxpr = jax.make_jaxpr(
        lambda m: griffin_lim(m, n_fft=64, hop_length=16, n_iter=2)
    )(jnp.ones((1, 33, 8)))
    assert "complex" not in str(jaxpr)
