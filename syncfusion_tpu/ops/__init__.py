"""DSP and compute building blocks shared across models and evaluation."""

from syncfusion_tpu.ops.wav import read_wav, write_wav
from syncfusion_tpu.ops.quantize import float32_to_int16, int16_to_float32
from syncfusion_tpu.ops.resample import resample, resample_jax
from syncfusion_tpu.ops.stft import stft, spectrogram
from syncfusion_tpu.ops.mel import mel_filterbank, mel_spectrogram
