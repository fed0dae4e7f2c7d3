"""ctypes bindings for the native I/O library (csrc/sfx_io.cpp).

Auto-builds ``libsfx_io.so`` with g++ on first use (single translation
unit, ~1 s); every entry point has a pure-Python fallback so the framework
works without a toolchain.  ctypes calls release the GIL, so reader threads
overlap decode with JAX dispatch.
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path
from typing import Iterator, Optional

import numpy as np

from syncfusion_tpu.core.logging import get_logger

log = get_logger(__name__)

_CSRC = Path(__file__).resolve().parents[2] / "csrc"
_LIB_PATH = _CSRC / "libsfx_io.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             str(_CSRC / "sfx_io.cpp"), "-o", str(_LIB_PATH)],
            check=True, capture_output=True, text=True,
        )
        return True
    except Exception as e:
        log.warning("native sfx_io build failed (%s); using Python fallback", e)
        return False


def load_library() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library, or None."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not _LIB_PATH.exists() and not _build():
            _build_failed = True
            return None
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.sfx_tar_open.restype = ctypes.c_void_p
        lib.sfx_tar_open.argtypes = [ctypes.c_char_p]
        lib.sfx_tar_next.restype = ctypes.c_int
        lib.sfx_tar_next.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.sfx_tar_close.argtypes = [ctypes.c_void_p]
        lib.sfx_free.argtypes = [ctypes.c_void_p]
        lib.sfx_wav_decode.restype = ctypes.c_int
        lib.sfx_wav_decode.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.sfx_resample.restype = ctypes.c_int
        lib.sfx_resample.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return load_library() is not None


def iter_tar_members(path: str) -> Iterator[tuple[str, bytes]]:
    """Yield (member_name, bytes) from a tar file via the native reader."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native library unavailable")
    handle = lib.sfx_tar_open(str(path).encode())
    if not handle:
        raise FileNotFoundError(path)
    name_buf = ctypes.create_string_buffer(512)
    try:
        while True:
            data_ptr = ctypes.POINTER(ctypes.c_uint8)()
            size = ctypes.c_int64()
            rc = lib.sfx_tar_next(handle, name_buf, 512,
                                  ctypes.byref(data_ptr), ctypes.byref(size))
            if rc == 0:
                return
            if rc < 0:
                raise IOError(f"tar read error in {path}")
            try:
                data = ctypes.string_at(data_ptr, size.value)
            finally:
                lib.sfx_free(data_ptr)
            yield name_buf.value.decode(), data
    finally:
        lib.sfx_tar_close(handle)


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Native WAV decode → ((channels, frames) float32, sample_rate)."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native library unavailable")
    buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
    out_ptr = ctypes.POINTER(ctypes.c_float)()
    n_frames = ctypes.c_int64()
    channels = ctypes.c_int()
    sr = ctypes.c_int()
    rc = lib.sfx_wav_decode(buf, len(data), ctypes.byref(out_ptr),
                            ctypes.byref(n_frames), ctypes.byref(channels),
                            ctypes.byref(sr))
    if rc != 0:
        raise ValueError("wav decode failed")
    total = n_frames.value * channels.value
    try:
        flat = np.ctypeslib.as_array(out_ptr, shape=(total,)).copy()
    finally:
        lib.sfx_free(out_ptr)
    return flat.reshape(n_frames.value, channels.value).T.copy(), sr.value


def resample_native(x: np.ndarray, orig_freq: int, new_freq: int) -> np.ndarray:
    """Native polyphase resample of mono (T,) float32 — same kernel bank as
    ops/resample.py (one source of truth for the filter)."""
    from syncfusion_tpu.ops.resample import _kernel, _out_length

    lib = load_library()
    if lib is None:
        raise RuntimeError("native library unavailable")
    kernels, width, orig, new = _kernel(orig_freq, new_freq)
    x = np.ascontiguousarray(x, np.float32)
    n_out = _out_length(len(x), orig, new)
    out = np.empty(n_out, np.float32)
    rc = lib.sfx_resample(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x), orig, new,
        np.ascontiguousarray(kernels).ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        kernels.shape[1], width,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_out,
    )
    if rc != 0:
        raise RuntimeError("native resample failed")
    return out
