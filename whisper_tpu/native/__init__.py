"""ctypes bindings for the native host runtime (whisper_native.cpp).

Every entry point has a NumPy fallback, so the framework works without the
compiled library; ``python tools/build_native.py`` builds it with g++.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(__file__), "libwhisper_native.so")
    if os.path.exists(path):
        try:
            lib = ctypes.CDLL(path)
            lib.wtn_version.restype = ctypes.c_int
            assert lib.wtn_version() == 1
            f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
            u16p = np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")
            lib.wtn_log_mel.argtypes = [
                f32p, ctypes.c_int64, f32p, ctypes.c_int, f32p,
                ctypes.c_int64, ctypes.c_int, ctypes.c_int,
            ]
            lib.wtn_fp16_to_f32.argtypes = [u16p, f32p, ctypes.c_int64]
            lib.wtn_signal_energy.argtypes = [f32p, ctypes.c_int64, ctypes.c_int, f32p]
            _LIB = lib
        except Exception:
            _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def log_mel_raw(
    pcm: np.ndarray, filters: np.ndarray, mode: str = "openai", n_threads: int = 4
) -> np.ndarray:
    """Unnormalized log10-mel [n_mel, n_frames] on the host CPU.

    Native when built; NumPy vectorized fallback otherwise. Framing matches
    whisper_tpu.features.mel (same two modes)."""
    pcm = np.ascontiguousarray(pcm, np.float32)
    filters = np.ascontiguousarray(filters, np.float32)
    n_mel = filters.shape[0]
    n_frames = len(pcm) // 160

    lib = _load()
    if lib is not None and n_frames > 0:
        out = np.empty((n_mel, n_frames), np.float32)
        lib.wtn_log_mel(
            pcm, len(pcm), filters, n_mel, out, n_frames,
            0 if mode == "openai" else 1, n_threads,
        )
        return out

    # NumPy fallback
    from whisper_tpu.features.mel import _dft_bases, _hann_window

    n_fft = 400
    if n_frames <= 0:
        return np.zeros((n_mel, 0), np.float32)
    if mode == "openai":
        padded = np.pad(pcm, (n_fft // 2, n_fft // 2), mode="reflect")
    else:
        padded = np.pad(pcm, (0, n_fft))
    idx = (np.arange(n_frames) * 160)[:, None] + np.arange(n_fft)[None, :]
    frames = padded[idx] * _hann_window(n_fft)[None, :]
    cos_b, sin_b = _dft_bases(n_fft)
    power = (frames @ cos_b) ** 2 + (frames @ sin_b) ** 2
    if mode == "reference":
        power[:, 1:-1] *= 2.0
    mel = power @ filters.T
    return np.log10(np.maximum(mel, 1e-10)).T.astype(np.float32)


def fp16_to_f32(src: np.ndarray) -> np.ndarray:
    src = np.ascontiguousarray(src)
    lib = _load()
    if lib is not None:
        out = np.empty(src.shape, np.float32)
        lib.wtn_fp16_to_f32(src.view(np.uint16), out.reshape(-1), src.size)
        return out
    return src.view(np.float16).astype(np.float32)


def signal_energy(pcm: np.ndarray, half_window: int = 32) -> np.ndarray:
    pcm = np.ascontiguousarray(pcm, np.float32)
    lib = _load()
    if lib is not None:
        out = np.empty(len(pcm), np.float32)
        lib.wtn_signal_energy(pcm, len(pcm), half_window, out)
        return out
    from whisper_tpu.api.timestamps import compute_signal_energy

    return compute_signal_energy(pcm, half_window)
