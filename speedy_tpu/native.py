"""ctypes binding to the native C++ runtime (csrc/libspeedy_tpu_native.so).

Exposes NativeSonicStream with the same Python interface as
streaming.SonicStream so the two runtimes are interchangeable and
cross-testable. The library is built on demand with csrc/Makefile.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
from typing import Callable, Optional

import numpy as np

_CSRC = pathlib.Path(__file__).resolve().parent.parent / "csrc"
_LIB_PATH = _CSRC / "libspeedy_tpu_native.so"
_lib = None


def build_native(force: bool = False) -> pathlib.Path:
    """Build the native library if needed; returns its path."""
    if force or not _LIB_PATH.exists() or (
        _LIB_PATH.stat().st_mtime
        < max(
            (_CSRC / "speedy_native.cc").stat().st_mtime,
            (_CSRC / "speedy_native.h").stat().st_mtime,
        )
    ):
        subprocess.run(
            ["make", "-C", str(_CSRC), "libspeedy_tpu_native.so"],
            check=True,
            capture_output=True,
        )
    return _LIB_PATH


def native_available() -> bool:
    try:
        load()
        return True
    except Exception:
        return False


_TENSION_CB = ctypes.CFUNCTYPE(None, ctypes.c_void_p, ctypes.c_int, ctypes.c_float)
_SPEED_CB = _TENSION_CB
_FEATURES_CB = ctypes.CFUNCTYPE(
    None, ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_float)
)
_SPECTROGRAM_CB = _FEATURES_CB


def load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    path = build_native()
    lib = ctypes.CDLL(str(path))
    lib.sonicCreateStream.restype = ctypes.c_void_p
    lib.sonicCreateStream.argtypes = [ctypes.c_int, ctypes.c_int]
    lib.sonicDestroyStream.argtypes = [ctypes.c_void_p]
    lib.sonicWriteShortToStream.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int16),
        ctypes.c_int,
    ]
    lib.sonicReadShortFromStream.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int16),
        ctypes.c_int,
    ]
    lib.sonicWriteFloatToStream.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
    ]
    lib.sonicReadFloatFromStream.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
    ]
    lib.sonicFlushStream.argtypes = [ctypes.c_void_p]
    lib.sonicSamplesAvailable.argtypes = [ctypes.c_void_p]
    lib.sonicSetSpeed.argtypes = [ctypes.c_void_p, ctypes.c_float]
    lib.sonicSetRate.argtypes = [ctypes.c_void_p, ctypes.c_float]
    lib.sonicEnableNonlinearSpeedup.argtypes = [ctypes.c_void_p, ctypes.c_float]
    lib.sonicSetDurationFeedbackStrength.argtypes = [ctypes.c_void_p, ctypes.c_float]
    lib.getSonicBufferSize.argtypes = [ctypes.c_void_p]
    lib.sonicSpectrogramSize.argtypes = [ctypes.c_void_p]
    lib.sonicTensionCallback.argtypes = [ctypes.c_void_p, _TENSION_CB]
    lib.sonicSpeedCallback.argtypes = [ctypes.c_void_p, _SPEED_CB]
    lib.sonicFeaturesCallback.argtypes = [ctypes.c_void_p, _FEATURES_CB]
    lib.sonicSpectrogramCallback.argtypes = [ctypes.c_void_p, _SPECTROGRAM_CB]
    lib.sonicNormalizedSpectrogramCallback.argtypes = [
        ctypes.c_void_p,
        _SPECTROGRAM_CB,
    ]
    # Callback getters (sonic2.h:106-124). Typed c_void_p here: the tests
    # compare registered-vs-returned pointer identity; invoking through
    # the typed CFUNCTYPE wrappers is the setter path's job.
    for g in (
        "getSonicTensionCallback",
        "getSonicSpeedCallback",
        "getSonicFeaturesCallback",
        "getSonicSpectrogramCallback",
        "getSonicNormalizedSpectrogramCallback",
    ):
        fn = getattr(lib, g)
        fn.restype = ctypes.c_void_p
        fn.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


class NativeSonicStream:
    """Python view of the native sonic2-compatible stream."""

    def __init__(self, sample_rate: int, num_channels: int = 1):
        self._lib = load()
        self._st = self._lib.sonicCreateStream(sample_rate, num_channels)
        self.sample_rate = sample_rate
        self.num_channels = num_channels
        self._cb_refs = []  # keep callback wrappers alive
        self._fft_size = self._lib.sonicSpectrogramSize(self._st)

    def __del__(self):
        if getattr(self, "_st", None):
            self._lib.sonicDestroyStream(self._st)
            self._st = None

    def set_speed(self, speed: float) -> None:
        self._lib.sonicSetSpeed(self._st, speed)

    def set_rate(self, rate: float) -> None:
        self._lib.sonicSetRate(self._st, rate)

    def enable_nonlinear_speedup(self, factor: float) -> None:
        self._lib.sonicEnableNonlinearSpeedup(self._st, factor)

    def set_duration_feedback_strength(self, factor: float) -> None:
        self._lib.sonicSetDurationFeedbackStrength(self._st, factor)

    def get_buffer_size(self) -> int:
        return self._lib.getSonicBufferSize(self._st)

    def spectrogram_size(self) -> int:
        return self._fft_size

    # callbacks get (stream, time, value/array) like streaming.SonicStream
    def _set_cb(self, setter, ctype, fn, array_len=None):
        if fn is None:
            return
        if array_len is None:
            wrapper = ctype(lambda st, t, v: fn(self, t, v))
        else:
            wrapper = ctype(
                lambda st, t, ptr: fn(
                    self, t, np.ctypeslib.as_array(ptr, shape=(array_len,)).copy()
                )
            )
        self._cb_refs.append(wrapper)
        setter(self._st, wrapper)

    def set_on_tension(self, fn: Optional[Callable]) -> None:
        self._set_cb(self._lib.sonicTensionCallback, _TENSION_CB, fn)

    def set_on_speed(self, fn: Optional[Callable]) -> None:
        self._set_cb(self._lib.sonicSpeedCallback, _SPEED_CB, fn)

    def set_on_features(self, fn: Optional[Callable]) -> None:
        self._set_cb(self._lib.sonicFeaturesCallback, _FEATURES_CB, fn, 15)

    def set_on_spectrogram(self, fn: Optional[Callable]) -> None:
        self._set_cb(
            self._lib.sonicSpectrogramCallback, _SPECTROGRAM_CB, fn, self._fft_size
        )

    def set_on_normalized_spectrogram(self, fn: Optional[Callable]) -> None:
        self._set_cb(
            self._lib.sonicNormalizedSpectrogramCallback,
            _SPECTROGRAM_CB,
            fn,
            self._fft_size // 2,
        )

    def write_short(self, samples: np.ndarray) -> bool:
        s = np.ascontiguousarray(samples, np.int16).reshape(-1)
        n = len(s) // self.num_channels
        ptr = s.ctypes.data_as(ctypes.POINTER(ctypes.c_int16))
        return bool(self._lib.sonicWriteShortToStream(self._st, ptr, n))

    def write_float(self, samples: np.ndarray) -> bool:
        s = np.ascontiguousarray(samples, np.float32).reshape(-1)
        n = len(s) // self.num_channels
        ptr = s.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        return bool(self._lib.sonicWriteFloatToStream(self._st, ptr, n))

    def read_short(self, max_samples: int) -> np.ndarray:
        buf = np.zeros(max_samples * self.num_channels, np.int16)
        ptr = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int16))
        n = self._lib.sonicReadShortFromStream(self._st, ptr, max_samples)
        out = buf[: n * self.num_channels]
        return out if self.num_channels == 1 else out.reshape(-1, self.num_channels)

    def read_float(self, max_samples: int) -> np.ndarray:
        buf = np.zeros(max_samples * self.num_channels, np.float32)
        ptr = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        n = self._lib.sonicReadFloatFromStream(self._st, ptr, max_samples)
        out = buf[: n * self.num_channels]
        return out if self.num_channels == 1 else out.reshape(-1, self.num_channels)

    def samples_available(self) -> int:
        return self._lib.sonicSamplesAvailable(self._st)

    def flush(self) -> bool:
        return bool(self._lib.sonicFlushStream(self._st))
