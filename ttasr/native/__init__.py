"""ctypes bindings for the ttasr C++ helper library.

Build with ``make -C ttasr/native`` (g++ only).  Every entry point has a
pure-Python/numpy fallback, so the framework works without the build —
the native paths are the fast lane for host-side hot loops (ingest
resampling, corpus CER).
"""

from __future__ import annotations

import ctypes
import os
from functools import lru_cache
from typing import Optional

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libttasr_native.so")


def _try_build() -> None:
    """Best-effort on-demand build (g++ is in the base image)."""
    import shutil
    import subprocess

    if shutil.which("make") is None or shutil.which("g++") is None:
        return
    subprocess.run(
        ["make", "-C", os.path.dirname(__file__)],
        capture_output=True, check=False, timeout=120,
    )


@lru_cache(maxsize=1)
def _load() -> Optional[ctypes.CDLL]:
    if not os.path.exists(_LIB_PATH):
        try:
            _try_build()
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.ttasr_pcm16_to_f32.argtypes = [
        ctypes.POINTER(ctypes.c_int16), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.ttasr_f32_to_pcm16.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int16),
    ]
    lib.ttasr_resample_out_len.restype = ctypes.c_int64
    lib.ttasr_resample_out_len.argtypes = [
        ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
    ]
    lib.ttasr_resample.restype = ctypes.c_int64
    lib.ttasr_resample.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
    ]
    lib.ttasr_levenshtein_u32.restype = ctypes.c_int64
    lib.ttasr_levenshtein_u32.argtypes = [
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_int64,
    ]
    return lib


def available() -> bool:
    return _load() is not None


def resample(audio: np.ndarray, sr_from: int, sr_to: int,
             half_width: int = 32) -> Optional[np.ndarray]:
    """Native polyphase resample; None when the library isn't built."""
    lib = _load()
    if lib is None:
        return None
    audio = np.ascontiguousarray(audio, np.float32)
    n_out = lib.ttasr_resample_out_len(len(audio), sr_from, sr_to)
    out = np.empty(n_out, np.float32)
    produced = lib.ttasr_resample(
        audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(audio),
        sr_from, sr_to,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), half_width,
    )
    return out[:produced]


def levenshtein(a: str, b: str) -> Optional[int]:
    """Native Levenshtein over codepoints; None when not built."""
    lib = _load()
    if lib is None:
        return None
    arr_a = np.frombuffer(a.encode("utf-32-le"), dtype=np.uint32)
    arr_b = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    return int(lib.ttasr_levenshtein_u32(
        arr_a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(arr_a),
        arr_b.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)), len(arr_b),
    ))


def pcm16_to_f32(data: bytes) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    pcm = np.frombuffer(data, dtype=np.int16)
    out = np.empty(len(pcm), np.float32)
    lib.ttasr_pcm16_to_f32(
        pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), len(pcm),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
