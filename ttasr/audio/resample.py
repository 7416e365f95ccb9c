"""Sample-rate conversion.

Host path: polyphase filtering (scipy when available, windowed-sinc numpy
otherwise) — the role soxr/librosa played for the reference
(asr_core.py:156).  Device path: :func:`resample_jax`, a jit-compilable
polyphase resampler for keeping the whole ingest pipeline on-TPU.
"""

from __future__ import annotations

import math
from functools import lru_cache

import numpy as np


def _gcd_ratio(sr_from: int, sr_to: int):
    g = math.gcd(int(sr_from), int(sr_to))
    return sr_to // g, sr_from // g  # (up, down)


def resample_poly_host(audio: np.ndarray, sr_from: int, sr_to: int) -> np.ndarray:
    """Polyphase resampling on host, float32 in/out.

    Order of preference: the ttasr C++ library (ttasr/native), scipy,
    pure-numpy windowed sinc.
    """
    if sr_from == sr_to:
        return np.asarray(audio, dtype=np.float32)
    try:
        from ttasr import native

        out = native.resample(np.asarray(audio, np.float32), sr_from, sr_to)
        if out is not None:
            return out
    except Exception:  # pragma: no cover - fall through to scipy
        pass
    up, down = _gcd_ratio(sr_from, sr_to)
    try:
        from scipy.signal import resample_poly

        out = resample_poly(np.asarray(audio, dtype=np.float64), up, down)
        return out.astype(np.float32)
    except ImportError:  # pragma: no cover
        return _resample_sinc_numpy(np.asarray(audio, dtype=np.float32), up, down)


def _resample_sinc_numpy(audio: np.ndarray, up: int, down: int,
                         half_width: int = 32) -> np.ndarray:
    """Windowed-sinc polyphase fallback (Kaiser window)."""
    n_out = int(np.ceil(len(audio) * up / down))
    cutoff = min(1.0 / up, 1.0 / down)
    t_out = np.arange(n_out) * (down / up)
    idx = np.floor(t_out).astype(np.int64)
    taps = np.arange(-half_width, half_width + 1)
    src = idx[:, None] + taps[None, :]
    frac = (t_out - idx)[:, None]
    x = taps[None, :] - frac
    kernel = np.sinc(x * up * cutoff) * np.kaiser(2 * half_width + 1, 8.0)[None, :]
    kernel *= up * cutoff
    src = np.clip(src, 0, len(audio) - 1)
    return (audio[src] * kernel).sum(axis=1).astype(np.float32)


@lru_cache(maxsize=8)
def _jax_kernel(up: int, down: int, half_width: int = 16):
    import jax.numpy as jnp

    cutoff = min(1.0 / up, 1.0 / down)
    taps = np.arange(-half_width, half_width + 1, dtype=np.float32)
    # One filter per output phase (up phases).
    phases = (np.arange(up, dtype=np.float32) * down / up) % 1.0
    x = taps[None, :] - phases[:, None]
    kern = np.sinc(x * up * cutoff) * np.kaiser(2 * half_width + 1, 8.0)[None, :]
    kern = (kern * up * cutoff).astype(np.float32)
    return jnp.asarray(kern)


def resample_jax(audio, sr_from: int, sr_to: int, half_width: int = 16):
    """Jit-compilable polyphase resampler (static shapes).

    ``audio`` is a 1-D jax array; output length is
    ``ceil(len(audio) * sr_to / sr_from)``.
    """
    import jax.numpy as jnp

    if sr_from == sr_to:
        return audio
    up, down = _gcd_ratio(sr_from, sr_to)
    kern = _jax_kernel(up, down, half_width)
    n_in = audio.shape[0]
    n_out = -(-n_in * up // down)
    t = jnp.arange(n_out) * (down / up)
    base = jnp.floor(t).astype(jnp.int32)
    phase = (jnp.arange(n_out) * down) % up
    taps = jnp.arange(-half_width, half_width + 1)
    src = jnp.clip(base[:, None] + taps[None, :], 0, n_in - 1)
    return jnp.sum(audio[src] * kern[phase], axis=1)
