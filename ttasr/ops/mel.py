"""Whisper log-mel frontend as TPU-friendly matmuls.

Replaces the C++ feature extractor inside faster-whisper/CTranslate2
(invoked implicitly by every ``.transcribe()`` in the reference; see
SURVEY.md §2.2).  Design: framing via a strided gather, the 400-point
rFFT expressed as two (400, 201) matmuls against DFT basis matrices, the
mel projection as a (201, n_mels) matmul, then log10 compression — all
of which XLA fuses and tiles onto the MXU.  A fused Pallas kernel with
the same contract lives in :mod:`ttasr.ops.mel_pallas`.

Numerical contract: identical (<=1e-4 abs) to
``transformers.WhisperFeatureExtractor`` output, which is what the
reference's training pipeline uses (train_asr.py:607-638) and what
CT2's runtime frontend reproduces.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

SAMPLE_RATE = 16000
N_FFT = 400
HOP_LENGTH = 160
CHUNK_LENGTH = 30  # seconds per Whisper window
N_SAMPLES = CHUNK_LENGTH * SAMPLE_RATE  # 480000
N_FRAMES = N_SAMPLES // HOP_LENGTH  # 3000 mel frames per window
N_FREQS = N_FFT // 2 + 1  # 201 rFFT bins


def _hz_to_mel_slaney(freq: np.ndarray) -> np.ndarray:
    """Slaney-scale mel: linear below 1 kHz, log above."""
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (freq - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(
        freq >= min_log_hz,
        min_log_mel + np.log(np.maximum(freq, 1e-10) / min_log_hz) / logstep,
        mels,
    )


def _mel_to_hz_slaney(mels: np.ndarray) -> np.ndarray:
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(
        mels >= min_log_mel,
        min_log_hz * np.exp(logstep * (mels - min_log_mel)),
        freqs,
    )


@lru_cache(maxsize=4)
def mel_filter_bank(n_mels: int = 80, n_freqs: int = N_FREQS,
                    sample_rate: int = SAMPLE_RATE,
                    f_min: float = 0.0, f_max: float = 8000.0) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank, shape (n_freqs, n_mels)."""
    fft_freqs = np.linspace(0, sample_rate / 2, n_freqs)
    mel_pts = np.linspace(
        _hz_to_mel_slaney(np.array(f_min)), _hz_to_mel_slaney(np.array(f_max)),
        n_mels + 2,
    )
    hz_pts = _mel_to_hz_slaney(mel_pts)
    fdiff = np.diff(hz_pts)
    slopes = hz_pts[None, :] - fft_freqs[:, None]  # (n_freqs, n_mels+2)
    lower = -slopes[:, :-2] / fdiff[None, :-1]
    upper = slopes[:, 2:] / fdiff[None, 1:]
    fb = np.maximum(0.0, np.minimum(lower, upper))
    # Slaney energy normalization.
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    fb *= enorm[None, :]
    return fb.astype(np.float32)


@lru_cache(maxsize=2)
def _dft_basis(n_fft: int = N_FFT):
    """Windowed real-DFT basis: returns (cos, sin) each (n_fft, n_freqs)."""
    n_freqs = n_fft // 2 + 1
    k = np.arange(n_fft)[:, None]
    f = np.arange(n_freqs)[None, :]
    angle = -2.0 * np.pi * k * f / n_fft
    window = np.hanning(n_fft + 1)[:-1]  # periodic hann
    cos = (np.cos(angle) * window[:, None]).astype(np.float32)
    sin = (np.sin(angle) * window[:, None]).astype(np.float32)
    return cos, sin


@lru_cache(maxsize=4)
def _device_constants(n_mels: int):
    # numpy (not device) arrays: caching device arrays created under a
    # jit trace leaks tracers.
    cos, sin = _dft_basis()
    return cos, sin, mel_filter_bank(n_mels)


def log_mel_spectrogram(audio, n_mels: int = 80, *, pad_to_chunk: bool = True):
    """Compute Whisper log-mel features on device.

    Args:
      audio: jax/numpy float32 array, shape ``(n,)`` or ``(batch, n)``.
      n_mels: 80 (v1/v2/turbo-style) or 128 (large-v3).
      pad_to_chunk: zero-pad / truncate to the fixed 30 s window
        (480000 samples) so every call has static shape.

    Returns:
      ``(n_mels, 3000)`` or ``(batch, n_mels, 3000)`` float32 features,
      normalized exactly like WhisperFeatureExtractor (log10, max-8
      clamp per example, (x+4)/4).
    """
    import jax
    import jax.numpy as jnp

    if pad_to_chunk and not isinstance(audio, jnp.ndarray):
        # pad/truncate HOST-side: eager device ops on a variable-length
        # array compile a tiny program per distinct length — on the
        # remote-TPU (axon) backend that is seconds per new streaming
        # chunk size.  After this the device only ever sees (.., 480000).
        # int16 PCM stays int16 until it reaches the device: the batch-16
        # f32 upload alone measured 0.52 s through the axon relay, and
        # int16 halves the bytes (the source PCM is int16 anyway, so the
        # on-device /32768 conversion is exact).
        a = np.asarray(audio)
        if a.dtype != np.int16:
            a = a.astype(np.float32, copy=False)
        squeeze = a.ndim == 1
        if squeeze:
            a = a[None]
        n = a.shape[-1]
        if n < N_SAMPLES:
            a = np.pad(a, ((0, 0), (0, N_SAMPLES - n)))
        elif n > N_SAMPLES:
            a = a[..., :N_SAMPLES]
        audio = jnp.asarray(a)
        if audio.dtype == jnp.int16:
            audio = audio.astype(jnp.float32) * (1.0 / 32768.0)
    else:
        if hasattr(audio, "dtype") and audio.dtype == jnp.int16:
            audio = audio.astype(jnp.float32) * (1.0 / 32768.0)
        else:
            audio = jnp.asarray(audio, dtype=jnp.float32)
        squeeze = audio.ndim == 1
        if squeeze:
            audio = audio[None]

        if pad_to_chunk:
            n = audio.shape[-1]
            if n < N_SAMPLES:
                audio = jnp.pad(audio, ((0, 0), (0, N_SAMPLES - n)))
            elif n > N_SAMPLES:
                audio = audio[..., :N_SAMPLES]

    n = audio.shape[-1]
    n_frames = n // HOP_LENGTH  # last frame dropped, as in HF (log_spec[:, :-1])

    # Reflect padding for centered frames.
    half = N_FFT // 2
    padded = jnp.pad(audio, ((0, 0), (half, half)), mode="reflect")

    # Strided framing: (batch, n_frames, n_fft).
    starts = jnp.arange(n_frames) * HOP_LENGTH
    idx = starts[:, None] + jnp.arange(N_FFT)[None, :]
    frames = padded[:, idx]

    cos_np, sin_np, fb_np = _device_constants(n_mels)
    cos, sin, fb = jnp.asarray(cos_np), jnp.asarray(sin_np), jnp.asarray(fb_np)
    prec = jax.lax.Precision.HIGHEST
    re = jnp.matmul(frames, cos, precision=prec)
    im = jnp.matmul(frames, sin, precision=prec)
    power = re * re + im * im  # (batch, n_frames, n_freqs)
    mel = jnp.matmul(power, fb, precision=prec)  # (batch, n_frames, n_mels)

    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    peak = jnp.max(log_spec, axis=(1, 2), keepdims=True)
    log_spec = jnp.maximum(log_spec, peak - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    out = jnp.swapaxes(log_spec, 1, 2)  # (batch, n_mels, n_frames)
    return out[0] if squeeze else out
