"""Tests for WAV decode/encode and resampling."""

import asyncio

import numpy as np

from ttasr.audio.io import (
    float32_to_pcm16_bytes,
    load_audio,
    pcm16_bytes_to_float32,
    read_wav_bytes,
    save_audio_to_file,
    wav_bytes,
    write_wav,
)
from ttasr.audio.resample import resample_poly_host, resample_jax


def _sine(n, sr=16000, f=440.0):
    return (0.2 * np.sin(2 * np.pi * f * np.arange(n) / sr)).astype(np.float32)


def test_wav_roundtrip(tmp_path):
    audio = _sine(8000)
    path = str(tmp_path / "a.wav")
    write_wav(path, audio, 16000)
    out, sr = load_audio(path, sr=16000)
    assert sr == 16000
    assert out.shape == audio.shape
    assert np.max(np.abs(out - audio)) < 1e-3  # 16-bit quantization


def test_wav_bytes_parse(sine_wav_bytes):
    audio, sr = read_wav_bytes(sine_wav_bytes)
    assert sr == 16000
    assert audio.ndim == 1
    assert len(audio) == 3200  # 0.2s


def test_load_audio_resamples(tmp_path):
    audio = _sine(44100, sr=44100)
    path = str(tmp_path / "hi.wav")
    write_wav(path, audio, 44100)
    out, sr = load_audio(path, sr=16000)
    assert sr == 16000
    assert abs(len(out) - 16000) <= 2


def test_pcm16_roundtrip():
    audio = _sine(100)
    back = pcm16_bytes_to_float32(float32_to_pcm16_bytes(audio))
    assert np.max(np.abs(back - audio)) < 1e-3


def test_resample_preserves_tone():
    sr_from, sr_to = 48000, 16000
    audio = _sine(48000, sr=sr_from)
    out = resample_poly_host(audio, sr_from, sr_to)
    assert abs(len(out) - 16000) <= 2
    # dominant frequency survives
    spec = np.abs(np.fft.rfft(out * np.hanning(len(out))))
    peak_hz = np.argmax(spec) * sr_to / len(out)
    assert abs(peak_hz - 440.0) < 5.0


def test_resample_jax_close_to_host():
    audio = _sine(32000, sr=32000)
    host = resample_poly_host(audio, 32000, 16000)
    dev = np.asarray(resample_jax(audio, 32000, 16000))
    assert dev.shape[0] == host.shape[0]
    # compare away from edges
    d = np.max(np.abs(dev[100:-100] - host[100 : len(dev) - 100]))
    assert d < 5e-3


def test_save_audio_to_file(tmp_path):
    audio = _sine(1600)
    pcm = float32_to_pcm16_bytes(audio)
    path = asyncio.run(
        save_audio_to_file(pcm, "x.wav", audio_dir=str(tmp_path))
    )
    out, sr = load_audio(path)
    assert sr == 16000 and len(out) == 1600


def test_multichannel_mono_mix(tmp_path):
    import wave

    left = _sine(1000, f=440.0)
    right = _sine(1000, f=880.0)
    inter = np.empty(2000, dtype=np.float32)
    inter[0::2], inter[1::2] = left, right
    path = str(tmp_path / "st.wav")
    with wave.open(path, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(16000)
        wf.writeframes(float32_to_pcm16_bytes(inter))
    out, _ = load_audio(path)
    assert out.shape == (1000,)
    expected = (left + right) / 2
    assert np.max(np.abs(out - expected)) < 1e-3


def test_wav_bytes_helper():
    audio = _sine(500)
    parsed, sr = read_wav_bytes(wav_bytes(audio))
    assert sr == 16000 and len(parsed) == 500


def test_load_audio_int16_passthrough(tmp_path):
    """int16=True returns raw PCM16 for mono 16 kHz WAVs (uploaded
    unconverted; /32768 happens on device) and matches the f32 load."""
    rng = np.random.default_rng(5)
    audio = (rng.standard_normal(16000) * 0.2).clip(-1, 1).astype(np.float32)
    path = str(tmp_path / "a.wav")
    write_wav(path, audio, 16000)

    i16, sr = load_audio(path, int16=True)
    f32, _ = load_audio(path)
    assert sr == 16000
    assert i16.dtype == np.int16
    np.testing.assert_allclose(i16.astype(np.float32) / 32768.0, f32,
                               rtol=0, atol=0)


def test_load_audio_int16_falls_back_on_resample(tmp_path):
    """A 44.1 kHz source cannot stay int16 (resampling is float)."""
    rng = np.random.default_rng(6)
    audio = (rng.standard_normal(44100) * 0.2).clip(-1, 1).astype(np.float32)
    path = str(tmp_path / "b.wav")
    write_wav(path, audio, 44100)
    out, sr = load_audio(path, int16=True)
    assert sr == 16000
    assert out.dtype == np.float32
