"""VAD tests: speech/silence discrimination + faster-whisper machinery."""

import numpy as np

from ttasr.audio.vad import (
    SpeechTimestampsMap,
    VadOptions,
    collect_chunks,
    get_speech_timestamps,
    speech_probabilities,
)

SR = 16000


def _tone(seconds, amp=0.3, f=300.0):
    t = np.arange(int(SR * seconds)) / SR
    return (amp * np.sin(2 * np.pi * f * t) * (1 + 0.4 * np.sin(2 * np.pi * 4 * t))).astype(np.float32)


def _noise(seconds, amp=0.002, seed=0):
    return (amp * np.random.default_rng(seed).standard_normal(int(SR * seconds))).astype(np.float32)


def test_probabilities_high_on_speech_low_on_silence():
    audio = np.concatenate([_noise(1.0), _tone(1.0), _noise(1.0, seed=1)])
    probs = speech_probabilities(audio)
    n = len(probs)
    sil1 = probs[: n // 3].mean()
    speech = probs[n // 3 : 2 * n // 3].mean()
    sil2 = probs[2 * n // 3 :].mean()
    assert speech > 0.8
    assert sil1 < 0.3 and sil2 < 0.3


def test_get_speech_timestamps_finds_burst():
    audio = np.concatenate([_noise(1.0), _tone(1.0), _noise(3.0, seed=1)])
    chunks = get_speech_timestamps(audio, VadOptions(min_silence_duration_ms=500))
    assert len(chunks) == 1
    start_s = chunks[0]["start"] / SR
    end_s = chunks[0]["end"] / SR
    # padded by speech_pad_ms=400
    assert 0.3 < start_s < 1.05
    assert 1.9 < end_s < 2.6


def test_empty_and_silent_audio():
    assert get_speech_timestamps(np.zeros(100, np.float32)) == []
    assert get_speech_timestamps(_noise(2.0)) == []
    assert collect_chunks(_noise(1.0), []).shape == (0,)


def test_collect_and_restore_timestamps():
    chunks = [
        {"start": SR * 2, "end": SR * 3},
        {"start": SR * 6, "end": SR * 8},
    ]
    audio = np.arange(SR * 10, dtype=np.float32)
    collected = collect_chunks(audio, chunks)
    assert len(collected) == SR * 3
    ts_map = SpeechTimestampsMap(chunks, SR)
    # time 0.5 in collected audio -> 2.5 in original
    assert ts_map.get_original_time(0.5) == 2.5
    # time 1.5 in collected -> second chunk, originally 6.0 + 0.5 offset
    assert ts_map.get_original_time(1.5) == 6.5


def test_min_speech_duration_filters_blips():
    blip = np.concatenate([_noise(1.0), _tone(0.1), _noise(1.0, seed=2)])
    chunks = get_speech_timestamps(
        blip, VadOptions(min_speech_duration_ms=250, min_silence_duration_ms=300)
    )
    assert chunks == []
