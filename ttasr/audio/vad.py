"""Voice activity detection.

Replaces the Silero-ONNX VAD embedded in faster-whisper (enabled by
``vad_filter=True`` at reference asr_core.py:163, api/file_asr.py:283,462,
faster_whisper_asr.py:144).  The segmentation state machine —
``VadOptions``, ``get_speech_timestamps``, ``collect_chunks``,
``SpeechTimestampsMap`` — keeps faster-whisper's exact semantics so the
engine's timestamp restoration math is identical.  The per-frame speech
probability comes from an in-repo learned conv VAD
(``ttasr.audio.vad_model``: harmonic/formant/syllabic-modulation
features, trained by tools/train_vad.py; Silero's own weights are
unavailable under zero egress), with a host-side adaptive energy
model as fallback when the vendored weights are absent.
"""

from __future__ import annotations

import bisect
import dataclasses
import functools
from typing import List, Optional

import numpy as np

SAMPLE_RATE = 16000
WINDOW = 512  # 32 ms probability frames (Silero v5 granularity)


@dataclasses.dataclass
class VadOptions:
    """Same knobs and defaults as faster_whisper.vad.VadOptions."""

    threshold: float = 0.5
    neg_threshold: Optional[float] = None
    min_speech_duration_ms: int = 250
    max_speech_duration_s: float = float("inf")
    min_silence_duration_ms: int = 2000
    speech_pad_ms: int = 400


def _iir_smooth(x: np.ndarray) -> np.ndarray:
    """One-pole IIR, forward then backward (zero-phase-ish)."""
    y = np.empty_like(x)
    c = x[0]
    for i in range(len(x)):
        c = 0.6 * c + 0.4 * x[i]
        y[i] = c
    z = np.empty_like(y)
    c = y[-1]
    for i in range(len(y) - 1, -1, -1):
        c = 0.6 * c + 0.4 * y[i]
        z[i] = c
    return z


def _energy_prob(audio: np.ndarray) -> np.ndarray:
    """Adaptive-energy speech score, pure numpy.

    This runs on the host per streaming chunk: a jitted version on the
    remote-TPU (axon) default backend costs a ~25 ms dispatch round
    trip per call plus a remote compile per audio-length bucket.  The
    frame count is a few hundred — numpy is microseconds.
    """
    n = audio.shape[0] // WINDOW
    frames = audio[: n * WINDOW].reshape(n, WINDOW)
    energy = np.log(np.mean(frames * frames, axis=1) + 1e-10)
    floor = np.quantile(energy, 0.1)
    peak = max(np.quantile(energy, 0.95), floor + 4.0)
    score = (energy - floor) / (peak - floor + 1e-6)
    s = _iir_smooth(score.astype(np.float64))
    return (1.0 / (1.0 + np.exp(-(s - 0.35) * 10.0))).astype(np.float32)


def speech_probabilities(audio: np.ndarray) -> np.ndarray:
    """Per-512-sample-frame speech probability in [0, 1].

    Uses the learned conv VAD (``ttasr.audio.vad_model``, trained by
    tools/train_vad.py on a synthesized speech/noise corpus) when its
    vendored weights are present; falls back to the adaptive energy
    heuristic otherwise.  Disable the model with TTASR_VAD_HEURISTIC=1.
    """
    if len(audio) < WINDOW:
        return np.zeros((0,), np.float32)
    import os

    if audio.dtype == np.int16:  # raw PCM16 master: scale to [-1, 1]
        audio = audio.astype(np.float32) / 32768.0
    energy = _energy_prob(np.asarray(audio, np.float32))
    if os.environ.get("TTASR_VAD_HEURISTIC") != "1":
        from ttasr.audio.vad_model import vad_probabilities

        probs = vad_probabilities(audio)
        if probs is not None:
            # product of experts: the conv net supplies spectral evidence
            # (harmonics/formants/syllabic modulation), the adaptive energy
            # score supplies dynamics evidence.  Stationary signals the net
            # is unsure about (chords, hum, noise) have flat energy and die
            # here, while speech is high on both.
            n = min(len(probs), len(energy))
            return np.sqrt(probs[:n] * energy[:n])
    return energy


def get_speech_timestamps(audio: np.ndarray,
                          vad_options: Optional[VadOptions] = None,
                          sampling_rate: int = SAMPLE_RATE) -> List[dict]:
    """Split audio into speech chunks (faster-whisper state machine).

    Returns list of ``{"start": sample, "end": sample}`` dicts.
    """
    opts = vad_options or VadOptions()
    probs = speech_probabilities(audio)
    audio_length = len(audio)

    threshold = opts.threshold
    neg_threshold = opts.neg_threshold
    if neg_threshold is None:
        neg_threshold = max(threshold - 0.15, 0.01)
    min_speech_samples = sampling_rate * opts.min_speech_duration_ms / 1000
    speech_pad_samples = sampling_rate * opts.speech_pad_ms / 1000
    max_speech_samples = (
        sampling_rate * opts.max_speech_duration_s
        - WINDOW
        - 2 * speech_pad_samples
    )
    min_silence_samples = sampling_rate * opts.min_silence_duration_ms / 1000
    min_silence_samples_at_max_speech = sampling_rate * 98 / 1000

    triggered = False
    speeches: List[dict] = []
    current: dict = {}
    temp_end = 0
    prev_end = next_start = 0

    for i, prob in enumerate(probs):
        pos = WINDOW * i
        if prob >= threshold and temp_end:
            temp_end = 0
            if next_start < prev_end:
                next_start = pos
        if prob >= threshold and not triggered:
            triggered = True
            current["start"] = pos
            continue
        if triggered and pos - current["start"] > max_speech_samples:
            if prev_end:
                current["end"] = prev_end
                speeches.append(current)
                current = {}
                if next_start < prev_end:
                    triggered = False
                else:
                    current["start"] = next_start
                prev_end = next_start = temp_end = 0
            else:
                current["end"] = pos
                speeches.append(current)
                current = {}
                prev_end = next_start = temp_end = 0
                triggered = False
                continue
        if prob < neg_threshold and triggered:
            if not temp_end:
                temp_end = pos
            if pos - temp_end > min_silence_samples_at_max_speech:
                prev_end = temp_end
            if pos - temp_end < min_silence_samples:
                continue
            current["end"] = temp_end
            if current["end"] - current["start"] > min_speech_samples:
                speeches.append(current)
            current = {}
            prev_end = next_start = temp_end = 0
            triggered = False
            continue

    if current.get("start") is not None and (
        audio_length - current["start"] > min_speech_samples
    ):
        current["end"] = audio_length
        speeches.append(current)

    # pad and merge
    for i, speech in enumerate(speeches):
        if i == 0:
            speech["start"] = int(max(0, speech["start"] - speech_pad_samples))
        if i != len(speeches) - 1:
            silence = speeches[i + 1]["start"] - speech["end"]
            if silence < 2 * speech_pad_samples:
                speech["end"] += silence // 2
                speeches[i + 1]["start"] = int(
                    max(0, speeches[i + 1]["start"] - silence // 2)
                )
            else:
                speech["end"] = int(
                    min(audio_length, speech["end"] + speech_pad_samples)
                )
                speeches[i + 1]["start"] = int(
                    max(0, speeches[i + 1]["start"] - speech_pad_samples)
                )
        else:
            speech["end"] = int(min(audio_length, speech["end"] + speech_pad_samples))
    return speeches


def collect_chunks(audio: np.ndarray, chunks: List[dict]) -> np.ndarray:
    """Concatenate speech chunks (faster_whisper.vad.collect_chunks)."""
    if not chunks:
        return np.zeros((0,), dtype=np.float32)
    return np.concatenate([audio[c["start"] : c["end"]] for c in chunks])


class SpeechTimestampsMap:
    """Map timestamps of the VAD-concatenated audio back to the original
    (faster_whisper.vad.SpeechTimestampsMap semantics)."""

    def __init__(self, chunks: List[dict], sampling_rate: int,
                 time_precision: int = 2):
        self.sampling_rate = sampling_rate
        self.time_precision = time_precision
        self.chunk_end_sample: List[int] = []
        self.total_silence_before: List[float] = []
        previous_end = 0
        silent_samples = 0
        for chunk in chunks:
            silent_samples += chunk["start"] - previous_end
            previous_end = chunk["end"]
            self.chunk_end_sample.append(chunk["end"] - silent_samples)
            self.total_silence_before.append(silent_samples / sampling_rate)

    def get_chunk_index(self, time: float) -> int:
        sample = int(time * self.sampling_rate)
        return min(
            bisect.bisect(self.chunk_end_sample, sample),
            len(self.chunk_end_sample) - 1,
        )

    def get_original_time(self, time: float, chunk_index: Optional[int] = None) -> float:
        if chunk_index is None:
            chunk_index = self.get_chunk_index(time)
        silence = self.total_silence_before[chunk_index]
        return round(silence + time, self.time_precision)
