"""EnergyVAD: real activity detection for the streaming gate.

Upgrade over the reference's shipped SimpleVAD (its PyannoteVAD exists
but is unreachable via the factory — reference vad/vad_factory.py:27-44).
Uses the jitted adaptive energy model from :mod:`ttasr.audio.vad` and
returns merged speech segments in seconds.
"""

from __future__ import annotations

from ttasr.audio.io import pcm16_bytes_to_float32
from ttasr.audio.vad import VadOptions, get_speech_timestamps
from ttasr.streaming.vad.vad_interface import VADInterface


class EnergyVAD(VADInterface):
    def __init__(self, **kwargs):
        self.min_duration = kwargs.get("min_duration", 0.1)
        self.options = VadOptions(
            threshold=kwargs.get("threshold", 0.5),
            min_speech_duration_ms=kwargs.get("min_speech_duration_ms", 250),
            min_silence_duration_ms=kwargs.get("min_silence_duration_ms", 500),
            speech_pad_ms=kwargs.get("speech_pad_ms", 100),
        )

    async def detect_activity(self, client):
        if len(client.scratch_buffer) == 0:
            return []
        audio = pcm16_bytes_to_float32(bytes(client.scratch_buffer))
        rate = client.sampling_rate
        chunks = get_speech_timestamps(audio, self.options, sampling_rate=rate)
        segments = [
            {"start": c["start"] / rate, "end": c["end"] / rate, "confidence": 1.0}
            for c in chunks
            if (c["end"] - c["start"]) / rate >= self.min_duration
        ]
        return segments
