"""Realtime streaming ASR engine.

Parity surface: reference api/stt_streaming/src/ — same factory pattern
and strategy/VAD/ASR type names, same Client session state, same WS
payload shapes.  The ASR plugin feeds in-memory PCM into the persistent
compiled decode loop (no per-chunk WAV round-trip like the reference's
faster_whisper_asr.py:155-157).
"""

from ttasr.streaming.client import Client
from ttasr.streaming.vad.vad_factory import VADFactory
from ttasr.streaming.asr.asr_factory import ASRFactory
from ttasr.streaming.buffering_strategy.buffering_strategy_factory import (
    BufferingStrategyFactory,
)

__all__ = ["Client", "VADFactory", "ASRFactory", "BufferingStrategyFactory"]
