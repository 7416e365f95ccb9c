from ttasr.streaming.asr.asr_factory import ASRFactory
from ttasr.streaming.asr.jax_whisper_asr import JaxWhisperASR

__all__ = ["ASRFactory", "JaxWhisperASR"]
