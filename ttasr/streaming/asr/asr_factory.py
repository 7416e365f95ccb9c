"""ASR factory (reference asr/asr_factory.py:9-30).

Keeps the reference's "faster_whisper" type name as an alias for the JAX
engine so existing launch configs keep working.
"""

import logging

from ttasr.streaming.asr.jax_whisper_asr import JaxWhisperASR

logger = logging.getLogger("ttasr.streaming.asr")


class ASRFactory:
    @staticmethod
    def create_asr_pipeline(type, **kwargs):
        logger.info("creating ASR pipeline: %s %s", type, kwargs)
        if type in ("jax_whisper", "faster_whisper", "whisper"):
            return JaxWhisperASR(**kwargs)
        raise ValueError(
            f"不支援的 ASR 管道類型: {type}。支援 'jax_whisper'（別名 'faster_whisper'）"
        )
