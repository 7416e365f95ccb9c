"""Inference engine: batch transcriber, result types, serving core."""

from ttasr.engine.batched import BatchedInferencePipeline
from ttasr.engine.results import Segment, TranscriptionInfo, Word, segments_to_srt, segments_to_txt
from ttasr.engine.transcriber import WhisperEngine, TranscribeOptions

__all__ = [
    "Segment", "TranscriptionInfo", "Word",
    "segments_to_srt", "segments_to_txt",
    "WhisperEngine", "TranscribeOptions",
    "BatchedInferencePipeline",
]
