"""Per-connection session state (reference api/stt_streaming/src/client.py).

Holds the incoming buffer, the scratch buffer being transcribed, the
whole-session buffer, per-client config (strategy + chunk parameters,
defaults 1.5 s / 0.1 s — reference client.py:36-43), and transcript
accumulation.
"""

from __future__ import annotations

import time
from typing import List, Optional

from ttasr.streaming.buffering_strategy.buffering_strategy_factory import (
    BufferingStrategyFactory,
)

DEFAULT_CONFIG = {
    "language": None,
    "processing_strategy": "silence_at_end_of_chunk",
    "processing_args": {
        "chunk_length_seconds": 1.5,
        "chunk_offset_seconds": 0.1,
    },
}


class Client:
    def __init__(self, client_id, sampling_rate: int, samples_width: int,
                 job_id: str, last_start_time: float,
                 transcript: Optional[List] = None):
        self.client_id = client_id
        self.buffer = bytearray()
        self.scratch_buffer = bytearray()
        self.session_audio_buffer = bytearray()
        self.config = {
            "language": None,
            "processing_strategy": "silence_at_end_of_chunk",
            "processing_args": {
                "chunk_length_seconds": 1.5,
                "chunk_offset_seconds": 0.1,
            },
        }
        self.file_counter = 0
        self.chunk_save_counter = 0
        self.total_samples = 0
        self.sampling_rate = sampling_rate
        self.samples_width = samples_width
        self.buffering_strategy = BufferingStrategyFactory.create_buffering_strategy(
            self.config["processing_strategy"], self, **self.config["processing_args"]
        )
        self.connect_time = None
        self.job_id = job_id
        self.last_start_time = last_start_time
        self.start_time = time.time()
        self.transcript = [] if transcript is None else transcript

    def update_config(self, config_data: dict) -> None:
        self.config.update(config_data)
        self.buffering_strategy = BufferingStrategyFactory.create_buffering_strategy(
            self.config["processing_strategy"], self, **self.config["processing_args"]
        )

    def append_audio_data(self, audio_data: bytes) -> None:
        self.buffer.extend(audio_data)
        self.session_audio_buffer.extend(audio_data)
        self.total_samples += len(audio_data) / self.samples_width

    def clear_buffer(self) -> None:
        self.buffer.clear()

    def increment_file_counter(self) -> None:
        self.file_counter += 1

    def get_file_name(self) -> str:
        return f"{self.client_id}_{self.file_counter}.wav"

    def get_chunk_file_name(self) -> str:
        return f"{self.client_id}_chunk_{self.chunk_save_counter:06d}.wav"

    def increment_chunk_save_counter(self) -> None:
        self.chunk_save_counter += 1

    def get_session_file_name(self) -> str:
        return f"{self.client_id}_{self.job_id}.wav"

    def process_audio(self, websocket, vad_pipeline, asr_pipeline) -> None:
        self.buffering_strategy.process_audio(websocket, vad_pipeline, asr_pipeline)
