"""SilenceAtEndOfChunk buffering strategy.

Parity surface: reference api/stt_streaming/src/buffering_strategy/
buffering_strategies.py —
- chunk/offset seconds from kwargs with env overrides
  ``BUFFERING_CHUNK_LENGTH_SECONDS`` / ``BUFFERING_CHUNK_OFFSET_SECONDS``
  (:32-40),
- when the buffer exceeds chunk_length bytes, move it to scratch and
  schedule async processing (:61-90) with a re-entrancy warning flag
  (:72-75),
- VAD gate: transcribe when the last VAD segment ends at least
  ``chunk_offset`` before scratch end OR scratch exceeds 2 s (:118-126),
- emits ``{"id", "code": 200, "message": "轉譯成功", "result": [...]}``
  (:145-158) and appends to ``client.transcript`` (:175).
"""

from __future__ import annotations

import asyncio
import json
import logging
import os
import time
import uuid

from ttasr.streaming.buffering_strategy.buffering_strategy_interface import (
    BufferingStrategyInterface,
)

logger = logging.getLogger("ttasr.streaming.buffering")


class SilenceAtEndOfChunk(BufferingStrategyInterface):
    def __init__(self, client, **kwargs):
        self.client = client
        chunk_length = os.environ.get("BUFFERING_CHUNK_LENGTH_SECONDS") \
            or kwargs.get("chunk_length_seconds")
        self.chunk_length_seconds = float(chunk_length)
        chunk_offset = os.environ.get("BUFFERING_CHUNK_OFFSET_SECONDS") \
            or kwargs.get("chunk_offset_seconds")
        self.chunk_offset_seconds = float(chunk_offset)
        self.error_if_not_realtime = os.environ.get("ERROR_IF_NOT_REALTIME") \
            or kwargs.get("error_if_not_realtime", False)
        # transient partials: when the silence gate is not met, still emit
        # a provisional (final=0) transcription of the scratch buffer —
        # the reference documents this as ``enableTransient=1``
        # (reference README.md:517-523) but never implements it.
        self.enable_transient = bool(kwargs.get("enable_transient", False))
        self.processing_flag = False
        self.start_time = None
        # Overload policy (VERDICT round-2 #6): when a decode overruns the
        # chunk cadence, do NOT spawn a second concurrent decode on the
        # same scratch (the reference re-enters and only logs,
        # buffering_strategies.py:72-75 — two decodes then race on one
        # buffer).  Instead the backlog keeps accumulating in
        # ``client.buffer`` and the NEXT process_audio call after the
        # in-flight decode finishes processes the merged span in one
        # larger decode (which lands in a larger token-budget bucket).
        # While behind, transient (final=0) partials are shed.
        self.behind = False
        self.overload_merges = 0

    def process_audio(self, websocket, vad_pipeline, asr_pipeline):
        if self.client.connect_time is None and len(self.client.buffer) > 0:
            self.client.connect_time = time.time()
        if self.start_time is None:
            self.start_time = time.time()

        chunk_length_in_bytes = (
            self.chunk_length_seconds
            * self.client.sampling_rate
            * self.client.samples_width
        )
        if len(self.client.buffer) > chunk_length_in_bytes:
            if self.processing_flag:
                # merge-backlog: leave the bytes in client.buffer; they
                # join the next decode as one span instead of racing a
                # second decode against the in-flight one
                self.behind = True
                self.overload_merges += 1
                logger.warning(
                    "realtime processing fell behind: merging backlog "
                    "(%.1f s pending) into the next chunk",
                    len(self.client.buffer)
                    / (self.client.sampling_rate * self.client.samples_width),
                )
                return
            self.client.scratch_buffer += self.client.buffer
            self.client.buffer.clear()
            self.processing_flag = True
            # sample-accurate session time of the scratch span's start:
            # total received minus what scratch now holds (wall-clock
            # deltas drift past the audio timeline and truncate)
            rate = self.client.sampling_rate * self.client.samples_width
            scratch_start_sec = (
                self.client.total_samples / self.client.sampling_rate
                - len(self.client.scratch_buffer) / rate
                + float(self.client.last_start_time)
            )
            asyncio.create_task(
                self.process_audio_async(
                    websocket, vad_pipeline, asr_pipeline,
                    self.start_time, self.client.last_start_time,
                    scratch_start_sec,
                )
            )
            self.start_time = None

    async def process_audio_async(self, websocket, vad_pipeline, asr_pipeline,
                                  start_time, default_start_time,
                                  scratch_start_sec=None):
        try:
            if scratch_start_sec is not None:
                start_transcribe_time = max(scratch_start_sec, 0.0)
            else:
                start_transcribe_time = (
                    int(start_time - self.client.connect_time)
                    + float(default_start_time)
                )
            vad_results = await vad_pipeline.detect_activity(self.client)
            if len(vad_results) == 0:
                self.client.scratch_buffer.clear()
                self.client.buffer.clear()
                return

            last_segment_should_end_before = (
                len(self.client.scratch_buffer)
                / (self.client.sampling_rate * self.client.samples_width)
            ) - self.chunk_offset_seconds
            if not (
                vad_results[-1]["end"] < last_segment_should_end_before
                or last_segment_should_end_before > 2
            ):
                if self.enable_transient and not self.behind:
                    # shed transients while behind: provisional partials
                    # are pure extra decode load when finals are late
                    await self._emit_transient(websocket, asr_pipeline,
                                               start_transcribe_time)
                return

            transcription = await asr_pipeline.transcribe(self.client)
            if transcription is not None and "text" in transcription:
                self.start_time = time.time()
                start_time_sec = start_transcribe_time
                end_time_sec = start_transcribe_time + (transcription.get("duration") or 0.0)
                connection_id = getattr(self.client, "connection_id", None) \
                    or str(uuid.uuid4())
                payload = {
                    "id": connection_id,
                    "code": 200,
                    "message": "轉譯成功",
                    "result": [
                        {
                            "segment": 0,
                            "transcript": self._postprocess(
                                transcription.get("text", "")),
                            "final": 1,
                            "startTime": round(float(start_time_sec), 3),
                            "endTime": round(float(end_time_sec), 3),
                        }
                    ],
                }
                await self._send(websocket, json.dumps(payload, ensure_ascii=False))
                self.client.transcript.append(payload)
                logger.info("chunk transcribed: %s", transcription.get("text", ""))
            self.client.scratch_buffer.clear()
            self.client.increment_file_counter()
        except Exception:
            logger.exception("chunk processing failed")
        finally:
            self.processing_flag = False
            # recovered when the pending backlog is back under one chunk
            chunk_bytes = (self.chunk_length_seconds
                           * self.client.sampling_rate
                           * self.client.samples_width)
            pending = len(self.client.buffer)
            if self.behind and pending <= chunk_bytes:
                self.behind = False
            if pending > chunk_bytes:
                # a backlog merged while this decode ran: process it NOW
                # instead of waiting for the next websocket message —
                # the client may already have gone quiet, and audio that
                # arrived mid-decode must not strand in client.buffer
                self.process_audio(websocket, vad_pipeline, asr_pipeline)

    def _postprocess(self, text: str) -> str:
        """Optional charactersToNumbers conversion (README.md:520)."""
        if getattr(self.client, "characters_to_numbers", False):
            from ttasr.text.normalize import num_to_cn

            return num_to_cn(text, mode=1)
        return text

    async def _emit_transient(self, websocket, asr_pipeline,
                              start_time_sec: float) -> None:
        """Provisional (final=0) result for the in-flight scratch buffer;
        the scratch is NOT cleared so the final result supersedes it."""
        transcription = await asr_pipeline.transcribe(self.client)
        if transcription is None or "text" not in transcription:
            return
        connection_id = getattr(self.client, "connection_id", None) \
            or str(uuid.uuid4())
        payload = {
            "id": connection_id,
            "code": 200,
            "message": "轉譯中",
            "result": [
                {
                    "segment": 0,
                    "transcript": self._postprocess(transcription.get("text", "")),
                    "final": 0,
                    "startTime": round(float(start_time_sec), 3),
                    "endTime": round(
                        float(start_time_sec)
                        + float(transcription.get("duration") or 0.0), 3),
                }
            ],
        }
        await self._send(websocket, json.dumps(payload, ensure_ascii=False))

    @staticmethod
    async def _send(websocket, text: str) -> None:
        """Support aiohttp (send_str), starlette (send_text) and raw
        websockets (send)."""
        if hasattr(websocket, "send_str"):
            await websocket.send_str(text)
        elif hasattr(websocket, "send_text"):
            await websocket.send_text(text)
        else:
            await websocket.send(text)
