"""Batched single-file transcription (``BatchedInferencePipeline``).

The sequential seek loop (``WhisperEngine.transcribe``) is inherently
serial within one file: window *i+1*'s start comes from window *i*'s
last timestamp, and ``condition_on_previous_text`` carries its tokens
forward.  A lone 5-minute file therefore decodes ~10 windows one after
another and leaves most of the chip's batch slots idle (bench_e2e
single-file RTF ~0.078 vs 0.018 at 8 concurrent files).

This module removes the serial dependency the way faster-whisper's
``BatchedInferencePipeline`` does (a documented member of the
reference's engine API surface — ``from faster_whisper import
BatchedInferencePipeline``; the reference pins faster-whisper but only
calls the sequential path, ``asr_core.py:159-167``): the learned VAD's
speech timestamps become the chunking oracle.  Speech segments merge
into independent <= 30 s spans of the ORIGINAL audio, every span
decodes concurrently through a :class:`ttasr.engine.serving.BatchServer`
(packing into the same fixed decode slots the multi-file path uses),
and timestamps are parsed per chunk at its own absolute offset — no
seek advance, no ``SpeechTimestampsMap`` remap, no prompt carry.

Semantics vs the sequential path:

- ``vad_filter`` is implicitly ON — VAD provides the chunk boundaries
  (faster-whisper's batched pipeline likewise requires VAD or explicit
  clip timestamps).
- ``condition_on_previous_text`` is ignored (chunks are independent);
  ``initial_prompt`` still applies to every chunk.
- Each chunk runs the SAME per-window machinery as the seek loop:
  temperature-fallback ladder with quality gates, no-speech skip,
  timestamp-token parsing, optional word alignment
  (``WhisperEngine._decode_with_fallback_server`` /
  ``_parse_window_tokens`` — one implementation, two drivers).
"""

from __future__ import annotations

import asyncio
from typing import List, Optional, Tuple

import numpy as np

from ttasr.audio.io import load_audio
from ttasr.audio.vad import VadOptions, get_speech_timestamps
from ttasr.engine.results import Segment, TranscriptionInfo
from ttasr.models.whisper.decode import build_prompt
from ttasr.ops.mel import HOP_LENGTH, N_FRAMES, N_SAMPLES, SAMPLE_RATE

__all__ = ["BatchedInferencePipeline", "build_speech_chunks",
           "transcribe_batched_with_server"]


def build_speech_chunks(speech_ts: List[dict], total_samples: int,
                        max_samples: int = N_SAMPLES) -> List[dict]:
    """Merge VAD speech segments into decode chunks <= ``max_samples``.

    Each chunk is a contiguous ``{"start", "end"}`` sample span of the
    ORIGINAL audio covering whole speech segments; the silence between
    merged segments rides along (whisper expects natural pauses — the
    batched path does not condense audio the way ``collect_chunks``
    does, so decoded timestamps are already absolute).  A single speech
    segment longer than ``max_samples`` splits at window boundaries
    (same effect as the seek loop crossing a 30 s window mid-speech).
    """
    chunks: List[dict] = []
    cur_start: Optional[int] = None
    cur_end = 0

    def flush():
        nonlocal cur_start
        if cur_start is not None and cur_end > cur_start:
            chunks.append({"start": cur_start, "end": min(cur_end,
                                                          total_samples)})
        cur_start = None

    for seg in speech_ts:
        s, e = int(seg["start"]), int(seg["end"])
        if cur_start is not None and e - cur_start <= max_samples:
            cur_end = max(cur_end, e)
            continue
        flush()
        cur_start, cur_end = s, e
        while cur_end - cur_start > max_samples:
            chunks.append({"start": cur_start,
                           "end": cur_start + max_samples})
            cur_start += max_samples
    flush()
    return chunks


async def transcribe_batched_with_server(
        engine, server, audio, *, chunk_length: Optional[float] = None,
        **kwargs
) -> Tuple[List[Segment], TranscriptionInfo]:
    """VAD-chunked concurrent transcription of ONE file through a
    running :class:`~ttasr.engine.serving.BatchServer`.

    All chunks are submitted at once; the server packs them into its
    fixed decode slots (alongside any other files' windows), so a
    single file saturates the chip instead of decoding one window at a
    time.  ``chunk_length`` (seconds, faster-whisper's batched knob)
    caps each chunk below the default 30 s window.  Returns
    ``(segments, info)`` like :meth:`WhisperEngine.transcribe`.
    """
    from ttasr.engine.transcriber import (_as_master, _host_f32,
                                          _parse_transcribe_kwargs)

    max_samples = (N_SAMPLES if chunk_length is None
                   else min(int(chunk_length * SAMPLE_RATE), N_SAMPLES))
    opts = _parse_transcribe_kwargs(kwargs)
    if isinstance(audio, (str, bytes)):
        audio, _ = load_audio(audio, sr=SAMPLE_RATE, int16=True)
    audio = _as_master(audio)
    duration = len(audio) / SAMPLE_RATE

    # host VAD in the dedicated serial executor (run_vad_async): off the
    # event loop so it never blocks the server's submit path, serial so
    # the one-core host finishes VADs FIFO, and counted so the server
    # defers partial bulk sweeps while sibling files' VADs still run
    from ttasr.engine.transcriber import run_vad_async

    speech_ts = await run_vad_async(_host_f32(audio),
                                    opts.vad_parameters or VadOptions())
    duration_after_vad = sum(
        c["end"] - c["start"] for c in speech_ts) / SAMPLE_RATE
    info = TranscriptionInfo(
        language=opts.language or "zh", language_probability=1.0,
        duration=duration, duration_after_vad=duration_after_vad,
    )
    if not speech_ts:
        return [], info

    chunks = build_speech_chunks(speech_ts, len(audio),
                                 max_samples=max_samples)
    tok = engine.tokenizer
    initial_prompt_tokens = (
        tok.encode(" " + opts.initial_prompt.strip())
        if opts.initial_prompt else [])
    prompt_ids = build_prompt(
        tok, language=opts.language or "zh", task=opts.task,
        without_timestamps=opts.without_timestamps,
        prefix_tokens=(tok.encode(" " + opts.prefix.strip())
                       if opts.prefix else ()),
        previous_tokens=(),
        initial_prompt_tokens=initial_prompt_tokens,
    )

    def parse_chunk(chunk, result, ratio, temperature) -> List[Segment]:
        time_offset = chunk["start"] / SAMPLE_RATE
        chunk_frames = min(N_FRAMES,
                           max((chunk["end"] - chunk["start"])
                               // HOP_LENGTH, 1))
        chunk_duration = chunk_frames * HOP_LENGTH / SAMPLE_RATE
        avg_logprob = result.avg_logprob
        no_speech_prob = result.no_speech_prob

        # same no-speech skip as the seek loop (transcriber.py)
        if (opts.no_speech_threshold is not None
                and no_speech_prob > opts.no_speech_threshold):
            if not (opts.log_prob_threshold is not None
                    and avg_logprob > opts.log_prob_threshold):
                return []

        new_segments, _ = engine._parse_window_tokens(
            result.tokens, time_offset, chunk_duration, chunk_frames)
        window_words = None
        if opts.word_timestamps and any(s[0] for s in new_segments):
            window_words = engine._align_window_words(
                [t for s in new_segments for t in s[0]], result.enc,
                time_offset,
            )
        out: List[Segment] = []
        for s_tokens, s_start, s_end in new_segments:
            text = tok.decode(s_tokens)
            if not text.strip():
                continue
            seg_words = None
            if window_words is not None:
                seg_words = [
                    w for w in window_words
                    if s_start - 0.01 <= (w.start + w.end) / 2 <= s_end + 0.5
                ]
            out.append(Segment(
                id=-1, seek=chunk["start"] // HOP_LENGTH,
                start=s_start, end=min(s_end, duration), text=text,
                tokens=s_tokens, avg_logprob=avg_logprob,
                compression_ratio=ratio, no_speech_prob=no_speech_prob,
                temperature=temperature, words=seg_words,
            ))
        return out

    async def one(chunk) -> List[Segment]:
        result, ratio, temperature = await engine._decode_with_fallback_server(
            server, audio[chunk["start"]: chunk["end"]], prompt_ids, opts,
            return_enc=opts.word_timestamps,
        )
        # parse as each chunk's decode resolves: the host-side token ->
        # segment work (tokenizer decode, timestamp parsing, word align)
        # of sweep N overlaps sweep N+1's device decode instead of
        # serializing after the last sweep
        return parse_chunk(chunk, result, ratio, temperature)

    per_chunk = await asyncio.gather(*[one(c) for c in chunks])
    segments: List[Segment] = [s for segs in per_chunk for s in segs]
    for i, s in enumerate(segments):
        s.id = i
    return segments, info


class BatchedInferencePipeline:
    """faster-whisper's batched entry point, TPU-native.

    >>> pipeline = BatchedInferencePipeline(engine)
    >>> segments, info = pipeline.transcribe("audio.wav", batch_size=8)

    Mirrors ``faster_whisper.BatchedInferencePipeline(model=...)``
    (the reference's engine library exposes it; the reference app only
    uses the sequential path).  ``batch_size`` maps to the decode-slot
    count of the internal :class:`BatchServer`; every chunk decode is
    the same compiled program the serving stack uses, so a warmed
    engine has no extra compiles.
    """

    def __init__(self, model, batch_size: int = 8):
        self.model = model
        self.batch_size = batch_size
        # Persistent private event loop + BatchServer: the sync
        # ``transcribe`` is callable from ANY context (including inside a
        # running event loop — ``asyncio.run`` raised there, unlike
        # faster-whisper's equivalent), and repeated calls reuse one
        # server instead of building and tearing one down per file
        # (ADVICE round 4 #4).  Async callers should prefer
        # :func:`transcribe_batched_with_server` on their own loop.
        self._loop = None
        self._thread = None
        self._server = None
        self._server_cfg = None

    def _ensure_loop(self):
        import threading

        if self._loop is None or not self._thread.is_alive():
            self._loop = asyncio.new_event_loop()
            self._thread = threading.Thread(
                target=self._loop.run_forever,
                name="ttasr-batched-pipeline", daemon=True)
            self._thread.start()
        return self._loop

    async def _get_server(self, slots: int, beam_size: int):
        from ttasr.engine.serving import BatchServer

        cfg = (slots, beam_size)
        if (self._server is None or self._server._stop
                or self._server_cfg != cfg):
            if self._server is not None and not self._server._stop:
                await self._server.stop()
            self._server = BatchServer(self.model, slots=slots,
                                       beam_size=beam_size)
            await self._server.start()
            self._server_cfg = cfg
        return self._server

    def transcribe(self, audio, batch_size: Optional[int] = None,
                   chunk_length: Optional[float] = None,
                   **kwargs) -> Tuple[List[Segment], TranscriptionInfo]:
        slots = int(batch_size or self.batch_size)
        beam_size = int(kwargs.get("beam_size", 5))

        async def run():
            server = await self._get_server(slots, beam_size)
            return await transcribe_batched_with_server(
                self.model, server, audio,
                chunk_length=chunk_length, **kwargs)

        loop = self._ensure_loop()
        return asyncio.run_coroutine_threadsafe(run(), loop).result()

    def close(self) -> None:
        """Stop the private server and loop (idempotent)."""
        if self._loop is None:
            return
        loop, self._loop = self._loop, None
        if self._server is not None and not self._server._stop:
            asyncio.run_coroutine_threadsafe(
                self._server.stop(), loop).result(timeout=30)
        self._server = None
        loop.call_soon_threadsafe(loop.stop)
        if self._thread is not None:
            self._thread.join(timeout=10)
            self._thread = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
