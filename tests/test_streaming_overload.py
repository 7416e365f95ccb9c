"""Overload policy of the streaming buffering strategy (VERDICT r2 #6).

When a chunk decode overruns the chunk cadence, the strategy must NOT
race a second decode against the in-flight one on the same scratch
buffer (the reference re-enters and only logs a warning); the backlog
merges into the next decode, and transient partials are shed while
behind.
"""

import asyncio

import numpy as np
import pytest

from ttasr.streaming.client import Client


def _pcm_seconds(seconds, sr=16000):
    return bytes(np.zeros(int(sr * seconds), dtype="<i2").tobytes())


class SlowASR:
    """Fake ASR whose decode takes ``delay`` seconds; records the scratch
    size seen by each call and the max concurrency."""

    def __init__(self, delay):
        self.delay = delay
        self.calls = []
        self.active = 0
        self.max_active = 0

    async def transcribe(self, client):
        self.active += 1
        self.max_active = max(self.max_active, self.active)
        self.calls.append(len(client.scratch_buffer))
        await asyncio.sleep(self.delay)
        self.active -= 1
        return {"text": "字", "duration": len(client.scratch_buffer) / 32000.0}


class PassVAD:
    async def detect_activity(self, client):
        # one segment ending early: the silence gate passes once scratch
        # exceeds 2 s (last_segment_should_end_before > 2)
        return [{"start": 0.0, "end": 0.1}]


class FakeWS:
    def __init__(self):
        self.sent = []

    async def send_str(self, text):
        self.sent.append(text)


def _client(chunk_s=1.0):
    c = Client("t", 16000, 2, "job", 0.0)
    c.connection_id = "conn"
    c.update_config({"processing_args": {
        "chunk_length_seconds": chunk_s, "chunk_offset_seconds": 0.1}})
    return c


def test_backlog_merges_instead_of_reentrant_decode(monkeypatch):
    monkeypatch.delenv("BUFFERING_CHUNK_LENGTH_SECONDS", raising=False)
    monkeypatch.delenv("BUFFERING_CHUNK_OFFSET_SECONDS", raising=False)

    async def run():
        client = _client(chunk_s=1.0)
        strat = client.buffering_strategy
        asr, vad, ws = SlowASR(delay=0.4), PassVAD(), FakeWS()

        # chunk 1: >1 s in the buffer and >2 s scratch needed for the
        # gate — feed 2.2 s so the first decode runs
        client.append_audio_data(_pcm_seconds(2.2))
        strat.process_audio(ws, vad, asr)
        await asyncio.sleep(0.05)
        assert asr.active == 1

        # while decode 1 is in flight, two more chunks arrive: both must
        # MERGE (no second concurrent decode)
        client.append_audio_data(_pcm_seconds(1.2))
        strat.process_audio(ws, vad, asr)
        client.append_audio_data(_pcm_seconds(1.2))
        strat.process_audio(ws, vad, asr)
        assert strat.behind is True
        assert strat.overload_merges == 2
        assert asr.active == 1  # never re-entered

        await asyncio.sleep(0.5)  # decode 1 finishes
        assert asr.max_active == 1

        # next frame triggers ONE merged decode over the 2.4 s backlog
        client.append_audio_data(_pcm_seconds(0.05))
        strat.process_audio(ws, vad, asr)
        await asyncio.sleep(0.5)
        assert len(asr.calls) == 2
        assert asr.calls[1] >= int(2.4 * 32000)  # merged span, one decode
        assert asr.max_active == 1
        assert strat.behind is False  # recovered
        assert len(ws.sent) == 2  # one final per decode

    asyncio.run(run())


def test_transients_shed_while_behind(monkeypatch):
    monkeypatch.delenv("BUFFERING_CHUNK_LENGTH_SECONDS", raising=False)
    monkeypatch.delenv("BUFFERING_CHUNK_OFFSET_SECONDS", raising=False)

    async def run():
        client = _client(chunk_s=1.0)
        client.update_config({"processing_args": {
            "chunk_length_seconds": 1.0, "chunk_offset_seconds": 0.1,
            "enable_transient": True}})
        strat = client.buffering_strategy
        asr, vad, ws = SlowASR(delay=0.0), PassVAD(), FakeWS()

        # gate NOT met (scratch 1.2 s <= 2 s and vad end >= boundary - offset
        # is false... use a vad end beyond the boundary): emit a transient
        class LateVAD:
            async def detect_activity(self, client):
                return [{"start": 0.0, "end": 10.0}]

        client.append_audio_data(_pcm_seconds(1.2))
        strat.process_audio(ws, LateVAD(), asr)
        await asyncio.sleep(0.1)
        assert len(ws.sent) == 1  # transient emitted when healthy
        assert '"final": 0' in ws.sent[0]

        # same situation while behind: transient shed (fresh client so
        # the scratch from the healthy transient doesn't trip the gate)
        client2 = _client(chunk_s=1.0)
        client2.update_config({"processing_args": {
            "chunk_length_seconds": 1.0, "chunk_offset_seconds": 0.1,
            "enable_transient": True}})
        strat2 = client2.buffering_strategy
        strat2.behind = True
        ws2 = FakeWS()
        client2.append_audio_data(_pcm_seconds(1.2))
        strat2.process_audio(ws2, LateVAD(), asr)
        await asyncio.sleep(0.1)
        assert len(ws2.sent) == 0  # shed

    asyncio.run(run())


def test_backlog_flushes_without_further_messages(monkeypatch):
    """A backlog that merged while a decode was in flight must be decoded
    even if the client sends NOTHING afterwards: process_audio only runs
    on incoming messages, so the decode's completion re-triggers it
    (code-review round 3: merged audio stranded forever otherwise)."""
    monkeypatch.delenv("BUFFERING_CHUNK_LENGTH_SECONDS", raising=False)
    monkeypatch.delenv("BUFFERING_CHUNK_OFFSET_SECONDS", raising=False)

    async def run():
        client = _client(chunk_s=1.0)
        strat = client.buffering_strategy
        asr, vad, ws = SlowASR(delay=0.3), PassVAD(), FakeWS()

        client.append_audio_data(_pcm_seconds(2.2))
        strat.process_audio(ws, vad, asr)
        await asyncio.sleep(0.05)
        assert asr.active == 1

        # the client's LAST audio arrives mid-decode and merges...
        client.append_audio_data(_pcm_seconds(2.5))
        strat.process_audio(ws, vad, asr)
        assert strat.behind is True

        # ...and the client goes silent. No more process_audio calls.
        await asyncio.sleep(0.8)
        assert len(asr.calls) == 2          # backlog decoded anyway
        assert asr.calls[1] >= int(2.5 * 32000)
        assert asr.max_active == 1
        assert len(ws.sent) == 2

    asyncio.run(run())
