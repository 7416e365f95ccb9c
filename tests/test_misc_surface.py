"""Coverage for auxiliary surface: streaming utils, doctor, config tree,
standalone server wiring, logging setups."""

import asyncio
import json
import os

import pytest


def test_streaming_utils_srt():
    from ttasr.streaming.utils import (
        list_to_plain_text,
        list_to_srt_text,
        srt_format_timestamp,
    )

    # unpadded hour format (reference utils.py:8-21)
    assert srt_format_timestamp(0.0) == "0:00:00,000"
    assert srt_format_timestamp(3661.5) == "1:01:01,500"
    subs = [{"startTime": 0.0, "endTime": 1.0, "text": "你好"}]
    srt = list_to_srt_text(subs)
    assert "1\n0:00:00,000 --> 0:00:01,000\n你好\n\n" == srt
    assert list_to_plain_text(subs) == "你好\n"


def test_convert_transcript_to_subtitles(tmp_path):
    from ttasr.streaming.utils import convert_transcript_to_subtitles

    path = tmp_path / "t.json"
    path.write_text(json.dumps([
        {"startTime": 0.0, "endTime": 1.5, "text": "a"},
        {"startTime": 1.5, "endTime": 3.0, "text": "b"},
    ]), encoding="utf-8")
    duration, srt_path, txt_path = convert_transcript_to_subtitles(str(path))
    assert duration == 3.0
    assert os.path.exists(srt_path) and os.path.exists(txt_path)


def test_create_today_folders(tmp_path):
    from ttasr.streaming.utils import create_today_folders

    out = create_today_folders(str(tmp_path), "job42")
    assert os.path.isdir(out) and out.endswith("job42")


def test_transfer_formats():
    from ttasr.streaming.utils import transfer_offline_format, transfer_streaming_format

    assert transfer_streaming_format([]) is None
    res = transfer_streaming_format([{"startTime": 0, "endTime": 1, "text": "x"}])
    assert res == [{"startTime": 0, "endTime": 1, "text": "x", "final": True}]
    off = transfer_offline_format({"segments": [
        {"start": 0, "end": 1, "text": "ok"},
        {"start": 1, "end": 2, "text": "喜歡請訂閱"},  # filtered
    ]})
    assert off == [{"startTime": 0, "endTime": 1, "text": "ok", "final": True}]


def test_doctor_report(tmp_path, capsys):
    from ttasr.cli.doctor import main

    report = main(["--model-dir", str(tmp_path / "nope")])
    assert report["modules"]["jax"] == "ok"
    assert report["model_dir"]["exists"] is False
    assert report["native"]["built"] in (True, False)


def test_doctor_launch_port_precheck():
    """launch_server refuses a port that is already bound (reference
    build.py:528-541 port pre-check)."""
    import socket

    from ttasr.cli.doctor import launch_server

    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as srv:
        srv.bind(("127.0.0.1", 0))
        srv.listen(1)
        port = srv.getsockname()[1]
        out = launch_server(port=port, timeout_s=1.0)
    assert out["launched"] is False
    assert "already in use" in out["error"]


def test_doctor_install_missing_tolerance(monkeypatch):
    """install_missing: optional packages tolerate pip failure, required
    ones surface it (reference build.py:155-226 semantics)."""
    import subprocess

    from ttasr.cli import doctor

    calls = []

    def fake_run(cmd, **kwargs):
        calls.append(cmd)

        class P:
            returncode = 1
            stderr = "no network"
        return P()

    monkeypatch.setattr(subprocess, "run", fake_run)
    out = doctor.install_missing({
        "aiohttp": "MISSING (no module)",        # required
        "Levenshtein": "missing (optional)",     # optional, pip-name mapped
        "jax": "ok",                             # untouched
    })
    assert out["aiohttp"].startswith("FAILED")
    assert out["Levenshtein"].startswith("failed (tolerated)")
    assert "jax" not in out
    assert any("python-Levenshtein" in c for cmd in calls for c in cmd)


def test_config_tree(monkeypatch):
    from ttasr.core.config import load_config

    monkeypatch.setenv("BUFFERING_CHUNK_LENGTH_SECONDS", "2.5")
    monkeypatch.setenv("TTASR_MAX_STREAMS", "7")
    cfg = load_config()
    assert cfg.streaming.chunk_length_seconds == 2.5
    assert cfg.streaming.max_streams == 7
    assert cfg.auth.jwt_algorithm == "HS256"


def test_standalone_server_flow():
    """Drive Server.handle_connection with a fake websocket."""
    from ttasr.streaming.server import Server
    from ttasr.streaming.vad.simple_vad import SimpleVAD

    class EchoASR:
        async def transcribe(self, client):
            return {"text": "hi", "duration": 0.5, "language": "zh",
                    "language_probability": 1.0, "final": True, "words": []}

    class FakeWS:
        def __init__(self, messages):
            self.messages = list(messages)
            self.sent = []

        def __aiter__(self):
            return self

        async def __anext__(self):
            if not self.messages:
                raise StopAsyncIteration
            return self.messages.pop(0)

        async def send(self, text):
            self.sent.append(json.loads(text))

        async def close(self):
            pass

    server = Server(SimpleVAD(min_duration=0.01), EchoASR())
    pcm = b"\x00\x01" * 16000 * 3  # 3s of audio -> exceeds 1.5s chunk and 2s VAD gate
    ws = FakeWS([json.dumps({"type": "config", "data": {"language": "zh"}}), pcm])

    async def run():
        await server.handle_connection(ws)
        await asyncio.sleep(0.1)  # let the chunk task finish

    asyncio.run(run())
    codes = [m.get("code") for m in ws.sent]
    assert 100 in codes and 200 in codes
    # a transcription payload arrived
    assert any(m.get("result") for m in ws.sent)


def test_logging_setups(tmp_path):
    from ttasr.core.logging import setup_api_logging, setup_hourly_logging

    logger = setup_api_logging(str(tmp_path), name="test_api_log")
    logger.info("hello")
    logger.error("bad")
    for h in logger.handlers:
        h.flush()
    assert (tmp_path / "test_api_log.log").exists()
    assert "bad" in (tmp_path / "test_api_log_error.log").read_text()

    hourly = setup_hourly_logging(str(tmp_path / "h" / "x.log"), name="test_hourly")
    hourly.info("tick")
    for h in hourly.handlers:
        h.flush()
    assert (tmp_path / "h" / "x.log").exists()


def test_stage_timer():
    from ttasr.core.profiling import StageTimer

    t = StageTimer()
    with t.stage("mel"):
        pass
    with t.stage("mel"):
        pass
    snap = t.snapshot()
    assert snap["mel"]["count"] == 2
    t.reset()
    assert t.snapshot() == {}


def test_transient_partials_and_characters_to_numbers():
    """enableTransient -> final=0 partials; charactersToNumbers -> Arabic
    digits (advanced params the reference documents but never implements)."""
    from ttasr.streaming.client import Client
    from ttasr.streaming.vad.simple_vad import SimpleVAD

    class FixedASR:
        async def transcribe(self, client):
            return {"text": "一百零五元", "duration": 0.5, "final": True,
                    "language": "zh", "language_probability": 1.0, "words": []}

    class FakeWS:
        def __init__(self):
            self.sent = []

        async def send(self, text):
            self.sent.append(json.loads(text))

    client = Client("c1", 16000, 2, "job", 0, [])
    client.connection_id = "cid"
    client.characters_to_numbers = True
    client.update_config({"processing_args": {
        "chunk_length_seconds": 0.5, "chunk_offset_seconds": 0.3,
        "enable_transient": True,
    }})
    ws = FakeWS()
    vad = SimpleVAD(min_duration=0.01)
    asr = FixedASR()

    async def run():
        # 1s of audio: SimpleVAD end == duration -> gate NOT met (<2s)
        client.append_audio_data(b"\x00\x01" * 16000)
        client.process_audio(ws, vad, asr)
        await asyncio.sleep(0.1)

    asyncio.run(run())
    finals = [r for m in ws.sent for r in m.get("result", [])]
    assert finals, ws.sent
    assert finals[0]["final"] == 0  # transient
    assert finals[0]["transcript"] == "105元"  # cn2an applied


def test_parity_harness_self_check():
    """tools/parity_vs_reference.py --check: the real-weights CER-parity
    harness (PARITY_PLAN.md) stays runnable without weights."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "parity_vs_reference.py"),
         "--check"],
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0, proc.stderr
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    assert report["check"] == "ok"


def test_streaming_token_budget_buckets(monkeypatch):
    """Bucketed decode-token budget for streaming chunks + the
    TTASR_STREAM_TOKEN_CAP override semantics."""
    from ttasr.streaming.asr.jax_whisper_asr import JaxWhisperASR

    budget = JaxWhisperASR._token_budget
    monkeypatch.delenv("TTASR_STREAM_TOKEN_CAP", raising=False)
    assert budget(1.5) == 48
    assert budget(5.0) == 48
    assert budget(6.0) == 96
    assert budget(20.0) == 224
    # Boundary alignment (ADVICE round 4 #2): the budget thresholds must
    # EQUAL the short-window encode buckets, or a live chunk in the gap
    # (e.g. 5.0-5.12 s) hits a never-warmed (window, budget) program —
    # a 20 s-5 min remote compile landing on a live stream.
    from ttasr.engine.serving import window_bucket
    reachable = set()
    for n in range(1, 500):          # 0.1 s steps through 50 s
        d = n / 10.0
        reachable.add((window_bucket(int(d * 16000)), budget(d)))
    assert reachable == {(81920, 48), (245760, 96), (480000, 224)}
    # census + warm-up must cover exactly that set
    import tools.compile_census as census_mod
    assert set(census_mod.STREAM_WINDOW_BUDGETS) == reachable
    warmed = {(window_bucket(int(s * 16000)), budget(s))
              for s in (1.5, 6.0, 16.0)}   # warm_up_async seconds list
    assert warmed == reachable
    monkeypatch.setenv("TTASR_STREAM_TOKEN_CAP", "0")
    assert budget(1.5) == 224  # 0 = full window budget
    monkeypatch.setenv("TTASR_STREAM_TOKEN_CAP", "64")
    assert budget(1.5) == 64   # fixed cap
    assert budget(20.0) == 64
    monkeypatch.setenv("TTASR_STREAM_TOKEN_CAP", "999")
    assert budget(1.5) == 224  # clamped to the window budget


def test_scratch_timestamps_are_sample_accurate():
    """startTime/endTime derive from the audio sample count, not
    wall-clock deltas (which drift past the audio timeline)."""
    import asyncio

    from ttasr.streaming.buffering_strategy.buffering_strategies import (
        SilenceAtEndOfChunk,
    )
    from ttasr.streaming.client import Client
    from ttasr.streaming.vad.simple_vad import SimpleVAD

    client = Client("c1", 16000, 2, "job", 0.0, [])
    strategy = SilenceAtEndOfChunk(client, chunk_length_seconds=1.0,
                                   chunk_offset_seconds=0.1)
    client.buffering_strategy = strategy

    class FixedASR:
        async def transcribe(self, client):
            n = len(client.scratch_buffer) // 2
            return {"text": "你好", "duration": n / 16000.0, "words": []}

    class FakeWS:
        def __init__(self):
            self.sent = []

        async def send_str(self, text):
            self.sent.append(json.loads(text))

    ws = FakeWS()
    vad = SimpleVAD(min_duration=0.01)
    asr = FixedASR()

    async def run():
        # 2.5 s of audio in one shot -> buffer > 1 s chunk -> scratch
        client.append_audio_data(b"\x00\x01" * (2 * 16000 + 8000))
        client.process_audio(ws, vad, asr)
        await asyncio.sleep(0.2)

    asyncio.run(run())
    finals = [r for m in ws.sent for r in m.get("result", [])]
    assert finals, ws.sent
    seg = finals[0]
    # scratch held the full 2.5 s starting at session time 0
    assert seg["startTime"] == 0.0
    assert abs(seg["endTime"] - 2.5) < 1e-3
