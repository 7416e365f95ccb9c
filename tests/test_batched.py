"""BatchedInferencePipeline tests: VAD chunking, concurrent single-file
transcription, parity of the chunk machinery with the seek-loop parsing.

The batched path (ttasr/engine/batched.py) mirrors faster-whisper's
``BatchedInferencePipeline``: VAD speech timestamps become independent
<= 30 s chunks of the ORIGINAL audio, all decoded concurrently through
a BatchServer with absolute per-chunk time offsets."""

import os
import sys

import numpy as np
import pytest

from ttasr.engine.batched import (BatchedInferencePipeline,
                                  build_speech_chunks)
from ttasr.engine.transcriber import WhisperEngine
from ttasr.models.whisper.config import WhisperConfig
from ttasr.models.whisper.model import init_params
from ttasr.ops.mel import N_SAMPLES, SAMPLE_RATE
from ttasr.text.tokenizer import build_byte_fallback_tokenizer

TOK = build_byte_fallback_tokenizer()

# quality gates off: random weights fail them on every window (same
# posture as bench_e2e.py), and the ladder would re-decode at every rung
GATES_OFF = dict(
    temperature=0.0,
    compression_ratio_threshold=None,
    log_prob_threshold=None,
    no_speech_threshold=None,
)


@pytest.fixture(scope="module")
def engine():
    cfg = WhisperConfig(
        name="micro", vocab_size=TOK.vocab_size, num_mel_bins=80,
        d_model=64, encoder_layers=2, encoder_heads=4,
        decoder_layers=2, decoder_heads=4, ffn_dim=128,
    )
    params = init_params(cfg, seed=0)
    return WhisperEngine("micro", params=params, config=cfg, tokenizer=TOK)


def _speech(seconds, seed):
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools"))
    from train_vad import synth_speech

    audio, _ = synth_speech(np.random.default_rng(seed), seconds)
    return audio.astype(np.float32)


def _two_burst_audio():
    """~1.8 s speech, ~3 s silence, ~1.8 s speech: the gap exceeds the
    VAD's 2 s min_silence, so two speech segments come back; with
    chunk_length=4 they cannot merge into one chunk (span 7.4 s)."""
    sr = SAMPLE_RATE
    a = np.zeros(int(8.0 * sr), np.float32)
    b1, b2 = _speech(1.8, seed=5), _speech(1.8, seed=6)
    a[int(0.5 * sr): int(0.5 * sr) + len(b1)] = b1
    a[int(5.3 * sr): int(5.3 * sr) + len(b2)] = b2
    return a


def test_build_speech_chunks_merges_within_window():
    ts = [{"start": 0, "end": 16000},
          {"start": 32000, "end": 64000},
          {"start": 80000, "end": 120000}]
    chunks = build_speech_chunks(ts, 200000)
    # all three spans fit one 30 s window (120000 < 480000)
    assert chunks == [{"start": 0, "end": 120000}]


def test_build_speech_chunks_splits_at_window():
    # second segment cannot join the first within 30 s
    ts = [{"start": 0, "end": 160000},
          {"start": 400000, "end": 560000}]
    chunks = build_speech_chunks(ts, 600000)
    assert chunks == [{"start": 0, "end": 160000},
                      {"start": 400000, "end": 560000}]


def test_build_speech_chunks_long_segment_splits():
    # one 70 s segment -> 30 + 30 + 10 s chunks at window boundaries
    n = 70 * SAMPLE_RATE
    chunks = build_speech_chunks([{"start": 0, "end": n}], n)
    assert chunks == [
        {"start": 0, "end": N_SAMPLES},
        {"start": N_SAMPLES, "end": 2 * N_SAMPLES},
        {"start": 2 * N_SAMPLES, "end": n},
    ]
    assert all(c["end"] - c["start"] <= N_SAMPLES for c in chunks)


def test_build_speech_chunks_empty():
    assert build_speech_chunks([], 16000) == []


def test_batched_pipeline_two_bursts(engine):
    """Two VAD-separated bursts decode as independent chunks with
    absolute timestamps; results are deterministic."""
    audio = _two_burst_audio()
    pipe = BatchedInferencePipeline(engine, batch_size=2)
    segs, info = pipe.transcribe(audio, language="zh", beam_size=1,
                                 max_new_tokens=6, chunk_length=4,
                                 **GATES_OFF)
    assert info.duration == pytest.approx(8.0, abs=0.01)
    assert 2.0 < info.duration_after_vad < 7.0
    assert segs, "speech bursts must produce segments"
    # chunk seeks are frame offsets into the ORIGINAL audio: the second
    # burst's segments must anchor past the silence gap
    seeks = sorted({s.seek for s in segs})
    assert len(seeks) == 2, seeks
    assert seeks[0] < 200 and seeks[1] > 300, seeks
    for s in segs:
        assert 0.0 <= s.start <= s.end <= info.duration + 0.5
        assert s.text.strip()
        assert s.temperature == 0.0

    segs2, _ = pipe.transcribe(audio, language="zh", beam_size=1,
                               max_new_tokens=6, chunk_length=4,
                               **GATES_OFF)
    assert [(s.start, s.end, s.text) for s in segs2] == \
        [(s.start, s.end, s.text) for s in segs]


def test_batched_matches_sequential_chunk_decode(engine):
    """Concurrent gather through the server must not change any chunk's
    result: decode the same chunks one at a time through the same
    per-window machinery and compare token-for-token."""
    import asyncio

    from ttasr.engine.batched import transcribe_batched_with_server
    from ttasr.engine.serving import BatchServer
    from ttasr.engine.transcriber import (_host_f32,
                                          _parse_transcribe_kwargs)
    from ttasr.audio.vad import VadOptions, get_speech_timestamps
    from ttasr.models.whisper.decode import build_prompt

    audio = _two_burst_audio()
    kwargs = dict(language="zh", beam_size=1, max_new_tokens=6,
                  **GATES_OFF)

    async def run_batched():
        server = BatchServer(engine, slots=2, beam_size=1)
        await server.start()
        try:
            return await transcribe_batched_with_server(
                engine, server, audio, chunk_length=4, **kwargs)
        finally:
            await server.stop()

    segs, _ = asyncio.run(run_batched())

    opts = _parse_transcribe_kwargs(dict(kwargs))
    ts = get_speech_timestamps(_host_f32(audio), VadOptions())
    chunks = build_speech_chunks(ts, len(audio),
                                 max_samples=4 * SAMPLE_RATE)
    prompt_ids = build_prompt(TOK, language="zh", task="transcribe",
                              without_timestamps=False,
                              previous_tokens=())

    async def run_sequential():
        server = BatchServer(engine, slots=2, beam_size=1)
        await server.start()
        try:
            out = []
            for c in chunks:
                out.append(await engine._decode_with_fallback_server(
                    server, audio[c["start"]: c["end"]], prompt_ids,
                    opts, return_enc=False))
            return out
        finally:
            await server.stop()

    direct = asyncio.run(run_sequential())
    assert len(direct) == len(chunks) == 2
    seg_tokens_by_seek = {}
    for s in segs:
        seg_tokens_by_seek.setdefault(s.seek, []).extend(s.tokens)
    for c, (res, _ratio, _t) in zip(chunks, direct):
        got = seg_tokens_by_seek.get(c["start"] // 160, [])
        # same post-parse the batched path applies: segment split +
        # whitespace-text segments dropped
        frames = max((c["end"] - c["start"]) // 160, 1)
        parsed, _ = engine._parse_window_tokens(
            res.tokens, c["start"] / SAMPLE_RATE, frames / 100.0, frames)
        want = [t for seg_toks, _s, _e in parsed
                if TOK.decode(seg_toks).strip()
                for t in seg_toks]
        assert got == want, (c, got, want)


def test_batched_word_timestamps(engine):
    """word_timestamps=True rides return_enc through the batched path:
    the aligner is called once per chunk with that chunk's encoder row
    and ABSOLUTE time offset.  (Random-weight DTW scatters word times
    anywhere in the 30 s window, so in-segment placement can't be
    asserted here — the aligner itself is tested in test_engine.py.)"""
    audio = _two_burst_audio()
    calls = []
    orig = engine._align_window_words

    def spy(text_tokens, enc, time_offset):
        calls.append((len(text_tokens), enc is not None, time_offset))
        return orig(text_tokens, enc, time_offset)

    engine._align_window_words = spy
    try:
        pipe = BatchedInferencePipeline(engine, batch_size=2)
        segs, _ = pipe.transcribe(audio, language="zh", beam_size=1,
                                  max_new_tokens=6, word_timestamps=True,
                                  chunk_length=4, **GATES_OFF)
    finally:
        engine._align_window_words = orig
    assert segs
    assert len(calls) == 2, calls
    offsets = sorted(c[2] for c in calls)
    assert all(ntok > 0 and has_enc for ntok, has_enc, _ in calls), calls
    # absolute offsets: second chunk's offset sits past the silence gap
    assert offsets[0] < 2.0 and offsets[1] > 3.0, offsets


def test_batched_no_speech_returns_empty(engine):
    """Silence-only input: no chunks, no segments, sane info."""
    audio = np.zeros(SAMPLE_RATE * 2, np.float32)
    pipe = BatchedInferencePipeline(engine, batch_size=2)
    segs, info = pipe.transcribe(audio, language="zh", beam_size=1,
                                 **GATES_OFF)
    assert segs == []
    assert info.duration_after_vad == 0.0


def test_batched_pipeline_reuses_server_and_runs_inside_loop(engine):
    """ADVICE round 4 #4: ``transcribe`` is callable from a running
    event loop (faster-whisper's equivalent is context-agnostic) and
    repeated calls reuse ONE BatchServer instead of building and
    tearing one down per file."""
    import asyncio

    audio = _two_burst_audio()
    pipe = BatchedInferencePipeline(engine, batch_size=2)
    try:
        segs1, _ = pipe.transcribe(audio, language="zh", beam_size=1,
                                   max_new_tokens=6, chunk_length=4,
                                   **GATES_OFF)
        server1 = pipe._server
        assert server1 is not None and not server1._stop
        served1 = server1.stats["served"]

        # second call: same server object, more requests served
        segs2, _ = pipe.transcribe(audio, language="zh", beam_size=1,
                                   max_new_tokens=6, chunk_length=4,
                                   **GATES_OFF)
        assert pipe._server is server1
        assert server1.stats["served"] > served1
        assert [(s.start, s.text) for s in segs2] == \
            [(s.start, s.text) for s in segs1]

        # callable from inside a running event loop (asyncio.run raised
        # RuntimeError here before)
        async def inside_loop():
            return pipe.transcribe(audio, language="zh", beam_size=1,
                                   max_new_tokens=6, chunk_length=4,
                                   **GATES_OFF)

        segs3, _ = asyncio.run(inside_loop())
        assert [(s.start, s.text) for s in segs3] == \
            [(s.start, s.text) for s in segs1]
    finally:
        pipe.close()
    assert pipe._server is None


def test_cli_batched_flag(engine, tmp_path):
    """`ttasr.cli.asr --batched` routes single files through the
    BatchedInferencePipeline and still writes the {name}_asr.txt
    output surface."""
    import wave

    from ttasr.cli.asr import process_audio_folder

    audio = _two_burst_audio()
    folder = tmp_path / "clips"
    folder.mkdir()
    pcm = (np.clip(audio, -1, 1) * 32767).astype("<i2")
    with wave.open(str(folder / "a.wav"), "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(SAMPLE_RATE)
        wf.writeframes(pcm.tobytes())

    res = process_audio_folder(str(folder), engine=engine, batched=True,
                               results_json_dir=str(tmp_path))
    assert res is not None
    out = folder / "a_asr.txt"
    assert out.exists()
