"""Continuous-batching server tests: concurrency, slot packing, parity
with direct decode."""

import asyncio

import numpy as np
import pytest

from ttasr.engine.serving import BatchServer
from ttasr.engine.transcriber import WhisperEngine
from ttasr.models.whisper.config import WhisperConfig
from ttasr.models.whisper.model import init_params
from ttasr.text.tokenizer import build_byte_fallback_tokenizer

TOK = build_byte_fallback_tokenizer()


@pytest.fixture(scope="module")
def engine():
    cfg = WhisperConfig(
        name="micro", vocab_size=TOK.vocab_size, num_mel_bins=80,
        d_model=64, encoder_layers=2, encoder_heads=4,
        decoder_layers=2, decoder_heads=4, ffn_dim=128,
    )
    params = init_params(cfg, seed=0)
    return WhisperEngine("micro", params=params, config=cfg, tokenizer=TOK)


def _audio(seed, seconds=1.0):
    rng = np.random.default_rng(seed)
    n = int(16000 * seconds)
    t = np.arange(n) / 16000
    return (0.3 * np.sin(2 * np.pi * (200 + seed * 50) * t)
            + 0.02 * rng.standard_normal(n)).astype(np.float32)


def test_concurrent_requests_batched(engine):
    async def run():
        server = BatchServer(engine, slots=4, beam_size=1, sample_len=8,
                             linger_ms=50)
        await server.start()
        try:
            prompt = TOK.sot_sequence("zh", predict_timestamps=True)
            results = await asyncio.gather(*[
                server.transcribe_window(_audio(i), prompt) for i in range(6)
            ])
            assert len(results) == 6
            for res in results:
                assert isinstance(res.tokens, list)
                assert np.isfinite(res.sum_logprob)
            stats = server.stats
            assert stats["served"] == 6
            # 6 requests in 4-slot batches -> at most 3 steps (batching worked)
            assert stats["steps"] <= 3
        finally:
            await server.stop()
    asyncio.run(run())


def test_server_matches_direct_decode(engine):
    """A request served through slot packing must equal a direct call with
    the same slot layout semantics (same tokens for the same audio)."""
    import jax

    from ttasr.models.whisper.decode import (
        DecodingOptions, greedy_decode, pad_prompts,
    )
    from ttasr.models.whisper.model import encode
    from ttasr.ops.mel import N_SAMPLES, log_mel_spectrogram

    audio = _audio(1)
    prompt_ids = TOK.sot_sequence("zh", predict_timestamps=True)

    async def run():
        server = BatchServer(engine, slots=2, beam_size=1, sample_len=8,
                             linger_ms=1)
        await server.start()
        try:
            return await server.transcribe_window(audio, prompt_ids)
        finally:
            await server.stop()

    served = asyncio.run(run())

    padded = np.zeros((2, N_SAMPLES), np.float32)
    padded[0, : len(audio)] = audio
    mel = log_mel_spectrogram(padded, n_mels=engine.cfg.num_mel_bins)
    enc = encode(engine.params, engine.cfg, mel)
    prompt, pad = pad_prompts([prompt_ids, prompt_ids], TOK.eot)
    out = greedy_decode(
        engine.params, engine.cfg, enc, prompt, pad, jax.random.PRNGKey(0),
        opts=DecodingOptions(beam_size=1, sample_len=8), ti=engine.ti,
    )
    direct = [int(t) for t in np.asarray(out["tokens"])[0, : int(out["lengths"][0])]]
    assert served.tokens == direct


def test_error_propagates(engine):
    async def run():
        server = BatchServer(engine, slots=2, beam_size=1, sample_len=8)
        await server.start()
        try:
            with pytest.raises(Exception):
                await server.transcribe_window("not audio", [TOK.sot])
        finally:
            await server.stop()
    asyncio.run(run())


def test_streaming_plugin_through_batch_server(engine):
    """JaxWhisperASR with a BatchServer: chunks route through the
    fixed-slot decode program."""
    from ttasr.streaming.asr.jax_whisper_asr import JaxWhisperASR
    from ttasr.streaming.client import Client

    async def run():
        server = BatchServer(engine, slots=2, beam_size=1, sample_len=8,
                             linger_ms=5)
        await server.start()
        try:
            plugin = JaxWhisperASR(engine=engine, server=server)
            client = Client("c1", 16000, 2, "job", 0, [])
            pcm = (np.clip(_audio(3, seconds=2.0), -1, 1) * 32767).astype("<i2")
            client.scratch_buffer = bytearray(pcm.tobytes())
            result = await plugin.transcribe(client)
            stats = server.stats
            assert stats["served"] >= 1
            if result is not None:
                assert "text" in result and result["final"] is True
                assert result["duration"] > 0
        finally:
            await server.stop()
    asyncio.run(run())


def test_transcribe_files_concurrent(engine, tmp_path):
    """Multiple files share decode slots; outputs match per-file shape."""
    from ttasr.audio.io import write_wav
    from ttasr.engine.serving import transcribe_files

    paths = []
    for i in range(3):
        p = str(tmp_path / f"f{i}.wav")
        write_wav(p, _audio(i, seconds=1.5))
        paths.append(p)

    async def run():
        return await transcribe_files(
            engine, paths, slots=3, beam_size=1,
            language="zh", vad_filter=False, max_new_tokens=8,
        )

    results = asyncio.run(run())
    assert set(results) == set(paths)
    for path, value in results.items():
        assert not isinstance(value, Exception), value
        segments, info = value
        assert info.duration == pytest.approx(1.5, abs=0.01)
        for seg in segments:
            assert seg.end >= seg.start
