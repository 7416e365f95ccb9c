"""End-to-end engine tests with a micro random-weight model.

Validates the full transcribe pipeline (audio -> mel -> encoder -> seek
loop -> beam decode -> segments) plus VAD gating, SRT/TXT writers, and
the faster-whisper-compatible call surface used by the reference.
"""

import numpy as np
import pytest

from ttasr.engine.results import (
    Segment,
    format_srt_timestamp,
    segments_to_srt,
    segments_to_txt,
)
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


def _speechy_audio(seconds=3.0, sr=16000):
    """Modulated tone bursts separated by silence (exercises the VAD)."""
    rng = np.random.default_rng(0)
    n = int(sr * seconds)
    t = np.arange(n) / sr
    env = (np.sin(2 * np.pi * 1.5 * t) > 0).astype(np.float32)
    sig = 0.3 * env * np.sin(2 * np.pi * 220 * t) * (1 + 0.5 * np.sin(2 * np.pi * 3 * t))
    sig += 0.01 * rng.standard_normal(n)
    return sig.astype(np.float32)


def test_transcribe_runs_end_to_end(engine):
    segments, info = engine.transcribe(
        _speechy_audio(),
        language="zh",
        beam_size=2,
        vad_filter=True,
        condition_on_previous_text=True,
        initial_prompt="",
        max_new_tokens=8,
        temperature=(0.0,),
    )
    assert info.duration == pytest.approx(3.0, abs=0.01)
    assert info.duration_after_vad <= info.duration + 1e-6
    assert isinstance(segments, list)
    for seg in segments:
        assert seg.end >= seg.start >= 0
        assert isinstance(seg.text, str)
        assert seg.tokens  # non-empty token list


def test_transcribe_accepts_reference_kwargs(engine):
    # exact kwarg set used at reference asr_core.py:159-167
    segments, info = engine.transcribe(
        _speechy_audio(1.0),
        language="zh",
        word_timestamps=False,
        vad_filter=True,
        beam_size=2,
        condition_on_previous_text=True,
        initial_prompt="",
        max_new_tokens=6,
    )
    assert info.language == "zh"


def test_transcribe_silence_yields_nothing(engine):
    silence = np.zeros(16000, dtype=np.float32)
    segments, info = engine.transcribe(
        silence, vad_filter=True, beam_size=1, max_new_tokens=4,
        temperature=(0.0,),
    )
    assert segments == []
    assert info.duration_after_vad == 0.0


def test_transcribe_no_vad_path(engine):
    segments, info = engine.transcribe(
        _speechy_audio(1.0), vad_filter=False, beam_size=1,
        max_new_tokens=6, temperature=(0.0,),
    )
    assert info.duration_after_vad == info.duration


def test_srt_writer_format():
    segs = [
        Segment(id=0, seek=0, start=0.0, end=1.5, text="你好", tokens=[],
                avg_logprob=0.0, compression_ratio=1.0, no_speech_prob=0.0),
        Segment(id=1, seek=0, start=1.5, end=3.999, text="世界\n第二行", tokens=[],
                avg_logprob=0.0, compression_ratio=1.0, no_speech_prob=0.0),
    ]
    srt = segments_to_srt(segs)
    lines = srt.split("\r\n")
    assert lines[0] == "1"
    assert lines[1] == "00:00:00,000 --> 00:00:01,500"
    assert lines[2] == "你好"
    assert lines[4] == "2"
    assert lines[5] == "00:00:01,500 --> 00:00:03,999"
    assert lines[6] == "世界 第二行"  # newlines folded to spaces
    assert segments_to_txt(segs) == "你好世界\n第二行"


def test_srt_timestamp_rounding_carry():
    # 0.9996 rounds to 1000 ms -> must carry into seconds
    assert format_srt_timestamp(0.9996) == "00:00:01,000"
    assert format_srt_timestamp(3599.9995) == "01:00:00,000"
    assert format_srt_timestamp(None) == "00:00:00,000"
    assert format_srt_timestamp(-5) == "00:00:00,000"


def test_word_timestamps(engine):
    segments, info = engine.transcribe(
        _speechy_audio(2.0), language="zh", beam_size=1, vad_filter=False,
        word_timestamps=True, max_new_tokens=8, temperature=(0.0,),
    )
    for seg in segments:
        assert seg.words is not None
        for w in seg.words:
            assert w.end >= w.start >= 0
            assert isinstance(w.word, str) and w.word
        # words ordered in time
        starts = [w.start for w in seg.words]
        assert starts == sorted(starts)


def test_detect_language(engine):
    lang, prob, ranked = engine.detect_language(_speechy_audio(1.0))
    assert lang in TOK.language_ids
    assert 0 < prob <= 1
    assert abs(sum(p for _, p in ranked) - 1.0) < 1e-4
    assert ranked[0][0] == lang


def test_language_auto_detection(engine):
    segments, info = engine.transcribe(
        _speechy_audio(1.0), language=None, beam_size=1, vad_filter=False,
        max_new_tokens=4, temperature=(0.0,),
    )
    assert info.language in TOK.language_ids
    assert 0 < info.language_probability <= 1


def test_best_of_selects_max_quality_candidate(engine, monkeypatch):
    """temperature>0 with best_of=K decodes K batched samples and returns
    the MaximumLikelihoodRanker winner (faster-whisper best_of semantics;
    reference transcribe surface default best_of=5)."""
    import ttasr.engine.transcriber as tr

    captured = {}
    real_greedy = tr.greedy_decode

    def spy(params, cfg, enc_out, prompt, pad, rng, temperature=None, **kw):
        out = real_greedy(params, cfg, enc_out, prompt, pad, rng,
                          temperature, **kw)
        captured["batch"] = int(enc_out.shape[0])
        captured["out"] = {k: np.asarray(v) for k, v in out.items()}
        return out

    monkeypatch.setattr(tr, "greedy_decode", spy)

    from ttasr.engine.transcriber import TranscribeOptions
    from ttasr.models.whisper.model import encode
    from ttasr.ops.mel import log_mel_spectrogram

    audio = _speechy_audio(2.0)
    mel = log_mel_spectrogram(audio, n_mels=engine.cfg.num_mel_bins)
    enc_out = encode(engine.params, engine.cfg, mel[None])
    prompt_ids = [engine.tokenizer.sot]
    opts = TranscribeOptions(best_of=3, max_new_tokens=6)
    tokens, avg_logprob, _ = engine._decode_window(
        enc_out, prompt_ids, opts, temperature=0.7
    )
    assert captured["batch"] == 3  # K candidates rode the batch axis
    out = captured["out"]
    lengths, sums = out["lengths"], out["sum_logprob"]
    penalties = ((5.0 + lengths + 1.0) / 6.0) ** 1.0
    pick = int(np.argmax(sums / penalties))
    # the argmax-quality candidate is the one returned
    n = int(lengths[pick])
    assert tokens == [int(t) for t in out["tokens"][pick, :n]]
    assert avg_logprob == pytest.approx(float(sums[pick]) / (n + 1))


def test_best_of_one_keeps_single_decode(engine):
    segments, _ = engine.transcribe(
        _speechy_audio(1.0), language="zh", vad_filter=False,
        max_new_tokens=4, temperature=0.7, best_of=1,
        condition_on_previous_text=False,
    )
    assert isinstance(segments, list)


def test_transcribe_path_int16_equals_float32(engine, tmp_path):
    """Loading a PCM16 WAV by path (auto-int16 master; device /32768)
    yields the same segments as the float32 array path — VAD gating,
    windowing, and decode all dtype-agnostic."""
    from ttasr.audio.io import load_audio, write_wav

    audio = _speechy_audio(2.0)
    path = str(tmp_path / "s.wav")
    write_wav(path, audio, 16000)
    f32, _ = load_audio(path)  # post write/read quantization, f32

    kwargs = dict(language="zh", beam_size=2, vad_filter=True,
                  max_new_tokens=8, temperature=(0.0,))
    seg_path, info_path = engine.transcribe(path, **kwargs)
    seg_f32, info_f32 = engine.transcribe(f32, **kwargs)
    key = lambda s: (s.start, s.end, s.text, tuple(s.tokens))
    assert [key(s) for s in seg_path] == [key(s) for s in seg_f32]
    assert info_path.duration == info_f32.duration
