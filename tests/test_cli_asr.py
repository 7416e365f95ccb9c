"""Batch CLI tests with a fake engine (the reference's DummyModel pattern,
api/tests/test_file_asr.py:36-60)."""

import json
import os

import numpy as np
import pytest

from ttasr.audio.io import write_wav
from ttasr.cli.asr import find_original_transcript, list_audio_files, process_audio_folder
from ttasr.engine.results import Segment, TranscriptionInfo


class FakeEngine:
    def __init__(self, text="這是單元測試"):
        self.text = text
        self.calls = []

    def transcribe(self, audio, **kwargs):
        self.calls.append(kwargs)
        seg = Segment(id=0, seek=0, start=0.0, end=1.0, text=self.text,
                      tokens=[1], avg_logprob=-0.1, compression_ratio=1.0,
                      no_speech_prob=0.0)
        info = TranscriptionInfo("zh", 1.0, 1.0, 1.0)
        return [seg], info


@pytest.fixture()
def audio_folder(tmp_path):
    folder = tmp_path / "clips"
    folder.mkdir()
    sine = (0.1 * np.sin(2 * np.pi * 440 * np.arange(3200) / 16000)).astype(np.float32)
    write_wav(str(folder / "a1.wav"), sine)
    write_wav(str(folder / "a2.WAV"), sine)
    (folder / "a1.txt").write_text("這是單元測試", encoding="utf-8")
    return folder


def test_list_audio_files_case_insensitive(audio_folder):
    files = list_audio_files(str(audio_folder))
    assert len(files) == 2


def test_find_original_transcript(audio_folder):
    path = find_original_transcript(str(audio_folder / "a1.wav"))
    assert path and path.endswith("a1.txt")
    assert find_original_transcript(str(audio_folder / "a2.WAV")) is None


def test_process_audio_folder_outputs(audio_folder, tmp_path):
    engine = FakeEngine()
    result = process_audio_folder(
        str(audio_folder), engine=engine, results_json_dir=str(tmp_path)
    )
    # per-file ASR outputs written next to the audio
    assert (audio_folder / "a1_asr.txt").read_text(encoding="utf-8") == "這是單元測試"
    assert (audio_folder / "a2_asr.txt").exists()
    # reference decode kwargs passed through
    assert engine.calls[0]["beam_size"] == 5
    assert engine.calls[0]["vad_filter"] is True
    assert engine.calls[0]["condition_on_previous_text"] is True
    assert engine.calls[0]["language"] == "zh"
    # aggregate JSON
    data = json.loads((tmp_path / "asr_comparison_results.json").read_text("utf-8"))
    assert data["summary"]["total_files"] == 2
    assert data["summary"]["files_with_transcript"] == 1
    assert data["summary"]["files_with_cer"] == 1
    assert data["summary"]["average_cer"] == 0.0
    assert data["summary"]["average_correct_rate"] == 100.0
    detail = {d["audio_file"]: d for d in data["detailed_results"]}
    assert detail["a1.wav"]["cer_result"]["cer_rate"] == 0.0
    assert detail["a1.wav"]["cer_result"]["reference_highlighted"] == "這是單元測試"
    assert result["summary"] == data["summary"]


def test_process_audio_folder_error_handling(audio_folder, tmp_path):
    class BrokenEngine:
        def transcribe(self, audio, **kwargs):
            raise RuntimeError("boom")

    process_audio_folder(
        str(audio_folder), engine=BrokenEngine(), results_json_dir=str(tmp_path)
    )
    # error recorded into the per-file output (reference asr_core.py:244-267)
    content = (audio_folder / "a1_asr.txt").read_text(encoding="utf-8")
    assert "錯誤: boom" in content
    data = json.loads((tmp_path / "asr_comparison_results.json").read_text("utf-8"))
    assert all("error" in d for d in data["detailed_results"])


def test_empty_folder(tmp_path):
    assert process_audio_folder(str(tmp_path)) is None


def test_process_audio_folder_concurrent(audio_folder, tmp_path):
    """--concurrency routes files through shared decode slots."""
    from ttasr.engine.transcriber import WhisperEngine
    from ttasr.models.whisper.config import WhisperConfig
    from ttasr.models.whisper.model import init_params
    from ttasr.text.tokenizer import build_byte_fallback_tokenizer

    tok = build_byte_fallback_tokenizer()
    cfg = WhisperConfig(
        name="micro", vocab_size=tok.vocab_size, num_mel_bins=80,
        d_model=64, encoder_layers=2, encoder_heads=4,
        decoder_layers=2, decoder_heads=4, ffn_dim=128,
    )
    engine = WhisperEngine("micro", params=init_params(cfg, seed=0),
                           config=cfg, tokenizer=tok)
    result = process_audio_folder(
        str(audio_folder), engine=engine, results_json_dir=str(tmp_path),
        concurrency=2,
    )
    assert result["summary"]["total_files"] == 2
    assert (audio_folder / "a1_asr.txt").exists()
    assert (audio_folder / "a2_asr.txt").exists()
