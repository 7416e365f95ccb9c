"""Tokenizer tests: BPE parity vs the HF tokenizers (Rust) library, byte
fallback roundtrips, and Whisper special-token layout."""

import json

import numpy as np
import pytest

from ttasr.text.tokenizer import (
    WhisperTokenizer,
    build_byte_fallback_tokenizer,
    load_tokenizer,
    _bytes_to_unicode,
)


def _make_training_corpus():
    return [
        "hello world, this is a test",
        "the quick brown fox jumps over the lazy dog",
        "今天天氣很好我們去公園散步",
        "numbers 123 and 456 percent %",
        "hello hello world world test test",
    ]


@pytest.fixture(scope="module")
def trained_pair(tmp_path_factory):
    """Train a small byte-level BPE with the Rust library, then load the
    exported tokenizer.json with our pure-Python implementation."""
    from tokenizers import Tokenizer
    from tokenizers.models import BPE
    from tokenizers.pre_tokenizers import ByteLevel
    from tokenizers.decoders import ByteLevel as ByteLevelDecoder
    from tokenizers.trainers import BpeTrainer

    tok = Tokenizer(BPE())
    tok.pre_tokenizer = ByteLevel(add_prefix_space=False, use_regex=True)
    tok.decoder = ByteLevelDecoder()
    trainer = BpeTrainer(
        vocab_size=400, special_tokens=[], initial_alphabet=ByteLevel.alphabet()
    )
    tok.train_from_iterator(_make_training_corpus(), trainer)
    path = tmp_path_factory.mktemp("tok") / "tokenizer.json"
    tok.save(str(path))
    ours = WhisperTokenizer.from_tokenizer_json(str(path))
    return tok, ours


def test_bpe_parity_with_rust(trained_pair):
    rust, ours = trained_pair
    cases = _make_training_corpus() + [
        "completely unseen text with weird   spacing",
        "mixed 中文 and English 123",
        "don't stop",
        "",
    ]
    for text in cases:
        golden = rust.encode(text).ids
        got = ours.encode(text)
        assert got == golden, f"{text!r}: {got} != {golden}"


def test_decode_roundtrip(trained_pair):
    _, ours = trained_pair
    for text in ["hello world", "今天天氣很好", "a b  c"]:
        assert ours.decode(ours.encode(text)) == text


def test_byte_fallback_roundtrip():
    tk = build_byte_fallback_tokenizer()
    for text in ["hello", "今天天氣很好，我們去公園散步。", "emoji 🎉 ok"]:
        ids = tk.encode(text)
        assert tk.decode(ids) == text


def test_special_token_layout():
    tk = build_byte_fallback_tokenizer()
    assert tk.eot == 256
    assert tk.sot == 257
    assert tk.language_ids["en"] == 258
    assert tk.language_ids["zh"] == 259
    assert tk.transcribe is not None and tk.translate is not None
    assert tk.no_timestamps is not None
    assert tk.timestamp_begin == tk.no_timestamps + 1
    assert tk.is_timestamp(tk.timestamp_begin)
    assert not tk.is_timestamp(tk.eot)
    assert tk.timestamp_to_seconds(tk.timestamp_begin + 100) == pytest.approx(2.0)


def test_sot_sequence_matches_hf_prefix_semantics():
    tk = build_byte_fallback_tokenizer()
    # set_prefix_tokens(language="zh", task="transcribe", predict_timestamps=False)
    seq = tk.sot_sequence("zh", "transcribe", predict_timestamps=False)
    assert seq == [tk.sot, tk.language_ids["zh"], tk.transcribe, tk.no_timestamps]
    seq_ts = tk.sot_sequence("nan" if "nan" in tk.language_ids else "yue",
                             "transcribe", predict_timestamps=True)
    assert seq_ts[-1] != tk.no_timestamps
    with pytest.raises(ValueError):
        tk.sot_sequence("xx")


def test_decode_skips_specials_and_timestamps():
    tk = build_byte_fallback_tokenizer()
    ids = tk.sot_sequence("zh") + tk.encode("hi") + [tk.timestamp_begin + 5, tk.eot]
    assert tk.decode(ids) == "hi"
    with_ts = tk.decode_with_timestamps(
        [tk.timestamp_begin] + tk.encode("hi") + [tk.timestamp_begin + 50]
    )
    assert with_ts == "<|0.00|>hi<|1.00|>"


def test_suppress_list_nonempty(trained_pair):
    _, ours = trained_pair
    # trained vocab has symbols; suppression must at least not crash and
    # return sorted unique ids
    sup = ours.non_speech_tokens()
    assert sup == sorted(set(sup))


def test_bytes_to_unicode_bijection():
    m = _bytes_to_unicode()
    assert len(m) == 256
    assert len(set(m.values())) == 256
