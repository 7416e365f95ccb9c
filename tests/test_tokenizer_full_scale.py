"""Full-scale (51865-id) tokenizer + decode-rules stress (VERDICT r4 #7).

The real CT2 model dirs ship a 51865-entry vocab (reference
faster_whisper_asr.py:38-51); zero egress prevents loading it, so
``tools/make_full_scale_vocab.py`` synthesizes one at the exact layout
(50256 byte-BPE ids + 100 language tags + task/spec tokens + 1501
timestamps).  These tests run the exact-parity suite, the suppress-mask
consistency checks, and the timestamp decode rules at that scale — the
round-3 byte-0xA9 suppress bug proved this surface only bites on real
vocab structure.
"""

import random

import numpy as np
import pytest

from ttasr.text.tokenizer import LANGUAGES, WhisperTokenizer

from tools.make_full_scale_vocab import (N_BPE, N_VOCAB_TOTAL, ZH_SENTS,
                                         build_full_scale_tokenizer_json)


@pytest.fixture(scope="module")
def full_pair(tmp_path_factory):
    from tokenizers import Tokenizer

    path = str(tmp_path_factory.mktemp("full_vocab") / "tokenizer.json")
    build_full_scale_tokenizer_json(path)
    return Tokenizer.from_file(path), WhisperTokenizer.from_tokenizer_json(path)


def _fuzz_texts():
    rng = random.Random(123)
    texts = list(ZH_SENTS)
    # random CJK (incl. chars whose merges may or may not exist), Latin,
    # digits, music symbols adjacent to CJK, mixed scripts, whitespace
    for _ in range(60):
        n = rng.randint(1, 40)
        texts.append("".join(chr(rng.randint(0x4E00, 0x9FFF))
                             for _ in range(n)))
    for _ in range(30):
        texts.append(" ".join(
            "".join(rng.choice("abcdefghijklmnopqrstuvwxyz")
                    for _ in range(rng.randint(1, 10)))
            for _ in range(rng.randint(1, 8))))
    texts += [
        "♪今天天氣♪ ♫真好♫ ♩音樂♩",
        " ♩ 天 ♩ ",
        "mixed 中文 English 日本語 한국어 123",
        "don't stop can't won't it's",
        "半形,全形，標點。混用!?！？",
        "『引號』「括號」(annotations) [brackets] {braces}",
        "emoji 🎉 unmapped ᚠᚡᚢ bytes",
        "\t tabs \n newlines   spaces ",
        "",
        " ",
        "100% of 3.14159 is $42.00",
    ]
    return texts


def test_full_scale_layout(full_pair):
    """Exact real-vocab layout: 51865 ids, specials at the whisper
    offsets, 100 languages, 1501 timestamps."""
    _, ours = full_pair
    assert ours.vocab_size == N_VOCAB_TOTAL == 51865
    assert ours.eot == N_BPE == 50256
    assert ours.sot == N_BPE + 1
    assert len(ours.language_ids) == len(LANGUAGES) == 100
    assert ours.language_ids["en"] == N_BPE + 2
    assert ours.language_ids["yue"] == N_BPE + 2 + LANGUAGES.index("yue")
    assert ours.no_timestamps == N_BPE + 2 + 100 + 2 + 3
    assert ours.timestamp_begin == ours.no_timestamps + 1
    assert ours.timestamp_begin + 1501 == N_VOCAB_TOTAL  # ts fill the tail
    seq = ours.sot_sequence("zh", "transcribe", predict_timestamps=False)
    assert seq == [ours.sot, ours.language_ids["zh"], ours.transcribe,
                   ours.no_timestamps]
    assert ours.timestamp_to_seconds(N_VOCAB_TOTAL - 1) == pytest.approx(30.0)


def test_full_scale_bpe_parity(full_pair):
    """Exact id-for-id parity vs the Rust library at 51865 scale."""
    rust, ours = full_pair
    for text in _fuzz_texts():
        golden = rust.encode(text).ids
        got = ours.encode(text)
        assert got == golden, f"{text!r}: {got[:20]} != {golden[:20]}"
        assert ours.decode(got) == rust.decode(golden)


def test_full_scale_multibyte_merges_exist(full_pair):
    """The synthetic vocab has real multi-byte merge structure: corpus
    CJK characters are single tokens, and common sentences compress far
    below 1 token/byte (i.e. this is NOT a byte-fallback in disguise)."""
    _, ours = full_pair
    # corpus-frequent characters merged to single tokens
    for ch in "天氣點謝":
        assert len(ours.encode(ch)) == 1, ch
    # rare characters still carry partial within-char merges (<= 2
    # pieces for a 3-byte char, i.e. a merged head + a shared raw tail
    # byte — exactly the shared-piece structure of the 0xA9 bug class)
    rng = random.Random(7)
    lens = [len(ours.encode(chr(rng.randint(0x4E00, 0x9FFF))))
            for _ in range(200)]
    assert max(lens) <= 2 and min(lens) == 1
    for sent in ZH_SENTS:
        ids = ours.encode(sent)
        assert len(ids) < len(sent.encode("utf-8")) / 2, sent


def test_full_scale_suppress_mask_spares_speech(full_pair):
    """No id required to encode zh speech appears in the suppress set
    (the round-3 shared-piece bug class, now at real scale), while the
    music/bracket symbols ARE suppressed."""
    _, ours = full_pair
    suppressed = set(ours.non_speech_tokens())
    assert len(suppressed) > 50, "real-vocab suppress list is large"
    for text in ZH_SENTS + ["hello world", "123 456"]:
        ids = set(ours.encode(text))
        banned = ids & suppressed
        assert not banned, (text, sorted(banned))
    # the symbols themselves are banned (single-token forms)
    for sym in "♪♫♩[](){}":
        ids = ours.encode(sym)
        if len(ids) == 1:
            assert ids[0] in suppressed, sym
    # defaults add specials + language tags
    full = set(ours.suppress_tokens_default())
    assert suppressed <= full
    assert ours.transcribe in full and ours.sot in full
    assert set(ours.language_ids.values()) <= full


def test_full_scale_decode_rules_match_hf(full_pair):
    """Token-for-token greedy parity vs HF's timestamp processor with a
    random-init model at n_vocab 51865 — the decode rules (static
    suppress mask, blank suppression, timestamp forcing) at the real
    vocab scale (mirrors tests/test_decode.py at toy scale)."""
    import jax
    import torch
    from transformers import WhisperConfig as HFConfig
    from transformers import WhisperForConditionalGeneration
    from transformers.generation.logits_process import (
        WhisperTimeStampLogitsProcessor,
    )

    from ttasr.models.whisper.decode import (DecodingOptions, TokenizerInfo,
                                             _static_suppress_mask,
                                             greedy_decode, pad_prompts)
    from ttasr.models.whisper import encode, params_from_hf_model

    _, tok = full_pair
    torch.manual_seed(0)
    hf_cfg = HFConfig(
        vocab_size=tok.vocab_size, num_mel_bins=80, d_model=64,
        encoder_layers=2, encoder_attention_heads=4,
        decoder_layers=2, decoder_attention_heads=4,
        encoder_ffn_dim=128, decoder_ffn_dim=128,
        max_source_positions=64, max_target_positions=448,
        dropout=0.0, pad_token_id=tok.eot, bos_token_id=tok.eot,
        eos_token_id=tok.eot, decoder_start_token_id=tok.sot,
    )
    hf = WhisperForConditionalGeneration(hf_cfg).eval()
    params, cfg = params_from_hf_model(hf)
    ti = TokenizerInfo.from_tokenizer(tok)
    assert ti.n_vocab == 51865
    assert ti.pad_vocab_begin is None  # real vocabs: ts fill the tail

    rng = np.random.default_rng(0)
    mel = rng.standard_normal((1, 80, 128)).astype(np.float32) * 0.4
    enc = encode(params, cfg, mel)
    prompt_ids = tok.sot_sequence("zh", "transcribe", predict_timestamps=True)

    class GenCfg:
        eos_token_id = tok.eot
        no_timestamps_token_id = tok.no_timestamps
        max_initial_timestamp_index = 50
        _detect_timestamp_from_logprob = True

    proc = WhisperTimeStampLogitsProcessor(GenCfg(),
                                           begin_index=len(prompt_ids))
    static_mask = torch.from_numpy(np.asarray(_static_suppress_mask(ti)))
    blank_ids = tok.encode(" ") + [tok.eot]

    tokens = torch.tensor([prompt_ids], dtype=torch.long)
    golden = []
    with torch.no_grad():
        enc_t = hf.model.encoder(torch.from_numpy(mel)).last_hidden_state
        for step in range(20):
            logits = hf(decoder_input_ids=tokens,
                        encoder_outputs=(enc_t,)).logits[:, -1].float()
            logits = logits + static_mask
            if step == 0:
                logits[:, blank_ids] = float("-inf")
            logits = proc(tokens, logits)
            nxt = int(torch.argmax(logits, dim=-1))
            if nxt == tok.eot:
                break
            golden.append(nxt)
            tokens = torch.cat([tokens, torch.tensor([[nxt]])], dim=1)

    opts = DecodingOptions(sample_len=20)
    prompt, pad = pad_prompts([prompt_ids], tok.eot)
    out = greedy_decode(params, cfg, enc, prompt, pad, jax.random.PRNGKey(0),
                        opts=opts, ti=ti)
    n = int(out["lengths"][0])
    ours = [int(t) for t in np.asarray(out["tokens"][0])[:n]]
    assert ours == golden, f"{ours} != {golden}"
    # the rules did real work at this scale: a timestamp leads, nothing
    # suppressed leaked through
    assert tok.is_timestamp(ours[0]) and ours[0] <= tok.timestamp_begin + 50
    assert not (set(ours) & set(ti.suppress))
