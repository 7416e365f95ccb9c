"""Synthesize a FULL-SCALE Whisper tokenizer.json (51865 ids) offline.

The real CT2 model dirs ship a 51865-entry ``tokenizer.json`` /
``vocabulary.json`` (reference faster_whisper_asr.py:38-51; the trained
HF tokenizer at train_asr.py:528-563 has the same layout), which zero
egress prevents downloading.  This tool builds a synthetic vocabulary at
the exact same scale and layout so the tokenizer/suppress-mask/decode-
rules surface is exercised at REAL vocab size (VERDICT r4 #7 — the
round-3 byte-0xA9 suppress bug proved this surface bites at scale):

- ids ``0 .. n_bpe-1``: byte-level BPE trained with the HF Rust
  ``tokenizers`` library on a deterministic synthetic corpus covering
  the full CJK unified block (within-character multi-byte merges — the
  shared-piece structure the suppress-mask bug class needs), Hangul,
  Latin words, digits, punctuation, and the openai non-speech symbols
  adjacent to CJK text,
- then the Whisper special layout, exactly like the real multilingual
  vocab: ``<|endoftext|>``, ``<|startoftranscript|>``, one tag per
  language (100 incl. ``yue``), ``<|translate|>``, ``<|transcribe|>``,
  ``<|startoflm|>``, ``<|startofprev|>``, ``<|nospeech|>``,
  ``<|notimestamps|>``, and 1501 timestamp tokens ``<|0.00|>`` ..
  ``<|30.00|>``.

Total = n_bpe + len(LANGUAGES) + 1509 = 51865 ids (n_bpe = 50256).

    python tools/make_full_scale_vocab.py /tmp/full_vocab/tokenizer.json
"""

from __future__ import annotations

import json
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ttasr.text.tokenizer import LANGUAGES, _TIMESTAMP_COUNT  # noqa: E402

N_VOCAB_TOTAL = 51865
# eot + sot + language tags + translate/transcribe + sot_lm/sot_prev/
# nospeech/notimestamps + timestamps
N_SPECIALS = 2 + len(LANGUAGES) + 2 + 4 + _TIMESTAMP_COUNT  # 1609
N_BPE = N_VOCAB_TOTAL - N_SPECIALS                          # 50256

ZH_SENTS = [
    "今天天氣真好我們去公園散步",
    "請問現在幾點了呢",
    "我想要一杯熱咖啡謝謝",
    "台北的捷運非常方便快速",
    "這個週末要去山上爬山",
    "會議改到下午三點開始",
    "火車快要進站了請注意",
    "晚餐想吃什麼好呢一起想",
    "天天向上天下太平",
    "謝謝大家的聆聽與支持",
]


def _corpus(seed: int = 0) -> list:
    """Deterministic synthetic corpus with enough pair diversity for
    50k merges, plus the structures the parity/suppress tests target."""
    rng = random.Random(seed)
    corpus = []
    # Full CJK unified block: every char contributes its two within-
    # character byte merges (3-byte UTF-8), the realistic "multi-byte
    # merge" mass of a real zh vocab.
    cjk = [chr(c) for c in range(0x4E00, 0xA000)]
    for _ in range(3):
        rng.shuffle(cjk)
        for i in range(0, len(cjk), 16):
            corpus.append("".join(cjk[i:i + 16]))
    # Hangul syllables: extra 3-byte merge material + byte diversity
    han = [chr(c) for c in range(0xAC00, 0xAC00 + 6000)]
    for _ in range(2):
        rng.shuffle(han)
        for i in range(0, len(han), 16):
            corpus.append("".join(han[i:i + 16]))
    # Latin words with a leading-space distribution like real text
    letters = "abcdefghijklmnopqrstuvwxyz"
    words = ["".join(rng.choice(letters)
                     for _ in range(rng.randint(2, 8))) for _ in range(8000)]
    for i in range(0, len(words), 12):
        corpus.append(" ".join(words[i:i + 12]))
    # High-frequency zh sentences (multi-character merges), numbers,
    # punctuation, contractions, and the openai non-speech symbols
    # ADJACENT to CJK (the suppress-mask interplay the round-3 bug hit)
    for _ in range(60):
        corpus.extend(ZH_SENTS)
        corpus.append("the quick brown fox jumps over the lazy dog")
        corpus.append("don't can't won't it's we're they've i'll he'd")
        corpus.append("numbers 123 456 789 0 percent % plus + minus -")
        corpus.append("半形,全形，標點。混用!?！？：；")
        corpus.append("♪今天♪ ♫天氣♫ ♩音樂♩ ♬歌聲♬ ♭♮♯ [音樂] (笑聲) 「引用」『書名』")
        corpus.append("<< >> <<< >>> -- --- (( )) [[ ]] {{ }} ♪♪ ♪♪♪")
    return corpus


def build_full_scale_tokenizer_json(path: str, seed: int = 0) -> str:
    """Train the BPE, inject the Whisper special layout, write
    ``tokenizer.json`` (HF fast-tokenizer format).  Returns ``path``."""
    from tokenizers import Tokenizer
    from tokenizers.models import BPE
    from tokenizers.pre_tokenizers import ByteLevel
    from tokenizers.decoders import ByteLevel as ByteLevelDecoder
    from tokenizers.trainers import BpeTrainer

    tok = Tokenizer(BPE())
    tok.pre_tokenizer = ByteLevel(add_prefix_space=False, use_regex=True)
    tok.decoder = ByteLevelDecoder()
    trainer = BpeTrainer(vocab_size=N_BPE, special_tokens=[],
                         initial_alphabet=ByteLevel.alphabet(),
                         show_progress=False)
    tok.train_from_iterator(_corpus(seed), trainer)
    n_bpe = len(tok.get_vocab())
    if n_bpe != N_BPE:
        raise RuntimeError(f"trained {n_bpe} BPE entries, wanted {N_BPE} "
                           "(corpus lacks pair diversity)")

    # Whisper multilingual special layout, appended after the BPE ids
    specials = ["<|endoftext|>", "<|startoftranscript|>"]
    specials += [f"<|{lang}|>" for lang in LANGUAGES]
    specials += ["<|translate|>", "<|transcribe|>", "<|startoflm|>",
                 "<|startofprev|>", "<|nospeech|>", "<|notimestamps|>"]
    specials += [f"<|{i * 0.02:.2f}|>" for i in range(_TIMESTAMP_COUNT)]

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    data = json.loads(tok.to_str())
    data["added_tokens"] = [
        {"id": n_bpe + i, "content": s, "single_word": False,
         "lstrip": False, "rstrip": False, "normalized": False,
         "special": True}
        for i, s in enumerate(specials)
    ]
    assert n_bpe + len(specials) == N_VOCAB_TOTAL
    with open(path, "w", encoding="utf-8") as fh:
        json.dump(data, fh, ensure_ascii=False)
    return path


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/full_vocab/tokenizer.json"
    build_full_scale_tokenizer_json(out)
    from ttasr.text.tokenizer import WhisperTokenizer

    tk = WhisperTokenizer.from_tokenizer_json(out)
    print(json.dumps({
        "path": out, "vocab_size": tk.vocab_size, "eot": tk.eot,
        "sot": tk.sot, "timestamp_begin": tk.timestamp_begin,
        "n_languages": len(tk.language_ids),
        "n_suppress": len(tk.suppress_tokens_default()),
    }))


if __name__ == "__main__":
    main()
