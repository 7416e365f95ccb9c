"""Whisper byte-level BPE tokenizer (pure Python, no Rust dependency).

Replaces the HF fast tokenizer used at reference train_asr.py:528-538 and
the tokenizer embedded in CT2 model dirs (``tokenizer.json`` /
``vocabulary.json``, validated at faster_whisper_asr.py:38-51).

Loads either format:
- HF ``tokenizer.json`` (model.vocab + model.merges + added_tokens), or
- a directory containing it (HF checkpoint / CT2 model dir).

Also provides :class:`ByteFallbackTokenizer`, an offline-friendly
tokenizer with one token per byte and the full Whisper special-token
layout, used for tests/benchmarks when no real vocab is available.

``sot_sequence`` reproduces ``tokenizer.set_prefix_tokens(language, task,
predict_timestamps)`` (reference train_asr.py:559-563).
"""

from __future__ import annotations

import json
import os
from functools import lru_cache
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

LANGUAGES = (
    "en zh de es ru ko fr ja pt tr pl ca nl ar sv it id hi fi vi he uk el ms "
    "cs ro da hu ta no th ur hr bg lt la mi ml cy sk te fa lv bn sr az sl kn "
    "et mk br eu is hy ne mn bs kk sq sw gl mr pa si km sn yo so af oc ka be "
    "tg sd gu am yi lo uz fo ht ps tk nn mt sa lb my bo tl mg as tt haw ln ha "
    "ba jw su yue"
).split()

TASKS = ("transcribe", "translate")

_TIMESTAMP_COUNT = 1501  # <|0.00|> .. <|30.00|> in 0.02 s steps


@lru_cache(maxsize=1)
def _bytes_to_unicode() -> Dict[int, str]:
    """GPT-2 byte <-> printable-unicode bijection."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, map(chr, cs)))


@lru_cache(maxsize=1)
def _unicode_to_bytes() -> Dict[str, int]:
    return {v: k for k, v in _bytes_to_unicode().items()}


@lru_cache(maxsize=1)
def _pretokenize_pattern():
    import regex

    # GPT-2 pre-tokenization pattern (used by Whisper's multilingual BPE).
    return regex.compile(
        r"""'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"""
    )


class WhisperTokenizer:
    """Byte-level BPE with Whisper special tokens."""

    def __init__(self, vocab: Dict[str, int], merges: Sequence[Tuple[str, str]],
                 special_tokens: Optional[Dict[str, int]] = None):
        self.vocab = dict(vocab)
        self.merge_ranks = {tuple(m): i for i, m in enumerate(merges)}
        self.special: Dict[str, int] = dict(special_tokens or {})
        # Specials participate in lookup but never in BPE.
        self.token_to_id = dict(self.vocab)
        self.token_to_id.update(self.special)
        self.id_to_token = {v: k for k, v in self.token_to_id.items()}
        self._byte_encoder = _bytes_to_unicode()
        self._byte_decoder = _unicode_to_bytes()
        self._bpe_cache: Dict[str, List[str]] = {}
        self._derive_special_ids()

    # -- construction -------------------------------------------------------

    @classmethod
    def from_tokenizer_json(cls, path: str) -> "WhisperTokenizer":
        with open(path, encoding="utf-8") as fh:
            data = json.load(fh)
        model = data["model"]
        merges = [
            tuple(m.split(" ")) if isinstance(m, str) else tuple(m)
            for m in model["merges"]
        ]
        vocab = model["vocab"]
        specials = {
            tok["content"]: tok["id"]
            for tok in data.get("added_tokens", [])
        }
        return cls(vocab, merges, specials)

    @classmethod
    def from_dir(cls, path: str) -> "WhisperTokenizer":
        tk = os.path.join(path, "tokenizer.json")
        if os.path.exists(tk):
            return cls.from_tokenizer_json(tk)
        raise FileNotFoundError(f"no tokenizer.json under {path}")

    # -- special-token layout -----------------------------------------------

    def _derive_special_ids(self) -> None:
        t2i = self.token_to_id
        self.eot = t2i.get("<|endoftext|>")
        self.sot = t2i.get("<|startoftranscript|>")
        self.translate = t2i.get("<|translate|>")
        self.transcribe = t2i.get("<|transcribe|>")
        self.sot_lm = t2i.get("<|startoflm|>")
        self.sot_prev = t2i.get("<|startofprev|>")
        self.no_speech = t2i.get("<|nospeech|>", t2i.get("<|nocaptions|>"))
        self.no_timestamps = t2i.get("<|notimestamps|>")
        self.timestamp_begin = t2i.get("<|0.00|>")
        if self.timestamp_begin is None and self.no_timestamps is not None:
            self.timestamp_begin = self.no_timestamps + 1
        self.language_ids = {
            lang: t2i[f"<|{lang}|>"] for lang in LANGUAGES if f"<|{lang}|>" in t2i
        }

    def sot_sequence(self, language: Optional[str] = "zh",
                     task: str = "transcribe",
                     predict_timestamps: bool = False) -> List[int]:
        """``<|startoftranscript|>[<|lang|>][<|task|>][<|notimestamps|>]``."""
        seq = [self.sot]
        if language is not None:
            lang_id = self.language_ids.get(language)
            if lang_id is None:
                raise ValueError(f"unsupported language: {language!r}")
            seq.append(lang_id)
            seq.append(self.transcribe if task == "transcribe" else self.translate)
        if not predict_timestamps and self.no_timestamps is not None:
            seq.append(self.no_timestamps)
        return seq

    def timestamp_to_seconds(self, token_id: int) -> float:
        return (token_id - self.timestamp_begin) * 0.02

    def is_timestamp(self, token_id: int) -> bool:
        return self.timestamp_begin is not None and token_id >= self.timestamp_begin

    @property
    def vocab_size(self) -> int:
        return max(self.id_to_token) + 1

    # -- BPE -----------------------------------------------------------------

    def _bpe(self, token: str) -> List[str]:
        cached = self._bpe_cache.get(token)
        if cached is not None:
            return cached
        parts = list(token)
        while len(parts) > 1:
            pairs = {(parts[i], parts[i + 1]) for i in range(len(parts) - 1)}
            best = min(pairs, key=lambda p: self.merge_ranks.get(p, 1 << 60))
            if best not in self.merge_ranks:
                break
            merged: List[str] = []
            i = 0
            while i < len(parts):
                if (
                    i < len(parts) - 1
                    and parts[i] == best[0]
                    and parts[i + 1] == best[1]
                ):
                    merged.append(parts[i] + parts[i + 1])
                    i += 2
                else:
                    merged.append(parts[i])
                    i += 1
            parts = merged
        self._bpe_cache[token] = parts
        return parts

    def encode(self, text: str) -> List[int]:
        """Text -> BPE ids (no special tokens added)."""
        be = self._byte_encoder
        out: List[int] = []
        unk = self.token_to_id.get("<unk>")
        for word in _pretokenize_pattern().findall(text):
            mapped = "".join(be[b] for b in word.encode("utf-8"))
            for piece in self._bpe(mapped):
                tid = self.token_to_id.get(piece)
                if tid is None:
                    # decompose to single byte tokens
                    for ch in piece:
                        bid = self.token_to_id.get(ch, unk)
                        if bid is not None:
                            out.append(bid)
                else:
                    out.append(tid)
        return out

    def decode(self, ids: Iterable[int], skip_special: bool = True) -> str:
        bd = self._byte_decoder
        special_ids = set(self.special.values())
        if self.timestamp_begin is not None:
            ts_end = self.timestamp_begin + _TIMESTAMP_COUNT
        pieces: List[str] = []
        for tid in ids:
            tid = int(tid)
            if skip_special:
                if tid in special_ids:
                    continue
                if self.timestamp_begin is not None and (
                    self.timestamp_begin <= tid < ts_end
                ):
                    continue
            tok = self.id_to_token.get(tid)
            if tok is not None:
                pieces.append(tok)
        raw = "".join(pieces)
        data = bytes(bd[ch] for ch in raw if ch in bd)
        return data.decode("utf-8", errors="replace")

    def decode_with_timestamps(self, ids: Iterable[int]) -> str:
        out = []
        buf: List[int] = []
        for tid in ids:
            tid = int(tid)
            if self.is_timestamp(tid):
                if buf:
                    out.append(self.decode(buf))
                    buf = []
                out.append(f"<|{self.timestamp_to_seconds(tid):.2f}|>")
            else:
                buf.append(tid)
        if buf:
            out.append(self.decode(buf))
        return "".join(out)

    # -- suppression lists ----------------------------------------------------

    def non_speech_tokens(self) -> List[int]:
        """Ids suppressed during decoding (openai-whisper's list): symbols,
        music markers, bracketed annotations."""
        symbols = list('"#()*+/:;<=>@[\\]^_`{|}~「」『』')
        symbols += (
            "<< >> <<< >>> -- --- -( -[ (' (\" (( )) ((( ))) [[ ]] {{ }} ♪♪ ♪♪♪"
        ).split()
        miscellaneous = set("♩♪♫♬♭♮♯")
        result = set()
        byte_fallback = getattr(self, "is_byte_fallback", False)
        for symbol in symbols + list(miscellaneous):
            for tok in {symbol, " " + symbol}:
                ids = self.encode(tok)
                if len(ids) == 1:
                    result.add(ids[0])
                elif symbol in miscellaneous and ids and not byte_fallback:
                    # openai keeps the symbol's LAST BPE piece.  Valid for
                    # a real vocab (that piece is symbol-specific); fatal
                    # for the byte-fallback vocab, where ids are raw
                    # UTF-8 bytes shared with CJK text — e.g. ♩ ends in
                    # 0xA9, the last byte of 天, and suppressing it bans
                    # every character containing that byte (caught by
                    # tools/check_trained_recognition.py).
                    result.add(ids[-1])
        return sorted(result)

    def suppress_tokens_default(self) -> List[int]:
        """Default suppress set: non-speech + specials that must not be
        sampled as text (matches CT2/faster-whisper defaults)."""
        ids = set(self.non_speech_tokens())
        for tid in (self.translate, self.transcribe, self.sot, self.sot_prev,
                    self.sot_lm):
            if tid is not None:
                ids.add(tid)
        if self.no_speech is not None:
            ids.add(self.no_speech)
        for lang_id in self.language_ids.values():
            ids.add(lang_id)
        return sorted(ids)


def build_byte_fallback_tokenizer() -> WhisperTokenizer:
    """An offline tokenizer: 256 byte tokens + Whisper special layout.

    Encodes any text (1 token/byte); used for tests, benchmarks and demo
    runs when no trained vocabulary is available.
    """
    byte_chars = [_bytes_to_unicode()[b] for b in range(256)]
    vocab = {ch: i for i, ch in enumerate(byte_chars)}
    specials = {}
    nid = 256
    specials["<|endoftext|>"] = nid; nid += 1
    specials["<|startoftranscript|>"] = nid; nid += 1
    for lang in LANGUAGES:
        specials[f"<|{lang}|>"] = nid; nid += 1
    specials["<|translate|>"] = nid; nid += 1
    specials["<|transcribe|>"] = nid; nid += 1
    specials["<|startoflm|>"] = nid; nid += 1
    specials["<|startofprev|>"] = nid; nid += 1
    specials["<|nospeech|>"] = nid; nid += 1
    specials["<|notimestamps|>"] = nid; nid += 1
    for i in range(_TIMESTAMP_COUNT):
        specials[f"<|{i * 0.02:.2f}|>"] = nid; nid += 1
    tok = WhisperTokenizer(vocab, [], specials)
    # marks that token ids are raw UTF-8 bytes: non_speech_tokens() must
    # not suppress a multi-byte symbol's tail byte (shared with CJK text)
    tok.is_byte_fallback = True
    return tok


def load_tokenizer(path_or_none: Optional[str]) -> WhisperTokenizer:
    """Load from a model dir / tokenizer.json, else the byte-fallback."""
    if path_or_none:
        if os.path.isdir(path_or_none):
            tk = os.path.join(path_or_none, "tokenizer.json")
            if os.path.exists(tk):
                return WhisperTokenizer.from_tokenizer_json(tk)
        elif os.path.isfile(path_or_none):
            return WhisperTokenizer.from_tokenizer_json(path_or_none)
    return build_byte_fallback_tokenizer()
