"""ASR output post-processing for zh/nan/hak/en transcripts.

Parity surface: reference ``asr_core.py:22-84`` and its near-verbatim
duplicate ``api/file_asr.py:196-256`` (single implementation here).

Chain applied to every transcript (reference asr_core.py:175-177):
``replace_words`` -> s2tw conversion -> ``remove_special_characters_by_
dataset_name`` -> ``.lower()``; exposed as :func:`postprocess_transcript`.

``num_to_cn`` reproduces the two directions of ``cn2an.transform``
(an2cn / cn2an) used at reference asr_core.py:81-84 without the cn2an
dependency (not available in this image).
"""

from __future__ import annotations

import re
import unicodedata

from ttasr.text.s2tw import s2tw_convert

# Domain-specific phrase replacements (reference asr_core.py:32-43).
WORD_REPLACEMENTS = {
    "百分之十五": "15%",
    "百分之五": "5%",
    "百分之十二點五": "12.5%",
    "百分之七": "7%",
    "零八零零零九五九八": "080009598",
}

# Punctuation / special characters stripped from transcripts
# (reference asr_core.py:71-78). Kept as an explicit character list.
_SPECIAL_CHARS = (
    ",\"'。，^¿¡；「」《》:：＄$[]〜～·・‧―─–－⋯、＼【】=<>{}_〈〉　）（—『』«»→„…(),`&＆﹁﹂#＃\\!?！;"
)
_SPECIAL_RE = re.compile("[" + re.escape(_SPECIAL_CHARS) + "]")

# CJK-ish codepoint ranges used to split sentences into "words"
# (reference asr_core.py:22-29).
_SPLIT_RE = re.compile(
    "([\u1100-\u11ff\u2e80-\ua4cf\ua840-\ud7af\uf900-\ufaff"
    "\ufe30-\ufe4f\uff65-\uffdc\U00020000-\U0002ffff%]|\\d+\\.\\d+|\\d+)"
)

_CN_DIGITS = "零一二三四五六七八九"
_AN2CN_NUM_RE = re.compile(r"\d+(?:\.\d+)?%?")
_CN_NUM_CHARS = "零一二三四五六七八九十百千萬万億亿兩两点點"
_CN2AN_NUM_RE = re.compile(f"[{_CN_NUM_CHARS}]+")

_UNIT_VALUES = {"十": 10, "百": 100, "千": 1000, "萬": 10000, "万": 10000,
                "億": 10 ** 8, "亿": 10 ** 8}
_DIGIT_VALUES = {c: i for i, c in enumerate(_CN_DIGITS)}
_DIGIT_VALUES.update({"兩": 2, "两": 2})


def split_sentence_to_words(text: str, is_split: bool) -> str:
    """Split CJK text into space-separated units (reference asr_core.py:22-29)."""
    if is_split is False:
        return text
    chars = _SPLIT_RE.split(text.strip().lower())
    return " ".join(w.strip() for w in chars if w is not None and w.strip())


def replace_words(article: str) -> str:
    """Apply domain phrase replacements (reference asr_core.py:32-43)."""
    out = article
    for old, new in WORD_REPLACEMENTS.items():
        out = out.replace(old, new)
    return out


def full_to_half(text: str) -> str:
    """Per-character NFKC full-width -> half-width fold (reference asr_core.py:61-68)."""
    return "".join(unicodedata.normalize("NFKC", ch) for ch in text)


def remove_special_characters_by_dataset_name(text: str) -> str:
    """Strip punctuation/special chars then width-fold (reference asr_core.py:71-78)."""
    return full_to_half(_SPECIAL_RE.sub("", text))


def _int_to_cn(num_str: str) -> str:
    """Positional Chinese reading of a non-negative integer string."""
    num = int(num_str)
    if num == 0:
        return "零"
    units4 = ["", "萬", "億", "兆"]
    small_units = ["", "十", "百", "千"]
    groups = []
    while num > 0:
        groups.append(num % 10000)
        num //= 10000
    parts = []
    for gi in range(len(groups) - 1, -1, -1):
        g = groups[gi]
        if g == 0:
            if parts and not parts[-1].endswith("零"):
                parts.append("零")
            continue
        gs = str(g)
        n = len(gs)
        piece = []
        pending_zero = gi != len(groups) - 1 and n < 4
        for i, ch in enumerate(gs):
            d = int(ch)
            if d == 0:
                pending_zero = True
                continue
            if pending_zero:
                piece.append("零")
                pending_zero = False
            piece.append(_CN_DIGITS[d] + small_units[n - i - 1])
        parts.append("".join(piece) + units4[gi])
    out = "".join(parts)
    out = out.rstrip("零")
    if out.startswith("一十"):
        out = out[1:]
    return out


def _number_to_cn(token: str) -> str:
    """One numeric token (int, decimal, optional trailing %) to Chinese."""
    percent = token.endswith("%")
    if percent:
        token = token[:-1]
    if "." in token:
        int_part, frac_part = token.split(".", 1)
        cn = _int_to_cn(int_part or "0") + "點" + "".join(
            _CN_DIGITS[int(d)] for d in frac_part
        )
    else:
        cn = _int_to_cn(token)
    return ("百分之" + cn) if percent else cn


def _cn_to_number(token: str) -> str:
    """Chinese numeral token back to an Arabic string (cn2an direction)."""
    if "點" in token or "点" in token:
        sep = "點" if "點" in token else "点"
        int_tok, frac_tok = token.split(sep, 1)
        frac = "".join(str(_DIGIT_VALUES.get(c, "")) for c in frac_tok)
        return f"{_cn_to_int(int_tok)}.{frac}"
    return str(_cn_to_int(token))


def _cn_to_int(token: str) -> int:
    if not token:
        return 0
    # Pure digit-sequence reading (e.g. 零八零零 -> 0800) if no units present.
    if all(c in _DIGIT_VALUES for c in token):
        if len(token) > 1 and any(c == "零" for c in token):
            return int("".join(str(_DIGIT_VALUES[c]) for c in token))
        if len(token) == 1:
            return _DIGIT_VALUES[token]
        return int("".join(str(_DIGIT_VALUES[c]) for c in token))
    total = 0
    section = 0
    current = 0
    for c in token:
        if c in _DIGIT_VALUES:
            current = _DIGIT_VALUES[c]
        elif c in _UNIT_VALUES:
            u = _UNIT_VALUES[c]
            if u >= 10000:
                section = (section + (current or 0)) * u
                total += section
                section = 0
            else:
                section += (current if current else 1) * u
            current = 0
    return total + section + current


def num_to_cn(text: str, mode: int = 0) -> str:
    """Arabic<->Chinese numeral transform (reference asr_core.py:81-84).

    ``mode=0`` -> an2cn (Arabic to Chinese), ``mode=1`` -> cn2an.
    """
    if mode == 0:
        return _AN2CN_NUM_RE.sub(lambda m: _number_to_cn(m.group(0)), text)

    def _repl(m: re.Match) -> str:
        tok = m.group(0)
        # Skip tokens that are bare unit/zero noise.
        if all(c == "零" for c in tok):
            return tok
        try:
            return _cn_to_number(tok)
        except Exception:
            return tok

    return _CN2AN_NUM_RE.sub(_repl, text)


def postprocess_transcript(text: str) -> str:
    """Full product post-processing chain (reference asr_core.py:175-177)."""
    return remove_special_characters_by_dataset_name(
        s2tw_convert(replace_words(text))
    ).lower()
