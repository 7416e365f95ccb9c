"""Host-side text stack: tokenizer, normalization, CER metric, filters.

Reference parity surface:
- ``cer.py`` (whole file)            -> :mod:`ttasr.text.cer`
- ``asr_core.py:22-106`` postproc    -> :mod:`ttasr.text.normalize`
- OpenCC s2tw conversion             -> :mod:`ttasr.text.s2tw`
- ``api/stt_streaming/src/utils.py`` -> :mod:`ttasr.text.filters`
- HF fast tokenizers (Rust)          -> :mod:`ttasr.text.tokenizer` (pure impl)
"""

from ttasr.text.cer import CERResult, calculate_cer, compare_texts, clean_text, cer_metric
from ttasr.text.normalize import (
    replace_words,
    full_to_half,
    remove_special_characters_by_dataset_name,
    num_to_cn,
    split_sentence_to_words,
    postprocess_transcript,
)
from ttasr.text.s2tw import s2tw_convert
from ttasr.text.filters import filter_text, language_codes, IGNORE_TEXT

__all__ = [
    "CERResult",
    "calculate_cer",
    "compare_texts",
    "clean_text",
    "cer_metric",
    "replace_words",
    "full_to_half",
    "remove_special_characters_by_dataset_name",
    "num_to_cn",
    "split_sentence_to_words",
    "postprocess_transcript",
    "s2tw_convert",
    "filter_text",
    "language_codes",
    "IGNORE_TEXT",
]
