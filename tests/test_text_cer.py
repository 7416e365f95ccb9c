"""Golden tests for the CER engine.

Golden values were produced by executing the reference implementation
(/root/reference/cer.py) on the inputs below; the engine here must
reproduce them exactly (difflib opcode accounting, highlight markup,
Chinese numeral conversion quirks included).
"""

from ttasr.text.cer import (
    arabic_to_chinese_number,
    calculate_cer,
    cer_metric,
    clean_text,
    compare_texts,
)


def test_readme_example():
    # The reference's own __main__ example (cer.py:319-333).
    r = compare_texts("今天天氣很好，我們去公園散步。", "今天天氣很好!，我去公園散步。")
    assert r.total_chars == 13
    assert (r.substitutions_count, r.deletions_count, r.insertions_count) == (0, 1, 0)
    assert abs(r.cer_rate - 1 / 13) < 1e-12
    assert r.reference_highlighted == "今天天氣很好我<們>去公園散步"
    assert r.hypothesis_highlighted == "今天天氣很好我□去公園散步"
    assert r.deletions_errors == ["正確文本中的「們」 被刪除 ，未被 ASR 轉譯成功"]


def test_homophone_and_numeral_folding():
    r = compare_texts("她說臺北得到了第1名", "它說台北得到第一名")
    assert r.reference_cleaned == "他說台北的到了第一名"
    assert r.hypothesis_cleaned == "他說台北的到第一名"
    assert (r.substitutions_count, r.deletions_count, r.insertions_count) == (0, 1, 0)
    assert abs(r.cer_rate - 0.1) < 1e-12


def test_replace_opcode_accounting():
    r = compare_texts("hello world 123", "hello word 124")
    assert r.reference_cleaned == "helloworld一百二十三"
    assert (r.substitutions_count, r.deletions_count, r.insertions_count) == (1, 1, 0)
    assert r.reference_highlighted == "hellowor<l>d一百二十[三]"
    assert r.hypothesis_highlighted == "hellowor□d一百二十[四]"
    assert r.substitutions_errors == ["正確文本中的「三」 在 ASR 轉譯文本中被替換成 「四」"]
    assert r.deletions_errors == ["正確文本中的「l」 被刪除 ，未被 ASR 轉譯成功"]


def test_insert_markers():
    r = compare_texts("abc", "xyzabc")
    assert r.cer_rate == 1.0
    assert r.reference_highlighted == "□□□abc"
    assert r.hypothesis_highlighted == "(x)(y)(z)abc"
    assert r.insertions_errors == ["「xyz」 在 ASR 結果 額外輸出，不屬於正確文本內容"]


def test_replace_overflow_counts_as_deletion():
    ref = "長長的文本" * 60
    hyp = "長長的文本" * 59 + "錯誤文字"
    r = compare_texts(ref, hyp)
    assert (r.substitutions_count, r.deletions_count, r.insertions_count) == (4, 1, 0)
    assert r.total_chars == 300
    assert r.deletions_errors == ["正確文本中的「本」 被刪除，未被 ASR 轉譯成功 (替換造成)"]
    # 250-char line breaks present in highlight output.
    assert "\n\n" in r.reference_highlighted


def test_empty_inputs_return_none():
    assert compare_texts("", "abc") is None
    assert compare_texts("abc", "") is None
    assert compare_texts(None, "abc") is None


def test_arabic_to_chinese_number_goldens():
    goldens = {
        "0": "零",
        "5": "五",
        "10": "一十",  # single-part result: the 一十->十 rule does not fire
        "15": "十五",
        "105": "一百零五",
        "1000": "一千",
        "10000": "一萬",
        "100000": "一十萬",
        # the reference's compound-unit quirk, reproduced bit-for-bit:
        "123456789": "一億二千萬三百萬四十萬五萬六千七百八十九",
        "1234567890": "一二三四五六七八九零",  # >9 digits -> digit sequence
        "007": "零零七",  # leading zero -> digit sequence
        "20": "二十",
        "1100000000": "一一零零零零零零零零",
    }
    for num, expected in goldens.items():
        assert arabic_to_chinese_number(num) == expected, num


def test_clean_text_goldens():
    assert clean_text("abc\n123 def") == "abc一百二十三def"
    assert clean_text("她它臺得") == "他他台的"
    assert clean_text("第105次,Hello!") == "第一百零五次hello"


def test_cer_zero_reference_is_zero():
    r = calculate_cer(",,,", ",,,")
    assert r.cer_rate == 0
    assert r.total_chars == 0


def test_cer_metric_levenshtein():
    # evaluate.load("cer") semantics: total edits / total ref chars.
    assert cer_metric(["abcd"], ["abxd"]) == 0.25
    assert cer_metric(["abcd", "ef"], ["abcd", "eg"]) == 1 / 6
    assert cer_metric([], []) == 0.0
