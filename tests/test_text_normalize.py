"""Tests for transcript post-processing, s2tw conversion, and filters."""

from ttasr.text.filters import IGNORE_TEXT, filter_segments, filter_text, language_codes
from ttasr.text.normalize import (
    full_to_half,
    num_to_cn,
    postprocess_transcript,
    remove_special_characters_by_dataset_name,
    replace_words,
    split_sentence_to_words,
)
from ttasr.text.s2tw import s2tw_convert


def test_replace_words():
    assert replace_words("百分之十五的人") == "15%的人"
    assert replace_words("百分之十二點五") == "12.5%"
    assert replace_words("電話零八零零零九五九八喔") == "電話080009598喔"
    assert replace_words("沒有數字") == "沒有數字"


def test_full_to_half():
    assert full_to_half("ＡＢＣ１２３") == "ABC123"
    assert full_to_half("ｈｅｌｌｏ") == "hello"


def test_remove_special_characters():
    out = remove_special_characters_by_dataset_name("你好，世界！「測試」：ＯＫ")
    assert out == "你好世界測試OK"
    out2 = remove_special_characters_by_dataset_name("a,b.c?d!e")
    # '.' is kept; ',', '?' and '!' are in the ignore set
    assert out2 == "ab.cde"


def test_s2tw_basic():
    assert s2tw_convert("简体中文") == "簡體中文"
    assert s2tw_convert("这是一个测试") == "這是一個測試"
    assert s2tw_convert("台湾") == "台灣"
    assert s2tw_convert("我们去图书馆看书") == "我們去圖書館看書"
    # phrase-level disambiguation
    assert s2tw_convert("这里") == "這裡"
    assert s2tw_convert("公里") == "公里"
    assert s2tw_convert("头发") == "頭髮"
    assert s2tw_convert("出发") == "出發"
    # traditional input passes through
    assert s2tw_convert("已經是繁體") == "已經是繁體"


def test_num_to_cn_an2cn():
    assert num_to_cn("我有2個") == "我有兩個" or num_to_cn("我有2個") == "我有二個"
    assert num_to_cn("15%") == "百分之十五"
    assert num_to_cn("12.5%") == "百分之十二點五"
    assert num_to_cn("105") == "一百零五"
    assert num_to_cn("2024年") == "二千零二十四年"


def test_num_to_cn_cn2an():
    assert num_to_cn("一百零五", mode=1) == "105"
    assert num_to_cn("兩千零二十四", mode=1) == "2024"
    assert num_to_cn("十五", mode=1) == "15"
    assert num_to_cn("三點一四", mode=1) == "3.14"


def test_split_sentence_to_words():
    assert split_sentence_to_words("你好world", True) == "你 好 world"
    assert split_sentence_to_words("abc", False) == "abc"
    assert split_sentence_to_words("價格12.5元", True) == "價 格 12.5 元"


def test_postprocess_transcript_chain():
    # replace_words -> s2tw -> strip specials -> lower
    out = postprocess_transcript("百分之十五，简体ＡＢＣ！")
    assert out == "15%簡體abc"


def test_filter_text_blocklist():
    assert filter_text("請不吝點贊和訂閱") is None
    assert filter_text("字幕by某某") is None
    assert filter_text("Amara.org提供") is None
    assert filter_text("正常的轉錄內容") == "正常的轉錄內容"
    assert len(IGNORE_TEXT) == 19


def test_filter_segments():
    segs = [{"text": "正常"}, {"text": "喜歡請訂閱"}, {"text": "也正常"}]
    assert filter_segments(segs) == [{"text": "正常"}, {"text": "也正常"}]


def test_language_codes():
    assert language_codes["english"] == "en"
    assert language_codes["cantonese"] == "yue"
    assert language_codes["traditionalchinese"] == "zh"
    assert len(language_codes) == 101
