"""CJKAnalyzer chain (width fold + bigram + stop) — expected outputs
pinned from the reference's own test suite (TestCJKAnalyzer.java,
TestCJKBigramFilter.java, TestCJKWidthFilter.java)."""
import pytest

from lucene_solr_spark.analysis.cjk import (
    cjk_analyze, cjk_bigram, width_fold)
from lucene_solr_spark.analysis.uax29 import segment, simple_lower


def toks(text):
    """Bigram-stream terms (pre-stop), mirroring assertAnalyzesTo."""
    stream = [(simple_lower(width_fold(text[a:b])), a, b, t)
              for a, b, t in segment(text)]
    return [t for t, _ in cjk_bigram(stream)]


def types(text):
    stream = [(simple_lower(width_fold(text[a:b])), a, b, t)
              for a, b, t in segment(text)]
    return [ty for _, ty in cjk_bigram(stream)]


def test_han_run_bigrams():
    # TestCJKAnalyzer.testJa1
    assert toks("一二三四五六七八九十") == [
        "一二", "二三", "三四", "四五", "五六", "六七", "七八",
        "八九", "九十"]
    assert set(types("一二三四五六七八九十")) == {"<DOUBLE>"}


def test_han_runs_with_spaces():
    # TestCJKAnalyzer.testJa2
    assert toks("一 二三四 五六七八九 十") == [
        "一", "二三", "三四", "五六", "六七", "七八", "八九", "十"]
    assert types("一 二三四 五六七八九 十")[0] == "<SINGLE>"


def test_ascii_passthrough():
    # TestCJKAnalyzer.testC
    assert toks("abc defgh ijklmn opqrstu vwxy z") == [
        "abc", "defgh", "ijklmn", "opqrstu", "vwxy", "z"]


def test_final_offset_cases():
    assert toks("あい") == ["あい"]
    assert toks("あい   ") == ["あい"]
    assert toks("あいtest") == ["あい", "test"]
    assert toks("testあい    ") == ["test", "あい"]


def test_mix():
    # TestCJKAnalyzer.testMix / testMix2
    assert toks("あいうえおabcかきくけこ") == [
        "あい", "いう", "うえ", "えお", "abc", "かき", "きく",
        "くけ", "けこ"]
    assert toks("あいうえおabんcかきくけ こ") == [
        "あい", "いう", "うえ", "えお", "ab", "ん", "c", "かき",
        "きく", "くけ", "こ"]


def test_non_ideographic_passthrough():
    # TestCJKAnalyzer.testNonIdeographic (+ nonspacing-mark variant)
    assert toks("一 روبرت موير") == ["一", "روبرت", "موير"]
    assert toks("一 رُوبرت موير") == ["一", "رُوبرت", "موير"]


def test_surrogates():
    # TestCJKAnalyzer.testSurrogates
    assert toks("𩬅艱鍟䇹愯瀛") == ["𩬅艱", "艱鍟", "鍟䇹", "䇹愯",
                                   "愯瀛"]


def test_width_folding():
    # TestCJKWidthFilter
    assert width_fold("Ｔｅｓｔ") == "Test"
    assert width_fold("１２３４") == "1234"
    assert width_fold("ｶﾀｶﾅ") == "カタカナ"
    assert width_fold("ｳﾞｨｯﾂ") == "ヴィッツ"
    assert width_fold("ﾊﾟﾅｿﾆｯｸ") == "パナソニック"


def test_fullwidth_text_through_chain():
    # width fold runs BEFORE bigramming/lowercase
    assert toks("Ｔｅｓｔ １２３４") == ["test", "1234"]


def test_stop_filter_with_gaps():
    terms, pos = cjk_analyze("the 一二 of test")
    assert terms == ["一二", "test"]
    assert pos == [1, 3]


def test_hangul_and_katakana_runs():
    assert toks("한국어") == ["한국", "국어"]
    assert toks("アート") == ["アー", "ート"]
