"""Round-4: Japanese morphological analysis (kuromoji class).

Parity is token-for-token against the REFERENCE JapaneseTokenizer +
JapaneseAnalyzer filter chain running on the same dictionary (built
with the reference's own TokenInfoDictionaryBuilder over real IPADIC
context ids + the real connection matrix / unknown dictionary —
tools/gen_kuromoji_dict.py; goldens in tests/fixtures/ja_golden*.json;
an adversarial live-harness fuzz incl. >1024-char gap-prune inputs ran
clean at generation time)."""

import json
import pathlib

import pytest

from lucene_solr_spark.analysis.ja import (ja_analyze,
                                           ja_analyze_batch,
                                           ja_tokenize)

FIX = pathlib.Path(__file__).parent / "fixtures"


def _golden(name):
    return json.loads((FIX / name).read_text(encoding="utf-8"))


def test_analyzer_matches_reference_golden():
    g = _golden("ja_golden.json")
    assert len(g["lines"]) >= 80
    for line, doc in zip(g["lines"], g["docs"]):
        gterms = [t[0] for t in doc]
        gpos = []
        p = -1
        for t in doc:
            p += int(t[1])
            gpos.append(p)
        terms, positions = ja_analyze(line)
        assert terms == gterms, repr(line)
        assert positions == gpos, repr(line)


def test_tokenizer_matches_reference_golden():
    # golden_tok is tokenizer + JapaneseBaseFormFilter: compare the
    # base-formed term and the POS tag
    g = _golden("ja_golden_tok.json")
    for line, doc in zip(g["lines"], g["docs"]):
        got = [((b if b is not None else s), p)
               for s, p, b in ja_tokenize(line)]
        want = [(t[0], t[1]) for t in doc]
        assert got == want, repr(line)


def test_morphology_shapes():
    # conjugated forms reduce to dictionary form; particles and
    # auxiliaries drop; katakana prolonged mark stems
    terms, positions = ja_analyze("田中さんは本を読んだ。")
    assert "読む" in terms          # 読ん -> 読む (baseform)
    assert "は" not in terms and "を" not in terms
    terms, _ = ja_analyze("サーバーとデータ")
    assert "サーバ" in terms       # katakana stem (>=4, trailing ー)
    assert "データ" in terms       # len 3: untouched
    # position gaps from filtered particles
    terms, positions = ja_analyze("私は学生です。")
    assert terms == ["私", "学生"]
    assert positions == [0, 2]     # gap where は was


def test_unknown_words_and_width():
    # unknown kanji compound (not in the compact lexicon) still
    # segments via the real unknown dictionary
    terms, _ = ja_analyze("未知漢字熟語連続")
    assert terms                    # segmented, not dropped
    # fullwidth folds via CJKWidthFilter before stopping/lowercasing
    terms, _ = ja_analyze("ＡＢＣ１２３は全角です。")
    assert "abc123" in terms or ("abc" in terms and "123" in terms)


def test_batch_and_empty():
    assert ja_analyze("") == ([], [])
    out = ja_analyze_batch(["本を読む。", ""])
    assert out[0][0] and out[1] == ([], [])
