"""Exact UAX#29 StandardTokenizer parity (round-3 VERDICT item 2).

tests/fixtures/uax29_parity.json holds a multilingual corpus (emoji,
Hangul, Thai, CJK, Hebrew+gershayim, mixed alphanumerics, plus 600
random class-dense strings) tokenized by the REFERENCE DFA
(StandardTokenizerImpl.java run through tools/gen_uax29_fixtures.py).
The suite requires ZERO token-boundary or type divergences. Table
provenance: behavioral probing of the reference scanner —
tools/gen_uax29_tables.py; live re-fuzz: tools/fuzz_uax29.py.
"""
import json
from pathlib import Path

import pytest

from lucene_solr_spark.analysis.uax29 import (
    ALPHANUM, EMOJI, HANGUL, IDEOGRAPHIC, KATAKANA, NUM,
    SOUTHEAST_ASIAN, segment, simple_lower, tokenize)

FIX = Path(__file__).parent / "fixtures" / "uax29_parity.json"


def test_reference_parity_zero_divergence():
    cases = json.loads(FIX.read_text())
    assert len(cases) > 600
    bad = []
    for case in cases:
        text = case["text"]
        want = [(t, tok) for t, tok in case["tokens"]]
        got = [(typ, text[a:b]) for a, b, typ in segment(text)]
        if got != want:
            bad.append((text, want, got))
    assert not bad, f"{len(bad)} divergences, first: {bad[0]}"


def test_types():
    text = "ab 12 가 ア か 一 ไทย 👍"
    types = [t for _, _, t in segment(text)]
    assert types == [ALPHANUM, NUM, HANGUL, KATAKANA, 4, IDEOGRAPHIC,
                     SOUTHEAST_ASIAN, EMOJI]


def test_hebrew_quotes():
    # WB7a/WB7b/WB7c: gershayim inside, trailing geresh kept
    assert [s for _, s in _toks('צה"ל')] == ['צה"ל']
    assert [s for _, s in _toks("מה'")] == ["מה'"]


def test_emoji_sequences():
    # ZWJ family, skin tone, flag pair, keycap, tag sequence
    fam = "\U0001F468‍\U0001F469‍\U0001F467‍\U0001F466"
    assert [s for _, s in _toks(fam)] == [fam]
    assert [s for _, s in _toks("\U0001F44D\U0001F3FD")] == \
        ["\U0001F44D\U0001F3FD"]
    fr = "\U0001F1EB\U0001F1F7"
    assert [s for _, s in _toks(fr + fr + "\U0001F1EB")] == [fr, fr]
    assert [s for _, s in _toks("3⃣")] == ["3⃣"]
    scot = ("\U0001F3F4\U000E0067\U000E0062\U000E0073\U000E0063"
            "\U000E0074\U000E007F")
    assert [s for _, s in _toks(scot)] == [scot]


def test_thai_run_single_token():
    assert [s for _, s in _toks("สวัสดี ครับ")] == ["สวัสดี", "ครับ"]


def test_chop_at_255():
    toks = tokenize("x" * 600)
    assert [len(t) for t, _, _ in toks] == [255, 255, 90]
    # chop counts UTF-16 units: astral chars take 2
    toks = tokenize("\U0001D400" * 200)  # math bold A, Lu
    assert [sum(2 for _ in t) for t, _, _ in toks] == [254, 146]


def test_simple_lower_java_semantics():
    assert simple_lower("İ") == "i"              # not 'i' + U+0307
    assert simple_lower("ΣΟΣ") == "σοσ"          # no final sigma
    assert simple_lower("HELLO ß") == "hello ß"


def _toks(text):
    return [(ty, text[a:b]) for a, b, ty in segment(text)]


def test_ascii_fast_path_matches_scanner():
    """standard_tokenize's pure-ASCII single-regex fast path must be
    indistinguishable from the NFA scanner (which is itself
    fuzz-verified against the reference DFA) — including the joiner
    classes [.,;'] / [.:'] / '_' and the >255 fallback."""
    import random
    import string

    from lucene_solr_spark.analysis.analyzers import (
        MAX_TOKEN_LENGTH, standard_tokenize)

    def nfa_ref(text):
        terms, positions, pos = [], [], -1
        for t, inc, _ in tokenize(text, MAX_TOKEN_LENGTH):
            pos += inc
            terms.append(simple_lower(t))
            positions.append(pos)
        return terms, positions

    rng = random.Random(77)
    pool = list(string.printable)
    jpool = list("abc019_.,;:'\"# *")
    cases = ["a_b.c'd:e,f", "1,000.5", "don't", "9;5", "1;2;3",
             "a;b", "_x_", "a" * 255, "a" * 256, "1" * 300 + ".5"]
    for _ in range(4000):
        k = rng.randint(0, 30)
        cases.append("".join(rng.choice(pool) for _ in range(k)))
    for _ in range(4000):
        k = rng.randint(0, 24)
        cases.append("".join(rng.choice(jpool) for _ in range(k)))
    for s in cases:
        assert standard_tokenize(s) == nfa_ref(s), repr(s)
