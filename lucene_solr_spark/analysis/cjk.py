"""CJK analyzer: StandardTokenizer + CJKWidthFilter + LowerCase +
CJKBigramFilter + StopFilter — the reference's ja/zh/ko analysis chain
(analysis/cjk/CJKAnalyzer.java:55 createComponents).

- Width folding (CJKWidthFilter.java:40): fullwidth ASCII variants
  FF01-FF5E -> ASCII (cp - 0xFEE0); halfwidth katakana FF65-FF9F ->
  fullwidth via the kana table, with the halfwidth voiced marks
  FF9E/FF9F COMPOSING into the preceding kana when a voiced form
  exists (same offset-preserving delete).
- Bigramming (CJKBigramFilter.java:152, default flags HAN | HIRAGANA
  | KATAKANA | HANGUL, outputUnigrams=false): codepoints of
  OFFSET-CONTIGUOUS CJK-typed tokens accumulate into one run; a run
  of length 1 emits a unigram "<SINGLE>", longer runs emit every
  adjacent codepoint pair as "<DOUBLE>"; non-CJK tokens pass through.
- Stop set: the published cjk/stopwords.txt (english function words).

Expected outputs pinned from the reference's own test suite
(TestCJKAnalyzer.java / TestCJKWidthFilter.java) in
tests/test_r5h_cjk.py.
"""

from __future__ import annotations

from typing import List, Tuple

from .uax29 import (
    HANGUL, HIRAGANA, IDEOGRAPHIC, KATAKANA, segment, simple_lower)

_CJK_TYPES = (IDEOGRAPHIC, HIRAGANA, KATAKANA, HANGUL)

# CJKAnalyzer DEFAULT_STOPWORD_FILE (cjk/stopwords.txt)
CJK_STOP = frozenset((
    "a", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "s",
    "such", "t", "that", "the", "their", "then", "there", "these",
    "they", "this", "to", "was", "will", "with", "www",
))

# halfwidth kana -> fullwidth (CJKWidthFilter.KANA_NORM, FF65..FF9D;
# FF9E/FF9F fall back to combining 3099/309A when they cannot compose)
_KANA_NORM = (
    0x30FB, 0x30F2, 0x30A1, 0x30A3, 0x30A5, 0x30A7, 0x30A9, 0x30E3,
    0x30E5, 0x30E7, 0x30C3, 0x30FC, 0x30A2, 0x30A4, 0x30A6, 0x30A8,
    0x30AA, 0x30AB, 0x30AD, 0x30AF, 0x30B1, 0x30B3, 0x30B5, 0x30B7,
    0x30B9, 0x30BB, 0x30BD, 0x30BF, 0x30C1, 0x30C4, 0x30C6, 0x30C8,
    0x30CA, 0x30CB, 0x30CC, 0x30CD, 0x30CE, 0x30CF, 0x30D2, 0x30D5,
    0x30D8, 0x30DB, 0x30DE, 0x30DF, 0x30E0, 0x30E1, 0x30E2, 0x30E4,
    0x30E6, 0x30E8, 0x30E9, 0x30EA, 0x30EB, 0x30EC, 0x30ED, 0x30EF,
    0x30F3, 0x3099, 0x309A,
)
# voiced / half-voiced composition deltas for kana 30A6..30FD
_KANA_VOICED = (
    78, 0, 0, 0, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0,
    1, 0, 1, 0, 1, 0, 1, 0, 0, 1, 0, 1, 0, 1, 0, 0, 0, 0, 0, 0, 1,
    0, 0, 1, 0, 0, 1, 0, 0, 1, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 8, 8, 8, 8, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 1,
)
_KANA_HALF_VOICED = (
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 2,
    0, 0, 2, 0, 0, 2, 0, 0, 2, 0, 0, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0,
)


def width_fold(token: str) -> str:
    """CJKWidthFilter.incrementToken over one token's text."""
    out: List[str] = []
    for ch in token:
        cp = ord(ch)
        if 0xFF01 <= cp <= 0xFF5E:
            out.append(chr(cp - 0xFEE0))
        elif 0xFF65 <= cp <= 0xFF9F:
            if cp in (0xFF9E, 0xFF9F) and out:
                prev = ord(out[-1])
                if 0x30A6 <= prev <= 0x30FD:
                    delta = (_KANA_HALF_VOICED if cp == 0xFF9F
                             else _KANA_VOICED)[prev - 0x30A6]
                    if delta:
                        out[-1] = chr(prev + delta)
                        continue
            out.append(chr(_KANA_NORM[cp - 0xFF65]))
        else:
            out.append(ch)
    return "".join(out)


def cjk_bigram(tokens) -> List[Tuple[str, str]]:
    """CJKBigramFilter (default flags, outputUnigrams=False) over
    [(text, start, end, type)] -> [(text, token_type)] with the
    reference's "<SINGLE>"/"<DOUBLE>" types; non-CJK tokens pass
    through with their standard type name."""
    from .uax29 import TOKEN_TYPES
    out: List[Tuple[str, str]] = []
    run: List[str] = []
    last_end = -1

    def flush():
        if len(run) == 1:
            out.append((run[0], "<SINGLE>"))
        else:
            for i in range(len(run) - 1):
                out.append((run[i] + run[i + 1], "<DOUBLE>"))
        run.clear()

    for text, a, b, typ in tokens:
        if typ in _CJK_TYPES:
            if a != last_end and run:
                flush()
            run.extend(text)
            last_end = b
        else:
            if run:
                flush()
            last_end = -1
            out.append((text, TOKEN_TYPES[typ]))
    if run:
        flush()
    return out


def cjk_analyze(text: str) -> tuple:
    """(terms, positions) for the full CJKAnalyzer chain. Stopwords
    leave position gaps (StopFilter semantics)."""
    return _cjk_from_spans(text or "", segment(text or ""))


def _cjk_from_spans(text: str, spans) -> tuple:
    toks = [(simple_lower(width_fold(text[a:b])), a, b, typ)
            for a, b, typ in spans]
    terms: List[str] = []
    positions: List[int] = []
    pos = -1
    for term, _typ in cjk_bigram(toks):
        pos += 1
        if term in CJK_STOP:
            continue
        terms.append(term)
        positions.append(pos)
    return terms, positions


def cjk_analyze_batch(texts: list) -> list:
    """cjk_analyze over a whole Arrow batch (C/dense UAX#29 kernel for
    the scan; width-fold/bigram/stop stay per-token)."""
    from .uax29_vec import segment_batch
    segs = segment_batch(texts)
    return [_cjk_from_spans(t, s) for t, s in zip(texts, segs)]
