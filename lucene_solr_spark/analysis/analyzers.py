"""Analyzers: text -> token stream (terms + positions).

Two pipelines, mirroring the reference's Analyzer abstraction
(lucene/core/src/java/org/apache/lucene/analysis/Analyzer.java:85,
StandardAnalyzer = StandardTokenizer + LowerCaseFilter with an EMPTY
stop set — lucene/core/.../analysis/standard/StandardAnalyzer.java:52-54):

``simple``  — ASCII-alnum runs, lowercased. Expressed with Spark
   built-ins (regexp_extract_all + transform/lower) so the whole invert
   stage stays inside whole-stage codegen, AND as the identical SQL in
   DuckDB for oracle checks. This is the default for corpora whose
   vocabulary is ASCII (the synthetic test corpora are).

``standard`` — a UAX#29-word-break approximation of Lucene's
   StandardTokenizer (lucene/core/.../standard/StandardTokenizer.java:29-69,
   generated DFA StandardTokenizerImpl.java) as a vectorized pandas UDF:
   - \\w runs (letters/digits/underscore; underscore = ExtendNumLet joins)
   - MidNumLet '.' joins letter.letter and digit.digit ("example.com", "3.14")
   - MidNum ',' joins digit,digit only ("1,000")
   - MidLetter ':' and apostrophes join letter:letter ("don't")
   - CJK ideographs and Hiragana emit one token per char; Katakana runs join
   - tokens longer than maxTokenLength=255 are dropped, positions keep gaps
     (StandardTokenizer.java:89,142-165)
   Known divergences from the JFlex grammar (documented, fixtures avoid
   them): emoji sequences, Hangul/Thai segmentation, exotic Extend marks.

Both lowercase with Python/JVM full Unicode simple case folding
(LowerCaseFilter — lucene/core/.../analysis/LowerCaseFilter.java:27).
Positions are 0-based token indexes (posIncr always 1; the default chain
has no stopwords so there are no gaps except dropped >255 tokens).
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

MAX_TOKEN_LENGTH = 255

# --------------------------------------------------------------------------
# simple analyzer (SQL-expressible; identical text for Spark and DuckDB)
# --------------------------------------------------------------------------

# Spark: transform(); DuckDB: list_transform(). Everything else is shared.
_SIMPLE_RE = "[A-Za-z0-9]+"

SIMPLE_TOKENS_SQL_SPARK = (
    f"transform(regexp_extract_all({{col}}, '{_SIMPLE_RE}', 0), t -> lower(t))"
)
SIMPLE_TOKENS_SQL_DUCKDB = (
    f"list_transform(regexp_extract_all({{col}}, '{_SIMPLE_RE}', 0), t -> lower(t))"
)


def simple_tokens_col(col: str = "text") -> Column:
    """tokens array<string> column via JVM built-ins (no Python in the path)."""
    return F.expr(SIMPLE_TOKENS_SQL_SPARK.format(col=col))


def simple_tokens_sql(col: str = "text", dialect: str = "duckdb") -> str:
    tpl = SIMPLE_TOKENS_SQL_DUCKDB if dialect == "duckdb" else SIMPLE_TOKENS_SQL_SPARK
    return tpl.format(col=col)


def simple_tokenize(text: str) -> list[str]:
    """Pure-python reference of the simple analyzer (tests/oracle)."""
    return [t.lower() for t in re.findall(_SIMPLE_RE, text or "")]


# --------------------------------------------------------------------------
# standard analyzer (UAX#29-ish), vectorized pandas UDF
# --------------------------------------------------------------------------

# candidate runs: \w plus the joiner chars we may need to re-split
_CAND_RE = re.compile(r"\w+(?:[.,:'’·]\w+)*", re.UNICODE)

_HAN = (
    "⺀-⻿々〇㐀-䶿一-鿿豈-﫿"
)
_HIRAGANA = "ぁ-ゖ"
_SINGLE_CHAR_RE = re.compile(f"[{_HAN}{_HIRAGANA}]")


def _is_letter(c: str) -> bool:
    return c.isalpha() and not _SINGLE_CHAR_RE.match(c)


def _split_run(run: str) -> list[str]:
    """Apply MidLetter/MidNum/MidNumLet joining rules inside a \\w+joiner run."""
    parts: list[str] = []
    buf: list[str] = []
    i, n = 0, len(run)
    while i < n:
        c = run[i]
        if c in ".,:'’·":
            prev = run[i - 1] if i > 0 else ""
            nxt = run[i + 1] if i + 1 < n else ""
            joins = False
            if prev and nxt:
                if c == ".":  # MidNumLet: letter.letter or digit.digit
                    joins = (_is_letter(prev) and _is_letter(nxt)) or (
                        prev.isdigit() and nxt.isdigit())
                elif c == ",":  # MidNum: digits only
                    joins = prev.isdigit() and nxt.isdigit()
                else:  # ':', apostrophes, middle dot: letters only
                    joins = _is_letter(prev) and _is_letter(nxt)
            if joins:
                buf.append(c)
            else:
                if buf:
                    parts.append("".join(buf))
                    buf = []
            i += 1
            continue
        if _SINGLE_CHAR_RE.match(c):  # CJK ideograph / hiragana: 1 token/char
            if buf:
                parts.append("".join(buf))
                buf = []
            parts.append(c)
            i += 1
            continue
        buf.append(c)
        i += 1
    if buf:
        parts.append("".join(buf))
    return [p for p in parts if p]


def standard_tokenize(text: str) -> tuple[list[str], list[int]]:
    """(terms, positions): lowercased tokens; >255-char tokens dropped but
    still consume a position (gap preserved)."""
    terms: list[str] = []
    positions: list[int] = []
    pos = -1
    for m in _CAND_RE.finditer(text or ""):
        for tok in _split_run(m.group(0)):
            pos += 1
            if len(tok) > MAX_TOKEN_LENGTH:
                continue  # dropped, position gap preserved
            terms.append(tok.lower())
            positions.append(pos)
    return terms, positions


def standard_tokenize_udf():
    """mapInPandas-style iterator UDF schema helper is in index.builder;
    here: a pandas_udf returning struct(terms, positions)."""
    from pyspark.sql.types import ArrayType, IntegerType, StringType, StructField, StructType

    ret = StructType([
        StructField("terms", ArrayType(StringType())),
        StructField("positions", ArrayType(IntegerType())),
    ])

    @F.pandas_udf(ret)
    def _tok(s: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for chunk in s:
            out = chunk.map(standard_tokenize)
            yield pd.DataFrame({
                "terms": out.map(lambda t: t[0]),
                "positions": out.map(lambda t: t[1]),
            })

    return _tok


# --------------------------------------------------------------------------
# english analyzer (EnglishAnalyzer-lite): simple tokenize + stop filter
# (position gaps preserved) + Porter stem — the analysis-common
# extension-point slice (analysis/common .../en/EnglishAnalyzer.java:
# StandardTokenizer + LowerCase + StopFilter + PorterStemFilter; the
# possessive filter is a no-op for the alnum tokenizer)
# --------------------------------------------------------------------------

def english_analyze(text: str) -> tuple:
    """Pure-python english pipeline: (terms, positions)."""
    from .filters import porter_stem, stop_filter
    toks = simple_tokenize(text)
    toks, pos = stop_filter(toks, list(range(len(toks))))
    return [porter_stem(t) for t in toks], pos


def english_analyze_udf():
    """Vectorized pandas UDF of the english pipeline, same struct shape
    as the standard analyzer (terms + positions with stop-word gaps)."""
    from pyspark.sql.types import (
        ArrayType, IntegerType, StringType, StructField, StructType,
    )

    ret = StructType([
        StructField("terms", ArrayType(StringType())),
        StructField("positions", ArrayType(IntegerType())),
    ])

    @F.pandas_udf(ret)
    def _tok(s: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        for chunk in s:
            out = chunk.map(english_analyze)
            yield pd.DataFrame({
                "terms": out.map(lambda t: t[0]),
                "positions": out.map(lambda t: t[1]),
            })

    return _tok
