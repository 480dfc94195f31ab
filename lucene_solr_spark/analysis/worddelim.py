"""WordDelimiterGraphFilter as a shared SQL token pipeline.

The reference filter (lucene/analysis/common/src/java/org/apache/
lucene/analysis/miscellaneous/WordDelimiterGraphFilter.java:47-94)
splits tokens into sub-words and optionally catenates runs:

  - split on intra-word delimiters (non-alphanumeric): "Wi-Fi" ->
    "Wi", "Fi"
  - split on case transitions (splitOnCaseChange): "PowerShot" ->
    "Power", "Shot"; an acronym run keeps its tail before a case
    drop: "TransAM" -> "Trans", "AM", "ABCDef" -> "ABC", "Def"
  - split on letter/digit transitions (splitOnNumerics): "SD500" ->
    "SD", "500", "j2se" -> "j", "2", "se"
  - strip trailing English possessive (stemEnglishPossessive):
    "O'Neil's" -> "O", "Neil"
  - catenateAll joins every alphanumeric run: "wi-fi" -> "wifi"

Instead of porting the filter's iterator, the rules are expressed as
three backreference-only regexp_replace passes (no lookaround, so the
SAME pattern runs on Spark's java.util.regex and DuckDB's RE2) that
insert a delimiter at every boundary the reference detects, followed
by a split:

  1. possessive:          ('s)(?non-alpha|end)  -> drop 's
  2. case transitions:    ([a-z0-9])([A-Z])     -> \\1 \\2
                          ([A-Z])([A-Z][a-z])   -> \\1 \\2
  3. letter<->digit:      ([A-Za-z])([0-9]) and ([0-9])([A-Za-z])

A boundary-insertion pass visits each character once, so the SQL form
is scan-shaped and whole-stage-codegen'd — no Python in the path.
``wdgf_tokens`` is the independent pure-Python model used by the
parity tests (it implements the same rules procedurally).
"""

from __future__ import annotations

import re

# (pattern, spark replacement, duckdb replacement)
_PASSES = [
    # stemEnglishPossessive (WordDelimiterGraphFilter.java:
    # stemEnglishPossessive step): 's before a boundary is dropped
    (r"'[sS](?=[^A-Za-z0-9]|$)", "", ""),
    # splitOnCaseChange: lower->Upper boundary
    (r"([a-z])([A-Z])", "$1 $2", r"\1 \2"),
    # acronym tail: the LAST upper of an upper run joins a following
    # lower-case run ("ABCDef" -> "ABC Def")
    (r"([A-Z])([A-Z][a-z])", "$1 $2", r"\1 \2"),
    # splitOnNumerics, both directions
    (r"([A-Za-z])([0-9])", "$1 $2", r"\1 \2"),
    (r"([0-9])([A-Za-z])", "$1 $2", r"\1 \2"),
]

# DuckDB's RE2 has no lookahead; the possessive pass is rewritten for
# that dialect as a capture of the boundary character.
_DUCK_POSS = (r"'[sS]([^A-Za-z0-9]|$)", r"\1")


def word_delimiter_tokens_sql(col: str, dialect: str,
                              lowercase: bool = True) -> str:
    """SQL expression: array of sub-word tokens of ``col``."""
    s = col
    if dialect == "spark":
        for pat, rep, _ in _PASSES:
            s = (f"regexp_replace({s}, "
                 f"'{pat.replace(chr(39), chr(39) * 2)}', '{rep}')")
        split = (f"filter(split({s}, '[^A-Za-z0-9]+'), "
                 "t -> length(t) > 0)")
    else:
        pat, rep = _DUCK_POSS
        s = (f"regexp_replace({s}, "
             f"'{pat.replace(chr(39), chr(39) * 2)}', '{rep}', 'g')")
        for pat, _, rep in _PASSES[1:]:
            s = f"regexp_replace({s}, '{pat}', '{rep}', 'g')"
        split = f"regexp_extract_all({s}, '[A-Za-z0-9]+', 0)"
    if lowercase:
        if dialect == "spark":
            return f"transform({split}, t -> lower(t))"
        return f"list_transform({split}, t -> lower(t))"
    return split


def catenate_all_sql(col: str, dialect: str,
                     lowercase: bool = True) -> str:
    """SQL expression: the catenateAll token (every alphanumeric run
    joined, WordDelimiterGraphFilter.java catenateAll flag)."""
    flags = ", 'g'" if dialect == "duckdb" else ""
    rep = "\\1" if dialect == "duckdb" else "$1"
    s = f"regexp_replace({col}, '''[sS]([^A-Za-z0-9]|$)', '{rep}'{flags})"
    s = f"regexp_replace({s}, '[^A-Za-z0-9]+', ''{flags})"
    return f"lower({s})" if lowercase else s


_POSS_RE = re.compile(r"'[sS](?=[^A-Za-z0-9]|$)")
_RUN_RE = re.compile(r"[A-Za-z0-9]+")


def wdgf_tokens(text: str, *, catenate_all: bool = False,
                lowercase: bool = True) -> list[str]:
    """Pure-Python reference model of the same rule subset, written
    procedurally (character classes + transition scan) so the tests
    compare two independent implementations."""
    t = _POSS_RE.sub("", text)
    out: list[str] = []
    for run in _RUN_RE.findall(t):
        parts: list[str] = []
        cur = run[0]
        for a, b in zip(run, run[1:]):
            boundary = (
                (a.islower() and b.isupper())
                or (a.isalpha() and b.isdigit())
                or (a.isdigit() and b.isalpha()))
            if boundary:
                parts.append(cur)
                cur = b
            else:
                cur += b
        parts.append(cur)
        # acronym tail: split "ABCDef"-style upper runs so the last
        # upper joins the following lower run
        for p in parts:
            m = re.match(r"^([A-Z]+)([A-Z][a-z]+)$", p)
            out += [m.group(1), m.group(2)] if m else [p]
    if catenate_all:
        cat = "".join(_RUN_RE.findall(t))
        if cat:
            out.append(cat)
    return [w.lower() for w in out] if lowercase else out
