"""Snowball-DEFAULT analyzer chains (round 5): the languages whose
reference analyzer stems with SnowballFilter by default —

  da  DanishAnalyzer.createComponents:117   (Std|LC|Stop|Snowball)
  nl  DutchAnalyzer.createComponents:153    (… |StemOverride|Snowball)
  sv_sb SwedishAnalyzer.createComponents:117
  no_sb NorwegianAnalyzer.createComponents:117
  ro  RomanianAnalyzer.createComponents:119
  tr  TurkishAnalyzer.createComponents:121  (Std|Apostrophe|TurkishLC
                                             |Stop|Snowball)

(`sv_sb`/`no_sb` keep the round-2 `sv`/`no` keys intact — those are
the reference's *LightStemFilter* chains, a different public surface.)

Stemmers live in analysis/snowball.py; stop sets in
analysis/snowball_stop.py (generated verbatim from the reference
resources by tools/gen_snowball_fixtures.py, which also produces the
compiled-reference golden token streams the whole chain is verified
against token-for-token — tests/test_r7c_snowball.py).
"""

from __future__ import annotations

import unicodedata
from typing import List, Tuple

#: StemmerOverrideFilter defaults (DutchAnalyzer.java:78-84): matches
#: mark the token keyword, so the stemmer is skipped.
NL_STEM_OVERRIDE = {"fiets": "fiets", "bromfiets": "bromfiets",
                    "ei": "eier", "kind": "kinder"}

_COMBINING_DOT = "̇"


def apostrophe(token: str) -> str:
    """ApostropheFilter.java:47 — strip the first apostrophe
    (' or U+2019) and everything after it."""
    for i, ch in enumerate(token):
        if ch == "'" or ch == "’":
            return token[:i]
    return token


def _before_dot(cps: List[str], pos: int) -> bool:
    for k in range(pos, len(cps)):
        if unicodedata.category(cps[k]) != "Mn":
            return False
        if cps[k] == _COMBINING_DOT:
            return True
    return False


def turkish_lower(term: str) -> str:
    """TurkishLowerCaseFilter.java:55 — Turkish casing: I -> ı unless
    followed (across combining marks) by U+0307, in which case I -> i
    and the dot is removed; all else Character.toLowerCase."""
    from .uax29 import simple_lower
    cps = list(term)
    out: List[str] = []
    i_or_after = False
    i = 0
    while i < len(cps):
        ch = cps[i]
        i_or_after = ch == "I" or (
            i_or_after and unicodedata.category(ch) == "Mn")
        if i_or_after:
            if ch == _COMBINING_DOT:
                i += 1
                continue
            if ch == "I":
                if _before_dot(cps, i + 1):
                    out.append("i")
                else:
                    out.append("ı")
                    i_or_after = False
                i += 1
                continue
        out.append(simple_lower(ch))
        i += 1
    return "".join(out)


def lang3_analyze_batch(lang: str, texts: List[str]
                        ) -> List[Tuple[List[str], List[int]]]:
    """Per-language Snowball-default chain over a whole batch; the
    UAX#29 scan runs through the C/dense kernel; stop removal leaves
    position gaps (FilteringTokenFilter posIncr semantics)."""
    from .analyzers import MAX_TOKEN_LENGTH
    from .snowball import STEMMERS
    from .snowball_stop import STOP_SETS
    from .uax29 import simple_lower
    from .uax29_vec import segment_batch

    key = {"sv_sb": "sv", "no_sb": "no"}.get(lang, lang)
    stem = STEMMERS[key]
    stops = STOP_SETS[lang]
    is_tr = lang == "tr"
    is_nl = lang == "nl"
    segs = segment_batch(texts, MAX_TOKEN_LENGTH)
    out: List[Tuple[List[str], List[int]]] = []
    for text, spans in zip(texts, segs):
        terms: List[str] = []
        positions: List[int] = []
        pos = -1
        for a, b, _typ in spans:
            pos += 1
            tok = text[a:b]
            if is_tr:
                t = turkish_lower(apostrophe(tok))
            else:
                t = simple_lower(tok)
            if t in stops:
                continue
            if is_nl and t in NL_STEM_OVERRIDE:
                t = NL_STEM_OVERRIDE[t]
            else:
                t = stem(t)
            terms.append(t)
            positions.append(pos)
        out.append((terms, positions))
    return out
