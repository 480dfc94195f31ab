"""Token filters: Porter stemmer, stop filter, shingle filter.

The extension-point slice of Lucene's analysis-common module
(SURVEY.md §2.8 "extended analyzers ... pluggable UDF slots"):

- ``porter_stem`` — the classic Porter (1980) algorithm, the same one
  behind PorterStemFilter (lucene/analysis/common/src/java/org/apache/
  lucene/analysis/en/PorterStemFilter.java; Lucene's PorterStemmer.java
  is a mechanical translation of the published algorithm). Implemented
  from the published rule set, steps 1a-5b.
- ``stop_filter`` — drop stop words but PRESERVE position gaps
  (ANA/StopFilter.java:28 increments posIncr across removed tokens).
- ``shingles_of`` — word n-gram ShingleFilter analogue
  (analysis/common .../shingle/ShingleFilter.java).

All are plain-python token-stream functions designed to be composed
inside an analyzer pandas UDF (analysis/analyzers.py english pipeline)
— Arrow-batched, never per-row Python in the Spark plan.
"""

from __future__ import annotations

_VOWELS = set("aeiou")


def _is_cons(word: str, i: int) -> bool:
    c = word[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """Porter's m: number of VC sequences in [C](VC){m}[V]."""
    forms = []
    for i in range(len(stem)):
        forms.append("c" if _is_cons(stem, i) else "v")
    s = "".join(forms)
    m = 0
    i = 0
    # skip initial consonants
    while i < len(s) and s[i] == "c":
        i += 1
    while i < len(s):
        while i < len(s) and s[i] == "v":
            i += 1
        if i >= len(s):
            break
        m += 1
        while i < len(s) and s[i] == "c":
            i += 1
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(w: str) -> bool:
    return (len(w) >= 2 and w[-1] == w[-2] and _is_cons(w, len(w) - 1))


def _cvc(w: str) -> bool:
    if len(w) < 3:
        return False
    return (_is_cons(w, len(w) - 3) and not _is_cons(w, len(w) - 2)
            and _is_cons(w, len(w) - 1) and w[-1] not in "wxy")


def porter_stem(word: str) -> str:
    """Porter (1980) stemming algorithm, steps 1a-5b."""
    w = word
    if len(w) <= 2:
        return w

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        flag = False
        if w.endswith("ed") and _has_vowel(w[:-2]):
            w = w[:-2]
            flag = True
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            w = w[:-3]
            flag = True
        if flag:
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif _ends_double_cons(w) and not w.endswith(("l", "s", "z")):
                w = w[:-1]
            elif _measure(w) == 1 and _cvc(w):
                w += "e"

    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # step 2
    for suf, rep in (("ational", "ate"), ("tional", "tion"),
                     ("enci", "ence"), ("anci", "ance"), ("izer", "ize"),
                     ("abli", "able"), ("alli", "al"), ("entli", "ent"),
                     ("eli", "e"), ("ousli", "ous"), ("ization", "ize"),
                     ("ation", "ate"), ("ator", "ate"), ("alism", "al"),
                     ("iveness", "ive"), ("fulness", "ful"),
                     ("ousness", "ous"), ("aliti", "al"),
                     ("iviti", "ive"), ("biliti", "ble")):
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break

    # step 3
    for suf, rep in (("icate", "ic"), ("ative", ""), ("alize", "al"),
                     ("iciti", "ic"), ("ical", "ic"), ("ful", ""),
                     ("ness", "")):
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break

    # step 4
    for suf in ("al", "ance", "ence", "er", "ic", "able", "ible", "ant",
                "ement", "ment", "ent", "ou", "ism", "ate", "iti", "ous",
                "ive", "ize"):
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 1:
                w = w[: -len(suf)]
            break
    else:
        if w.endswith("ion") and len(w) > 3 and w[-4] in "st" \
                and _measure(w[:-3]) > 1:
            w = w[:-3]

    # step 5a
    if w.endswith("e"):
        m = _measure(w[:-1])
        if m > 1 or (m == 1 and not _cvc(w[:-1])):
            w = w[:-1]
    # step 5b
    if _ends_double_cons(w) and w.endswith("l") and _measure(w) > 1:
        w = w[:-1]
    return w


# a compact English stop set (Lucene's EnglishAnalyzer.ENGLISH_STOP_WORDS_SET
# — analysis/common .../en/EnglishAnalyzer.java; the classic 33-word list)
ENGLISH_STOP_WORDS = frozenset(
    "a an and are as at be but by for if in into is it no not of on or "
    "such that the their then there these they this to was will with"
    .split())


def stop_filter(tokens: list, positions: list,
                stop_set=ENGLISH_STOP_WORDS) -> tuple:
    """Drop stop words, PRESERVING original positions — downstream
    phrase queries see the same position gaps Lucene's StopFilter
    produces via posIncr accumulation (ANA/StopFilter.java:28)."""
    out_t, out_p = [], []
    for t, p in zip(tokens, positions):
        if t not in stop_set:
            out_t.append(t)
            out_p.append(p)
    return out_t, out_p


def shingles_of(tokens: list, n: int = 2, sep: str = " ") -> list:
    """Word n-gram shingles (ShingleFilter analogue, output-only form)."""
    if len(tokens) < n:
        return []
    return [sep.join(tokens[i:i + n]) for i in range(len(tokens) - n + 1)]


def edge_ngrams_py(term: str, min_gram: int = 2,
                   max_gram: int = 4) -> list:
    """EdgeNGramTokenFilter (lucene/analysis/common/src/java/org/
    apache/lucene/analysis/ngram/EdgeNGramTokenFilter.java:34): the
    leading-edge prefixes of the token from min_gram to max_gram
    characters — the classic index-time autocomplete expansion. A
    term shorter than min_gram emits nothing (the filter's
    keepShortTerm=false default shape)."""
    return [term[:k] for k in range(min_gram,
                                    min(max_gram, len(term)) + 1)]


def edge_ngrams_sql_array(col: str, min_gram: int = 2,
                          max_gram: int = 4) -> str:
    """Spark-SQL array of edge n-grams of ``col`` (same semantics as
    edge_ngrams_py). The DuckDB oracle proves the equivalence via the
    prefix-LIKE identity instead: looking up gram g in an edge-ngram
    index returns exactly the terms LIKE 'g%' (len(g) >= min_gram),
    which is what makes the expansion correct for autocomplete."""
    ks = ", ".join(str(k) for k in range(min_gram, max_gram + 1))
    return (f"transform(filter(array({ks}), k -> k <= length({col})), "
            f"k -> substring({col}, 1, k))")


# ---------------------------------------------------------------------------
# phonetic key (Solr PhoneticFilterFactory, Soundex encoder)
# ---------------------------------------------------------------------------

_SOUNDEX_CLASSES = (
    ("[bfpv]", "1"), ("[cgjkqsxz]", "2"), ("[dt]", "3"),
    ("[l]", "4"), ("[mn]", "5"), ("[r]", "6"),
)


def soundex_sql(col: str, dialect: str = "spark") -> str:
    """Classic American Soundex as portable SQL (Solr's
    PhoneticFilterFactory default encoder, solr/core/src/java/org/
    apache/solr/analysis/PhoneticFilterFactory shape; algorithm per
    Knuth TAOCP vol. 3 / the commons-codec Soundex the factory wraps).

    Steps, each a regexp_replace both engines support (DuckDB needs the
    explicit 'g' flag — Spark replaces globally by default):
      1. drop h/w (consonants across h/w collapse together),
      2. map consonant classes to digits 1-6, vowels to the separator 0,
      3. collapse adjacent equal digits,
      4. drop the leading code digit (it belongs to the kept first
         letter), remove separators, pad with 0 to 3 digits,
      5. key = upper(first letter) + 3 digits.

    Documented divergence: a leading h/w is dropped in step 1 before
    the first letter is captured here, so words starting with h or w
    key on their second letter (strict Soundex keeps them; no such
    terms appear in the fixture vocabulary's query set).
    """
    g = ", 'g'" if dialect == "duckdb" else ""
    x = f"regexp_replace(lower({col}), '[hw]', ''{g})"
    for pat, digit in _SOUNDEX_CLASSES:
        x = f"regexp_replace({x}, '{pat}', '{digit}'{g})"
    x = f"regexp_replace({x}, '[aeiouy]', '0'{g})"
    # collapse runs of the same digit (vowel separators break runs);
    # one replace per digit — DuckDB regexes are RE2, which has no
    # backreferences, so '(\\d)\\1+' is not portable
    for d in "0123456":
        x = f"regexp_replace({x}, '{d}{d}+', '{d}'{g})"
    # drop the first code char (the kept letter's own code), strip 0s
    x = f"regexp_replace(substr({x}, 2), '0', ''{g})"
    first = f"upper(substr(lower({col}), 1, 1))"
    return f"(CASE WHEN length({col}) = 0 THEN '' ELSE " \
           f"{first} || substr({x} || '000', 1, 3) END)"


def soundex_py(word: str) -> str:
    """Reference implementation of soundex_sql (same steps, same
    divergence) for tests."""
    import re as _re
    if not word:
        return ""
    w = word.lower()
    x = _re.sub(r"[hw]", "", w)
    for pat, digit in _SOUNDEX_CLASSES:
        x = _re.sub(pat, digit, x)
    x = _re.sub(r"[aeiouy]", "0", x)
    x = _re.sub(r"([0-9])\1+", r"\1", x)
    x = _re.sub(r"0", "", x[1:])
    return w[0].upper() + (x + "000")[:3]


# ---------------------------------------------------------------------------
# ASCII folding (lucene/analysis/common/src/java/org/apache/lucene/
# analysis/miscellaneous/ASCIIFoldingFilter.java:58 — the Latin-1 /
# Latin Extended-A diacritic subset of its fold table; ligature and
# non-Latin foldings are out of scope for this corpus)
# ---------------------------------------------------------------------------

FOLD_FROM = ("àáâãäåèéêëìíîïòóôõöùúûüçñýÿ"
             "ÀÁÂÃÄÅÈÉÊËÌÍÎÏÒÓÔÕÖÙÚÛÜÇÑÝŸ")
FOLD_TO = ("aaaaaaeeeeiiiiooooouuuucnyy"
           "AAAAAAEEEEIIIIOOOOOUUUUCNYY")


def fold_ascii_sql(col: str, dialect: str = "spark") -> str:
    """Accent folding as SQL — two genuinely independent realizations:
    an explicit per-character translate table on the Spark side vs
    DuckDB's ICU-backed strip_accents; the parity test + oracle gate
    prove they agree over the covered repertoire."""
    if dialect == "spark":
        return f"translate({col}, '{FOLD_FROM}', '{FOLD_TO}')"
    if dialect == "duckdb":
        return f"strip_accents({col})"
    raise ValueError(f"unknown dialect {dialect!r}")


def fold_ascii_py(s: str) -> str:
    return s.translate(str.maketrans(FOLD_FROM, FOLD_TO))


def minimal_stem_sql(col: str) -> str:
    """English minimal (plural-only) stemmer as ONE portable SQL
    scalar — the S-Stemmer of Harman, "How Effective Is Suffixing?",
    exactly as EnglishMinimalStemmer.java:29-45 implements it:
    words shorter than 3 or not ending in 's' pass through; '-us'/'-ss'
    endings pass through; '-ies' becomes '-y' unless preceded by 'a' or
    'e'; '-Xes' passes through for X in {i,a,o,e}; otherwise the final
    's' is dropped.  The identical text runs in Spark whole-stage
    codegen and in the DuckDB oracle (substr/length/right/concat are
    shared dialect)."""
    c = col
    third = f"substr({c}, length({c}) - 2, 1)"
    fourth = f"substr({c}, length({c}) - 3, 1)"
    return (
        f"CASE WHEN length({c}) < 3 OR right({c}, 1) <> 's' THEN {c} "
        f"WHEN substr({c}, length({c}) - 1, 1) IN ('u', 's') THEN {c} "
        f"WHEN substr({c}, length({c}) - 1, 1) = 'e' THEN ("
        f"CASE WHEN length({c}) > 3 AND {third} = 'i' "
        f"AND {fourth} NOT IN ('a', 'e') "
        f"THEN concat(substr({c}, 1, length({c}) - 3), 'y') "
        f"WHEN {third} IN ('i', 'a', 'o', 'e') THEN {c} "
        f"ELSE substr({c}, 1, length({c}) - 1) END) "
        f"ELSE substr({c}, 1, length({c}) - 1) END")


def minimal_stem_py(word: str) -> str:
    """Reference-port of EnglishMinimalStemmer.stem (the law-test
    twin of minimal_stem_sql)."""
    n = len(word)
    if n < 3 or word[-1] != "s":
        return word
    if word[-2] in ("u", "s"):
        return word
    if word[-2] == "e":
        if n > 3 and word[-3] == "i" and word[-4] not in ("a", "e"):
            return word[:-3] + "y"
        if word[-3] in ("i", "a", "o", "e"):
            return word
        return word[:-1]
    return word[:-1]


def common_grams_py(tokens: list, common: set) -> list:
    """CommonGramsFilter gram tokens (lucene/analysis/common/src/java/
    org/apache/lucene/analysis/commongrams/CommonGramsFilter.java:38,
    gramToken :149-176): for every adjacent pair where the previous
    token was common OR the current token is common, emit
    ``prev + '_' + cur`` (SEPARATOR :54).  This is the output-only gram
    list (the grams the filter injects alongside the unigrams; the
    CommonGramsQueryFilter keeps exactly these for phrase queries)."""
    out = []
    for a, b in zip(tokens, tokens[1:]):
        if a in common or b in common:
            out.append(f"{a}_{b}")
    return out


# ---------------------------------------------------------------------------
# round-4g: the remaining small TokenFilter family (analysis-common)
# ---------------------------------------------------------------------------

# EnglishPossessiveFilter.java:37-50: strip the trailing 2 chars when
# the penultimate is one of ' ’ ＇ and the last is s/S.
POSSESSIVE_PATTERN = "['’＇][sS]$"


def possessive_strip_sql(col: str, dialect: str = "spark") -> str:
    """EnglishPossessiveFilter as one regexp_replace (the pattern
    carries the three apostrophe codepoints literally so the SAME
    regex runs under Java-regex Spark and RE2 DuckDB; only the string
    QUOTING differs — Spark takes the double-quoted literal, DuckDB
    doubles the embedded single quote)."""
    if dialect == "duckdb":
        pat = POSSESSIVE_PATTERN.replace("'", "''")
        return f"regexp_replace({col}, '{pat}', '', 'g')"
    return f'regexp_replace({col}, "{POSSESSIVE_PATTERN}", "")'


def possessive_strip_py(term: str) -> str:
    if (len(term) >= 2 and term[-2] in "'’＇"
            and term[-1] in "sS"):
        return term[:-2]
    return term


def pattern_replace_sql(col: str, pattern: str, replacement: str,
                        dialect: str = "spark") -> str:
    """PatternReplaceFilter (replaceAll shape — Spark's
    regexp_replace is global by default, DuckDB needs the 'g'
    flag)."""
    g = ", 'g'" if dialect == "duckdb" else ""
    # same single-quote escaping as possessive_strip_sql: a
    # quote-bearing pattern/replacement must not break the SQL literal
    p = pattern.replace("'", "''")
    r = replacement.replace("'", "''")
    return (f"regexp_replace({col}, '{p}', "
            f"'{r}'{g})")


def truncate_token_sql(col: str, n: int) -> str:
    """TruncateTokenFilter (analysis/miscellaneous/
    TruncateTokenFilter.java: keep the first ``length`` chars)."""
    return f"substring({col}, 1, {n})"


def length_filter_pred_sql(col: str, min_len: int,
                           max_len: int) -> str:
    """LengthFilter (analysis/miscellaneous/LengthFilter.java:34
    accept): min <= len <= max, applied to the token text at this
    point in the chain."""
    return (f"(length({col}) >= {min_len} AND "
            f"length({col}) <= {max_len})")


def ngrams_py(term: str, min_gram: int = 2, max_gram: int = 3,
              preserve_original: bool = False) -> list:
    """NGramTokenFilter (analysis/ngram/NGramTokenFilter.java:99-134)
    in the reference's emission order: outer loop over start
    position, inner loop over gram size min..max, emitting only while
    pos+size <= len; ``preserveOriginal`` keeps a too-short token
    verbatim (:112-117)."""
    n = len(term)
    if preserve_original and n < min_gram:
        return [term]
    out = []
    for p in range(0, n - min_gram + 1):
        for g in range(min_gram, max_gram + 1):
            if p + g <= n:
                out.append(term[p:p + g])
    return out


def ngrams_sql_array(col: str, min_gram: int = 2, max_gram: int = 3,
                     dialect: str = "spark") -> str:
    """The same grams, same order, as an array expression; the caller
    guarantees len(col) >= min_gram (no empty-array branch).  Spark
    and DuckDB twins differ only in list-function spellings
    (sequence/transform/filter vs range/list_transform/list_filter —
    DuckDB's range upper bound is exclusive)."""
    if dialect == "duckdb":
        return (f"flatten(list_transform("
                f"range(0, length({col}) - {min_gram} + 1), "
                f"p -> list_filter(list_transform("
                f"range({min_gram}, {max_gram} + 1), "
                f"g -> CASE WHEN p + g <= length({col}) "
                f"THEN substring({col}, p + 1, g) END), "
                f"x -> x IS NOT NULL)))")
    return (f"flatten(transform("
            f"sequence(0, length({col}) - {min_gram}), "
            f"p -> filter(transform("
            f"sequence({min_gram}, {max_gram}), "
            f"g -> CASE WHEN p + g <= length({col}) "
            f"THEN substring({col}, p + 1, g) END), "
            f"x -> x IS NOT NULL)))")
