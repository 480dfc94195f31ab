"""Lucene RegExp dialect -> Java/RE2 regex translation.

Lucene's RegexpQuery does NOT take Java regex syntax: patterns are the
``org.apache.lucene.util.automaton.RegExp`` dialect
(lucene/core/src/java/org/apache/lucene/util/automaton/RegExp.java),
which differs from Java/PCRE in ways that silently change meaning:

- ``^`` and ``$`` are ordinary characters (the automaton match is
  always whole-string; there are no anchors);
- ``\\c`` is ALWAYS the literal character c — there are no escape
  classes, so ``\\d`` means the letter d;
- ``.`` matches any character including newline;
- ``"..."`` is a quoted literal, ``()`` is the empty string;
- optional-syntax operators (all enabled by RegexpQuery's default
  flags=ALL): ``a&b`` intersection, ``~a`` complement, ``#`` empty
  language, ``@`` any string, ``<n-m>`` numerical interval,
  ``<name>`` named automaton.

This module parses the dialect with the reference grammar
(RegExp.java:1030-1167 parseUnionExp..parseCharExp) and emits an
equivalent Java-regex string (also valid RE2/DuckDB and Python re, so
one translation serves the engine, the oracle, and the kernel's
python-side matcher). Operators whose languages are not regular-
expression-expressible without automaton algebra — intersection,
complement, named automata — raise the typed ``RegexpUnsupported``
instead of being silently reinterpreted.

Numerical intervals follow Automata.makeDecimalInterval semantics
(Automata.java:452): same-width bounds fix the digit count
(zero-padded); different widths accept any number of leading zeros
before an unpadded value in range.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple


class RegexpSyntaxError(ValueError):
    """Malformed pattern (mirrors RegExp.java's
    IllegalArgumentException positions)."""


class RegexpUnsupported(ValueError):
    """Pattern is valid Lucene RegExp but uses an operator with no
    regex translation (intersection ``&``, complement ``~``, named
    automaton ``<name>``)."""


# ---------------------------------------------------------------- AST

@dataclass(frozen=True)
class RChar:
    c: str


@dataclass(frozen=True)
class RRange:
    lo: str
    hi: str


@dataclass(frozen=True)
class RClass:          # [..] / [^..]: members are RChar | RRange
    members: Tuple
    negate: bool


@dataclass(frozen=True)
class RAny:            # .
    pass


@dataclass(frozen=True)
class REmpty:          # '#' — the empty LANGUAGE (matches nothing)
    pass


@dataclass(frozen=True)
class RAnyString:      # '@'
    pass


@dataclass(frozen=True)
class RString:         # "..." quoted literal / () empty string
    s: str


@dataclass(frozen=True)
class RInterval:       # <n-m>
    lo: int
    hi: int
    digits: int


@dataclass(frozen=True)
class RConcat:
    parts: Tuple


@dataclass(frozen=True)
class RUnion:
    parts: Tuple


@dataclass(frozen=True)
class RRepeat:         # min..max, max=None => unbounded
    e: object
    min: int
    max: object


@dataclass(frozen=True)
class RIntersection:   # a & b — composable as predicate AND when it
    parts: Tuple       # spans a whole (sub)pattern


@dataclass(frozen=True)
class RComplement:     # ~a — composable as predicate NOT likewise
    e: object


# ------------------------------------------------------------- parser

class _Parser:
    """Recursive descent following RegExp.java's productions
    (parseUnionExp -> parseInterExp -> parseConcatExp ->
    parseRepeatExp -> parseComplExp -> parseCharClassExp ->
    parseSimpleExp), flags=ALL."""

    def __init__(self, s: str):
        self.s = s
        self.pos = 0

    def _more(self) -> bool:
        return self.pos < len(self.s)

    def _peek(self, chars: str) -> bool:
        return self._more() and self.s[self.pos] in chars

    def _match(self, c: str) -> bool:
        if self._more() and self.s[self.pos] == c:
            self.pos += 1
            return True
        return False

    def _next(self) -> str:
        if not self._more():
            raise RegexpSyntaxError("unexpected end-of-string")
        ch = self.s[self.pos]
        self.pos += 1
        return ch

    def parse(self):
        e = self.union_exp()
        if self._more():
            raise RegexpSyntaxError(
                f"end-of-string expected at position {self.pos}")
        return e

    def union_exp(self):
        e = self.inter_exp()
        if self._match("|"):
            r = self.union_exp()
            return RUnion(tuple([e, r]))
        return e

    def inter_exp(self):
        e = self.concat_exp()
        if self._match("&"):
            r = self.inter_exp()
            rest = r.parts if isinstance(r, RIntersection) else (r,)
            return RIntersection(tuple([e]) + tuple(rest))
        return e

    def concat_exp(self):
        e = self.repeat_exp()
        if self._more() and not self._peek(")|") and not self._peek("&"):
            r = self.concat_exp()
            return RConcat(tuple([e, r]))
        return e

    def repeat_exp(self):
        e = self.compl_exp()
        while self._peek("?*+{"):
            if self._match("?"):
                e = RRepeat(e, 0, 1)
            elif self._match("*"):
                e = RRepeat(e, 0, None)
            elif self._match("+"):
                e = RRepeat(e, 1, None)
            elif self._match("{"):
                start = self.pos
                while self._peek("0123456789"):
                    self.pos += 1
                if start == self.pos:
                    raise RegexpSyntaxError(
                        f"integer expected at position {self.pos}")
                n = int(self.s[start:self.pos])
                m: object = None
                if self._match(","):
                    start = self.pos
                    while self._peek("0123456789"):
                        self.pos += 1
                    m = int(self.s[start:self.pos]) \
                        if start != self.pos else None
                else:
                    m = n
                if not self._match("}"):
                    raise RegexpSyntaxError(
                        f"expected '}}' at position {self.pos}")
                e = RRepeat(e, n, m)
        return e

    def compl_exp(self):
        if self._match("~"):
            return RComplement(self.compl_exp())
        return self.char_class_exp()

    def char_class_exp(self):
        if self._match("["):
            negate = self._match("^")
            members = [self.char_class()]
            while self._more() and not self._peek("]"):
                members.append(self.char_class())
            if not self._match("]"):
                raise RegexpSyntaxError(
                    f"expected ']' at position {self.pos}")
            return RClass(tuple(members), negate)
        return self.simple_exp()

    def char_class(self):
        c = self.char_exp()
        if self._match("-"):
            return RRange(c, self.char_exp())
        return RChar(c)

    def simple_exp(self):
        if self._match("."):
            return RAny()
        if self._match("#"):
            return REmpty()
        if self._match("@"):
            return RAnyString()
        if self._match('"'):
            start = self.pos
            while self._more() and not self._peek('"'):
                self.pos += 1
            if not self._match('"'):
                raise RegexpSyntaxError(
                    f"expected '\"' at position {self.pos}")
            return RString(self.s[start:self.pos - 1])
        if self._match("("):
            if self._match(")"):
                return RString("")
            e = self.union_exp()
            if not self._match(")"):
                raise RegexpSyntaxError(
                    f"expected ')' at position {self.pos}")
            return e
        if self._match("<"):
            start = self.pos
            while self._more() and not self._peek(">"):
                self.pos += 1
            if not self._match(">"):
                raise RegexpSyntaxError(
                    f"expected '>' at position {self.pos}")
            body = self.s[start:self.pos - 1]
            i = body.find("-")
            if i == -1:
                raise RegexpUnsupported(
                    f"named automaton <{body}> is not supported "
                    "(RegexpQuery's default AutomatonProvider has "
                    "none either)")
            if (i == 0 or i == len(body) - 1
                    or i != body.rfind("-")
                    or not body[:i].isdigit()
                    or not body[i + 1:].isdigit()):
                raise RegexpSyntaxError(
                    f"interval syntax error at position {self.pos - 1}")
            smin, smax = body[:i], body[i + 1:]
            imin, imax = int(smin), int(smax)
            digits = len(smin) if len(smin) == len(smax) else 0
            if imin > imax:
                imin, imax = imax, imin
            return RInterval(imin, imax, digits)
        return RChar(self.char_exp())

    def char_exp(self) -> str:
        self._match("\\")
        return self._next()


# --------------------------------------------------------- translation

_META = set(".^$*+?()[]{}|\\/")


def _esc(c: str) -> str:
    """Escape one literal char for Java regex (also RE2/Python-safe)."""
    if c in _META:
        return "\\" + c
    return c


def _esc_class(c: str) -> str:
    """Escape one literal char inside a [...] class."""
    if c in "\\]^-[&":
        return "\\" + c
    return c


def _fixed_ge(t: str) -> str:
    """Digit strings, same length as t, numerically >= t."""
    if len(t) == 1:
        return f"[{t}-9]" if t != "9" else "9"
    h, rest = t[0], t[1:]
    n = len(rest)
    parts = [h + "(?:" + _fixed_ge(rest) + ")"]
    if h != "9":
        parts.append(f"[{chr(ord(h) + 1)}-9][0-9]{{{n}}}")
    return "|".join(parts)


def _fixed_le(t: str) -> str:
    """Digit strings, same length as t, numerically <= t."""
    if len(t) == 1:
        return f"[0-{t}]" if t != "0" else "0"
    h, rest = t[0], t[1:]
    n = len(rest)
    parts = [h + "(?:" + _fixed_le(rest) + ")"]
    if h != "0":
        parts.append(f"[0-{chr(ord(h) - 1)}][0-9]{{{n}}}")
    return "|".join(parts)


def _fixed_between(x: str, y: str) -> str:
    """Digit strings of len(x)==len(y), numerically in [x, y]."""
    if x == y:
        return x
    if len(x) == 1:
        return f"[{x}-{y}]"
    hx, tx = x[0], x[1:]
    hy, ty = y[0], y[1:]
    n = len(tx)
    if hx == hy:
        return hx + "(?:" + _fixed_between(tx, ty) + ")"
    parts = [hx + "(?:" + _fixed_ge(tx) + ")"]
    if ord(hy) - ord(hx) > 1:
        parts.append(
            f"[{chr(ord(hx) + 1)}-{chr(ord(hy) - 1)}][0-9]{{{n}}}")
    parts.append(hy + "(?:" + _fixed_le(ty) + ")")
    return "|".join(parts)


def _interval_regex(lo: int, hi: int, digits: int) -> str:
    """Automata.makeDecimalInterval (Automata.java:452): fixed width
    when digits > 0 (bounds zero-padded to that width); otherwise any
    number of leading zeros then an unpadded in-range value."""
    if digits > 0:
        x = str(lo).zfill(digits)
        y = str(hi).zfill(digits)
        return "(?:" + _fixed_between(x, y) + ")"
    parts = []
    for w in range(len(str(lo)), len(str(hi)) + 1):
        a = max(lo, 0 if w == 1 else 10 ** (w - 1))
        b = min(hi, 10 ** w - 1)
        if a <= b:
            parts.append(_fixed_between(str(a).zfill(w),
                                        str(b).zfill(w)))
    return "0*(?:" + "|".join(parts) + ")"


def _to_java(e) -> str:
    if isinstance(e, RChar):
        return _esc(e.c)
    if isinstance(e, RString):
        return "".join(_esc(c) for c in e.s) if e.s else "(?:)"
    if isinstance(e, RAny):
        return "[\\s\\S]"
    if isinstance(e, RAnyString):
        return "[\\s\\S]*"
    if isinstance(e, REmpty):
        return "[^\\s\\S]"
    if isinstance(e, RClass):
        body = []
        for m in e.members:
            if isinstance(m, RChar):
                body.append(_esc_class(m.c))
            else:
                body.append(_esc_class(m.lo) + "-" + _esc_class(m.hi))
        return ("[^" if e.negate else "[") + "".join(body) + "]"
    if isinstance(e, RInterval):
        return _interval_regex(e.lo, e.hi, e.digits)
    if isinstance(e, RUnion):
        return "(?:" + "|".join(_to_java(p) for p in e.parts) + ")"
    if isinstance(e, RConcat):
        return "".join(_to_java(p) for p in e.parts)
    if isinstance(e, RRepeat):
        if e.max is not None and e.min > e.max:
            # RegExp.java parses a{n,m} with n > m; Operations.repeat
            # yields the EMPTY language — match nothing instead of
            # emitting an invalid '{3,2}' quantifier that throws in
            # every backend
            return "[^\\s\\S]"
        inner = "(?:" + _to_java(e.e) + ")"
        if e.min == 0 and e.max is None:
            return inner + "*"
        if e.min == 1 and e.max is None:
            return inner + "+"
        if e.min == 0 and e.max == 1:
            return inner + "?"
        if e.max is None:
            return inner + "{%d,}" % e.min
        if e.min == e.max:
            return inner + "{%d}" % e.min
        return inner + "{%d,%d}" % (e.min, e.max)
    if isinstance(e, RIntersection):
        raise RegexpUnsupported(
            "intersection (&) inside a larger expression has no regex "
            "translation — it is supported only where it spans a "
            "whole (sub)pattern, as a predicate conjunction")
    if isinstance(e, RComplement):
        raise RegexpUnsupported(
            "complement (~) inside a larger expression has no regex "
            "translation — it is supported only where it spans a "
            "whole (sub)pattern, as a predicate negation")
    raise TypeError(f"unknown node {e!r}")


def lucene_regexp_to_java(pattern: str) -> str:
    """Translate a Lucene RegExp-dialect pattern to an equivalent
    (unanchored) Java/RE2/Python regex for whole-string matching.
    Raises RegexpSyntaxError on malformed input and RegexpUnsupported
    on intersection/complement (anywhere — use
    ``lucene_regexp_to_tree`` for predicate-level support) and named
    automata."""
    return _to_java(_Parser(pattern).parse())


def lucene_regexp_to_tree(pattern: str):
    """Predicate tree for whole-string matching with automaton-
    algebra operators supported where they compose as predicates:

        ("re", java_regex)        leaf full-match
        ("and", [trees...])       intersection  a&b
        ("not", tree)             complement    ~a

    ``a&b`` and ``~a`` are language intersection/complement
    (RegExp.java REGEXP_INTERSECTION/REGEXP_COMPLEMENT); over a
    whole-string match they are exactly predicate AND / NOT, so every
    backend (Spark rlike Column, DuckDB SQL, python re) evaluates the
    same tree. Occurrences INSIDE concatenation/repetition — where
    only true automaton algebra could translate — still raise
    RegexpUnsupported rather than being reinterpreted."""
    def walk(node):
        if isinstance(node, RIntersection):
            return ("and", [walk(p) for p in node.parts])
        if isinstance(node, RComplement):
            return ("not", walk(node.e))
        if isinstance(node, RUnion):
            # a union whose branches contain algebra operators
            # composes as predicate OR; a pure-regex union stays one
            # regex leaf
            try:
                return ("re", _to_java(node))
            except RegexpUnsupported:
                return ("or", [walk(p) for p in node.parts])
        return ("re", _to_java(node))
    return walk(_Parser(pattern).parse())
