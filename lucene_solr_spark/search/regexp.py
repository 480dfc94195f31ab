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
python-side matcher). Intersection ``&`` and complement ``~`` are
evaluated the way the reference does — automaton algebra
(RegExp.java:897 makeIntersection, :563 complement) — ANYWHERE in the
pattern: the subtree compiles to a symbolic DFA over a partitioned
codepoint alphabet (product / completion+flip), and GNFA state
elimination turns the result back into one portable regex. Only named
automata (and algebra subtrees beyond the state cap) raise the typed
``RegexpUnsupported`` instead of being silently reinterpreted.

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
    """Pattern is valid Lucene RegExp but cannot be translated: named
    automaton ``<name>`` (RegexpQuery's default AutomatonProvider has
    none either), or an algebra subtree whose determinized automaton
    exceeds the state cap."""


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
    if isinstance(e, (RIntersection, RComplement)):
        # mid-pattern automaton algebra (round 4): compile the subtree
        # to a symbolic DFA (product for &, completion+flip for ~ —
        # RegExp.java:897 makeIntersection / :563 complement) and
        # state-eliminate back to a plain regex every backend runs
        return _algebra_to_regex(e)
    raise TypeError(f"unknown node {e!r}")


# ------------------------------------------------- automaton algebra
# Language intersection (&) and complement (~) ANYWHERE in a pattern,
# the way the reference evaluates them (RegExp.java toAutomaton:
# makeIntersection/complement over Brics automata).  The subtree is
# compiled to a symbolic DFA over a partitioned codepoint alphabet
# (classes keep intervals, never per-char fanout), the algebra is
# applied on DFAs, and the result is converted BACK to a regex by GNFA
# state elimination — so the downstream contract is unchanged: one
# regex string that Spark rlike, DuckDB and python re all evaluate
# identically.

_MAXCP = 0x10FFFF
_ALGEBRA_STATE_CAP = 4096


def _fixed_ge_ast(t: str):
    if len(t) == 1:
        return RClass((RRange(t, "9"),), False) if t != "9" \
            else RChar("9")
    h, rest = t[0], t[1:]
    parts = [RConcat((RChar(h), _fixed_ge_ast(rest)))]
    if h != "9":
        parts.append(RConcat((
            RClass((RRange(chr(ord(h) + 1), "9"),), False),
            RRepeat(RClass((RRange("0", "9"),), False),
                    len(rest), len(rest)))))
    return parts[0] if len(parts) == 1 else RUnion(tuple(parts))


def _fixed_le_ast(t: str):
    if len(t) == 1:
        return RClass((RRange("0", t),), False) if t != "0" \
            else RChar("0")
    h, rest = t[0], t[1:]
    parts = [RConcat((RChar(h), _fixed_le_ast(rest)))]
    if h != "0":
        parts.append(RConcat((
            RClass((RRange("0", chr(ord(h) - 1)),), False),
            RRepeat(RClass((RRange("0", "9"),), False),
                    len(rest), len(rest)))))
    return parts[0] if len(parts) == 1 else RUnion(tuple(parts))


def _fixed_between_ast(x: str, y: str):
    if x == y:
        return RString(x)
    if len(x) == 1:
        return RClass((RRange(x, y),), False)
    hx, tx = x[0], x[1:]
    hy, ty = y[0], y[1:]
    if hx == hy:
        return RConcat((RChar(hx), _fixed_between_ast(tx, ty)))
    parts = [RConcat((RChar(hx), _fixed_ge_ast(tx)))]
    if ord(hy) - ord(hx) > 1:
        parts.append(RConcat((
            RClass((RRange(chr(ord(hx) + 1), chr(ord(hy) - 1)),), False),
            RRepeat(RClass((RRange("0", "9"),), False),
                    len(tx), len(tx)))))
    parts.append(RConcat((RChar(hy), _fixed_le_ast(ty))))
    return RUnion(tuple(parts))


def _interval_ast(lo: int, hi: int, digits: int):
    """AST with the same language as _interval_regex (used only by the
    automaton path; the string translator keeps its proven output)."""
    if digits > 0:
        return _fixed_between_ast(str(lo).zfill(digits),
                                  str(hi).zfill(digits))
    parts = []
    for w in range(len(str(lo)), len(str(hi)) + 1):
        a = max(lo, 0 if w == 1 else 10 ** (w - 1))
        b = min(hi, 10 ** w - 1)
        if a <= b:
            parts.append(_fixed_between_ast(str(a).zfill(w),
                                            str(b).zfill(w)))
    body = parts[0] if len(parts) == 1 else RUnion(tuple(parts))
    return RConcat((RRepeat(RChar("0"), 0, None), body))


def _class_intervals(e) -> list:
    """Disjoint sorted [lo, hi] codepoint intervals of a character-set
    leaf (RChar / RRange / RClass / RAny)."""
    if isinstance(e, RChar):
        return [(ord(e.c), ord(e.c))]
    if isinstance(e, RRange):
        lo, hi = ord(e.lo), ord(e.hi)
        return [(min(lo, hi), max(lo, hi))]
    if isinstance(e, RAny):
        return [(0, _MAXCP)]
    if isinstance(e, RClass):
        ivs = []
        for m in e.members:
            ivs += _class_intervals(m)
        ivs.sort()
        merged = []
        for lo, hi in ivs:
            if merged and lo <= merged[-1][1] + 1:
                merged[-1] = (merged[-1][0], max(merged[-1][1], hi))
            else:
                merged.append((lo, hi))
        if not e.negate:
            return merged
        out = []
        prev = 0
        for lo, hi in merged:
            if lo > prev:
                out.append((prev, lo - 1))
            prev = hi + 1
        if prev <= _MAXCP:
            out.append((prev, _MAXCP))
        return out
    raise TypeError(e)


def _collect_intervals(e, out: list) -> None:
    if isinstance(e, (RChar, RRange, RClass, RAny)):
        out.extend(_class_intervals(e))
    elif isinstance(e, RString):
        out.extend((ord(c), ord(c)) for c in e.s)
    elif isinstance(e, RInterval):
        _collect_intervals(_interval_ast(e.lo, e.hi, e.digits), out)
    elif isinstance(e, (RAnyString,)):
        out.append((0, _MAXCP))
    elif isinstance(e, REmpty):
        pass
    elif isinstance(e, RConcat) or isinstance(e, RUnion) \
            or isinstance(e, RIntersection):
        for p in e.parts:
            _collect_intervals(p, out)
    elif isinstance(e, RRepeat):
        _collect_intervals(e.e, out)
    elif isinstance(e, RComplement):
        _collect_intervals(e.e, out)
        out.append((0, _MAXCP))  # complement touches the full alphabet
    else:
        raise TypeError(e)


class _Partition:
    """Disjoint codepoint blocks refining every interval in the
    pattern; automata run over block ids."""

    def __init__(self, intervals):
        pts = {0, _MAXCP + 1}
        for lo, hi in intervals:
            pts.add(lo)
            pts.add(hi + 1)
        self.bounds = sorted(pts)          # blocks: [b_i, b_{i+1}-1]
        self.nblocks = len(self.bounds) - 1

    def blocks_for(self, intervals) -> frozenset:
        from bisect import bisect_right
        out = set()
        for lo, hi in intervals:
            i = bisect_right(self.bounds, lo) - 1
            while i < self.nblocks and self.bounds[i] <= hi:
                out.add(i)
                i += 1
        return frozenset(out)

    def block_range(self, b: int):
        return self.bounds[b], self.bounds[b + 1] - 1


class _Frag:
    """NFA fragment: trans[s] = [(blockset, t)], eps[s] = [t]."""

    def __init__(self):
        self.trans: list = []
        self.eps: list = []

    def new(self) -> int:
        self.trans.append([])
        self.eps.append([])
        return len(self.trans) - 1


def _build_nfa(e, part: _Partition, frag: _Frag):
    """(start, accept) for node ``e`` inside ``frag``; algebra nodes
    recurse through _node_dfa and re-embed the DFA."""
    if isinstance(e, (RChar, RRange, RClass, RAny)):
        a, b = frag.new(), frag.new()
        bs = part.blocks_for(_class_intervals(e))
        if bs:
            frag.trans[a].append((bs, b))
        return a, b
    if isinstance(e, RString):
        a = frag.new()
        cur = a
        for c in e.s:
            nxt = frag.new()
            frag.trans[cur].append(
                (part.blocks_for([(ord(c), ord(c))]), nxt))
            cur = nxt
        if cur == a:
            b = frag.new()
            frag.eps[a].append(b)
            return a, b
        return a, cur
    if isinstance(e, REmpty):
        return frag.new(), frag.new()      # no path: empty language
    if isinstance(e, RAnyString):
        a, b = frag.new(), frag.new()
        frag.eps[a].append(b)
        all_bs = part.blocks_for([(0, _MAXCP)])
        frag.trans[a].append((all_bs, a))
        return a, b
    if isinstance(e, RInterval):
        return _build_nfa(_interval_ast(e.lo, e.hi, e.digits),
                          part, frag)
    if isinstance(e, RConcat):
        first = None
        prev_end = None
        for p in e.parts:
            s, t = _build_nfa(p, part, frag)
            if first is None:
                first = s
            else:
                frag.eps[prev_end].append(s)
            prev_end = t
        return first, prev_end
    if isinstance(e, RUnion):
        a, b = frag.new(), frag.new()
        for p in e.parts:
            s, t = _build_nfa(p, part, frag)
            frag.eps[a].append(s)
            frag.eps[t].append(b)
        return a, b
    if isinstance(e, RRepeat):
        if e.max is not None and e.min > e.max:
            return frag.new(), frag.new()  # empty language
        a = frag.new()
        cur = a
        for _ in range(e.min):
            s, t = _build_nfa(e.e, part, frag)
            frag.eps[cur].append(s)
            cur = t
        if e.max is None:
            s, t = _build_nfa(e.e, part, frag)
            frag.eps[cur].append(s)
            frag.eps[t].append(s)
            frag.eps[t].append(cur)
            b = frag.new()
            frag.eps[cur].append(b)
            frag.eps[t].append(b)
            return a, b
        b = frag.new()
        frag.eps[cur].append(b)
        for _ in range(e.max - e.min):
            s, t = _build_nfa(e.e, part, frag)
            frag.eps[cur].append(s)
            cur = t
            frag.eps[cur].append(b)
        return a, b
    if isinstance(e, (RIntersection, RComplement)):
        dfa = _node_dfa(e, part)
        # embed DFA as an NFA fragment
        ids = {}
        for st in dfa["states"]:
            ids[st] = frag.new()
        b = frag.new()
        for st, row in dfa["trans"].items():
            for blk, t in row.items():
                frag.trans[ids[st]].append((frozenset([blk]), ids[t]))
        for st in dfa["accepts"]:
            frag.eps[ids[st]].append(b)
        return ids[dfa["start"]], b
    raise TypeError(e)


def _determinize(frag: _Frag, start: int, accept: int) -> dict:
    """Subset construction -> partial DFA over block ids:
    {"states", "trans": {s: {blk: t}}, "start", "accepts"}."""
    closure_cache: dict = {}

    def closure(ss: frozenset) -> frozenset:
        got = closure_cache.get(ss)
        if got is not None:
            return got
        seen = set(ss)
        stack = list(ss)
        while stack:
            u = stack.pop()
            for v in frag.eps[u]:
                if v not in seen:
                    seen.add(v)
                    stack.append(v)
        got = frozenset(seen)
        closure_cache[ss] = got
        return got

    s0 = closure(frozenset([start]))
    states = {s0: 0}
    order = [s0]
    trans: dict = {}
    i = 0
    while i < len(order):
        ss = order[i]
        i += 1
        by_block: dict = {}
        for s in ss:
            for bs, t in frag.trans[s]:
                for blk in bs:
                    by_block.setdefault(blk, set()).add(t)
        row = {}
        for blk, ts in by_block.items():
            nxt = closure(frozenset(ts))
            if nxt not in states:
                if len(states) >= _ALGEBRA_STATE_CAP:
                    raise RegexpUnsupported(
                        "automaton algebra exceeded the state cap "
                        f"({_ALGEBRA_STATE_CAP}) — pattern too large")
                states[nxt] = len(states)
                order.append(nxt)
            row[blk] = states[nxt]
        trans[states[ss]] = row
    accepts = {states[ss] for ss in order if accept in ss}
    return {"states": set(states.values()), "trans": trans,
            "start": 0, "accepts": accepts}


def _dfa_product(a: dict, b: dict) -> dict:
    """Intersection of two partial DFAs."""
    start = (a["start"], b["start"])
    ids = {start: 0}
    order = [start]
    trans: dict = {}
    i = 0
    while i < len(order):
        pa, pb = order[i]
        sid = ids[(pa, pb)]
        i += 1
        row = {}
        ra = a["trans"].get(pa, {})
        rb = b["trans"].get(pb, {})
        for blk, ta in ra.items():
            tb = rb.get(blk)
            if tb is None:
                continue
            np_ = (ta, tb)
            if np_ not in ids:
                if len(ids) >= _ALGEBRA_STATE_CAP:
                    raise RegexpUnsupported(
                        "automaton algebra exceeded the state cap — "
                        "pattern too large")
                ids[np_] = len(ids)
                order.append(np_)
            row[blk] = ids[np_]
        trans[sid] = row
    accepts = {ids[p] for p in order
               if p[0] in a["accepts"] and p[1] in b["accepts"]}
    return {"states": set(ids.values()), "trans": trans, "start": 0,
            "accepts": accepts}


def _dfa_complement(d: dict, nblocks: int) -> dict:
    """Complete with a sink over the full block alphabet, then flip
    accepting states."""
    sink = max(d["states"]) + 1 if d["states"] else 1
    states = set(d["states"]) | {sink}
    trans = {}
    for s in states:
        row = dict(d["trans"].get(s, {}))
        for blk in range(nblocks):
            if blk not in row:
                row[blk] = sink
        trans[s] = row
    accepts = states - set(d["accepts"])
    return {"states": states, "trans": trans, "start": d["start"],
            "accepts": accepts}


def _node_dfa(e, part: _Partition) -> dict:
    if isinstance(e, RIntersection):
        dfas = [_node_dfa(p, part) for p in e.parts]
        d = dfas[0]
        for other in dfas[1:]:
            d = _dfa_product(d, other)
        return d
    if isinstance(e, RComplement):
        return _dfa_complement(_node_dfa(e.e, part), part.nblocks)
    frag = _Frag()
    s, t = _build_nfa(e, part, frag)
    return _determinize(frag, s, t)


# ----- DFA -> regex (GNFA state elimination) -----

def _cls_cp(cp: int) -> str:
    """Portable class-member escape: printable ASCII raw (class metas
    backslashed), controls/DEL as \\xHH (valid in Java, RE2 and python
    re alike), everything else as the literal character."""
    if cp < 0x20 or cp == 0x7F or (0x80 <= cp < 0xA0):
        return "\\x%02X" % cp
    c = chr(cp)
    return _esc_class(c)


def _split_surrogates(lo: int, hi: int):
    """Drop the UTF-16 surrogate block from a range: surrogates cannot
    appear in the valid-Unicode terms being matched, and raw
    surrogate codepoints are ill-formed in RE2/SQL pattern literals."""
    out = []
    if lo < 0xD800:
        out.append((lo, min(hi, 0xD7FF)))
    if hi > 0xDFFF:
        out.append((max(lo, 0xE000), hi))
    if hi < 0xD800 or lo > 0xDFFF:
        return [(lo, hi)]
    return out


def _blocks_regex(blks: frozenset, part: _Partition) -> str:
    """One regex unit matching exactly the given blocks."""
    if blks == part.blocks_for([(0, _MAXCP)]):
        return "[\\s\\S]"
    ranges = sorted(part.block_range(b) for b in blks)
    merged = []
    for lo, hi in ranges:
        if merged and lo == merged[-1][1] + 1:
            merged[-1] = (merged[-1][0], hi)
        else:
            merged.append((lo, hi))
    merged = [r for lo, hi in merged for r in _split_surrogates(lo, hi)]
    if not merged:
        # every range fell inside the surrogate gap (pattern had lone
        # surrogate class bounds): an empty [] would mis-parse as
        # match-anything in re/RE2 — emit a never-matching atom.
        return "[^\\s\\S]"
    if len(merged) == 1 and merged[0][0] == merged[0][1]:
        cp = merged[0][0]
        if cp < 0x20 or cp == 0x7F or (0x80 <= cp < 0xA0):
            return "\\x%02X" % cp
        return _esc(chr(cp))
    body = []
    for lo, hi in merged:
        if lo == hi:
            body.append(_cls_cp(lo))
        elif hi == lo + 1:
            body.append(_cls_cp(lo) + _cls_cp(hi))
        else:
            body.append(_cls_cp(lo) + "-" + _cls_cp(hi))
    return "[" + "".join(body) + "]"


def _runion(a, b):
    if a is None:
        return b
    if b is None:
        return a
    if a == b:
        return a
    if a == "":
        return "(?:" + b + ")?"
    if b == "":
        return "(?:" + a + ")?"
    return "(?:" + a + "|" + b + ")"


def _rconcat(a, b):
    if a is None or b is None:
        return None
    return a + b


def _rstar(a):
    if a is None or a == "":
        return ""
    return "(?:" + a + ")*"


def _dfa_to_regex(d: dict, part: _Partition) -> str:
    """GNFA state elimination; edges are backend-portable regex
    units ('' = epsilon, None = no edge)."""
    if not d["accepts"]:
        return "[^\\s\\S]"
    START, ACC = -1, -2
    edges: dict = {}

    def add(i, j, r):
        edges[(i, j)] = _runion(edges.get((i, j)), r)

    # group parallel block edges first: (i, j) -> blockset
    by_pair: dict = {}
    for i, row in d["trans"].items():
        for blk, j in row.items():
            by_pair.setdefault((i, j), set()).add(blk)
    for (i, j), blks in by_pair.items():
        add(i, j, _blocks_regex(frozenset(blks), part))
    add(START, d["start"], "")
    for a_ in d["accepts"]:
        add(a_, ACC, "")

    remaining = set(d["states"])
    while remaining:
        # cheapest-first heuristic: fewest in*out paths
        def cost(k):
            ins = sum(1 for (i, j) in edges if j == k and i != k)
            outs = sum(1 for (i, j) in edges if i == k and j != k)
            return ins * outs
        k = min(remaining, key=cost)
        remaining.discard(k)
        loop = _rstar(edges.pop((k, k), None))
        ins = [(i, r) for (i, j), r in list(edges.items())
               if j == k and i != k]
        outs = [(j, r) for (i, j), r in list(edges.items())
                if i == k and j != k]
        for (i, j) in list(edges):
            if i == k or j == k:
                del edges[(i, j)]
        for i, rin in ins:
            for j, rout in outs:
                add(i, j, _rconcat(_rconcat(rin, loop), rout))
    final = edges.get((START, ACC))
    if final is None:
        return "[^\\s\\S]"
    if final == "":
        return "(?:)"
    return final


def _algebra_to_regex(e) -> str:
    """Compile an algebra subtree (& / ~ anywhere inside it) to one
    plain regex: symbolic NFA -> DFA (+product/complement) -> GNFA
    state elimination."""
    ivs: list = []
    _collect_intervals(e, ivs)
    part = _Partition(ivs)
    d = _node_dfa(e, part)
    return "(?:" + _dfa_to_regex(d, part) + ")"


def lucene_regexp_to_java(pattern: str) -> str:
    """Translate a Lucene RegExp-dialect pattern to an equivalent
    (unanchored) Java/RE2/Python regex for whole-string matching.
    Intersection/complement compile via automaton algebra wherever
    they occur. Raises RegexpSyntaxError on malformed input and
    RegexpUnsupported on named automata / over-cap algebra."""
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
    same tree. Occurrences INSIDE concatenation/repetition compile
    through the automaton-algebra path into a single regex leaf
    (round 4); the predicate tree remains the cheap path for the
    whole-pattern case."""
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
