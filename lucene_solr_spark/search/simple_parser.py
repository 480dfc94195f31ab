"""SimpleQueryParser: fault-tolerant end-user query syntax -> AST.

The analogue of Lucene's SimpleQueryParser
(lucene/queryparser/src/java/org/apache/lucene/queryparser/simple/
SimpleQueryParser.java:99): a parser that NEVER throws — any syntax
error is decoded as best it can and the rest ignored. Supported
operators (all flags enabled, the `-1` default):

    token1+token2      AND            (SimpleQueryParser.java:175)
    token1|token2      OR             (:186)
    -token             NOT (MUST_NOT + SHOULD MatchAll wrapper,
                                       buildQueryTree :440-447)
    "t1 t2"            phrase; "t1 t2"~N sloppy phrase (:283 consumePhrase)
    term*              prefix         (:386 consumeToken)
    term~N             fuzzy, capped at 2 (LevenshteinAutomata max);
                       bare ~ = automatic fuzziness 2 (parseFuzziness)
    ( ... )            precedence     (:226 consumeSubQuery)
    \\x                escape of + | " ( ) \\ etc.

Structure-building mirrors buildQueryTree (:434-470): the running
`top` query accumulates clauses of ONE occur class; when the operator
changes (or on the first combine), the old top nests as a single
clause under the new operator. Default operator between bare tokens is
OR (SHOULD). Error tolerance mirrors the reference exactly: an
unclosed ``(`` or ``"`` is treated as an extraneous character
(consumeSubQuery :264-267, consumePhrase :327-330), an empty ``()`` /
``""`` resets the pending operator, ``)`` with no opener is skipped,
double negation cancels (:199 ``++state.not``).

Leaf text runs through the same analyzer as indexing (newDefaultQuery
-> createBooleanQuery); a leaf analyzing to multiple tokens becomes an
OR-of-terms (default operator), to zero tokens is dropped.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..analysis.analyzers import simple_tokenize
from .query import (
    Bool, Fuzzy, MatchAll, Phrase, Prefix, Query, Term,
)

_WS = {" ", "\t", "\n", "\r"}
_DELIMS = {'"', "|", "+", "(", ")"} | _WS


@dataclass
class _State:
    data: str
    index: int = 0
    length: int = 0
    top: Query | None = None
    current_op: str | None = None   # "must" | "should"
    previous_op: str | None = None
    neg: int = 0


def _analyzed_leaf(text: str) -> Query | None:
    """newDefaultQuery: analyze and build OR-of-terms (QueryBuilder
    createBooleanQuery with the default SHOULD operator)."""
    toks = [t for t in simple_tokenize(text) if t]
    if not toks:
        return None
    if len(toks) == 1:
        return Term(toks[0])
    return Bool(should=tuple(Term(t) for t in toks))


def _analyzed_phrase(text: str, slop: int) -> Query | None:
    toks = [t for t in simple_tokenize(text) if t]
    if not toks:
        return None
    if len(toks) == 1:
        return Term(toks[0])
    return Phrase(tuple(toks), slop)


def _add_clause(top: Bool, branch: Query, occur: str) -> Bool:
    """addClause (SimpleQueryParser.java:422): copy + append."""
    if occur == "must":
        return Bool(must=top.must + (branch,), should=top.should,
                    must_not=top.must_not, filter=top.filter,
                    minimum_should_match=top.minimum_should_match)
    return Bool(must=top.must, should=top.should + (branch,),
                must_not=top.must_not, filter=top.filter,
                minimum_should_match=top.minimum_should_match)


def _build_query_tree(st: _State, branch: Query | None) -> None:
    """buildQueryTree (SimpleQueryParser.java:434-470)."""
    if branch is None:
        # branch errored out entirely: the pending operator was meant
        # for it and is consumed (:470-474)
        st.current_op = None
        return
    if st.neg % 2 == 1:
        branch = Bool(should=(MatchAll(),), must_not=(branch,))
    if st.top is None:
        st.top = branch
    else:
        if st.current_op is None:
            st.current_op = "should"  # default operator OR
        if st.previous_op != st.current_op:
            wrap = Bool(**{st.current_op: (st.top,)})
            st.top = wrap
        st.top = _add_clause(st.top, branch, st.current_op)
        st.previous_op = st.current_op
    st.current_op = None


def _parse_fuzziness(st: _State) -> int:
    """parseFuzziness (SimpleQueryParser.java:481): digits after ~;
    empty -> automatic 2; non-numeric -> 0; negative impossible here."""
    if st.index >= st.length or st.data[st.index] != "~":
        return 0
    buf = []
    while True:
        st.index += 1
        if st.index >= st.length or st.data[st.index] in _DELIMS:
            break
        buf.append(st.data[st.index])
    s = "".join(buf)
    if s == "":
        return 2
    try:
        n = int(s)
    except ValueError:
        return 0
    return max(n, 0)


def _consume_phrase(st: _State) -> None:
    """consumePhrase (SimpleQueryParser.java:283-351), control flow
    kept 1:1: break at the closing quote (possibly stepping onto a
    trailing ``~`` when slop digits follow); after the loop,
    index==length means the closing quote was never found (opening
    quote extraneous), index==start means an empty ``""`` (resets the
    pending operator), anything else builds the phrase."""
    start = st.index + 1
    st.index = start
    copied: list[str] = []
    escaped = False
    has_slop = False
    while st.index < st.length:
        c = st.data[st.index]
        if not escaped:
            if c == "\\":
                escaped = True
                st.index += 1
                continue
            if c == '"':
                if (st.index + 1 < st.length
                        and st.data[st.index + 1] == "~"):
                    st.index += 1
                    if st.index + 1 < st.length:
                        has_slop = True
                    break
                break
        escaped = False
        copied.append(c)
        st.index += 1
    if st.index == st.length:
        # closing quote never found: opening quote is extraneous
        st.index = start
        return
    if st.index == start:
        # "" immediately closed: pending operator was for it, reset
        st.current_op = None
        st.index += 1
        return
    text = "".join(copied)
    slop = _parse_fuzziness(st) if has_slop else 0
    _build_query_tree(st, _analyzed_phrase(text, slop))
    st.index += 1


def _consume_subquery(st: _State) -> None:
    start = st.index + 1
    st.index = start
    precedence = 1
    escaped = False
    while st.index < st.length:
        c = st.data[st.index]
        if not escaped:
            if c == "\\":
                escaped = True
                st.index += 1
                continue
            if c == "(":
                precedence += 1
            elif c == ")":
                precedence -= 1
                if precedence == 0:
                    break
        escaped = False
        st.index += 1
    if st.index == st.length:
        # no closing paren: opener is extraneous (:264-267)
        st.index = start
    elif st.index == start:
        # immediate close: pending op was for this subquery, reset
        st.current_op = None
        st.index += 1
    else:
        sub = _State(st.data, start, st.index)
        _parse_sub_query(sub)
        _build_query_tree(st, sub.top)
        st.index += 1


def _consume_token(st: _State) -> None:
    copied: list[str] = []
    escaped = False
    prefix = False
    fuzzy = False
    while st.index < st.length:
        c = st.data[st.index]
        if not escaped:
            if c == "\\":
                escaped = True
                prefix = False
                st.index += 1
                continue
            if c in _DELIMS:
                break
            if copied and c == "~":
                fuzzy = True
                break
            prefix = bool(copied) and c == "*"
        escaped = False
        copied.append(c)
        st.index += 1
    if not copied:
        return
    branch: Query | None
    if fuzzy:
        token = "".join(copied)
        fuzziness = min(_parse_fuzziness(st), 2)
        if fuzziness == 0:
            branch = _analyzed_leaf(token)
        else:
            toks = [t for t in simple_tokenize(token) if t]
            branch = Fuzzy(toks[0], fuzziness) if toks else None
    elif prefix:
        token = "".join(copied[:-1])
        toks = [t for t in simple_tokenize(token) if t]
        branch = Prefix(toks[0]) if toks else None
    else:
        branch = _analyzed_leaf("".join(copied))
    _build_query_tree(st, branch)


def _parse_sub_query(st: _State) -> None:
    while st.index < st.length:
        c = st.data[st.index]
        if c == "(":
            _consume_subquery(st)
        elif c == ")":
            st.index += 1
        elif c == '"':
            _consume_phrase(st)
        elif c == "+":
            if st.current_op is None and st.top is not None:
                st.current_op = "must"
            st.index += 1
        elif c == "|":
            if st.current_op is None and st.top is not None:
                st.current_op = "should"
            st.index += 1
        elif c == "-":
            st.neg += 1
            st.index += 1
            continue  # do not reset neg
        elif c in _WS:
            st.index += 1
        else:
            _consume_token(st)
        st.neg = 0


def parse_simple(text: str) -> Query:
    """Parse; on a fully-empty result return MatchNoDocs (the
    reference returns MatchNoDocsQuery for an empty string)."""
    st = _State(text, 0, len(text))
    _parse_sub_query(st)
    if st.top is None:
        return Bool()  # matches nothing
    return st.top
