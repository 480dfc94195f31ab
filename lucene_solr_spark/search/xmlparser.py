"""XML query parser — the CoreParser family re-expressed over our AST.

Reference: ``lucene/queryparser/src/java/org/apache/lucene/queryparser/
xml/CoreParser.java`` (builder registry, :77-121) and its ``builders/``
package. The reference walks a DOM and dispatches each element name to
a ``QueryBuilder``; we do the same with ``xml.etree.ElementTree`` and
compile straight to the engine AST (query.py), so the parsed tree is
scored by the exact same Spark plan / DuckDB SQL as every other parser
family (the seventh family: classic, surround, simple, complex-phrase,
edismax, JSON DSL, XML).

Supported element builders (same names and attribute conventions as
the reference):

- ``TermQuery`` (TermQueryBuilder.java:34-41) — text content is the
  term, ``boost`` attribute wraps in Boost.
- ``TermsQuery`` (TermsQueryBuilder.java:38-62) — element text is
  analyzed; each token becomes a SHOULD TermQuery;
  ``minimumNumberShouldMatch`` attribute supported.
- ``MatchAllDocsQuery`` (MatchAllDocsQueryBuilder.java).
- ``BooleanQuery`` (BooleanQueryBuilder.java:48-84) — ``<Clause
  occurs="must|should|mustNot|filter">`` children, each holding one
  sub-query element; ``minimumNumberShouldMatch`` and ``boost``.
- ``DisjunctionMaxQuery`` (DisjunctionMaxQueryBuilder.java:48-66) —
  ``tieBreaker`` attribute, children are the disjuncts.
- ``ConstantScoreQuery`` (ConstantScoreQueryBuilder.java:39-48) —
  first child is the wrapped query.
- ``UserQuery`` (UserInputQueryBuilder.java) — text content is parsed
  by the classic QueryParser.
- ``SpanTerm`` / ``SpanNear`` / ``SpanOr`` / ``SpanNot``
  (SpanTermBuilder.java, SpanNearBuilder.java:42-52,
  SpanOrBuilder.java, SpanNotBuilder.java) — SpanNear requires
  ``slop``; ``inOrder`` defaults false, realized as the 2-clause
  unordered union when false (NearSpansUnordered semantics, same
  composition as the q_span_unordered registry entry).

``fieldName`` attributes are accepted and must name the text field
(single-text-field engine); RangeQuery maps to TermRange.

Malformed XML, unknown elements, or missing required attributes raise
``XmlParseError`` like the reference's ParserException.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from ..analysis.analyzers import simple_tokenize
from .parser import parse as parse_classic
from .query import (
    Bool, Boost, ConstantScore, DisMax, MatchAll, Query, SpanNear,
    SpanNot, SpanOr, Term, TermRange,
)


class XmlParseError(ValueError):
    """ParserException analogue (xml/ParserException.java)."""


def _text(e: ET.Element) -> str:
    t = (e.text or "").strip()
    if not t:
        raise XmlParseError(f"element <{e.tag}> requires text content")
    return t


def _boost(e: ET.Element, q: Query) -> Query:
    b = float(e.get("boost", "1"))
    return Boost(q, b) if b != 1.0 else q


def _occurs(clause: ET.Element) -> str:
    occ = clause.get("occurs", "should")
    low = occ.lower()
    if low in ("should", "must", "mustnot", "filter") and (
            low != "filter" or occ == "filter"):
        # the reference compares "filter" case-sensitively
        # (BooleanQueryBuilder.java:80) but the occur keywords
        # case-insensitively (:74-79)
        return low
    raise XmlParseError(
        f'Invalid value for "occurs" attribute of clause: {occ}')


def _children(e: ET.Element) -> list[ET.Element]:
    return list(e)


def parse_xml(xml_text: str, default_field: str = "text") -> Query:
    """Parse a CoreParser XML query document into the engine AST."""
    try:
        root = ET.fromstring(xml_text)
    except ET.ParseError as exc:  # malformed document
        raise XmlParseError(f"malformed XML query: {exc}") from exc
    return _build(root, default_field)


def _build(e: ET.Element, field: str) -> Query:
    tag = e.tag
    if tag == "TermQuery":
        # TermQueryBuilder analyzes nothing: the text IS the term
        return _boost(e, Term(_text(e).lower()))
    if tag == "TermsQuery":
        toks = simple_tokenize(_text(e))
        msm = int(e.get("minimumNumberShouldMatch", "0"))
        q: Query = Bool(should=tuple(Term(t) for t in toks),
                        minimum_should_match=msm)
        return _boost(e, q)
    if tag == "MatchAllDocsQuery":
        return _boost(e, MatchAll())
    if tag == "UserQuery":
        return _boost(e, parse_classic(_text(e), field))
    if tag == "BooleanQuery":
        must, should, must_not, filt = [], [], [], []
        for clause in _children(e):
            if clause.tag != "Clause":
                raise XmlParseError(
                    f"BooleanQuery child must be <Clause>, got "
                    f"<{clause.tag}>")
            subs = _children(clause)
            if len(subs) != 1:
                raise XmlParseError(
                    "Clause requires exactly one child query element")
            sub = _build(subs[0], field)
            occ = _occurs(clause)
            {"must": must, "should": should,
             "mustnot": must_not, "filter": filt}[occ].append(sub)
        q = Bool(must=tuple(must), should=tuple(should),
                 must_not=tuple(must_not), filter=tuple(filt),
                 minimum_should_match=int(
                     e.get("minimumNumberShouldMatch", "0")))
        return _boost(e, q)
    if tag == "DisjunctionMaxQuery":
        tie = float(e.get("tieBreaker", "0"))
        disjuncts = tuple(_build(c, field) for c in _children(e))
        if not disjuncts:
            raise XmlParseError("DisjunctionMaxQuery requires children")
        return _boost(e, DisMax(disjuncts, tie))
    if tag == "ConstantScoreQuery":
        subs = _children(e)
        if len(subs) != 1:
            raise XmlParseError(
                "ConstantScoreQuery requires exactly one child")
        return _boost(e, ConstantScore(_build(subs[0], field), 1.0))
    if tag == "RangeQuery":
        # RangeQueryBuilder.java: lowerTerm/upperTerm attributes,
        # includeLower/includeUpper default true
        lo, hi = e.get("lowerTerm"), e.get("upperTerm")
        if lo is None or hi is None:
            raise XmlParseError("RangeQuery requires lowerTerm/upperTerm")
        return _boost(e, TermRange(
            lo.lower(), hi.lower(),
            e.get("includeLower", "true").lower() == "true",
            e.get("includeUpper", "true").lower() == "true"))
    if tag in ("SpanTerm", "SpanNear", "SpanOr", "SpanNot"):
        return _boost(e, _build_span(e, field))
    raise XmlParseError(f"unknown query element <{tag}>")


def _build_span(e: ET.Element, field: str) -> Query:
    tag = e.tag
    if tag == "SpanTerm":
        return Term(_text(e).lower())
    if tag == "SpanNear":
        slop_s = e.get("slop")
        if slop_s is None:  # SpanNearBuilder.java:42 getAttributeOrFail
            raise XmlParseError("SpanNear requires a slop attribute")
        slop = int(slop_s)
        in_order = e.get("inOrder", "false").lower() == "true"
        terms = []
        for c in _children(e):
            sub = _build_span(c, field)
            if not isinstance(sub, Term):
                raise XmlParseError(
                    "SpanNear children must be SpanTerm elements "
                    "(nested span clauses are out of subset)")
            terms.append(sub.term)
        if len(terms) < 2:
            raise XmlParseError("SpanNear requires >=2 SpanTerm children")
        if in_order:
            return SpanNear(tuple(terms), slop)
        if len(terms) == 2:
            # NearSpansUnordered for two single-term clauses == union
            # of both orders with the same slop window
            a, b = terms
            return SpanOr((SpanNear((a, b), slop),
                           SpanNear((b, a), slop)))
        raise XmlParseError(
            "unordered SpanNear supported for 2 clauses (the composed "
            "NearSpansUnordered form)")
    if tag == "SpanOr":
        return SpanOr(tuple(_build_span(c, field) for c in _children(e)))
    if tag == "SpanNot":
        inc = e.find("Include")
        exc = e.find("Exclude")
        if inc is None or exc is None:
            raise XmlParseError("SpanNot requires Include and Exclude")
        return SpanNot(_build_span(_children(inc)[0], field),
                       _build_span(_children(exc)[0], field))
    raise XmlParseError(f"unknown span element <{tag}>")
