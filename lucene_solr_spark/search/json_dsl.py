"""Solr JSON Query DSL -> engine query AST.

The reference's JSON Request API lets every query be a JSON object
``{qparser_name: {param: value, ...}}`` which
``solr/core/src/java/org/apache/solr/request/json/JsonQueryConverter.java:30``
rewrites into local-params strings dispatched to the named QParser;
bare strings fall through to the default (lucene/classic) parser
(``toLocalParams`` :33).  Here the same JSON shapes compile DIRECTLY
to the engine's query AST — there is no string round-trip because the
AST is the local-params' target anyway.

Supported qparsers (each cites its plugin):

- bare string            -> classic QueryParser (search/parser.py)
- ``{"lucene":  {"query"|"v": s}}``  -> classic parser
  (LuceneQParserPlugin.java)
- ``{"bool":    {"must"|"should"|"must_not"|"filter": [q...]}}``
  (BoolQParserPlugin.java:43-46; values may be single objects or
  lists, exactly like the reference's repeated params)
- ``{"term":    {"f": field, "v": value}}`` (TermQParserPlugin.java —
  raw term, NO analysis, matching the reference's raw-term semantics;
  the engine's single text field makes f optional)
- ``{"prefix":  {"f": field, "v": value}}`` (PrefixQParserPlugin.java)
- ``{"boost":   {"b": factor, "query": q}}`` (BoostQParserPlugin.java)
- ``{"edismax": {"qf"...}}`` is intentionally NOT duplicated here —
  the engine exposes it as the dedicated edismax entry point
  (search/edismax.py), mirroring how Solr dispatches to the same
  plugin either way.
"""

from __future__ import annotations

from .parser import parse as parse_query
from .query import Bool, Boost, Prefix, Term


class JsonQueryError(ValueError):
    pass


def _as_list(v):
    return v if isinstance(v, list) else [v]


def json_query(obj):
    """Compile a JSON Query DSL object (already-parsed JSON) to the
    engine AST."""
    if isinstance(obj, str):
        return parse_query(obj)
    if not isinstance(obj, dict):
        raise JsonQueryError(
            f"expect a json object or string, found: {obj!r}")
    if len(obj) != 1:
        # JsonQueryConverter.java:82 "expect only one query parser"
        raise JsonQueryError(
            f"expect only one query parser, found: {sorted(obj)}")
    (qtype, params), = obj.items()
    if qtype == "lucene":
        if isinstance(params, str):
            return parse_query(params)
        return parse_query(params.get("query", params.get("v", "")))
    if qtype == "bool":
        return Bool(
            must=tuple(json_query(q)
                       for q in _as_list(params.get("must", []))),
            should=tuple(json_query(q)
                         for q in _as_list(params.get("should", []))),
            must_not=tuple(json_query(q)
                           for q in _as_list(params.get("must_not", []))),
            filter=tuple(json_query(q)
                         for q in _as_list(params.get("filter", []))))
    if qtype == "term":
        return Term(params["v"] if isinstance(params, dict) else params)
    if qtype == "prefix":
        return Prefix(params["v"] if isinstance(params, dict) else params)
    if qtype == "boost":
        return Boost(json_query(params["query"]),
                     float(params.get("b", 1.0)))
    raise JsonQueryError(f"unknown query parser: {qtype!r}")
