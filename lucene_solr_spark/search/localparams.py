"""Solr local-params query syntax -> engine query AST (+ rerank spec).

The EIGHTH parser family. Solr dispatches ``{!type key=val ...}body``
strings to named QParser plugins (``QParser.getParser`` /
``QueryParsing.parseLocalParams`` in
solr/core/src/java/org/apache/solr/search/QueryParsing.java:103 —
StrParser scanning: bare first token = parser type, ``key=value``
pairs with single/double-quoted or bare values, ``$name`` request-
param dereference, ``v`` local param overriding the trailing body).

Supported qparsers (each cites its plugin):

- ``{!lucene}body`` / no type -> classic QueryParser
  (LuceneQParserPlugin.java)
- ``{!term}body``   -> raw Term, NO analysis (TermQParserPlugin.java)
- ``{!prefix}body`` -> Prefix (PrefixQParserPlugin.java)
- ``{!boost b=f}body`` -> Boost around the classic parse
  (BoostQParserPlugin.java)
- ``{!rerank reRankQuery=$rqq reRankDocs=N reRankWeight=w}body``
  (ReRankQParserPlugin.java:53; defaults reRankDocs=200,
  reRankWeight=2.0 per :60-62) -> a ``ReRank`` spec: first-pass
  ``main`` ranks everything, the top ``docs`` hits are rescored
  ``score + weight * rerank_score`` (AbstractReRankQuery's additive
  combine), hits below the cut keep their first-pass score, and the
  merged list re-sorts. Execution lives with the caller (it composes
  two scored plans); see __spark_entry__._p_rerank.
- ``{!func}body`` -> FunctionQParserPlugin.java:31 (FuncScore spec;
  the funcparser module owns the grammar)
- ``{!frange l= u= incl= incu=}body`` ->
  FunctionRangeQParserPlugin.java:39 (FRange spec)
- ``{!field f=text}body`` -> FieldQParserPlugin.java:40 (analyzed:
  one token Term, several Phrase)
- ``{!raw f=text}body`` -> RawQParserPlugin.java:35 (no analysis)
- ``{!maxscore tie=t}body`` -> MaxScoreQParserPlugin.java:38
  (top-level SHOULD clauses grouped into a DisjunctionMax)
- ``{!switch case=.. case.x=.. default=..}input`` ->
  SwitchQParserPlugin.java:95 (param-selected subquery)
- ``{!knn f=field topK=N}[v1, v2, ...]``
  (solr/core/src/java/org/apache/solr/search/neural/
  KnnQParserPlugin.java: ``f`` required, ``topK`` default 10; body =
  the literal query vector) -> a ``Knn`` spec. Solr scores dense
  cosine fields with VectorSimilarityFunction.COSINE's normalized
  ``(1 + cos) / 2`` (lucene/core/.../index/VectorSimilarityFunction
  .java); execution composes vector.ann.cosine_topk_vec.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from .funcparser import FuncNode, parse_func
from .parser import parse as parse_query
from .query import (Bool, Boost, DisMax, Phrase, Prefix, Query, Term,
                    TermInSet)


class LocalParamsError(ValueError):
    pass


@dataclass(frozen=True)
class ReRank:
    main: Query
    rerank: Query
    docs: int
    weight: float


@dataclass(frozen=True)
class FuncScore:
    """{!func}body (FunctionQParserPlugin.java:31): the function
    value IS the score (lucene queries/function FunctionQuery).
    Execution projects the compiled column over the docvalues and
    top-ks; see funcparser.compile_col / compile_sql."""

    func: FuncNode


@dataclass(frozen=True)
class FRange:
    """{!frange l=.. u=.. incl= incu=}func
    (FunctionRangeQParserPlugin.java:39 -> ValueSourceRangeFilter):
    constant-score filter on l <= f(doc) <= u; a missing bound is
    open, incl/incu default true."""

    func: FuncNode
    lower: float | None
    upper: float | None
    incl: bool
    incu: bool


@dataclass(frozen=True)
class Knn:
    field: str
    top_k: int
    vector: tuple


@dataclass(frozen=True)
class Graph:
    """{!graph from= to= traversalFilter= maxDepth= returnRoot=
    returnOnlyLeaf=}rootQuery (GraphQueryParser.java:30 — NOTE
    from/to are reversed from {!join}; defaults node_id/edge_ids,
    maxDepth -1, returnRoot true, returnOnlyLeaf false). Execution
    is graphquery.graph_traverse's iterative frontier BFS."""

    root: Query
    from_field: str
    to_field: str
    max_depth: int
    traversal_filter: Query | None
    return_root: bool
    only_leaf: bool


@dataclass(frozen=True)
class Collapse:
    """{!collapse field=..} (CollapsingQParserPlugin.java:138) — a
    post-filter keeping one head doc per group (max score, docid-asc
    ties, the plugin's default ord policy). Composes as an fq on the
    caller's main query; execution is the proven q_collapse window
    plan."""

    field: str


@dataclass(frozen=True)
class GeoFilt:
    """{!geofilt sfield pt d} / {!bbox} (SpatialFilterQParserPlugin
    .java:36 / SpatialBoxQParserPlugin): great-circle distance filter
    (or its bounding box) around pt, d in km."""

    sfield: str
    lat: float
    lon: float
    d_km: float
    box: bool


@dataclass(frozen=True)
class Mlt:
    """{!mlt mintf= mindf=}docId (mlt/MLTQParserPlugin.java:40,
    defaults mintf=2 mindf=5)."""

    doc_id: int
    mintf: int
    mindf: int


@dataclass(frozen=True)
class PayloadScore:
    """{!payload_score f= func= includeSpanScore=}terms
    (PayloadScoreQParserPlugin.java:46)."""

    query: Query
    func: str
    include_span_score: bool


@dataclass(frozen=True)
class PayloadCheck:
    """{!payload_check f= payloads='..'}terms
    (PayloadCheckQParserPlugin.java:47)."""

    query: Query
    payloads: tuple


@dataclass(frozen=True)
class TermsStats:
    """{!significantTerms}/{!igain}/{!tlogit} streaming-handler
    qparsers (SignificantTermsQParserPlugin.java:57,
    IGainTermsQParserPlugin.java:48,
    TextLogisticRegressionQParserPlugin.java:45) — analytics
    collectors addressed by the stream layer; the spec carries the
    plugin name + its params verbatim, and execution routes to the
    already-oracle-proven mlstreams/relatedness plans."""

    kind: str
    params: tuple


@dataclass(frozen=True)
class HashSpec:
    """{!hash workers= worker=} (HashQParserPlugin.java:47 — export
    partition filter on hash(keys) % workers) and {!hash_range
    f= l= u=} (HashRangeQParserPlugin.java:33)."""

    kind: str
    params: tuple


@dataclass(frozen=True)
class MinHashSpec:
    """{!min_hash sim= analyzer_field=}text
    (MinHashQParserPlugin.java:73) — banded MinHash similarity
    filter; execution is the textops minhash/LSH stack."""

    text: str
    sim: float


@dataclass(frozen=True)
class GraphTerms:
    """{!graphTerms f= maxDocFreq=}t1,t2,..
    (GraphTermsQParserPlugin.java:66): the boolean OR of the terms
    SKIPPING any whose docFreq exceeds maxDocFreq — the frontier
    hot-node guard. Execution resolves df from the term-stats table
    and reduces to TermInSet."""

    terms: tuple
    max_doc_freq: int


@dataclass(frozen=True)
class XCJoin:
    """{!join from= to= fromIndex=}fromQuery (JoinQParserPlugin /
    CrossCollectionJoinQuery.java — the from-side query's from-field
    value set selects to-side docs, constant score). ``predicate``
    is the minimal from-side filter grammar this engine accepts:
    ("all",), ("eq", field, value) from ``field:value`` bodies."""

    from_index: str
    from_field: str
    to_field: str
    predicate: tuple


@dataclass(frozen=True)
class ParentBlock:
    """{!parent which=conv score=...}child_query
    (solr/core/src/java/org/apache/solr/search/join/
    BlockJoinParentQParserPlugin.java:40): parents whose block
    contains a child matching the body; ``score`` = the join
    ScoreMode (none|max|min|total|avg, :47). In the transcript tier
    blocks are the DERIVED conv groups (doc_id div turns_per_conv —
    the conv_signals contract), so ``which`` must be the literal
    ``conv``; arbitrary parent-filter queries would need interleaved
    parent docs the input shape does not have (documented
    divergence)."""
    child: Query
    score_mode: str = "none"


@dataclass(frozen=True)
class ChildBlock:
    """{!child of=conv}parent_query (BlockJoinChildQParserPlugin
    .java): children of blocks whose parent matches. With derived
    blocks the parent-side body is evaluated as 'some turn of the
    conv matches' (EXISTS at conv level) — the closest faithful
    reading when parents are rollups, not stored docs."""
    parent: Query


def parse_local_params(s: str, params: dict | None = None):
    """``{!type k=v ...}body`` -> (type, {k: v}, body).

    ``$name`` values dereference ``params`` (the request-parameter map,
    QueryParsing.java StrParser.getParams); the ``v`` local param
    overrides the trailing body; ``type=`` overrides the bare name.
    """
    params = params or {}
    s = s.strip()
    if not s.startswith("{!"):
        raise LocalParamsError(f"local params must start with '{{!': "
                               f"{s[:20]!r}")
    i, n, kv, ptype = 2, len(s), {}, None
    while i < n and s[i] != "}":
        if s[i].isspace():
            i += 1
            continue
        j = i
        while j < n and s[j] not in " =}":
            j += 1
        word = s[i:j]
        if j < n and s[j] == "=":
            j += 1
            if j < n and s[j] in "'\"":
                quote = s[j]
                j += 1
                buf = []
                while j < n and s[j] != quote:
                    if s[j] == "\\" and j + 1 < n:
                        j += 1
                    buf.append(s[j])
                    j += 1
                if j >= n:
                    raise LocalParamsError("unterminated quoted value")
                j += 1
                val = "".join(buf)
            else:
                k0 = j
                while j < n and s[j] not in " }":
                    j += 1
                val = s[k0:j]
            if val.startswith("$"):
                ref = val[1:]
                if ref not in params:
                    raise LocalParamsError(f"undefined param ${ref}")
                val = params[ref]
            kv[word] = val
        elif word:
            if ptype is None:
                ptype = word
            else:
                raise LocalParamsError(
                    f"unexpected bare token {word!r} after type")
        i = j
    if i >= n or s[i] != "}":
        raise LocalParamsError("unterminated local params (missing '}')")
    body = s[i + 1:].strip()
    if "v" in kv:
        body = kv.pop("v")
    ptype = kv.pop("type", ptype) or "lucene"
    return ptype, kv, body


def local_query(s: str, params: dict | None = None):
    """Compile a local-params query string. Returns a Query AST, or a
    ``ReRank`` spec for ``{!rerank}`` (which composes two plans)."""
    if not s.strip().startswith("{!"):
        return parse_query(s)
    ptype, kv, body = parse_local_params(s, params)
    if ptype == "lucene":
        return parse_query(body)
    if ptype == "term":
        return Term(body)
    if ptype == "prefix":
        return Prefix(body)
    if ptype == "boost":
        return Boost(parse_query(body), float(kv.get("b", "1")))
    if ptype == "knn":
        if "f" not in kv:
            raise LocalParamsError("{!knn} requires f")
        body = body.strip()
        if not (body.startswith("[") and body.endswith("]")):
            raise LocalParamsError("{!knn} body must be a [..] vector")
        try:
            vec = tuple(float(x) for x in body[1:-1].split(","))
        except ValueError as exc:
            raise LocalParamsError(f"bad knn vector: {exc}") from None
        return Knn(field=kv["f"], top_k=int(kv.get("topK", "10")),
                   vector=vec)
    if ptype == "terms":
        # TermsQParserPlugin.java:62 — comma-separated raw terms, NO
        # analysis, constant-score set membership (method param is an
        # access-path hint the planner owns here)
        terms = tuple(t.strip() for t in body.split(kv.get(
            "separator", ",")) if t.strip())
        if not terms:
            raise LocalParamsError("{!terms} requires a non-empty list")
        return TermInSet(terms)
    if ptype == "bool":
        # BoolQParserPlugin.java:43-46 — must/should/must_not/filter
        # params each hold a subquery string (usually via $refs)
        def _clauses(key):
            vals = [v for k, v in kv.items() if k == key]
            out = tuple(local_query(v, params) for v in vals)
            for q in out:
                if isinstance(q, (ReRank, Knn)):
                    raise LocalParamsError(
                        f"{{!bool}} clause cannot be a "
                        f"{type(q).__name__} spec")
            return out
        must = _clauses("must")
        should = _clauses("should")
        must_not = _clauses("must_not")
        filt = _clauses("filter")
        if not (must or should or filt):
            raise LocalParamsError("{!bool} needs a positive clause")
        msm = int(kv.get("mm", "0"))
        return Bool(must=must, should=should, must_not=must_not,
                    filter=filt, minimum_should_match=msm)
    if ptype == "parent":
        if kv.get("which") != "conv":
            raise LocalParamsError(
                "{!parent} requires which=conv (derived blocks)")
        mode = kv.get("score", "none")
        if mode not in ("none", "max", "min", "total", "avg"):
            raise LocalParamsError(f"bad ScoreMode {mode!r}")
        return ParentBlock(parse_query(body), score_mode=mode)
    if ptype == "child":
        if kv.get("of") != "conv":
            raise LocalParamsError(
                "{!child} requires of=conv (derived blocks)")
        return ChildBlock(parse_query(body))
    if ptype == "rerank":
        rq = kv.get("reRankQuery")
        if rq is None:
            raise LocalParamsError("{!rerank} requires reRankQuery")
        rerank = local_query(rq, params)
        if isinstance(rerank, ReRank):
            raise LocalParamsError("nested {!rerank} is not supported")
        return ReRank(main=parse_query(body), rerank=rerank,
                      docs=int(kv.get("reRankDocs", "200")),
                      weight=float(kv.get("reRankWeight", "2.0")))
    if ptype == "query":
        # NestedQParserPlugin.java:43 — the v/body re-enters the
        # dispatcher with its own {!type}
        return local_query(body, params)
    if ptype == "simple":
        from .simple_parser import parse_simple
        return parse_simple(body)
    if ptype == "surround":
        from .surround import parse_surround
        return parse_surround(body)
    if ptype == "complexphrase":
        from .complexphrase import parse_complex_phrase
        return parse_complex_phrase(body)
    if ptype == "xmlparser":
        from .xmlparser import parse_xml
        return parse_xml(body)
    if ptype == "xport":
        # ExportQParserPlugin.java:43 — wraps the body query to
        # force the export codepath; the parse itself is the body's
        return parse_query(body)
    if ptype == "dismax":
        # DisMaxQParserPlugin.java / DisMaxQParser: lenient
        # whitespace tokens, each a per-field disjunction (one text
        # field here), combined as SHOULD with the mm spec
        # (SolrPluginUtils.setMinShouldMatch)
        from ..analysis.analyzers import simple_tokenize
        from .edismax import calculate_min_should_match
        toks = simple_tokenize(body)
        if not toks:
            raise LocalParamsError("{!dismax} query analyzed to "
                                   "no tokens")
        should = tuple(Term(t) for t in toks)
        msm = calculate_min_should_match(len(should),
                                         kv.get("mm", "1"))
        return Bool(should=should, minimum_should_match=msm)
    if ptype == "edismax":
        from .edismax import edismax
        return edismax(body, tie=float(kv.get("tie", "0.0")),
                       mm=kv.get("mm"))
    if ptype == "filters":
        # FiltersQParserPlugin.java:38 — param-referenced cached
        # filters composed with the v/body main query (excludeTags
        # needs the tagging machinery; unsupported here)
        if "excludeTags" in kv:
            raise LocalParamsError(
                "{!filters} excludeTags is not supported")
        ref = kv.get("param")
        if ref is None:
            raise LocalParamsError("{!filters} requires param=")
        sub = local_query(ref, params)
        main = local_query(body, params)
        if isinstance(sub, (ReRank, Knn)) \
                or isinstance(main, (ReRank, Knn)):
            raise LocalParamsError(
                "{!filters} clauses cannot be spec queries")
        return Bool(must=(main,), filter=(sub,))
    if ptype == "collapse":
        if "field" not in kv:
            raise LocalParamsError("{!collapse} requires field")
        return Collapse(field=kv["field"])
    if ptype in ("geofilt", "bbox"):
        for need in ("sfield", "pt", "d"):
            if need not in kv:
                raise LocalParamsError(f"{{!{ptype}}} requires "
                                       f"{need}")
        try:
            lat, lon = (float(x) for x in kv["pt"].split(","))
        except ValueError as exc:
            raise LocalParamsError(f"bad pt: {exc}") from None
        return GeoFilt(sfield=kv["sfield"], lat=lat, lon=lon,
                       d_km=float(kv["d"]), box=ptype == "bbox")
    if ptype == "mlt":
        try:
            did = int(body.strip())
        except ValueError:
            raise LocalParamsError(
                "{!mlt} body must be a document id") from None
        return Mlt(doc_id=did, mintf=int(kv.get("mintf", "2")),
                   mindf=int(kv.get("mindf", "5")))
    if ptype == "payload_score":
        func = kv.get("func", "")
        if func not in ("min", "max", "sum", "average"):
            raise LocalParamsError(
                "{!payload_score} func must be min/max/sum/average")
        return PayloadScore(
            query=parse_query(body), func=func,
            include_span_score=kv.get("includeSpanScore",
                                      "false") == "true")
    if ptype == "payload_check":
        if "payloads" not in kv:
            raise LocalParamsError(
                "{!payload_check} requires payloads")
        return PayloadCheck(query=parse_query(body),
                            payloads=tuple(kv["payloads"].split()))
    if ptype in ("significantTerms", "igain", "tlogit"):
        return TermsStats(kind=ptype,
                          params=tuple(sorted(kv.items())))
    if ptype in ("hash", "hash_range"):
        need = ("workers",) if ptype == "hash" else ("f", "l", "u")
        for n in need:
            if n not in kv:
                raise LocalParamsError(f"{{!{ptype}}} requires {n}")
        return HashSpec(kind=ptype,
                        params=tuple(sorted(kv.items())))
    if ptype == "min_hash":
        return MinHashSpec(text=body,
                           sim=float(kv.get("sim", "0.0")))
    if ptype == "graphTerms":
        terms = tuple(t.strip() for t in body.split(",")
                      if t.strip())
        if not terms:
            raise LocalParamsError("{!graphTerms} needs terms")
        return GraphTerms(terms=terms,
                          max_doc_freq=int(kv.get("maxDocFreq",
                                                  str(2 ** 31 - 1))))
    if ptype == "xcjf":
        # XCJFQParserPlugin.java — the cross-collection join's
        # older name; same spec as {!join fromIndex=}
        if "fromIndex" not in kv:
            raise LocalParamsError("{!xcjf} requires fromIndex")
        kv = dict(kv)
        return local_query(
            "{!join fromIndex=" + kv["fromIndex"] + " from="
            + kv.get("from", "") + " to=" + kv.get("to", "") + "}"
            + body, params)
    if ptype == "graph":
        # GraphQueryParser.java:30 — from/to REVERSED from {!join}
        tf = kv.get("traversalFilter")
        return Graph(
            root=parse_query(body),
            from_field=kv.get("from", "node_id"),
            to_field=kv.get("to", "edge_ids"),
            max_depth=int(kv.get("maxDepth", "-1")),
            traversal_filter=(None if tf is None
                              else parse_query(tf)),
            return_root=kv.get("returnRoot", "true") != "false",
            only_leaf=kv.get("returnOnlyLeaf", "false") == "true")
    if ptype == "join":
        # JoinQParserPlugin.java — from/to fields + optional
        # fromIndex; the minimal from-side body grammar is
        # "*:*" or "field:value"
        if "from" not in kv or "to" not in kv:
            raise LocalParamsError("{!join} requires from and to")
        body = body.strip()
        if body == "*:*":
            pred = ("all",)
        else:
            m = re.match(r"^([A-Za-z_][A-Za-z0-9_]*):(\S+)$", body)
            if not m:
                raise LocalParamsError(
                    "{!join} from-side body must be *:* or "
                    "field:value here")
            pred = ("eq", m.group(1), m.group(2))
        return XCJoin(from_index=kv.get("fromIndex", ""),
                      from_field=kv["from"], to_field=kv["to"],
                      predicate=pred)
    if ptype == "func":
        # FunctionQParserPlugin.java:31
        return FuncScore(parse_func(body))
    if ptype == "frange":
        # FunctionRangeQParserPlugin.java:39 — l/u bounds with
        # incl/incu inclusivity flags (defaults true)
        lo = kv.get("l")
        hi = kv.get("u")
        if lo is None and hi is None:
            raise LocalParamsError("{!frange} needs l and/or u")
        return FRange(parse_func(body),
                      lower=None if lo is None else float(lo),
                      upper=None if hi is None else float(hi),
                      incl=kv.get("incl", "true") != "false",
                      incu=kv.get("incu", "true") != "false")
    if ptype == "field":
        # FieldQParserPlugin.java:40 — analyze the raw value against
        # the field type: one token -> TermQuery, several ->
        # PhraseQuery (the text field's simple analyzer here)
        from ..analysis.analyzers import simple_tokenize
        if kv.get("f", "text") != "text":
            raise LocalParamsError(
                "{!field} supports the analyzed text field")
        toks = simple_tokenize(body)
        if not toks:
            raise LocalParamsError("{!field} value analyzed to "
                                   "no tokens")
        return Term(toks[0]) if len(toks) == 1 \
            else Phrase(tuple(toks))
    if ptype == "raw":
        # RawQParserPlugin.java:35 — the value as ONE term, no
        # analysis at all
        if kv.get("f", "text") != "text":
            raise LocalParamsError(
                "{!raw} supports the text field")
        return Term(body)
    if ptype == "maxscore":
        # MaxScoreQParserPlugin.java:38 — parse like lucene, then
        # group the top-level SHOULD clauses into one
        # DisjunctionMax(tie=tieBreaker, default 0) keeping other
        # clauses as-is
        q = parse_query(body)
        tie = float(kv.get("tie", "0.0"))
        if isinstance(q, Bool) and len(q.should) > 1:
            return Bool(must=q.must,
                        should=(DisMax(q.should, tiebreak=tie),),
                        must_not=q.must_not, filter=q.filter,
                        minimum_should_match=min(
                            q.minimum_should_match, 1))
        return q
    if ptype == "switch":
        # SwitchQParserPlugin.java:95 — the trimmed input selects
        # case.<val> (or bare `case` for empty input, `default`
        # otherwise); the chosen param value re-enters local_query
        val = body.strip()
        chosen = kv.get("case") if val == "" \
            else kv.get(f"case.{val}")
        if chosen is None:
            chosen = kv.get("default")
        if chosen is None:
            raise LocalParamsError(
                f"{{!switch}} has no case for input {val!r} and "
                "no default")
        sub = local_query(chosen, params)
        if isinstance(sub, (ReRank, Knn, FuncScore, FRange)):
            raise LocalParamsError(
                "{!switch} case cannot select a spec query")
        return sub
    raise LocalParamsError(f"unknown qparser {ptype!r}")
