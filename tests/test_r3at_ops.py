"""Round-3at ops: the COMPLETE standard qparser registry
(QParserPlugin.java:48-93 standardPlugins) dispatching through
local_query — routing parsers, spec parsers, and the dismax mm
arithmetic."""

import pytest

from lucene_solr_spark.search.localparams import (Collapse, FRange,
                                                  FuncScore, GeoFilt,
                                                  Graph, GraphTerms,
                                                  HashSpec, Knn,
                                                  LocalParamsError,
                                                  MinHashSpec, Mlt,
                                                  PayloadCheck,
                                                  PayloadScore,
                                                  ReRank, TermsStats,
                                                  XCJoin,
                                                  local_query)
from lucene_solr_spark.search.query import (Bool, Phrase,
                                            PhraseWildcard, Term)


def test_every_standard_plugin_name_dispatches():
    """Each NAME in QParserPlugin.standardPlugins must be accepted
    by the dispatcher (with minimal valid params)."""
    probes = {
        "lucene": "{!lucene}merge",
        "func": "{!func}sum(n_chars, 1)",
        "prefix": "{!prefix}mer",
        "boost": "{!boost b=2}merge",
        "dismax": "{!dismax}merge sort",
        "edismax": "{!edismax mm=1}merge sort",
        "field": "{!field f=text}Merge Sort",
        "raw": "{!raw f=text}Merge",
        "term": "{!term}merge",
        "terms": "{!terms}merge,sort",
        "query": "{!query v='{!term}merge'}",
        "frange": "{!frange l=1 u=2}n_chars",
        "geofilt": "{!geofilt sfield=loc pt=1,2 d=10}",
        "bbox": "{!bbox sfield=loc pt=1,2 d=10}",
        "join": "{!join from=user_id to=doc_id}*:*",
        "surround": "{!surround}merge 3w sort",
        "switch": "{!switch case.a='merge'}a",
        "maxscore": "{!maxscore}merge sort",
        "parent": "{!parent which=conv}merge",
        "child": "{!child of=conv}merge",
        "filters": "{!filters param='{!term}sort'}merge",
        "collapse": "{!collapse field=lang}",
        "simple": "{!simple}merge +sort",
        "complexphrase": '{!complexphrase}"ha* join"',
        "rerank": "{!rerank reRankQuery='{!term}sort'}merge",
        "xport": "{!xport}merge",
        "mlt": "{!mlt}42",
        "hash": "{!hash workers=4 worker=0}",
        "graph": "{!graph from=a to=b maxDepth=1}merge",
        "xmlparser": "{!xmlparser}<TermQuery>merge</TermQuery>",
        "graphTerms": "{!graphTerms maxDocFreq=10}merge,sort",
        "igain": "{!igain field=text outcome=o}",
        "tlogit": "{!tlogit field=text outcome=o}",
        "significantTerms": "{!significantTerms field=text}",
        "payload_score": "{!payload_score f=text func=max}merge",
        "payload_check": "{!payload_check f=text payloads='1'}m",
        "bool": "{!bool must='{!term}merge'}",
        "min_hash": "{!min_hash sim=0.5}text here",
        "xcjf": "{!xcjf fromIndex=events from=a to=b}*:*",
        "hash_range": "{!hash_range f=doc_id l=0 u=10}",
        "knn": "{!knn f=emb topK=3}[1.0, 2.0]",
    }
    for name, probe in probes.items():
        try:
            local_query(probe)
        except LocalParamsError as exc:  # pragma: no cover
            pytest.fail(f"{name}: {exc}")


def test_dismax_mm_conditional_spec():
    # 4 optional clauses, spec "2<-25%": 4 > 2 -> 4 - trunc(1) = 3
    q = local_query("{!dismax mm='2<-25%'}merge sort hash join")
    assert isinstance(q, Bool)
    assert q.minimum_should_match == 3
    assert q.should == (Term("merge"), Term("sort"), Term("hash"),
                        Term("join"))
    # percentage truncates toward zero like the Java (int) cast
    assert local_query("{!dismax mm='75%'}a b c") \
        .minimum_should_match == 2


def test_nested_query_deref():
    assert local_query("{!query v=$qq}", {"qq": "{!term}Sort"}) \
        == Term("Sort")


def test_filters_composition():
    q = local_query("{!filters param=$fq v=$q}",
                    {"fq": "{!term}sort", "q": "merge"})
    assert q == Bool(must=(Term("merge"),), filter=(Term("sort"),))
    with pytest.raises(LocalParamsError, match="excludeTags"):
        local_query("{!filters param=$fq excludeTags=t}x",
                    {"fq": "merge"})


def test_spec_parsers_carry_params():
    g = local_query("{!geofilt sfield=loc pt=12.5,-70.2 d=500}")
    assert isinstance(g, GeoFilt)
    assert (g.lat, g.lon, g.d_km, g.box) == (12.5, -70.2, 500.0,
                                             False)
    assert local_query("{!bbox sfield=loc pt=1,2 d=3}").box is True
    m = local_query("{!mlt mintf=1 mindf=3}42")
    assert isinstance(m, Mlt)
    assert (m.doc_id, m.mintf, m.mindf) == (42, 1, 3)
    ps = local_query("{!payload_score f=text func=sum "
                     "includeSpanScore=true}merge sort")
    assert isinstance(ps, PayloadScore)
    assert ps.func == "sum" and ps.include_span_score is True
    pc = local_query("{!payload_check f=text payloads='1 2'}m s")
    assert isinstance(pc, PayloadCheck)
    assert pc.payloads == ("1", "2")
    gt = local_query("{!graphTerms maxDocFreq=7}a,b,c")
    assert isinstance(gt, GraphTerms)
    assert gt.terms == ("a", "b", "c") and gt.max_doc_freq == 7
    xc = local_query("{!xcjf fromIndex=events from=u to=d}t:v")
    assert isinstance(xc, XCJoin)
    assert xc.from_index == "events"


def test_spec_parser_errors():
    for bad in ["{!collapse}", "{!geofilt sfield=l pt=1,2}",
                "{!mlt}not_an_id", "{!payload_score f=t func=oops}m",
                "{!payload_check f=t}m", "{!hash}",
                "{!hash_range f=a}", "{!graphTerms}",
                "{!xcjf from=a to=b}x:y"]:
        with pytest.raises(LocalParamsError):
            local_query(bad)


def test_routing_parsers_match_direct_calls():
    from lucene_solr_spark.search.complexphrase import \
        parse_complex_phrase
    from lucene_solr_spark.search.simple_parser import parse_simple
    from lucene_solr_spark.search.surround import parse_surround
    from lucene_solr_spark.search.xmlparser import parse_xml
    assert local_query("{!simple}merge +sort") \
        == parse_simple("merge +sort")
    assert local_query("{!surround}merge 3w sort") \
        == parse_surround("merge 3w sort")
    assert local_query('{!complexphrase}"ha* join"') \
        == parse_complex_phrase('"ha* join"')
    assert local_query("{!xmlparser}<TermQuery>merge</TermQuery>") \
        == parse_xml("<TermQuery>merge</TermQuery>")
    assert local_query("{!xport}merge") == local_query("merge")
