"""Round-3g ops: facet stream, seeded random stream, FIM split plan,
multilingual alpha-sampling."""

import math

import pytest

SF = "/root/testdata/sf0.001"


def _mk_eval(spark):
    from lucene_solr_spark.search.streams import StreamEvaluator
    return StreamEvaluator(
        {"documents": spark.read.parquet(f"{SF}/documents.parquet")})


# ---------------------------------------------------------------------------
# facet stream (FacetStream.java)
# ---------------------------------------------------------------------------

def test_facet_stream_python_twin(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").collect()
    agg = {}
    for r in docs:
        k = (r["lang"], r["source"])
        c, s = agg.get(k, (0, 0))
        agg[k] = (c + 1, s + r["n_chars"])
    want = sorted(((l, s, c, t) for (l, s), (c, t) in agg.items()),
                  key=lambda x: (-x[2], x[0], x[1]))[:12]

    ev = _mk_eval(spark)
    out = ev.eval('facet(documents, q="*:*", buckets="lang,source", '
                  'bucketSorts="count(*) desc, lang asc, source asc", '
                  'bucketSizeLimit=12, count(*), sum(n_chars), '
                  'avg(n_chars))').collect()
    got = [(r["lang"], r["source"], r["count"], r["sum_n_chars"])
           for r in out]
    assert got == want
    for r in out:
        assert math.isclose(r["avg_n_chars"],
                            r["sum_n_chars"] / r["count"], rel_tol=1e-12)


def test_facet_stream_accepts_flat_alias_sorts(spark):
    """bucketSorts accepts flattened metric aliases too."""
    ev = _mk_eval(spark)
    a = ev.eval('facet(documents, q="*:*", buckets="lang", '
                'bucketSorts="sum(n_chars) desc", count(*), '
                'sum(n_chars))').collect()
    b = ev.eval('facet(documents, q="*:*", buckets="lang", '
                'bucketSorts="sum_n_chars desc", count(*), '
                'sum(n_chars))').collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    sums = [r["sum_n_chars"] for r in a]
    assert sums == sorted(sums, reverse=True)


# ---------------------------------------------------------------------------
# random stream (RandomStream.java + RandomSortField order)
# ---------------------------------------------------------------------------

def test_random_stream_is_seeded_hash_topk(spark):
    from lucene_solr_spark.search.randomsort import wang_hash32
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    want = set(sorted(ids, key=lambda d: wang_hash32(d + 13))[:20])

    ev = _mk_eval(spark)
    out = ev.eval('random(documents, q="*:*", rows=20, '
                  'fl="doc_id,source", seed=13)').collect()
    assert {r["doc_id"] for r in out} == want
    assert len(out) == 20
    # a different seed draws a different sample
    out2 = ev.eval('random(documents, q="*:*", rows=20, '
                   'fl="doc_id,source", seed=14)').collect()
    assert {r["doc_id"] for r in out2} != want


# ---------------------------------------------------------------------------
# fim_split (arXiv:2207.14255)
# ---------------------------------------------------------------------------

def test_fim_split_python_twin(spark):
    from lucene_solr_spark.search.randomsort import wang_hash32
    from lucene_solr_spark.textops.ops import fim_split
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    meta = {r["doc_id"]: r["n_chars"]
            for r in docs.select("doc_id", "n_chars").collect()}

    got = {r["doc_id"]: r for r in fim_split(docs).collect()}
    assert set(got) == set(meta)
    n_fim = 0
    for d, n in meta.items():
        h1 = wang_hash32(d + 101) % (n + 1)
        h2 = wang_hash32(d + 202) % (n + 1)
        h3 = wang_hash32(d + 303)
        fim = (h3 % 100) < 50
        u, v = min(h1, h2), max(h1, h2)
        r = got[d]
        assert r["fim"] == fim
        if fim:
            n_fim += 1
            assert r["mode"] == ("psm" if (h3 >> 1) % 2 == 0 else "spm")
            assert (r["p_len"], r["m_len"], r["s_len"]) == \
                (u, v - u, n - v)
        else:
            assert r["mode"] == "none"
            assert (r["p_len"], r["m_len"], r["s_len"]) == (n, 0, 0)
        assert r["p_len"] + r["m_len"] + r["s_len"] == n
    # the FIM rate actually bites (~50%)
    assert 0.3 <= n_fim / len(meta) <= 0.7


# ---------------------------------------------------------------------------
# alpha_sample (XLM-R arXiv:1911.02116 §3.1)
# ---------------------------------------------------------------------------

def test_alpha_sample_python_twin(spark):
    from lucene_solr_spark.analysis.analyzers import simple_tokenize
    from lucene_solr_spark.textops.ops import alpha_sample
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    toks = {}
    for r in docs.select("lang", "text").collect():
        toks[r["lang"]] = toks.get(r["lang"], 0) + \
            len(simple_tokenize(r["text"]))
    total = float(sum(toks.values()))
    sp = {l: math.sqrt(t / total) for l, t in toks.items()}
    z = sum(sp.values())

    got = {r["lang"]: r for r in alpha_sample(docs).collect()}
    assert set(got) == set(toks)
    for l in toks:
        r = got[l]
        assert r["tokens"] == toks[l]
        assert math.isclose(r["p"], toks[l] / total, abs_tol=1e-6)
        assert math.isclose(r["q"], sp[l] / z, abs_tol=1e-6)
        assert math.isclose(r["boost"],
                            (sp[l] / z) / (toks[l] / total),
                            abs_tol=1e-5)
    # temperature flattening: q sums to 1; low-resource boosts > 1,
    # the largest language is down-sampled
    assert math.isclose(sum(r["q"] for r in got.values()), 1.0,
                        abs_tol=1e-5)
    hi = max(toks, key=lambda l: toks[l])
    lo = min(toks, key=lambda l: toks[l])
    assert got[hi]["boost"] < 1.0 < got[lo]["boost"]
