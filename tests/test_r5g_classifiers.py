"""Round-3 classification variants: BM25NBClassifier and
KNearestFuzzyClassifier (the reference module's last unported named
classes) plus the shared NearestFuzzyQuery acceptance predicate."""
import duckdb
import pytest

from __spark_entry__ import (
    _nfq_accept_sql, adjacent_swap_sql, queries)
from lucene_solr_spark.search.query import osa_distance

SF = "/root/testdata/sf0.001"


def _duck_pairs(pred_sql, pairs):
    con = duckdb.connect()
    vals = ", ".join(
        f"('{t}', '{s}')" for t, s in pairs)
    rows = con.execute(
        f"SELECT t, s FROM (VALUES {vals}) x(t, s) "
        f"WHERE {pred_sql.replace('ts.term', 't').replace('s.src', 's')}"
    ).fetchall()
    return {(a, b) for a, b in rows}


def test_adjacent_swap_duckdb_matches_osa():
    vocab = ["table", "tabel", "tbale", "talbe", "tale", "tables",
             "cable", "ab", "ba", "aa", "a", "abcd", "abdc", "acbd"]
    pairs = [(t, s) for t in vocab for s in vocab]
    pred = adjacent_swap_sql("t", "s", "duckdb")
    got = _duck_pairs(pred, pairs)
    want = {(t, s) for t, s in pairs
            if t != s and len(t) == len(s)
            and any(t[:i] == s[:i] and t[i] == s[i + 1]
                    and t[i + 1] == s[i] and t[i + 2:] == s[i + 2:]
                    for i in range(len(s) - 1))}
    assert got == want


def test_nfq_accept_duckdb_is_prefix_plus_osa1():
    vocab = ["table", "tabel", "tale", "tables", "cable", "tbale",
             "stable", "tab", "ta", "t", "tavle", "tales"]
    pairs = [(t, s) for t in vocab for s in vocab]
    pred = _nfq_accept_sql("t", "s", "duckdb")
    got = _duck_pairs(pred, pairs)
    want = set()
    for t, s in pairs:
        p = min(2, len(s))
        if t[:p] == s[:p] and osa_distance(t, s) <= 1:
            want.add((t, s))
    assert got == want


def test_spark_duckdb_swap_predicates_agree(spark):
    import random
    rng = random.Random(11)
    vocab = sorted({"".join(rng.choice("abc") for _ in
                            range(rng.randint(1, 5)))
                    for _ in range(120)})
    pairs = [(t, s) for t in vocab for s in vocab]
    duck = _duck_pairs(_nfq_accept_sql("t", "s", "duckdb"), pairs)
    df = spark.createDataFrame(pairs, "t string, s string")
    from pyspark.sql import functions as F
    got = {(r["t"], r["s"]) for r in df.filter(
        F.expr(_nfq_accept_sql("t", "s", "spark"))).collect()}
    assert got == duck


@pytest.fixture(scope="module")
def bm25nb_rows(spark):
    return queries()["q_classify_bm25nb"](spark, SF).collect()


def test_bm25nb_probabilities(bm25nb_rows):
    by_doc = {}
    for r in bm25nb_rows:
        by_doc.setdefault(r["doc_id"], []).append(r["prob"])
    assert len(by_doc) == 6
    for doc, ps in by_doc.items():
        assert abs(sum(ps) - 1.0) < 1e-4      # softmax normalizes
        assert all(0.0 <= p <= 1.0 for p in ps)


def test_knn_fuzzy_shape(spark):
    rows = queries()["q_classify_knn_fuzzy"](spark, SF).collect()
    assert rows, "no classes returned"
    assert sum(r["n"] for r in rows) <= 10    # k neighbors
    assert all(0.0 < r["score"] <= 1.0 + 1e-9 for r in rows)
    # scores are sums of score/maxScore over <=k neighbors / k
    assert rows == sorted(rows, key=lambda r: (-r["score"], r["cls"]))
