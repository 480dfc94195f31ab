"""Round-3 scale fixes: LSH hot-bucket cap + window_dedup hashed key.

The flagship MinHash+LSH dedup must survive a skewed 100 TB corpus: a
boilerplate bucket with 10^4-10^6 members must NOT fan out into 10^8+
candidate pairs. These tests pin the cap policy (keep the bucket_cap
lowest doc ids; 'drop' removes the bucket), its invariance on
non-skewed corpora, and the no-silent-truncation audit view.
"""
import pytest

from pyspark.sql import functions as F

from lucene_solr_spark.textops import ops as textops


def _hot_corpus(spark, n_dup=10_000, n_normal=20):
    """n_dup identical boilerplate docs (one LSH hot bucket in every
    band) plus a few distinct docs."""
    boiler = ("accept all cookies to continue reading this site uses "
              "cookies privacy policy terms of service apply here")
    rows = [(i, boiler) for i in range(n_dup)]
    rows += [(n_dup + i,
              f"unique document number {i} about topic {i * 7} with "
              f"specific content alpha{i} beta{i} gamma{i}")
             for i in range(n_normal)]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def hot_df(spark):
    df = _hot_corpus(spark).repartition(8).persist()
    df.count()
    return df


def test_hot_bucket_pairs_bounded(hot_df):
    """10^4-member hot bucket completes with exactly C(cap,2) pairs
    from the retained sample — not C(10^4,2) ~ 5*10^7."""
    cap = 64
    pairs = textops.minhash_lsh_pairs(hot_df, bucket_cap=cap)
    got = pairs.count()
    # all boilerplate docs are identical => every retained candidate
    # pair verifies at jaccard 1.0; the cap keeps ids 0..cap-1
    assert got == cap * (cap - 1) // 2
    mx = pairs.agg(F.max("doc_b")).first()[0]
    assert mx == cap - 1  # lowest-ids policy is deterministic


def test_hot_bucket_drop_policy(hot_df):
    """on_hot='drop' removes oversize buckets entirely: the
    boilerplate mass contributes zero pairs."""
    pairs = textops.minhash_lsh_pairs(hot_df, bucket_cap=64,
                                      on_hot="drop")
    assert pairs.filter(F.col("doc_b") < 10_000).count() == 0


def test_hot_bucket_audit_view(hot_df):
    """lsh_hot_buckets logs every bounded bucket with its drop count
    (no silent truncation): the identical docs share one bucket per
    band => 4 rows, each dropping n_dup - cap members."""
    hot = textops.lsh_hot_buckets(hot_df, bucket_cap=64).collect()
    assert len(hot) == 4  # one hot bucket in each of the 4 bands
    for r in hot:
        assert r["bucket_size"] == 10_000
        assert r["n_dropped"] == 10_000 - 64


def test_cap_invariant_without_skew(spark):
    """On a corpus with no bucket over the cap, capped == uncapped
    (the default-cap path cannot change small-corpus results)."""
    rows = []
    for i in range(60):
        base = f"shared prefix tokens {i % 6} " * 3
        rows.append((i, base + f"tail {i} omega{i}"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, textops.minhash_lsh_pairs(
        df, bucket_cap=textops.LSH_BUCKET_CAP).collect()))
    b = sorted(map(tuple, textops.minhash_lsh_pairs(
        df, bucket_cap=10 ** 9).collect()))
    assert a == b


def test_dup_clusters_on_hot_corpus(hot_df):
    """Label propagation over the capped pair graph: the retained
    boilerplate sample forms ONE cluster labeled by doc 0."""
    cl = textops.dup_clusters(hot_df)
    big = (cl.groupBy("cluster").count()
           .orderBy(F.desc("count")).first())
    assert big["cluster"] == 0
    assert big["count"] == textops.LSH_BUCKET_CAP


def test_window_dedup_hashed_key(spark):
    """Hashed-window groupBy key: counts identical to the raw-string
    formulation (cross-checked by construction: doc 1 repeats doc 0's
    16-token run, doc 2 is disjoint)."""
    run = " ".join(f"tok{i}" for i in range(16))
    df = spark.createDataFrame(
        [(0, run + " extra0 " + run),
         (1, "lead1 lead2 " + run),
         (2, " ".join(f"other{i}" for i in range(20)))],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           textops.window_dedup(df).collect()}
    # doc 0: 33 tokens -> 18 windows; the run repeats within the doc
    # and in doc 1, so windows covering a full run occurrence are dup
    assert out[0]["flagged"] and out[1]["flagged"]
    assert not out[2]["flagged"]
    assert out[2]["dup_windows"] == 0
    assert out[1]["n_windows"] == 3  # 18 tokens -> 3 windows
    # the pure-run window (positions aligned to a run start) is shared
    assert out[1]["dup_windows"] >= 1


def test_cap_compiles_to_mapside_window_group_limit(spark):
    """The bucket cap must stay a WindowGroupLimit with a PARTIAL
    stage (enforced map-side, before the exchange) — the property
    that makes the skew fix free at 100 TB."""
    df = spark.createDataFrame([(i, f"doc {i} text body {i}") for i
                                in range(30)],
                               "doc_id long, text string")
    plan = textops.minhash_lsh_pairs(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "WindowGroupLimit" in plan
    assert "Partial" in plan


def test_window_dedup_shuffles_hash_not_strings(spark):
    """window_dedup's groupBy key must be the xxhash64 long computed
    inside the explode projection — the raw window string must never
    reach an Exchange."""
    df = spark.createDataFrame(
        [(0, " ".join(f"t{i}" for i in range(40)))],
        "doc_id long, text string")
    plan = textops.window_dedup(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "xxhash64" in plan
    # the count-groupBy exchange partitions on the hashed long w#..L
    import re as _re
    assert _re.search(r"hashpartitioning\(w#\d+L", plan)
