"""Round-3b ops: C4 blocklist signals, conversation signals, MMR
diversity rerank, IVFADC (IVF + residual PQ) — law tests (driver
parity in tools/verify_contract.py)."""

import math

import pytest

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# badword_counts
# ---------------------------------------------------------------------------

def test_badwords_counts_and_flag(spark):
    from lucene_solr_spark.textops.ops import badword_counts
    df = spark.createDataFrame(
        [(0, "slow dup slow clean"), (1, "all clean here"), (2, "")],
        "doc_id long, text string")
    rows = {r.doc_id: r for r in
            badword_counts(df, ("slow", "dup", "fail")).collect()}
    assert rows[0].n_bad == 3            # slow x2 + dup
    assert rows[0].n_bad_types == 2      # slow, dup (fail absent)
    assert rows[0].bad_free is False
    assert rows[1].n_bad == 0 and rows[1].bad_free is True
    assert rows[2].n_bad == 0 and rows[2].bad_free is True


def test_badwords_is_case_insensitive_via_tokenizer(spark):
    from lucene_solr_spark.textops.ops import badword_counts
    df = spark.createDataFrame([(0, "SLOW Dup")],
                               "doc_id long, text string")
    r = badword_counts(df, ("slow", "dup")).collect()[0]
    assert r.n_bad == 2 and r.n_bad_types == 2


# ---------------------------------------------------------------------------
# conv_signals
# ---------------------------------------------------------------------------

def test_conv_signals_aggregates(spark):
    from lucene_solr_spark.textops.ops import conv_signals
    # conv 0: docs 0..3 (turn parity: user/asst/user/asst)
    df = spark.createDataFrame(
        [(0, "a b c"), (1, "d e"), (2, "f"), (3, "g h i j")],
        "doc_id long, text string")
    r = conv_signals(df, turns_per_conv=4).collect()
    assert len(r) == 1
    row = r[0]
    assert row.conv_id == 0 and row.n_turns == 4
    assert row.user_tokens == 4   # 3 + 1 (turns 0, 2)
    assert row.asst_tokens == 6   # 2 + 4 (turns 1, 3)
    assert row.asst_share == round(6 / 10, 6)


def test_conv_signals_zero_token_conversation(spark):
    from lucene_solr_spark.textops.ops import conv_signals
    df = spark.createDataFrame([(0, ""), (1, "")],
                               "doc_id long, text string")
    row = conv_signals(df, turns_per_conv=2).collect()[0]
    assert row.user_tokens == 0 and row.asst_tokens == 0
    assert row.asst_share == 0.0


# ---------------------------------------------------------------------------
# MMR rerank
# ---------------------------------------------------------------------------

def _mmr_brute(cands, sims, k, lam):
    """Independent python model of the greedy."""
    sel, out = [], []
    rem = sorted(cands)
    for rank in range(min(k, len(rem))):
        best = None
        for c in rem:
            pen = max((sims[(c, s)] for s in sel), default=0.0)
            sc = round(lam * cands[c] - (1 - lam) * pen, 6)
            if best is None or sc > best[1]:
                best = (c, sc)
        sel.append(best[0])
        rem.remove(best[0])
        out.append((rank + 1, best[0], best[1]))
    return out


def test_mmr_first_pick_is_top_relevance(spark):
    import __spark_entry__ as e
    rows = sorted(e._v_mmr(spark, SF).collect(),
                  key=lambda r: r.sel_rank)
    from lucene_solr_spark.vector.ann import cosine_topk
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    top1 = cosine_topk(emb, e._MMR_Q, 1).collect()[0]
    assert rows[0].vec_id == top1.vec_id
    assert rows[0].mmr == round(e._MMR_LAM * top1.cos, 6)


def test_mmr_matches_python_model(spark):
    """Engine greedy == independent python greedy over the SAME
    rounded rel/sim inputs."""
    import __spark_entry__ as e
    from pyspark.sql import functions as F
    from lucene_solr_spark.vector.ann import DOT, cosine_topk
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cand = cosine_topk(emb, e._MMR_Q, e._MMR_N)
    rel = {r.vec_id: r.cos for r in cand.collect()}
    ids = list(rel)
    sub = emb.filter(F.col("vec_id").isin(ids))
    a = sub.select(F.col("vec_id").alias("a"),
                   F.col("embedding").alias("va"))
    b = sub.select(F.col("vec_id").alias("b"),
                   F.col("embedding").alias("vb"))
    cos = (f"ROUND(({DOT.format(a='va', b='vb')}) / "
           f"(sqrt({DOT.format(a='va', b='va')}) * "
           f"sqrt({DOT.format(a='vb', b='vb')})), 6)")
    sims = {(r.a, r.b): r.sim for r in
            a.join(b, F.col("a") != F.col("b"))
            .select("a", "b", F.expr(cos).alias("sim")).collect()}
    want = _mmr_brute(rel, sims, e._MMR_K, e._MMR_LAM)
    got = [(r.sel_rank, r.vec_id, r.mmr)
           for r in sorted(e._v_mmr(spark, SF).collect(),
                           key=lambda r: r.sel_rank)]
    assert got == want


def test_mmr_selection_is_diverse(spark):
    """MMR must differ from pure relevance order whenever the
    top-relevance set contains near-duplicates; at minimum the
    selected set has no exact duplicates and is k-sized."""
    import __spark_entry__ as e
    rows = e._v_mmr(spark, SF).collect()
    ids = [r.vec_id for r in rows]
    assert len(ids) == e._MMR_K == len(set(ids))


# ---------------------------------------------------------------------------
# IVFADC
# ---------------------------------------------------------------------------

def test_ivf_pq_candidates_come_from_probed_cells(spark):
    import __spark_entry__ as e
    from pyspark.sql import functions as F
    from lucene_solr_spark.vector.ann import ivf_assign
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    res = e._v_ivf_pq(spark, SF).collect()
    assert 0 < len(res) <= 10
    asg = {r.vec_id: r.cent_id
           for r in ivf_assign(emb, e._IVF_STRIDE).collect()}
    cells = {asg[r.vec_id] for r in res}
    assert len(cells) <= e._IVFPQ_NPROBE


def test_ivf_pq_adist_is_sum_of_subspace_luts(spark):
    """ADC law: every returned adist equals the sum over m of the
    query-residual-to-code distances — recomputed with numpy."""
    import numpy as np
    import __spark_entry__ as e
    from lucene_solr_spark.vector.ann import ivf_assign
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64)
            for r in emb.collect()}
    stride, stride2, m, nprobe = (e._IVF_STRIDE, e._IVFPQ_STRIDE2,
                                  e._IVFPQ_M, e._IVFPQ_NPROBE)
    asg = {r.vec_id: r.cent_id
           for r in ivf_assign(emb, stride).collect()}
    resid = {v: vecs[v] - vecs[asg[v]] for v in vecs}
    dsub = len(next(iter(vecs.values()))) // m
    rc_ids = sorted(v for v in vecs if v % stride2 == 0)

    def subs(x, mi):
        return x[mi * dsub:(mi + 1) * dsub]

    def code(v, mi):
        ds = {c: round(float(np.sum((subs(resid[v], mi)
                                     - subs(resid[c], mi)) ** 2)), 6)
              for c in rc_ids}
        return min(ds, key=lambda c: (ds[c], c))

    q = e._PQ_Q
    qcos = {c: round(float(np.dot(vecs[q], vecs[c])
                           / (np.linalg.norm(vecs[q])
                              * np.linalg.norm(vecs[c]))), 6)
            for c in vecs if c % stride == 0}
    probed = sorted(qcos, key=lambda c: (-qcos[c], c))[:nprobe]
    for r in e._v_ivf_pq(spark, SF).collect():
        cell = asg[r.vec_id]
        assert cell in probed
        qr = vecs[q] - vecs[cell]
        want = round(sum(
            round(float(np.sum((subs(qr, mi)
                                - subs(resid[code(r.vec_id, mi)], mi))
                               ** 2)), 6)
            for mi in range(m)), 6)
        assert math.isclose(r.adist, want, abs_tol=2e-6), \
            (r.vec_id, r.adist, want)
