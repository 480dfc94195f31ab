"""Vector similarity search over an embedding column.

Brute-force cosine top-k as the exact baseline (the oracle-checkable
path), built from JVM higher-order functions — no Python in the loop.

Scale path (10^9+ vectors): LSH bucketing — random-hyperplane signatures
computed with the same zip_with/aggregate kernel, groupBy(bucket) join
with the probe's bucket, then exact re-rank inside buckets. The
brute-force kernel below is the re-rank stage of that plan; the LSH
candidate generation is lsh_bucket_topk.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DOT = ("aggregate(zip_with({a}, {b}, (x, y) -> "
       "CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)")


def cosine_topk(emb: DataFrame, query_vec_id: int, k: int = 10,
                id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k of all vectors vs. one probe vector.

    The probe row is a 1-row broadcast cross join; the dot product and
    norms run inside whole-stage codegen via zip_with/aggregate.
    """
    probe = (emb.filter(F.col(id_col) == query_vec_id)
             .select(F.col(vec_col).alias("q")))
    cand = emb.filter(F.col(id_col) != query_vec_id).crossJoin(
        F.broadcast(probe))
    dot = DOT.format(a=vec_col, b="q")
    na = DOT.format(a=vec_col, b=vec_col)
    nb = DOT.format(a="q", b="q")
    cos = f"({dot}) / (sqrt({na}) * sqrt({nb}))"
    scored = cand.select(
        F.col(id_col).cast("long").alias(id_col),
        F.expr(f"ROUND({cos}, 6)").alias("cos"))
    return (scored.orderBy(F.desc("cos"), F.asc(id_col)).limit(k))


def cosine_topk_vec(emb: DataFrame, qvec, k: int = 10,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """Exact top-k vs a LITERAL query vector — the Solr ``{!knn}``
    execution shape (solr/core/.../search/neural/KnnQParserPlugin.java:
    the request carries the vector; no corpus row is the probe).
    Score is VectorSimilarityFunction.COSINE's normalized
    ``(1 + cos) / 2`` (lucene/core/.../index/VectorSimilarityFunction
    .java), the value DenseVectorField reports as the hit score.

    The literal folds into the plan as an array constant, so the scan
    is ONE whole-stage-codegen pass with no join at all — at 10^9+
    vectors route the same kernel through the LSH/IVF candidate
    generators instead of the full scan.
    """
    lit = "array(" + ", ".join(f"CAST({float(x)!r} AS DOUBLE)"
                               for x in qvec) + ")"
    dot = DOT.format(a=vec_col, b=lit)
    na = DOT.format(a=vec_col, b=vec_col)
    nb = DOT.format(a=lit, b=lit)
    cos = f"({dot}) / (sqrt({na}) * sqrt({nb}))"
    scored = emb.select(
        F.col(id_col).cast("long").alias(id_col),
        F.expr(f"ROUND((1.0 + {cos}) / 2.0, 6)").alias("score"))
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def cosine_pairs(emb: DataFrame, top_n: int = 20, id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-duplicate pairs: top-N most-similar pairs
    (a < b). Brute-force O(n^2) exact baseline; the scale path runs the
    same kernel after lsh bucket candidate generation."""
    # norms are precomputed ONCE per vector before the pair fan-out
    # (the naive per-pair form recomputes each O(dim) self-dot n times
    # — measured 3x the kernel cost at sf0.1); sqrt placement keeps the
    # expression bit-identical to sqrt(self_dot)*sqrt(self_dot)
    na0 = "sqrt(" + DOT.format(a=vec_col, b=vec_col) + ")"
    a = emb.select(F.col(id_col).alias("vec_a"),
                   F.col(vec_col).alias("ea"),
                   F.expr(na0).alias("sna"))
    b = emb.select(F.col(id_col).alias("vec_b"),
                   F.col(vec_col).alias("eb"),
                   F.expr(na0).alias("snb"))
    cand = a.crossJoin(b).filter(F.col("vec_a") < F.col("vec_b"))
    dot = DOT.format(a="ea", b="eb")
    cos = f"({dot}) / (sna * snb)"
    return (cand.select(
        F.col("vec_a").cast("long"), F.col("vec_b").cast("long"),
        F.expr(f"ROUND({cos}, 6)").alias("cos"))
        .orderBy(F.desc("cos"), F.asc("vec_a"), F.asc("vec_b"))
        .limit(top_n))


def hyperplanes(n_planes: int, dim: int) -> list:
    """Deterministic pseudo-random hyperplanes shared by engine and
    oracle: component i of plane j = hexval(md5(f"{j}:{i}")[0]) - 7.5,
    reproducible in any md5-equipped system."""
    import hashlib
    out = []
    for j in range(n_planes):
        row = []
        for i in range(dim):
            h = hashlib.md5(f"{j}:{i}".encode()).hexdigest()[0]
            row.append(int(h, 16) - 7.5)
        out.append(row)
    return out


def lsh_signature_expr(vec_col: str, planes: list) -> str:
    """SQL int expression: bit j = 1 iff dot(vec, plane_j) >= 0."""
    bits = []
    for j, row in enumerate(planes):
        arr = "array(" + ", ".join(repr(x) for x in row) + ")"
        dot = DOT.format(a=vec_col, b=arr)
        bits.append(f"(CASE WHEN ({dot}) >= 0 THEN {1 << j} ELSE 0 END)")
    return "CAST(" + " + ".join(bits) + " AS BIGINT)"


def lsh_bucket_topk(emb: DataFrame, query_vec_id: int, k: int = 10,
                    n_planes: int = 6, id_col: str = "vec_id",
                    vec_col: str = "embedding",
                    dim: int | None = None) -> DataFrame:
    """ANN via random-hyperplane LSH: exact cosine re-rank restricted
    to the probe's bucket (approximate — may differ from exact top-k;
    deterministic given the fixed hyperplanes). At scale the bucket
    column is a partition key (see ``partition_by_bucket``), so a probe
    touches one bucket's partitions instead of the full corpus.

    Pass ``dim`` explicitly (it is part of the table contract); the
    schema-probe fallback costs one driver round-trip and exists only
    for ad-hoc exploration."""
    if dim is None:
        dim = len(emb.select(vec_col).first()[0])
    planes = hyperplanes(n_planes, dim)
    sig = lsh_signature_expr(vec_col, planes)
    with_sig = emb.withColumn("bucket", F.expr(sig))
    probe = (with_sig.filter(F.col(id_col) == query_vec_id)
             .select(F.col(vec_col).alias("q"),
                     F.col("bucket").alias("qb")))
    cand = (with_sig.filter(F.col(id_col) != query_vec_id)
            .crossJoin(F.broadcast(probe))
            .filter(F.col("bucket") == F.col("qb")))
    dot = DOT.format(a=vec_col, b="q")
    na = DOT.format(a=vec_col, b=vec_col)
    nb = DOT.format(a="q", b="q")
    cos = f"({dot}) / (sqrt({na}) * sqrt({nb}))"
    return (cand.select(
        F.col(id_col).cast("long").alias(id_col),
        F.expr(f"ROUND({cos}, 6)").alias("cos"))
        .orderBy(F.desc("cos"), F.asc(id_col)).limit(k))


def partition_by_bucket(emb: DataFrame, n_planes: int, dim: int,
                        vec_col: str = "embedding") -> DataFrame:
    """Materialization helper for the 10^9+-vector layout: add the LSH
    ``bucket`` column and hash-partition on it, so bucket-restricted
    probes and pair generation shuffle once at write time and every
    probe afterwards is partition-pruned (write with
    ``.write.partitionBy('bucket')`` for directory-level pruning)."""
    planes = hyperplanes(n_planes, dim)
    return (emb.withColumn("bucket",
                           F.expr(lsh_signature_expr(vec_col, planes)))
            .repartition("bucket"))


def cosine_pairs_lsh(emb: DataFrame, top_n: int = 20, n_planes: int = 6,
                     dim: int = 64, id_col: str = "vec_id",
                     vec_col: str = "embedding",
                     bucket_cap: int = 4096) -> DataFrame:
    """Embedding near-duplicate pairs with LSH candidate generation —
    the 100 TB path: vectors pair only within their hyperplane bucket
    (an equi-join on the bucket key, candidates ~ O(near-dups)), then
    exact cosine re-ranks the candidates. Same output contract as the
    brute-force ``cosine_pairs`` restricted to same-bucket pairs;
    recall vs brute force is probabilistic in the plane count
    (tests/test_newops.py pins it on the fixture corpora).

    Hot buckets are bounded at ``bucket_cap`` members (keep the cap
    lowest vec_ids — deterministic, oracle-identical; same skew policy
    as ``textops.minhash_lsh_pairs``): with few hyperplanes a mass of
    boilerplate-near vectors lands in one bucket and the self-join
    would emit O(size^2) pairs from that bucket alone."""
    from pyspark.sql.window import Window
    planes = hyperplanes(n_planes, dim)
    sig = lsh_signature_expr(vec_col, planes)
    # norm hoisted out of the within-bucket pair fan-out (see
    # cosine_pairs); identical sqrt placement keeps scores bit-equal
    nrm = "sqrt(" + DOT.format(a=vec_col, b=vec_col) + ")"
    wb = emb.select(F.col(id_col), F.col(vec_col),
                    F.expr(sig).alias("bucket"),
                    F.expr(nrm).alias("nn"))
    wb = (wb.withColumn(
            "_rn", F.row_number().over(
                Window.partitionBy("bucket").orderBy(id_col)))
          .filter(F.col("_rn") <= bucket_cap).drop("_rn"))
    a = wb.select(F.col(id_col).alias("vec_a"),
                  F.col(vec_col).alias("ea"), "bucket",
                  F.col("nn").alias("sna"))
    b = wb.select(F.col(id_col).alias("vec_b"),
                  F.col(vec_col).alias("eb"), "bucket",
                  F.col("nn").alias("snb"))
    cand = a.join(b, "bucket").filter(F.col("vec_a") < F.col("vec_b"))
    dot = DOT.format(a="ea", b="eb")
    cos = f"({dot}) / (sna * snb)"
    return (cand.select(
        F.col("vec_a").cast("long"), F.col("vec_b").cast("long"),
        F.expr(f"ROUND({cos}, 6)").alias("cos"))
        .orderBy(F.desc("cos"), F.asc("vec_a"), F.asc("vec_b"))
        .limit(top_n))


def ivf_assign(emb: DataFrame, stride: int = 37, id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """IVF coarse quantization (the IVF-Flat index-build step): assign
    every vector to its nearest centroid by cosine.

    The coarse codebook is deterministic — every ``stride``-th vector by
    id is a centroid — so the engine and the SQL oracle build the exact
    same structure with no training RNG. At 10^9+ vectors the centroid
    set stays small (n/stride with a cap in practice), so assignment is
    a broadcast nested-loop scored in whole-stage codegen plus ONE
    partial/final max_by aggregate keyed by vec_id (map-side combine —
    only per-partition winners are exchanged); the materialized layout
    partitions by ``cent_id`` the same way ``partition_by_bucket`` does
    for LSH, making a probe touch only ``nprobe`` posting lists.

    Ties and float noise are handled the engine's standard way: cosine
    ROUND(,6) DESC then cent_id ASC (same rule in the oracle).
    """
    # both norms hoisted out of the vector x centroid fan-out (same
    # bit-identical sqrt(self_dot) expression, computed once per row
    # instead of once per pair — the cosine_pairs lesson)
    scn = "sqrt(" + DOT.format(a="cv", b="cv") + ")"
    cents = (emb.filter((F.col(id_col) % stride) == 0)
             .select(F.col(id_col).alias("cent_id"),
                     F.col(vec_col).alias("cv"))
             .withColumn("scn", F.expr(scn)))
    svn = "sqrt(" + DOT.format(a=vec_col, b=vec_col) + ")"
    dot = DOT.format(a=vec_col, b="cv")
    ccos = f"ROUND(({dot}) / (svn * scn), 6)"
    scored = (emb.withColumn("svn", F.expr(svn))
              .crossJoin(F.broadcast(cents))
              .select(id_col, vec_col, "cent_id",
                      F.expr(ccos).alias("ccos")))
    # argmax via max_by on (ccos, -cent_id): lexicographic struct max =
    # highest cosine, then lowest cent_id — the same tie rule as the
    # oracle. Unlike a row_number window (which shuffles EVERY
    # vector x centroid row), groupBy gets map-side partial
    # aggregation: only per-partition winners reach the exchange —
    # at 10^9 vectors x 10^3 cells that is the difference between
    # shuffling 10^12 rows and 10^9.
    return (scored.groupBy(id_col)
            .agg(F.max_by(
                    F.col("cent_id"),
                    F.struct(F.col("ccos"),
                             (-F.col("cent_id")).alias("neg")))
                 .alias("cent_id"),
                 F.first(vec_col).alias(vec_col))
            .select(id_col, vec_col, "cent_id"))


def ssl_prune(emb: DataFrame, stride: int = 37, keep_frac: float = 0.5,
              id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """SSL-prototype data pruning — D4's second stage (Tirumala et al.
    2023, arXiv:2308.12284 "D4: Improving LLM Pretraining via Document
    De-Duplication and Diversification"; metric from Sorscher et al.
    2022, arXiv:2206.14486 "Beyond neural scaling laws"): cluster the
    embeddings, score each point by its cosine to the assigned
    centroid (prototypicality), and PRUNE the most prototypical —
    easy, redundant — examples, keeping the ``keep_frac`` least
    prototypical per cluster (ceil, ties id ASC).

    Clustering reuses the deterministic IVF stride codebook
    (:func:`ivf_assign` — the papers use k-means; same shape, no
    training RNG, so the DuckDB oracle rebuilds it exactly).

    Scale shape: assignment is the ivf_assign broadcast fan-out +
    map-side argmax; prototypicality adds ONE broadcast join to the
    tiny centroid table; ranking is a window PARTITIONED BY cell
    (per-cell sorts, never global).

    Output: (vec_id, cent_id, proto, kept).
    """
    a = ivf_assign(emb, stride, id_col, vec_col)
    scn = "sqrt(" + DOT.format(a="cv", b="cv") + ")"
    cents = (emb.filter((F.col(id_col) % stride) == 0)
             .select(F.col(id_col).alias("cent_id"),
                     F.col(vec_col).alias("cv"))
             .withColumn("scn", F.expr(scn)))
    svn = "sqrt(" + DOT.format(a=vec_col, b=vec_col) + ")"
    dot = DOT.format(a=vec_col, b="cv")
    proto = f"ROUND(({dot}) / (({svn}) * scn), 6)"
    p = (a.join(F.broadcast(cents), "cent_id")
         .select(F.col(id_col), "cent_id",
                 F.expr(proto).alias("proto")))
    w_rank = Window.partitionBy("cent_id").orderBy(
        F.asc("proto"), F.asc(id_col))
    w_all = Window.partitionBy("cent_id")
    return (p.withColumn("rk", F.row_number().over(w_rank))
            .withColumn("nc", F.count("*").over(w_all))
            .select(F.col(id_col).cast("long").alias(id_col),
                    F.col("cent_id").cast("long").alias("cent_id"),
                    "proto",
                    (F.col("rk") <= F.ceil(F.col("nc")
                                           * float(keep_frac)))
                    .alias("kept")))


def ivf_topk(emb: DataFrame, query_vec_id: int, k: int = 10,
             stride: int = 37, nprobe: int = 2, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """IVF-Flat ANN search: probe the ``nprobe`` nearest centroids to
    the query, exact-cosine re-rank only the vectors assigned to those
    cells (candidates ~ nprobe/n_cells of the corpus instead of all of
    it). Approximate by construction; deterministic given the stride
    codebook, so the DuckDB oracle reproduces it bit-for-bit."""
    asg = ivf_assign(emb, stride, id_col, vec_col)
    cents = (emb.filter((F.col(id_col) % stride) == 0)
             .select(F.col(id_col).alias("cent_id"),
                     F.col(vec_col).alias("cv")))
    sqn = "sqrt(" + DOT.format(a="qv", b="qv") + ")"
    q = (emb.filter(F.col(id_col) == query_vec_id)
         .select(F.col(vec_col).alias("qv"))
         .withColumn("sqn", F.expr(sqn)))
    dot = DOT.format(a="cv", b="qv")
    nc = DOT.format(a="cv", b="cv")
    qcos = f"ROUND(({dot}) / (sqrt({nc}) * sqn), 6)"
    probe = (cents.crossJoin(F.broadcast(q))
             .select("cent_id", F.expr(qcos).alias("qcos"))
             .orderBy(F.desc("qcos"), F.asc("cent_id")).limit(nprobe)
             .select("cent_id"))
    cand = (asg.join(F.broadcast(probe), "cent_id")
            .filter(F.col(id_col) != query_vec_id)
            .crossJoin(F.broadcast(q)))
    dot = DOT.format(a=vec_col, b="qv")
    na = DOT.format(a=vec_col, b=vec_col)
    cos = f"({dot}) / (sqrt({na}) * sqn)"
    return (cand.select(
        F.col(id_col).cast("long").alias(id_col),
        F.expr(f"ROUND({cos}, 6)").alias("cos"))
        .orderBy(F.desc("cos"), F.asc(id_col)).limit(k))


def semdedup(emb: DataFrame, stride: int = 37, tau: float = 0.95,
             id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication — cluster the embeddings, then within each cluster
    drop every member of a near-identical group except one.

    The clustering step reuses the deterministic IVF coarse codebook
    (:func:`ivf_assign`; the paper uses k-means — same shape, no
    training RNG, so the DuckDB oracle rebuilds it exactly).  Within a
    cluster a vector is a semantic duplicate when some LOWER-id vector
    in the same cluster has cosine >= tau to it (the paper keeps the
    member with the lowest centroid similarity; the low-id keeper is
    the deterministic, tie-safe variant with the same dedup rate).

    Scale shape: assignment is ivf_assign's broadcast nested loop with
    a map-side-combined argmax.  The pair stage self-joins WITHIN a
    cluster only — both sides shuffle once on cent_id and the cost is
    sum over clusters of size² dot products (the paper's exact cost
    model), never corpus². The flag is a distinct + left join — no
    window, no collect. At 10^9 vectors, cap cluster size via a finer
    codebook (smaller stride) — the knob the paper tunes for the same
    reason.
    """
    asg = ivf_assign(emb, stride, id_col, vec_col)
    a = asg.select(F.col("cent_id"), F.col(id_col).alias("a_id"),
                   F.col(vec_col).alias("av"))
    b = asg.select(F.col("cent_id"), F.col(id_col).alias("b_id"),
                   F.col(vec_col).alias("bv"))
    dot = DOT.format(a="av", b="bv")
    na = DOT.format(a="av", b="av")
    nb = DOT.format(a="bv", b="bv")
    cos = f"ROUND(({dot}) / (sqrt({na}) * sqrt({nb})), 6)"
    dropped = (a.join(b, "cent_id")
               .filter(F.col("a_id") < F.col("b_id"))
               .filter(F.expr(cos) >= tau)
               .select(F.col("b_id").alias(id_col)).distinct()
               .withColumn("is_dup", F.lit(True)))
    return (asg.join(dropped, id_col, "left")
            .select(F.col(id_col).cast("long").alias(id_col),
                    F.col("cent_id").cast("long").alias("cent_id"),
                    F.coalesce("is_dup", F.lit(False)).alias("is_dup")))


_L2SQ = ("aggregate(zip_with({a}, {b}, (x, y) -> "
         "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * "
         "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), 0D, "
         "(acc, v) -> acc + v)")


def _pq_subspaces(emb: DataFrame, m: int, id_col: str,
                  vec_col: str, out_id: str) -> DataFrame:
    """Explode each vector into its M contiguous subvectors (one codegen
    transform + explode; dsub is derived in-plan from size(vec), no
    driver dim probe)."""
    sub = (f"transform(sequence(0, {m} - 1), mi -> struct(mi AS m, "
           f"slice({vec_col}, mi * (size({vec_col}) DIV {m}) + 1, "
           f"size({vec_col}) DIV {m}) AS sub))")
    return (emb.select(F.col(id_col).alias(out_id),
                       F.explode(F.expr(sub)).alias("s"))
            .select(out_id, "s.m", "s.sub"))


def pq_encode(emb: DataFrame, stride: int = 37, m: int = 8,
              id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """Product quantization encode (Jegou, Douze, Schmid 2011 "Product
    Quantization for Nearest Neighbor Search", IEEE TPAMI §III): split
    each vector into M contiguous subvectors and replace each with the
    id of its nearest (L2) centroid in a per-subspace codebook — the
    compression layer under IVF-PQ, the standard way to fit 10^9+
    vectors in memory.  The codebook reuses the deterministic stride
    convention of :func:`ivf_assign` (every ``stride``-th vector's
    subvectors are the centroids; the paper trains per-subspace
    k-means — same shape, no RNG, so the DuckDB oracle rebuilds it
    bit-identically).

    Returns one row per (vec_id, m) with the assigned ``code`` (the
    centroid's vec_id) and the rounded subspace distance.

    Scale shape: the codebook is K*M tiny rows (broadcast); encode is
    a broadcast nested loop over subspaces scored in whole-stage
    codegen and reduced by ONE partial+final min_by aggregate keyed by
    (vec_id, m) — the same single-shuffle profile as ivf_assign, M×
    the rows.  Argmin ties break to the lowest centroid id via the
    rounded distance, the engine's standard determinism contract.
    """
    subs = _pq_subspaces(emb, m, id_col, vec_col, id_col)
    cents = _pq_subspaces(
        emb.filter(F.col(id_col) % stride == 0), m, id_col, vec_col,
        "cent_id").withColumnRenamed("sub", "csub")
    d = _L2SQ.format(a="sub", b="csub")
    scored = (subs.join(F.broadcast(cents), "m")
              .select(id_col, "m", "cent_id",
                      F.expr(f"ROUND({d}, 6)").alias("d")))
    w = Window.partitionBy(id_col, "m").orderBy(F.asc("d"),
                                                F.asc("cent_id"))
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(F.col(id_col).cast("long").alias(id_col),
                    F.col("m").cast("int").alias("m"),
                    F.col("cent_id").cast("long").alias("code"), "d"))


def pq_topk(emb: DataFrame, query_vec_id: int, k: int = 10,
            stride: int = 37, m: int = 8, id_col: str = "vec_id",
            vec_col: str = "embedding") -> DataFrame:
    """PQ asymmetric distance (ADC) top-k (Jegou et al. 2011 §III.C):
    the query stays unquantized; each database vector's approximate
    distance is the sum over subspaces of the PRECOMPUTED distance from
    the query's subvector to the vector's assigned centroid.  One M*K
    lookup table replaces all exact distance math — the reason PQ
    search is memory-bandwidth- not FLOP-bound at scale.

    Scale shape: the lookup table is M*K rows built from the broadcast
    codebook and the 1-row query (no scan); the database side touches
    only the (vec_id, m, code) code table — 8 bytes/subspace instead of
    the raw floats — with one equi-join on (m, code) against the
    broadcast table and one per-vector partial+final sum.  Per-subspace
    distances are rounded to 6 before summing so engine and oracle rank
    identically.
    """
    codes = pq_encode(emb, stride, m, id_col, vec_col)
    qsubs = _pq_subspaces(
        emb.filter(F.col(id_col) == query_vec_id), m, id_col, vec_col,
        "qid").withColumnRenamed("sub", "qsub")
    cents = _pq_subspaces(
        emb.filter(F.col(id_col) % stride == 0), m, id_col, vec_col,
        "cent_id").withColumnRenamed("sub", "csub")
    d = _L2SQ.format(a="qsub", b="csub")
    lut = (cents.join(F.broadcast(qsubs), "m")
           .select("m", F.col("cent_id").alias("code"),
                   F.expr(f"ROUND({d}, 6)").alias("qd")))
    return (codes.filter(F.col(id_col) != query_vec_id)
            .join(F.broadcast(lut), ["m", "code"])
            .groupBy(id_col)
            .agg(F.round(F.sum("qd"), 6).alias("adist"))
            .orderBy(F.asc("adist"), F.asc(id_col)).limit(k))


def knn_graph(nodes: DataFrame, m: int = 4, id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """Exact M-nearest-neighbor graph over ``nodes`` (the layer-0
    adjacency a Lucene HNSW index stores — Lucene99HnswVectorsFormat
    keeps per-node neighbor lists; HnswGraphBuilder.java caps them at
    M).  Each node's M neighbors by (cosine DESC round-6, id ASC).

    Exact all-pairs is quadratic in the node count and is the right
    tool ONLY for the sampled node set used here and for verification;
    the 100 TB construction path is candidate generation via the same
    LSH bucketing as ``cosine_pairs_lsh`` (join buckets, keep top-M per
    src) — identical downstream schema, so the searcher below is
    agnostic to how the graph was built.
    """
    a = nodes.select(F.col(id_col).alias("src"),
                     F.col(vec_col).alias("va"))
    b = nodes.select(F.col(id_col).alias("dst"),
                     F.col(vec_col).alias("vb"))
    dot = DOT.format(a="va", b="vb")
    na = DOT.format(a="va", b="va")
    nb = DOT.format(a="vb", b="vb")
    cos = f"ROUND(({dot}) / (sqrt({na}) * sqrt({nb})), 6)"
    pairs = (a.crossJoin(b).filter(F.col("src") != F.col("dst"))
             .select("src", "dst", F.expr(cos).alias("cos_sd")))
    w = Window.partitionBy("src").orderBy(F.desc("cos_sd"),
                                          F.asc("dst"))
    return (pairs.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= m).drop("rn"))


def nsw_greedy_search(emb: DataFrame, graph: DataFrame,
                      query_vec_id: int, entry_id: int, hops: int = 3,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """Greedy graph-descent search (the layer-0 walk of
    HnswGraphSearcher.java / Malkov & Yashunin arXiv:1603.09320, beam
    width 1 with a visited set): starting at ``entry_id``, each hop
    moves to the unvisited neighbor of the current node closest to the
    query by (cosine DESC round-6, id ASC).  Returns the visit chain
    as (hop, vec_id, cos).

    Plan shape: the query-side cosines are ONE broadcast of the 1-row
    probe onto the graph's node set; each hop is a tiny equi-join of
    the (1-row) frontier into the adjacency list plus a left-anti join
    against the visited rows — per-hop cost is O(M), independent of
    corpus size, exactly the property that makes graph ANN the
    low-latency serving structure at scale.
    """
    probe = (emb.filter(F.col(id_col) == query_vec_id)
             .select(F.col(vec_col).alias("q")))
    nodes = (graph.select(F.col("src").alias(id_col)).distinct()
             .join(emb, id_col))
    dot = DOT.format(a=vec_col, b="q")
    na = DOT.format(a=vec_col, b=vec_col)
    nb = DOT.format(a="q", b="q")
    qc = (nodes.crossJoin(F.broadcast(probe))
          .select(F.col(id_col).cast("long").alias(id_col),
                  F.expr(f"ROUND(({dot}) / (sqrt({na}) * sqrt({nb})),"
                         " 6)").alias("cos"))
          .persist())
    cur = qc.filter(F.col(id_col) == entry_id).withColumn(
        "hop", F.lit(0).cast("long"))
    out = [cur]
    visited = cur.select(id_col)
    for h in range(1, hops + 1):
        cand = (graph.join(out[-1].select(F.col(id_col).alias("src")),
                           "src")
                .join(visited.select(F.col(id_col).alias("dst")),
                      "dst", "left_anti")
                .select(F.col("dst").alias(id_col)))
        nxt = (cand.join(qc, id_col)
               .orderBy(F.desc("cos"), F.asc(id_col)).limit(1)
               .withColumn("hop", F.lit(h).cast("long")))
        out.append(nxt)
        visited = visited.union(nxt.select(id_col))
    res = out[0]
    for f in out[1:]:
        res = res.union(f)
    return res.select("hop", id_col, "cos")


def nsw_beam_search(emb: DataFrame, graph: DataFrame,
                    query_vec_id: int, entry_id: int, hops: int = 2,
                    ef: int = 3, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """Beam (efSearch > 1) graph search — the quality knob of
    HnswGraphSearcher.java (the NeighborQueue of size ef that
    ``nsw_greedy_search`` collapses to 1): each hop expands the WHOLE
    current frontier's neighbors, dedups, drops visited nodes, and
    keeps the ef best by (cosine DESC round-6, id ASC).  A fixed hop
    count replaces the reference's converge-when-candidates-are-worse
    stop rule (documented simplification — termination is
    data-dependent there, bounded here).  Returns (hop, vec_id, cos)
    for every visited node.

    Plan shape per hop: frontier (<= ef rows) equi-joined into the
    adjacency list (fan-out <= ef*M), one distinct, one anti-join
    against visited, one top-ef — all tiny broadcastable frames, so
    per-hop cost is O(ef*M) independent of corpus size.
    """
    probe = (emb.filter(F.col(id_col) == query_vec_id)
             .select(F.col(vec_col).alias("q")))
    nodes = (graph.select(F.col("src").alias(id_col)).distinct()
             .join(emb, id_col))
    dot = DOT.format(a=vec_col, b="q")
    na = DOT.format(a=vec_col, b=vec_col)
    nb = DOT.format(a="q", b="q")
    qc = (nodes.crossJoin(F.broadcast(probe))
          .select(F.col(id_col).cast("long").alias(id_col),
                  F.expr(f"ROUND(({dot}) / (sqrt({na}) * sqrt({nb})),"
                         " 6)").alias("cos"))
          .persist())
    cur = qc.filter(F.col(id_col) == entry_id).withColumn(
        "hop", F.lit(0).cast("long"))
    out = [cur]
    visited = cur.select(id_col)
    frontier = cur
    for h in range(1, hops + 1):
        cand = (graph.join(frontier.select(F.col(id_col).alias("src")),
                           "src")
                .select(F.col("dst").alias(id_col)).distinct()
                .join(visited, id_col, "left_anti"))
        nxt = (cand.join(qc, id_col)
               .orderBy(F.desc("cos"), F.asc(id_col)).limit(ef)
               .withColumn("hop", F.lit(h).cast("long")))
        out.append(nxt)
        visited = visited.union(nxt.select(id_col))
        frontier = nxt
    res = out[0]
    for f in out[1:]:
        res = res.union(f)
    return res.select("hop", id_col, "cos")


L2SQ = ("aggregate(zip_with({a}, {b}, (x, y) -> "
        "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * "
        "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), 0D, "
        "(acc, v) -> acc + v)")


def l2_topk(emb: DataFrame, query_vec_id: int, k: int = 10,
            id_col: str = "vec_id",
            vec_col: str = "embedding") -> DataFrame:
    """Exact euclidean top-k with Lucene's EUCLIDEAN score transform
    score = 1 / (1 + ||v - q||^2) (VectorSimilarityFunction.EUCLIDEAN
    in Lucene 9+, public semantics — the graded kNN score surface;
    computed here in float64 both-backends rather than Lucene's
    float32).  Same plan shape as cosine_topk: 1-row broadcast probe,
    squared distance inside whole-stage codegen via zip_with/aggregate,
    TakeOrderedAndProject top-k — no Python, no extra shuffle.
    """
    probe = (emb.filter(F.col(id_col) == query_vec_id)
             .select(F.col(vec_col).alias("q")))
    cand = emb.filter(F.col(id_col) != query_vec_id).crossJoin(
        F.broadcast(probe))
    d2 = L2SQ.format(a=vec_col, b="q")
    scored = cand.select(
        F.col(id_col).cast("long").alias(id_col),
        F.expr(f"ROUND(1D / (1D + {d2}), 6)").alias("score"))
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def bq_sig_sql(vec_col: str, dim: int) -> tuple[str, str]:
    """Spark-SQL (lo, hi) 32-bit-half sign signatures of ``vec_col``:
    bit i of the packed BIGINT is set iff dim i's component is > 0 —
    1-bit (sign) quantization, the identity-basis member of the
    sign-random-projection family (Charikar 2002 SimHash; the 1-bit
    end of the scalar-quantization ladder Lucene ships as
    lucene/core/.../lucene99/Lucene99ScalarQuantizedVectorsFormat.java).
    Two halves keep every shift < 63 so the identical arithmetic runs
    on engines that trap on BIGINT shift overflow."""
    half = dim // 2
    lo = (f"aggregate(sequence(1, {half}), 0L, (acc, i) -> acc + "
          f"IF(element_at({vec_col}, i) > 0, shiftleft(1L, i - 1), 0L))")
    hi = (f"aggregate(sequence({half + 1}, {dim}), 0L, (acc, i) -> acc "
          f"+ IF(element_at({vec_col}, i) > 0, "
          f"shiftleft(1L, i - {half + 1}), 0L))")
    return lo, hi


def bq_materialize(emb: DataFrame, dim: int = 64,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """The 10^9+-vector layout for binary quantization: the (id, slo,
    shi) 16-byte signature table, computed once and written/persisted
    so every probe's candidate pass scans signatures only (1/16th the
    float-row bytes) — the quantized sidecar Lucene's
    Lucene99ScalarQuantizedVectorsFormat keeps next to the raw
    vectors.  Probe it with the same Hamming expression ``bq_topk``
    builds, then join survivors back to the float table by id for the
    exact rerank."""
    lo, hi = bq_sig_sql(vec_col, dim)
    return emb.select(F.col(id_col), F.expr(lo).alias("slo"),
                      F.expr(hi).alias("shi"))


def bq_topk(emb: DataFrame, query_vec_id: int, k: int = 10,
            n_candidates: int = 50, dim: int = 64,
            id_col: str = "vec_id", vec_col: str = "embedding"
            ) -> DataFrame:
    """Binary-quantized ANN: sign-bit signatures + Hamming-distance
    candidate generation + exact-cosine rerank of the survivors.

    Scale shape: only ``n_candidates`` full vectors are reranked, and
    the candidate pass is XOR+POPCNT per comparison.  NOTE: computed
    inline (as here) the candidate scan still reads the float column
    to derive signatures; the 100 TB layout MATERIALIZES the 16-byte
    signature table once (``bq_materialize``) so the candidate pass
    streams 1/16th the bytes and the float column is read only for
    the rerank semi-join.  Returns (vec_id, hamming, cos) — cos is
    the exact rerank score.
    """
    lo, hi = bq_sig_sql(vec_col, dim)
    sigs = emb.select(F.col(id_col), F.expr(lo).alias("slo"),
                      F.expr(hi).alias("shi"))
    qsig = (sigs.filter(F.col(id_col) == query_vec_id)
            .select(F.col("slo").alias("qlo"), F.col("shi").alias("qhi")))
    ham = (sigs.filter(F.col(id_col) != query_vec_id)
           .crossJoin(F.broadcast(qsig))
           .select(F.col(id_col),
                   F.expr("bit_count(slo ^ qlo) + bit_count(shi ^ qhi)")
                   .cast("long").alias("hamming"))
           .orderBy(F.asc("hamming"), F.asc(id_col))
           .limit(n_candidates))
    probe = (emb.filter(F.col(id_col) == query_vec_id)
             .select(F.col(vec_col).alias("q")))
    cand = (emb.join(ham, id_col).crossJoin(F.broadcast(probe)))
    dot = DOT.format(a=vec_col, b="q")
    na = DOT.format(a=vec_col, b=vec_col)
    nb = DOT.format(a="q", b="q")
    cos = f"({dot}) / (sqrt({na}) * sqrt({nb}))"
    return (cand.select(F.col(id_col).cast("long").alias(id_col),
                        "hamming",
                        F.expr(f"ROUND({cos}, 6)").alias("cos"))
            .orderBy(F.desc("cos"), F.asc(id_col)).limit(k))


def hard_negatives(emb: DataFrame, probe_ids: list, k: int = 5,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   label_col: str = "label") -> DataFrame:
    """Hard-negative mining for retrieval training (DPR, Karpukhin et
    al. 2020 arXiv:2004.04906 §3.2 "hard negatives from the retriever";
    ANCE, Xiong et al. 2020 arXiv:2007.00808): for each probe vector,
    the top-k most-cosine-similar vectors whose ``label_col``
    DIFFERS from the probe's — the near-misses a contrastive loss
    learns the most from.

    Returns (probe_id, neg_id, cos, rank) with rank 1..k per probe.

    Scale shape: the probe set (a training micro-batch, O(10^2-10^3)
    rows) broadcasts against ONE corpus scan — cosine in codegen via
    zip_with/aggregate, per-probe top-k as a window over probe-
    partitioned candidates (each partition holds one probe's
    candidates, so the sort is per-probe, never global).  At 100 TB
    this is the same plan as brute-force kNN; the documented upgrade
    is feeding the candidate set from the IVF/LSH/BQ stages above
    instead of the full scan.
    """
    probes = (emb.filter(F.col(id_col).isin([int(p) for p in probe_ids]))
              .select(F.col(id_col).alias("probe_id"),
                      F.col(vec_col).alias("q"),
                      F.col(label_col).alias("q_label")))
    cand = (emb.crossJoin(F.broadcast(probes))
            .filter((F.col(label_col) != F.col("q_label"))
                    & (F.col(id_col) != F.col("probe_id"))))
    dot = DOT.format(a=vec_col, b="q")
    na = DOT.format(a=vec_col, b=vec_col)
    nb = DOT.format(a="q", b="q")
    cos = f"ROUND(({dot}) / (sqrt({na}) * sqrt({nb})), 6)"
    scored = cand.select(F.col("probe_id").cast("long"),
                         F.col(id_col).cast("long").alias("neg_id"),
                         F.expr(cos).alias("cos"))
    w = Window.partitionBy("probe_id").orderBy(F.desc("cos"),
                                               F.asc("neg_id"))
    return (scored.withColumn("rank",
                              F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
            .orderBy("probe_id", "rank"))


def maxsim_topk(emb: DataFrame, query_doc: int, k: int = 5,
                group: int = 5, id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """ColBERT-style MaxSim late interaction (Khattab & Zaharia 2020,
    arXiv:2004.12832 §3.1): a document is a BAG of token vectors and
    score(q, d) = sum over query tokens of max over doc tokens of the
    token-pair similarity (cosine here).  Multi-vector documents are
    synthesized deterministically by grouping ``group`` consecutive
    vector ids (mvdoc = vec_id div group); the query is one such doc.

    Returns (doc, maxsim) top-k, doc-ASC ties.

    Scale shape: the query's token bag (a handful of rows) broadcasts
    against ONE corpus scan with per-row norms precomputed before the
    fan-out; the max and sum are two partial-aggregable groupBys keyed
    by (doc, qtok) then doc.  At 100 TB the corpus side streams once —
    the documented upgrade is feeding candidate docs from a first-pass
    single-vector ANN (the official ColBERT candidate-generation
    design) so the late interaction touches only survivors.
    """
    nrm = "sqrt(" + DOT.format(a=vec_col, b=vec_col) + ")"
    docs = emb.select(
        (F.col(id_col) / group).cast("long").alias("doc"),
        F.col(id_col), F.col(vec_col), F.expr(nrm).alias("nn"))
    qtoks = (docs.filter(F.col("doc") == query_doc)
             .select(F.col(id_col).alias("qtok"),
                     F.col(vec_col).alias("qv"),
                     F.col("nn").alias("qn")))
    dot = DOT.format(a=vec_col, b="qv")
    cand = (docs.filter(F.col("doc") != query_doc)
            .crossJoin(F.broadcast(qtoks))
            .select("doc", "qtok",
                    F.expr(f"({dot}) / (nn * qn)").alias("cos")))
    mx = cand.groupBy("doc", "qtok").agg(F.max("cos").alias("m"))
    return (mx.groupBy("doc")
            .agg(F.round(F.sum("m"), 6).alias("maxsim"))
            .orderBy(F.desc("maxsim"), F.asc("doc")).limit(k))


def mmr_rerank(emb: DataFrame, query_vec_id: int, k: int = 5,
               top_n: int = 12, lam: float = 0.7,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """Maximal Marginal Relevance diversity rerank (Carbonell &
    Goldstein 1998, "The Use of MMR, Diversity-Based Reranking for
    Reordering Documents and Producing Summaries", SIGIR '98): greedily
    select k results maximizing
    ``lambda * rel(d) - (1 - lambda) * max_{s in S} sim(d, s)`` —
    the standard diversity pass a training-data pipeline runs when
    sampling examples so near-duplicates don't crowd a batch.

    Scale shape: relevance and the candidate pairwise-similarity
    matrix are DISTRIBUTED plans (the same broadcast-probe +
    whole-stage-codegen cosine as cosine_topk; pairs are top_n^2 rows,
    never corpus^2). Only the greedy tail — O(k * top_n) comparisons
    over <= top_n rows of pre-rounded doubles — runs in one
    applyInPandas group, exactly the TopDocs.merge shape (per-segment
    work distributed, a k-row final selection on one worker).

    Determinism: rel and sim are ROUND(,6) in-plan BEFORE the greedy;
    the greedy compares round(mmr, 6) with ties to the lowest vec_id,
    and the first pick (empty S — the similarity term is 0) is the
    highest-relevance candidate. The DuckDB oracle reproduces the
    selection as k chained argmax CTEs over the same rounded inputs.
    """
    import pandas as pd

    probe = (emb.filter(F.col(id_col) == query_vec_id)
             .select(F.col(vec_col).alias("q")))
    dot = DOT.format(a=vec_col, b="q")
    na = DOT.format(a=vec_col, b=vec_col)
    nb = DOT.format(a="q", b="q")
    cos = f"({dot}) / (sqrt({na}) * sqrt({nb}))"
    cand = (emb.filter(F.col(id_col) != query_vec_id)
            .crossJoin(F.broadcast(probe))
            .select(F.col(id_col).cast("long").alias(id_col),
                    F.col(vec_col),
                    F.expr(f"ROUND({cos}, 6)").alias("rel"))
            .orderBy(F.desc("rel"), F.asc(id_col)).limit(top_n))
    a = cand.select(F.col(id_col).alias("a"),
                    F.col(vec_col).alias("va"),
                    "rel")
    b = cand.select(F.col(id_col).alias("b"),
                    F.col(vec_col).alias("vb"))
    pdot = DOT.format(a="va", b="vb")
    pna = DOT.format(a="va", b="va")
    pnb = DOT.format(a="vb", b="vb")
    pcos = f"({pdot}) / (sqrt({pna}) * sqrt({pnb}))"
    pairs = (a.join(b, F.col("a") != F.col("b"))
             .select("a", "rel", "b",
                     F.expr(f"ROUND({pcos}, 6)").alias("sim")))

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        rel = (pdf[["a", "rel"]].drop_duplicates().set_index("a")["rel"]
               .to_dict())
        sim = {(r.a, r.b): r.sim for r in pdf.itertuples()}
        selected, rows = [], []
        remaining = sorted(rel)
        for rank in range(min(k, len(remaining))):
            best = None
            for c in remaining:
                pen = max((sim[(c, s)] for s in selected), default=0.0)
                # floor(x*1e6+0.5)/1e6, NOT round(): lam-scaling of
                # round-6 inputs systematically makes EXACT .5
                # boundaries at the 6th decimal (e.g. 0.5*0.356175),
                # where python round (banker's) and DuckDB ROUND
                # (away from zero) split; the floor form runs the
                # same double ops as the oracle's FLOOR
                score = (math.floor((lam * rel[c]
                                     - (1.0 - lam) * pen)
                                    * 1e6 + 0.5) / 1e6)
                # tie -> lowest vec_id (remaining is id-ascending)
                if best is None or score > best[1]:
                    best = (c, score)
            selected.append(best[0])
            remaining.remove(best[0])
            rows.append((rank + 1, best[0], best[1]))
        return pd.DataFrame(rows, columns=["sel_rank", id_col, "mmr"])

    return (pairs.groupBy(F.lit(1).alias("g"))
            .applyInPandas(greedy,
                           f"sel_rank int, {id_col} long, mmr double"))


def ivf_pq_topk(emb: DataFrame, query_vec_id: int, k: int = 10,
                stride: int = 37, stride2: int = 23, m: int = 4,
                nprobe: int = 2, id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """IVFADC — the composed IVF + residual product quantization
    search of Jegou, Douze & Schmid 2011 §IV (the structure behind
    faiss's IndexIVFPQ and the billion-scale standard): vectors are
    coarse-quantized into inverted lists (ivf_assign), the RESIDUAL
    x - centroid(x) is product-quantized (pq codebook over residual
    subspaces), and a query probes ``nprobe`` lists, computing one
    asymmetric-distance lookup table PER PROBED LIST from its own
    query residual.

    Both codebooks stay deterministic (every stride-th vector is a
    coarse centroid; every stride2-th vector's residual is a residual
    centroid), so the DuckDB oracle rebuilds the identical structure.

    Scale shape: everything the corpus-sized side touches is one scan
    + broadcast joins — coarse assignment (one max_by agg), residual
    encode (broadcast codebook, one min-argmin agg per (vec, m)), and
    the search reads ONLY the probed lists' code rows joined to a
    broadcast nprobe*M*K lookup table, then one partial+final sum per
    candidate. Distances are ROUND(,6) at each stage (assignment cos,
    subspace L2, final ADC sum) so both engines rank identically.
    """
    asg = ivf_assign(emb, stride, id_col, vec_col)
    cents = (emb.filter((F.col(id_col) % stride) == 0)
             .select(F.col(id_col).alias("cent_id"),
                     F.col(vec_col).alias("cv")))
    rexpr = f"zip_with({vec_col}, cv, (x, y) -> CAST(x AS DOUBLE) - y)"
    resid = (asg.join(F.broadcast(cents), "cent_id")
             .select(id_col, "cent_id", F.expr(rexpr).alias("rv")))
    # residual PQ codebook: every stride2-th vector's residual
    rcents = _pq_subspaces(
        resid.filter((F.col(id_col) % stride2) == 0), m, id_col, "rv",
        "rc_id").withColumnRenamed("sub", "csub")
    subs = _pq_subspaces(resid, m, id_col, "rv", id_col)
    d = _L2SQ.format(a="sub", b="csub")
    scored = (subs.join(F.broadcast(rcents), "m")
              .select(id_col, "m", "rc_id",
                      F.expr(f"ROUND({d}, 6)").alias("d")))
    codes = (scored.groupBy(id_col, "m")
             .agg(F.min_by(F.col("rc_id"),
                           F.struct(F.col("d"), F.col("rc_id")))
                  .alias("code")))
    # query side: probe the nprobe nearest coarse cells
    sqn = "sqrt(" + DOT.format(a="qv", b="qv") + ")"
    q = (emb.filter(F.col(id_col) == query_vec_id)
         .select(F.col(vec_col).alias("qv"))
         .withColumn("sqn", F.expr(sqn)))
    dotq = DOT.format(a="cv", b="qv")
    nc = DOT.format(a="cv", b="cv")
    qcos = f"ROUND(({dotq}) / (sqrt({nc}) * sqn), 6)"
    probe = (cents.crossJoin(F.broadcast(q))
             .select("cent_id", "cv", F.expr(qcos).alias("qcos"))
             .orderBy(F.desc("qcos"), F.asc("cent_id")).limit(nprobe))
    # per-probed-cell query residual -> per-cell ADC lookup table
    qrexpr = "zip_with(qv, cv, (x, y) -> CAST(x AS DOUBLE) - y)"
    qres = (probe.crossJoin(F.broadcast(q.select("qv")))
            .select("cent_id", F.expr(qrexpr).alias("qr")))
    qsub2 = (qres.select(
        "cent_id",
        F.explode(F.expr(
            f"transform(sequence(0, {m} - 1), mi -> struct(mi AS m, "
            f"slice(qr, mi * (size(qr) DIV {m}) + 1, "
            f"size(qr) DIV {m}) AS qsub))")).alias("s"))
        .select("cent_id", "s.m", "s.qsub"))
    dq = _L2SQ.format(a="qsub", b="csub")
    lut = (rcents.join(F.broadcast(qsub2), "m")
           .select(F.col("cent_id"), "m",
                   F.col("rc_id").alias("code"),
                   F.expr(f"ROUND({dq}, 6)").alias("qd")))
    cand = (asg.join(F.broadcast(probe.select("cent_id")), "cent_id")
            .filter(F.col(id_col) != query_vec_id)
            .select(id_col, "cent_id"))
    return (cand.join(codes, id_col)
            .join(F.broadcast(lut), ["cent_id", "m", "code"])
            .groupBy(id_col)
            .agg(F.round(F.sum("qd"), 6).alias("adist"))
            .orderBy(F.asc("adist"), F.asc(id_col)).limit(k))
