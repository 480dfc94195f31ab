"""Solr ML streaming expressions -> Spark DataFrame plans.

Two of the reference's "analytics" stream decorators operate on an
indexed text field plus a binary outcome column:

* ``featuresSelection(...)`` (solr/solrj/src/java/org/apache/solr/
  client/solrj/io/stream/FeaturesSelectionStream.java:60) ranks terms
  by information gain against the outcome.  The per-term score is
  computed by the ``igain`` query parser (solr/core/src/java/org/
  apache/solr/search/IGainTermsQParserPlugin.java:156-205):

      pc       = numPositiveDocs / numDocs
      H(p)     = -p ln p - (1-p) ln(1-p)      (0 when p is 0 or 1)
      docFreq  = xc + nc        (positive + negative docs with term)
      score    = H(pc) - ( (docFreq/numDocs) * H(xc/docFreq)
                 + (1 - docFreq/numDocs)
                   * H((numPositiveDocs - xc) / (numDocs - docFreq + 1)) )

  and each emitted tuple carries ``idf_d = ln(numDocs / (docFreq+1))``
  (FeaturesSelectionStream.java:371).

* ``train(...)`` (solr/solrj/src/java/org/apache/solr/client/solrj/io/
  stream/TextLogitStream.java:80) fits a logistic regression over
  those term features.  The per-shard pass (solr/core/src/java/org/
  apache/solr/search/TextLogisticRegressionQParserPlugin.java:168-213)
  builds, for every matching doc that contains at least one feature
  term, the vector

      x[0] = 1.0 ;  x[j+1] = idf[j] * (1 + ln(tf_j))   (term present)

  with initial weights all 1.0 (:97), then applies
  ``w -= alpha * (sigmoid(w.x) - y) * x`` per doc and reports
  ``error = sum |sigmoid(w_start.x) - y|`` against the iteration-START
  weights; the coordinator averages the per-shard weight vectors
  (TextLogitStream.java:461-472).

  Divergence (documented, deliberate): the reference updates ``w``
  doc-by-doc WITHIN a shard (order-dependent stochastic GD) and then
  averages across shards.  Here each iteration is one full-batch
  gradient step from the iteration-start weights —

      w <- w - alpha * sum_docs (sigmoid(w_start.x) - y) * x

  i.e. exactly the limit of the reference's shard-averaging scheme as
  every doc becomes its own shard.  This form is deterministic and
  partition-order independent (each step is ONE map-side-combined
  aggregate; no sequential scan), which is what makes it a 100 TB
  plan: k+2 doubles cross the wire per partition per iteration.  The
  ``error`` definition matches the reference exactly (start weights).

Both operators are pure JVM-side DataFrame plans: a semi-join of the
postings to the label set, one hash aggregate per pass, and a
broadcast of the (tiny) corpus totals.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def _binary_entropy(p):
    """H(p) in nats with the reference's 0/1 guard
    (IGainTermsQParserPlugin.java:203-205)."""
    return F.when((p <= 0.0) | (p >= 1.0), F.lit(0.0)).otherwise(
        -p * F.log(p) - (1.0 - p) * F.log(1.0 - p))


def features_selection(postings: DataFrame, labels: DataFrame,
                       num_terms: int,
                       feature_set: str = "features") -> DataFrame:
    """Information-gain feature selection.

    ``postings``: (term, docid, ...) — one row per (doc, term);
    ``labels``:   (docid, outcome) with outcome already mapped to 0/1
    (the reference's positiveLabel comparison,
    TextLogisticRegressionQParserPlugin.java:160).

    Returns the FeaturesSelectionStream tuple shape: id, index_i,
    term_s, score_f, featureSet_s, idf_d — top ``num_terms`` by score
    (ties broken by term ascending to keep the stream deterministic;
    the reference's TreeSet comparator breaks ties by term as well,
    IGainTermsQParserPlugin.java:236-240).
    """
    tot = labels.agg(
        F.count("*").cast("double").alias("n"),
        F.sum("outcome").cast("double").alias("npos"))
    per_term = (postings.select("term", "docid").distinct()
                .join(labels, "docid")
                .groupBy("term")
                .agg(F.count("*").cast("double").alias("df"),
                     F.sum("outcome").cast("double").alias("xc")))
    j = per_term.crossJoin(F.broadcast(tot))
    h_c = _binary_entropy(F.col("npos") / F.col("n"))
    h_in = _binary_entropy(F.col("xc") / F.col("df"))
    h_out = _binary_entropy(
        (F.col("npos") - F.col("xc")) / (F.col("n") - F.col("df") + 1.0))
    scored = j.select(
        "term",
        (h_c - ((F.col("df") / F.col("n")) * h_in
                + (1.0 - F.col("df") / F.col("n")) * h_out))
        .alias("score_f"),
        F.log(F.col("n") / (F.col("df") + 1.0)).alias("idf_d"),
        "df")
    w = Window.orderBy(F.desc("score_f"), F.asc("term"))
    return (scored
            .withColumn("index_i", F.row_number().over(w).cast("long"))
            .filter(F.col("index_i") <= num_terms)
            .select(
                F.concat(F.lit(feature_set + "_"),
                         F.col("index_i").cast("string")).alias("id"),
                "index_i",
                F.col("term").alias("term_s"),
                "score_f",
                F.lit(feature_set).alias("featureSet_s"),
                "idf_d"))


def train_logit(postings: DataFrame, labels: DataFrame,
                terms: list[str], *, alpha: float = 0.01,
                max_iterations: int = 3,
                n_docs: int | None = None) -> DataFrame:
    """Batch-gradient logistic regression over term features (see the
    module docstring for the exact reference semantics and the one
    documented divergence).

    ``terms`` plays the role of the featuresSelection input stream;
    idf_d is recomputed here with the identical formula so the two
    stages compose exactly as TextLogitStream consumes them
    (TextLogitStream.java:426-434).

    Returns one row per (iteration, weight index): iteration_i, idx,
    weight (value AFTER the iteration's step), error (the reference's
    iteration-start totalError).  alpha defaults to the reference's
    0.01 (TextLogisticRegressionQParserPlugin.java:80).
    """
    spark = postings.sparkSession
    if n_docs is None:
        n_docs = labels.count()
    dfs = {r["term"]: r["df"] for r in
           (postings.filter(F.col("term").isin(terms))
            .groupBy("term")
            .agg(F.countDistinct("docid").alias("df")).collect())}
    idfs = [math.log(n_docs / (dfs.get(t, 0) + 1.0)) for t in terms]

    # per-doc feature vectors; only docs containing >=1 feature term
    # participate (the reference builds docVectors postings-first:
    # TextLogisticRegressionQParserPlugin.java:170-193)
    feats = (postings.filter(F.col("term").isin(terms))
             .groupBy("docid")
             .agg(*[F.max(F.when(F.col("term") == t,
                                 F.lit(idfs[j]) * (1.0 + F.log("tf"))))
                    .alias(f"x{j + 1}")
                    for j, t in enumerate(terms)])
             .na.fill(0.0)
             .join(labels, "docid")
             .persist())

    k = len(terms)
    weights = [1.0] * (k + 1)
    rows = []
    for it in range(1, max_iterations + 1):
        z = F.lit(weights[0])
        for j in range(k):
            z = z + F.lit(weights[j + 1]) * F.col(f"x{j + 1}")
        sig = 1.0 / (1.0 + F.exp(-z))
        err = (sig - F.col("outcome")).alias("e")
        g = feats.select(err, *[F.col(f"x{j + 1}") for j in range(k)])
        agg = g.agg(
            F.sum(F.abs("e")).alias("err"),
            F.sum("e").alias("g0"),
            *[F.sum(F.col("e") * F.col(f"x{j + 1}")).alias(f"g{j + 1}")
              for j in range(k)]).collect()[0]
        weights = [weights[j] - alpha * agg[f"g{j}"]
                   for j in range(k + 1)]
        rows += [(it, j, weights[j], float(agg["err"]))
                 for j in range(k + 1)]
    feats.unpersist()
    return spark.createDataFrame(
        rows, "iteration_i long, idx long, weight double, error double")
