"""lucene_solr_spark — a PySpark-native inverted-index + BM25 top-k engine.

A from-scratch rebuild of the *capabilities* of Apache Lucene/Solr
(reference: irvingzhang/lucene-solr, Lucene 9.0.0-SNAPSHOT) as an idiomatic
Spark DataFrame pipeline:

- tokenization/analysis via Spark built-ins or vectorized pandas/Arrow UDFs
- inverted index = a postings DataFrame (term -> docid, tf, positions),
  optionally packed into compressed per-term block segments
- BM25 (k1=1.2, b=0.75) top-k with Lucene-exact float32 arithmetic
  (SmallFloat norm quantization, 256-entry norm-inverse cache) and a
  double-precision mode whose math is expressible in ANSI SQL for
  oracle verification
- boolean / phrase / multi-term queries compiled from a small query AST
  to DataFrame plans (joins on docid, position-list intersection)
- segment build + tiered merge + block-max WAND pruning for scale

Nothing here is a port: the reference's segment files, skip lists and
doc-at-a-time scorers are re-expressed as DataFrame plans that Catalyst
can optimize (predicate pushdown on term, broadcast stats joins,
TakeOrderedAndProject top-k).
"""

__version__ = "0.1.0"

K1 = 1.2
B = 0.75
