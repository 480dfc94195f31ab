"""Solr Text Tagger — dictionary tagging of free text.

Reference: solr/core/src/java/org/apache/solr/handler/tagger/
Tagger.java:47 (FST-cursor longest-match tagging of the input token
stream against a dictionary field) and TagClusterReducer.java:32/59
(``overlaps`` parameter: ALL keeps every match, LONGEST_DOMINANT_RIGHT
iteratively keeps the longest tag — rightmost on ties — and removes
overlapping ones).

Spark-first realization: the dictionary is a tiny table (entity /
gazetteer lists), so it is broadcast; the corpus side is one scan:

    tokens -> posexplode -> equi-join on the dictionary's FIRST token
    (broadcast hash join) -> full-slice equality check in codegen
    (slice(tokens, pos+1, n) = dict tokens)

No corpus shuffle at all in ALL mode — tagging is scan-speed, which is
what makes the tagger usable as an entity-extraction pass over 100 TB.
The reducer modes differ only in a per-doc post-step: ALL is the plan
above; LONGEST_DOMINANT_RIGHT applies the reference's reduction per
doc (a python fold over that doc's matches — bounded by matches per
doc, not corpus size).

Divergence note: the reference measures tag length in characters
(TagLL.charLen); here length is in tokens, which for a
whitespace-normalized token stream preserves the same dominance order
except when entries mix very long and very short words.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..analysis.analyzers import simple_tokenize, simple_tokens_col


def _dict_rows(dictionary: dict) -> list:
    rows = []
    for tag_id, phrase in dictionary.items():
        toks = (simple_tokenize(phrase)
                if isinstance(phrase, str) else list(phrase))
        if not toks:
            raise ValueError(f"empty dictionary entry {tag_id!r}")
        rows.append((str(tag_id), toks, toks[0], len(toks)))
    return rows


def tag_text(df: DataFrame, dictionary: dict, id_col: str = "doc_id",
             text_col: str = "text", overlaps: str = "ALL") -> DataFrame:
    """Tag every dictionary phrase occurrence in every document.

    ``dictionary``: tag_id -> phrase (string, analyzed here) or token
    tuple.  Returns (id, tag_id, start_pos, end_pos) with 0-based
    token positions, end inclusive.
    """
    if overlaps not in ("ALL", "LONGEST_DOMINANT_RIGHT"):
        raise ValueError(f"unknown overlaps mode {overlaps!r}")
    spark = SparkSession.getActiveSession()
    dic = spark.createDataFrame(
        _dict_rows(dictionary),
        "tag_id string, dtoks array<string>, first_tok string, n int")
    occ = (df.withColumn("tokens", simple_tokens_col(text_col))
           .select(F.col(id_col), "tokens",
                   F.posexplode("tokens").alias("pos", "term")))
    matches = (occ.join(F.broadcast(dic),
                        occ.term == dic.first_tok)
               .filter(F.expr("slice(tokens, pos + 1, n) = dtoks"))
               .select(F.col(id_col), "tag_id",
                       F.col("pos").cast("int").alias("start_pos"),
                       (F.col("pos") + F.col("n") - 1).cast("int")
                       .alias("end_pos")))
    if overlaps == "ALL":
        return matches
    return _reduce_ldr(matches, id_col)


def reduce_ldr_py(tags: list) -> list:
    """TagClusterReducer.LONGEST_DOMINANT_RIGHT (TagClusterReducer.
    java:59): repeatedly mark the longest unmarked tag — ties resolved
    to the RIGHTMOST in start order (the reference's ``>=`` while
    walking the list) — then drop unmarked tags overlapping it.

    ``tags``: list of (start, end, tag_id); returns the kept sublist
    in (start, end, tag_id) order.
    """
    alive = sorted(tags, key=lambda t: (t[0], t[1], t[2]))
    marked = []
    while alive:
        longest_i = None
        for i, t in enumerate(alive):
            ln = t[1] - t[0] + 1
            if longest_i is None or ln >= (alive[longest_i][1]
                                           - alive[longest_i][0] + 1):
                longest_i = i
        longest = alive.pop(longest_i)
        marked.append(longest)
        alive = [t for t in alive
                 if t[1] < longest[0] or t[0] > longest[1]]
    return sorted(marked)


def _reduce_ldr(matches: DataFrame, id_col: str) -> DataFrame:
    """Per-doc reduction: one groupBy collect of that doc's matches
    (bounded by matches-per-doc), reduced by the reference fold."""
    import pandas as pd

    @F.pandas_udf("array<struct<start_pos:int,end_pos:int,tag_id:string>>")
    def red(starts, ends, tags):
        out = []
        for s, e, t in zip(starts, ends, tags):
            kept = reduce_ldr_py(list(zip(s, e, t)))
            out.append([(int(a), int(b), str(c)) for a, b, c in kept])
        return pd.Series(out)

    g = (matches.groupBy(id_col)
         .agg(F.collect_list("start_pos").alias("ss"),
              F.collect_list("end_pos").alias("es"),
              F.collect_list("tag_id").alias("ts")))
    return (g.select(F.col(id_col),
                     F.explode(red("ss", "es", "ts")).alias("m"))
            .select(id_col, F.col("m.tag_id").alias("tag_id"),
                    F.col("m.start_pos").alias("start_pos"),
                    F.col("m.end_pos").alias("end_pos")))
