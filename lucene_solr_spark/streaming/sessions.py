"""Custom stateful streaming operator: conversation sessionization.

``applyInPandasWithState`` over the transcript stream keyed by
conv_id: state accumulates per-conversation turn counts / token totals
/ last-activity time, and a session summary row is emitted when the
conversation goes quiet for ``gap`` (processing-time timeout). This is
the "custom stateful operator" slot the reference has no analogue for
(its incremental path is append-only indexing — SURVEY.md §2.9); a
transcript pipeline needs it for per-conversation rollups feeding
quality filters.

The same summary is computable in batch (group-by) — ``summarize_batch``
— which is the exactness oracle for the state logic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout
from pyspark.sql.types import (
    IntegerType, LongType, StringType, StructField, StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType([
    StructField("conv_id", StringType()),
    StructField("n_turns", LongType()),
    StructField("n_tokens", LongType()),
    StructField("n_roles", IntegerType()),
    StructField("first_ts", TimestampType()),
    StructField("last_ts", TimestampType()),
])

_STATE_SCHEMA = StructType([
    StructField("n_turns", LongType()),
    StructField("n_tokens", LongType()),
    StructField("roles", StringType()),      # '|'-joined distinct roles
    StructField("first_ts", LongType()),     # epoch micros
    StructField("last_ts", LongType()),
])


def _session_fn(key, pdfs, state):
    import pandas as pd

    from ..analysis.analyzers import simple_tokenize

    if state.hasTimedOut:
        n_turns, n_tokens, roles, first_us, last_us = state.get
        state.remove()
        yield pd.DataFrame({
            "conv_id": [key[0]],
            "n_turns": [n_turns],
            "n_tokens": [n_tokens],
            "n_roles": [len(roles.split("|")) if roles else 0],
            "first_ts": [pd.Timestamp(first_us, unit="us")],
            "last_ts": [pd.Timestamp(last_us, unit="us")],
        })
        return
    n_turns, n_tokens, roles, first_us, last_us = (
        state.get if state.exists else (0, 0, "", None, None))
    role_set = set(roles.split("|")) - {""}
    for pdf in pdfs:
        n_turns += len(pdf)
        n_tokens += int(sum(len(simple_tokenize(t))
                            for t in pdf["text"].fillna("")))
        role_set |= set(pdf["role"].dropna())
        ts_us = pd.to_datetime(pdf["ts"]).astype("int64") // 1000
        lo, hi = int(ts_us.min()), int(ts_us.max())
        first_us = lo if first_us is None else min(first_us, lo)
        last_us = hi if last_us is None else max(last_us, hi)
    state.update((n_turns, n_tokens, "|".join(sorted(role_set)),
                  first_us, last_us))
    state.setTimeoutDuration(2000)  # session gap: 2 s of quiescence
    return
    yield  # pragma: no cover — marks this branch as a generator too


def sessionize_stream(stream: DataFrame) -> DataFrame:
    """Streaming transcript rows -> session summaries on conversation
    quiescence (2 s processing-time gap)."""
    return (stream.groupBy("conv_id").applyInPandasWithState(
        _session_fn, SESSION_SCHEMA, _STATE_SCHEMA, "append",
        GroupStateTimeout.ProcessingTimeTimeout))


def summarize_batch(df: DataFrame) -> DataFrame:
    """Batch oracle for the state logic."""
    from ..analysis.analyzers import simple_tokens_col
    return (df.withColumn("_nt", F.size(simple_tokens_col("text")))
            .groupBy("conv_id")
            .agg(F.count("*").cast("long").alias("n_turns"),
                 F.sum("_nt").cast("long").alias("n_tokens"),
                 F.countDistinct("role").cast("int").alias("n_roles"),
                 F.min("ts").alias("first_ts"),
                 F.max("ts").alias("last_ts")))
