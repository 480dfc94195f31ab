"""Update-request processor chain: the field-mutating family.

The reference runs every added document through an
UpdateRequestProcessorChain before indexing
(solr/core/src/java/org/apache/solr/update/processor/
UpdateRequestProcessorChain.java:60); the workhorse members are the
FieldMutatingUpdateProcessor subclasses — pure per-document value
transformations configured in solrconfig.  Here the same chain is a
composition of DataFrame transformations (whole-stage-codegen Column
expressions — at 100 TB each processor is a projection folded into
the ingest scan, never a separate pass), applied to a batch before
``IndexWriter.append`` / ``append_raw``:

- ``trim(f)`` — TrimFieldUpdateProcessorFactory (String.trim).
- ``truncate(f, n)`` — TruncateFieldUpdateProcessorFactory
  (subSequence(0, min(n, len))).
- ``regex_replace(f, pattern, replacement, literal=True)`` —
  RegexReplaceProcessorFactory.java:69 (Matcher.replaceAll over the
  whole value; ``literalReplacement`` defaults TRUE = the replacement
  is quoted, '$'/'\\' inert — mirrored by escaping the replacement
  for Spark's regexp_replace when literal).
- ``html_strip(f)`` — HTMLStripFieldUpdateProcessorFactory; the
  reference runs the full HTMLStripCharFilter state machine, this
  engine removes tags/comments and unescapes the five core entities
  (documented approximation; the filter's charset/script edge cases
  are out of scope).
- ``remove_blank(f)`` — RemoveBlankFieldUpdateProcessorFactory
  (empty string -> value removed = NULL here).
- ``ignore(f)`` — IgnoreFieldUpdateProcessorFactory (column drop).
- ``default_value(f, v)`` — DefaultValueUpdateProcessorFactory
  (set only when absent/NULL).
- ``timestamp(f, now)`` — TimestampUpdateProcessorFactory with the
  request-bound NOW passed explicitly (determinism).
- ``uuid(f, seed=None)`` — UUIDUpdateProcessorFactory; random by
  contract.  ``seed`` switches to a deterministic content-derived
  UUIDv4-shaped value (md5 of seed + doc cols) for reproducible
  pipelines — a documented extension, the reference always randoms.
- ``clone(src, dst)`` — CloneFieldUpdateProcessorFactory.
- ``field_length(f, dst=None)`` — FieldLengthUpdateProcessorFactory
  (value -> its CharSequence length).
- ``count_field_values(f, dst=None)`` —
  CountFieldValuesUpdateProcessorFactory (multivalued count).
- ``first_value/last_value/min_value/max_value/uniq(f)`` — the
  multivalued selectors (FirstFieldValue/LastFieldValue/
  MinFieldValue/MaxFieldValue/UniqFields factories) over array
  columns.
- ``concat_values(f, delim)`` — ConcatFieldUpdateProcessorFactory.
- ``parse_long/parse_double/parse_boolean(f)`` — the ParseX
  factories' mutate-if-parseable rule: try_cast, keeping NULL where
  the parse fails (the reference leaves the raw string — a typed
  column cannot mix, documented divergence).
- ``ignore_large_document(limit_bytes)`` —
  IgnoreLargeDocumentProcessorFactory: drop docs whose summed
  string-field byte estimate exceeds the limit (filter, not fail).
- ``skip_existing(writer, key_cols)`` —
  SkipExistingDocumentsProcessorFactory: anti-join the batch against
  the index's existing keys — fully distributed, the index side is
  the (pruned) source-key projection.

``chain(*procs)`` composes them left-to-right like the configured
processor chain; each processor is ``fn(df) -> df``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "chain", "trim", "truncate", "regex_replace", "html_strip",
    "remove_blank", "ignore", "default_value", "timestamp", "uuid",
    "clone", "field_length", "count_field_values", "first_value",
    "last_value", "min_value", "max_value", "uniq", "concat_values",
    "parse_long", "parse_double", "parse_boolean",
    "ignore_large_document", "skip_existing",
]


def chain(*procs):
    """UpdateRequestProcessorChain.java:60 — left-to-right
    composition; returns fn(df) -> df."""
    def run(df: DataFrame) -> DataFrame:
        for p in procs:
            df = p(df)
        return df
    return run


def _mutate(f, expr_fn):
    def run(df):
        return df.withColumn(f, expr_fn(F.col(f)))
    return run


def trim(f: str):
    return _mutate(f, F.trim)


def truncate(f: str, n: int):
    return _mutate(f, lambda c: F.substring(c, 1, n))


def regex_replace(f: str, pattern: str, replacement: str,
                  literal: bool = True):
    # Matcher.quoteReplacement when literalReplacement (the default)
    repl = replacement.replace("\\", "\\\\").replace("$", r"\$") \
        if literal else replacement
    return _mutate(f, lambda c: F.regexp_replace(c, pattern, repl))


_HTML_TAG = r"<[^>]*>"
_HTML_COMMENT = r"<!--.*?-->"


def html_strip(f: str):
    def run(df):
        c = F.col(f)
        c = F.regexp_replace(c, _HTML_COMMENT, "")
        c = F.regexp_replace(c, _HTML_TAG, "")
        for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                        ("&apos;", "'"), ("&amp;", "&")):
            c = F.replace(c, F.lit(ent), F.lit(ch))
        return df.withColumn(f, c)
    return run


def remove_blank(f: str):
    # length-0 only: RemoveBlankFieldUpdateProcessorFactory removes
    # empty strings, NOT whitespace-only values ('  ' is kept — the
    # reference composes trim() + remove_blank to get trim-then-remove)
    return _mutate(f, lambda c: F.when(c != "", c))


def ignore(f: str):
    def run(df):
        return df.drop(f)
    return run


def default_value(f: str, v):
    def run(df):
        if f not in df.columns:
            return df.withColumn(f, F.lit(v))
        return df.withColumn(f, F.coalesce(F.col(f), F.lit(v)))
    return run


def timestamp(f: str, now):
    def run(df):
        if f in df.columns:
            return df.withColumn(f, F.coalesce(F.col(f),
                                               F.lit(now)))
        return df.withColumn(f, F.lit(now))
    return run


def uuid(f: str, seed: str = None):
    def run(df):
        if seed is None:
            return df.withColumn(f, F.expr("uuid()"))
        # deterministic UUIDv4-shaped value from the row content
        h = F.md5(F.concat_ws("\x1f", F.lit(seed),
                              *[F.col(c).cast("string")
                                for c in df.columns]))
        return df.withColumn(
            f, F.concat_ws(
                "-", F.substring(h, 1, 8), F.substring(h, 9, 4),
                F.concat(F.lit("4"), F.substring(h, 14, 3)),
                F.substring(h, 17, 4), F.substring(h, 21, 12)))
    return run


def clone(src: str, dst: str):
    def run(df):
        return df.withColumn(dst, F.col(src))
    return run


def field_length(f: str, dst: str = None):
    def run(df):
        return df.withColumn(dst or f, F.length(F.col(f)))
    return run


def count_field_values(f: str, dst: str = None):
    def run(df):
        return df.withColumn(dst or f, F.size(F.col(f)))
    return run


def first_value(f: str):
    return _mutate(f, lambda c: c.getItem(0))


def last_value(f: str):
    return _mutate(f, lambda c: F.element_at(c, -1))


def min_value(f: str):
    return _mutate(f, F.array_min)


def max_value(f: str):
    return _mutate(f, F.array_max)


def uniq(f: str):
    return _mutate(f, F.array_distinct)


def concat_values(f: str, delim: str = ", "):
    return _mutate(f, lambda c: F.array_join(c, delim))


def parse_long(f: str):
    return _mutate(f, lambda c: c.try_cast("long"))


def parse_double(f: str):
    return _mutate(f, lambda c: c.try_cast("double"))


def parse_boolean(f: str):
    return _mutate(f, lambda c: c.try_cast("boolean"))


def ignore_large_document(limit_bytes: int):
    """IgnoreLargeDocumentProcessorFactory.java: estimate the doc
    size from its field values and DROP docs over the limit (the
    reference throws per doc; a distributed ingest filters)."""
    def run(df):
        str_cols = [fld.name for fld in df.schema.fields
                    if fld.dataType.typeName() == "string"]
        size = F.lit(0)
        for c in str_cols:
            size = size + F.coalesce(F.octet_length(F.col(c)),
                                     F.lit(0))
        return df.filter(size <= limit_bytes)
    return run


def skip_existing(existing: DataFrame, key_cols):
    """SkipExistingDocumentsProcessorFactory: drop batch rows whose
    key already exists — an anti-join against the index's key
    projection (this architecture keeps stored fields in the source
    table; pass its key projection).  Distributed; nothing via the
    driver."""
    keys = existing.select(*key_cols).distinct()

    def run(df):
        return df.join(keys, list(key_cols), "left_anti")
    return run
