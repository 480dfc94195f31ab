"""Round-3z ops: cat / parseCSV / parseTSV / shuffle / sql / noop
streams (solr/core handler/CatStream.java:49,
solrj/io/stream/CsvStream.java:120, TsvStream.java:76,
ShuffleStream + SqlStream + NoOpStream per Lang.java registrations) —
the file-ingestion and SQL-routing surface of the streaming API."""

import pytest

SF = "/root/testdata/sf0.001"


def _ev(spark, chroot=None):
    from lucene_solr_spark.search.streams import StreamEvaluator
    docs = spark.createDataFrame(
        [(0, "alpha beta", "en"), (1, "beta gamma", "de"),
         (2, "alpha alpha", "en"), (3, "gamma delta", "fr")],
        "doc_id long, text string, lang string")
    return StreamEvaluator({"documents": docs},
                           chroot=chroot), docs


# ---------------------------------------------------------------------------
# cat — file lines under a chroot
# ---------------------------------------------------------------------------

def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return str(tmp_path)


def test_cat_emits_file_line_tuples_in_order(spark, tmp_path):
    root = _write(tmp_path, "a.txt", "one\ntwo\n\nfour\n")
    ev, _ = _ev(spark, chroot=root)
    rows = (ev.eval('cat("a.txt")')
            .orderBy("line_no").collect())
    # trailing newline yields NO empty last line; interior empty kept
    assert [(r["file"], r["line_no"], r["line"]) for r in rows] == [
        ("a.txt", 1, "one"), ("a.txt", 2, "two"),
        ("a.txt", 3, ""), ("a.txt", 4, "four")]


def test_cat_maxlines_caps_across_files_in_listed_order(spark,
                                                        tmp_path):
    _write(tmp_path, "a.txt", "a1\na2\n")
    root = _write(tmp_path, "b.txt", "b1\nb2\n")
    ev, _ = _ev(spark, chroot=root)
    rows = (ev.eval('cat("a.txt,b.txt", maxLines=3)')
            .orderBy("file", "line_no").collect())
    assert [(r["file"], r["line"]) for r in rows] == [
        ("a.txt", "a1"), ("a.txt", "a2"), ("b.txt", "b1")]


def test_cat_requires_chroot_and_existing_file(spark, tmp_path):
    ev, _ = _ev(spark)  # no chroot
    with pytest.raises(ValueError, match="chroot"):
        ev.eval('cat("a.txt")')
    ev2, _ = _ev(spark, chroot=str(tmp_path))
    with pytest.raises(ValueError, match="not found"):
        ev2.eval('cat("missing.txt")')


# ---------------------------------------------------------------------------
# parseCSV / parseTSV
# ---------------------------------------------------------------------------

def test_parsecsv_headers_quotes_and_nulls(spark, tmp_path):
    root = _write(
        tmp_path, "d.csv",
        'name,desc,n\nmerge,"sorted, stable",3\nsplit,,2\n')
    ev, _ = _ev(spark, chroot=root)
    rows = (ev.eval('parseCSV(cat("d.csv"))')
            .orderBy("id").collect())
    got = [(r["id"], r["name"], r["desc"], r["n"]) for r in rows]
    # quoted comma survives, quotes stripped, empty field -> null,
    # id = file_lineNumber (header is line 1)
    assert got == [("d.csv_2", "merge", "sorted, stable", "3"),
                   ("d.csv_3", "split", None, "2")]


def test_parsecsv_unions_per_file_headers(spark, tmp_path):
    _write(tmp_path, "x.csv", "a,b\n1,2\n")
    root = _write(tmp_path, "y.csv", "a,c\n3,4\n")
    ev, _ = _ev(spark, chroot=root)
    rows = (ev.eval('parseCSV(cat("x.csv,y.csv"))')
            .orderBy("id").collect())
    by_id = {r["id"]: r for r in rows}
    assert by_id["x.csv_2"]["b"] == "2" and by_id["x.csv_2"]["c"] is None
    assert by_id["y.csv_2"]["c"] == "4" and by_id["y.csv_2"]["b"] is None


def test_parsecsv_field_count_mismatch_raises(spark, tmp_path):
    root = _write(tmp_path, "bad.csv", "a,b\n1,2,3\n")
    ev, _ = _ev(spark, chroot=root)
    with pytest.raises(ValueError, match="same number of fields"):
        ev.eval('parseCSV(cat("bad.csv"))')


def test_parsetsv_tab_split_no_quote_handling(spark, tmp_path):
    root = _write(tmp_path, "d.tsv",
                  'k\tv\nm1\t"raw, quoted"\nm2\tplain\n')
    ev, _ = _ev(spark, chroot=root)
    rows = (ev.eval('parseTSV(cat("d.tsv"))')
            .orderBy("id").collect())
    # quotes are NOT stripped on the TSV path (TsvStream.java:76)
    assert [(r["k"], r["v"]) for r in rows] == [
        ("m1", '"raw, quoted"'), ("m2", "plain")]


# ---------------------------------------------------------------------------
# shuffle — full sorted export
# ---------------------------------------------------------------------------

def test_shuffle_is_full_sorted_export(spark):
    ev, docs = _ev(spark)
    out = ev.eval('shuffle(documents, q="lang:en", '
                  'fl="doc_id,lang", sort="doc_id asc")').collect()
    assert [(r["doc_id"], r["lang"]) for r in out] == [
        (0, "en"), (2, "en")]


def test_shuffle_partitionkeys_keeps_rowset(spark):
    ev, _ = _ev(spark)
    out = ev.eval('shuffle(documents, q="*:*", fl="doc_id,lang", '
                  'sort="doc_id asc", partitionKeys="lang")')
    assert sorted(r["doc_id"] for r in out.collect()) == [0, 1, 2, 3]


def test_shuffle_requires_sort(spark):
    ev, _ = _ev(spark)
    with pytest.raises(ValueError, match="sort"):
        ev.eval('shuffle(documents, q="*:*", fl="doc_id")')


# ---------------------------------------------------------------------------
# sql — route a statement through the SolrSQL handler
# ---------------------------------------------------------------------------

def test_sql_stream_routes_through_handler(spark):
    ev, _ = _ev(spark)
    rows = ev.eval('sql(documents, stmt="SELECT lang, count(*) '
                   'FROM documents GROUP BY lang ORDER BY lang ASC")'
                   ).collect()
    assert [(r["lang"], r["count"]) for r in rows] == [
        ("de", 1), ("en", 2), ("fr", 1)]


def test_sql_stream_validates_inputs(spark):
    ev, _ = _ev(spark)
    with pytest.raises(ValueError, match="unknown collection"):
        ev.eval('sql(nope, stmt="SELECT 1")')
    with pytest.raises(ValueError, match="stmt"):
        ev.eval("sql(documents)")


# ---------------------------------------------------------------------------
# noop
# ---------------------------------------------------------------------------

def test_noop_emits_nothing(spark):
    ev, _ = _ev(spark)
    out = ev.eval("noop()")
    assert out.count() == 0 and out.columns == []


def test_parsecsv_duplicate_header_last_wins(spark, tmp_path):
    """CsvStream puts fields into the tuple in header order, so a
    duplicate header name keeps the LAST column's value
    (Tuple.put overwrite semantics)."""
    root = _write(tmp_path, "dup.csv", "a,b,a\n1,2,3\n")
    ev, _ = _ev(spark, chroot=root)
    rows = ev.eval('parseCSV(cat("dup.csv"))').collect()
    assert len(rows) == 1
    assert rows[0]["a"] == "3"      # last occurrence, not "1"
    assert rows[0]["b"] == "2"


def test_parsecsv_many_files_one_plan(spark, tmp_path):
    """Multi-file parse stays one distributed plan (the per-file
    driver loop is gone): files with different headers union by
    name."""
    _write(tmp_path, "p1.csv", "x,y\n1,2\n")
    root = _write(tmp_path, "p2.csv", "y,z\n5,6\n")
    ev, _ = _ev(spark, chroot=root)
    rows = {r["id"]: r for r in
            ev.eval('parseCSV(cat("p1.csv,p2.csv"))').collect()}
    assert rows["p1.csv_2"]["x"] == "1"
    assert rows["p1.csv_2"]["z"] is None
    assert rows["p2.csv_2"]["z"] == "6"
    assert rows["p2.csv_2"]["x"] is None
