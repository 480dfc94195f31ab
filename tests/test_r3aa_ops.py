"""Round-3aa ops: temporal evaluators
(solrj/io/eval/RecursiveTemporalEvaluator.java +
TemporalEvaluator{Year,Month,Day,DayOfYear,DayOfQuarter,Quarter,Week,
Hour,Minute,Second,Epoch}.java) — date-part accessors inside
select(), UTC semantics, java.time field parity."""

import datetime as dt

import pytest

ROWS = [
    # (id, timestamp) — chosen to pin the tricky fields: ISO-week
    # year boundaries, quarter starts/ends, leap day
    (0, dt.datetime(2021, 1, 1, 0, 0, 0)),    # ISO week 53 of 2020
    (1, dt.datetime(2021, 1, 4, 9, 30, 15)),  # ISO week 1
    (2, dt.datetime(2020, 2, 29, 23, 59, 59)),  # leap day
    (3, dt.datetime(2021, 4, 1, 12, 0, 1)),   # Q2 day 1
    (4, dt.datetime(2021, 12, 31, 6, 45, 30)),  # Q4 day 92
]


def _ev(spark):
    from lucene_solr_spark.search.streams import StreamEvaluator
    df = spark.createDataFrame(ROWS, "id long, ts timestamp")
    return StreamEvaluator({"ev": df})


def _rows(spark, parts):
    ev = _ev(spark)
    body = ", ".join(f"{fn}(ts) as {al}" for fn, al in parts)
    out = ev.eval(f'select(search(ev, q="*:*", fl="id,ts", '
                  f'sort="id asc"), id, {body})')
    return {r["id"]: r for r in out.collect()}


def test_calendar_parts_match_java_time(spark):
    got = _rows(spark, [("year", "y"), ("month", "mo"), ("day", "d"),
                        ("dayOfYear", "doy"), ("quarter", "q"),
                        ("hour", "h"), ("minute", "mi"),
                        ("second", "s")])
    for i, t in ROWS:
        r = got[i]
        assert (r["y"], r["mo"], r["d"]) == (t.year, t.month, t.day)
        assert r["doy"] == t.timetuple().tm_yday
        assert r["q"] == (t.month - 1) // 3 + 1
        assert (r["h"], r["mi"], r["s"]) == (t.hour, t.minute,
                                             t.second)


def test_week_is_iso_week_based(spark):
    """IsoFields.WEEK_OF_WEEK_BASED_YEAR: 2021-01-01 is week 53 of
    the 2020 ISO year; 2021-01-04 is week 1."""
    got = _rows(spark, [("week", "w")])
    for i, t in ROWS:
        assert got[i]["w"] == t.isocalendar()[1]
    assert got[0]["w"] == 53 and got[1]["w"] == 1


def test_day_of_quarter_is_one_based(spark):
    got = _rows(spark, [("dayOfQuarter", "doq")])
    for i, t in ROWS:
        qstart = dt.date(t.year, ((t.month - 1) // 3) * 3 + 1, 1)
        expect = (t.date() - qstart).days + 1
        assert got[i]["doq"] == expect
    assert got[3]["doq"] == 1   # Apr 1 = first day of Q2
    assert got[4]["doq"] == 92  # Dec 31 = day 92 of Q4


def test_epoch_is_utc_millis(spark):
    """TemporalEvaluatorEpoch.java:42 — atZone(UTC).toInstant()
    .toEpochMilli()."""
    got = _rows(spark, [("epoch", "ep")])
    for i, t in ROWS:
        ms = int(t.replace(tzinfo=dt.timezone.utc).timestamp() * 1000)
        assert got[i]["ep"] == ms


def test_temporal_accepts_iso_strings(spark):
    """RecursiveTemporalEvaluator parses ISO-8601 strings too —
    the cast('timestamp') path."""
    from lucene_solr_spark.search.streams import StreamEvaluator
    df = spark.createDataFrame([(0, "2021-06-15 08:05:09")],
                               "id long, iso string")
    ev = StreamEvaluator({"ev": df})
    [r] = ev.eval('select(search(ev, q="*:*", fl="id,iso", '
                  'sort="id asc"), year(iso) as y, month(iso) as mo, '
                  'hour(iso) as h)').collect()
    assert (r["y"], r["mo"], r["h"]) == (2021, 6, 8)
