"""Round-5: per-process transient arena in the invert kernel
(segments._arena / _segment_ids / _iota*): grow-only pooled buffers so
steady-state batches touch no new pages (the measured page-supply
ceiling of concurrent builds on virtualized hosts).  The kernel's
packed output must be unchanged — build-path equality is covered by
the append/append_raw store-equality test; here the helpers' semantics
and reuse contract are pinned."""

import numpy as np

from lucene_solr_spark.index import segments as S


def test_arena_grow_only_reuse():
    a = S._arena("t_x", 100, np.int64)
    assert a.size == 100 and a.dtype == np.int64
    buf1 = S._ARENA["t_x"]
    b = S._arena("t_x", 50, np.int32)
    assert b.size == 50 and b.dtype == np.int32
    assert S._ARENA["t_x"] is buf1          # no realloc on shrink
    c = S._arena("t_x", buf1.nbytes + 1, np.uint8)
    assert S._ARENA["t_x"] is not buf1      # grew
    assert c.size == buf1.nbytes + 1


def test_arena_distinct_names_never_alias():
    a = S._arena("t_a", 64, np.int64)
    b = S._arena("t_b", 64, np.int64)
    a[:] = 1
    b[:] = 2
    assert a.sum() == 64 and b.sum() == 128


def test_segment_ids_matches_repeat():
    rng = np.random.default_rng(0)
    for _ in range(20):
        counts = rng.integers(0, 5, rng.integers(1, 40))
        off = np.zeros(counts.size + 1, dtype=np.int64)
        np.cumsum(counts, out=off[1:])
        n = int(off[-1])
        want = np.repeat(np.arange(counts.size), counts)
        got = S._segment_ids(off, n, "t_seg")
        assert np.array_equal(got[:n], want)


def test_iota_caches():
    assert np.array_equal(S._iota32(10), np.arange(10, dtype=np.int32))
    assert np.array_equal(S._iota64(1000),
                          np.arange(1000, dtype=np.int64))
    # grow then re-serve from cache
    big = S._iota32(5000)
    assert big[-1] == 4999
    again = S._iota32(100)
    assert again.base is not None
