"""Filter-result caching — the LRUQueryCache analogue.

Lucene caches per-segment DocIdSets of filters in an LRU keyed by query
(SEARCH/LRUQueryCache.java:90) and admits a query only once a usage
policy deems it worth caching (UsageTrackingQueryCachingPolicy: seen at
least N times, with cheap queries needing more sightings). The Spark
realization caches the *match-set DataFrame* of a filter-context query
node via ``.persist()``:

- admission: a key is persisted only from its ``min_frequency``-th use
  (first uses run uncached — exactly the usage-tracking shape);
- eviction: least-recently-used entries past ``max_entries`` are
  ``unpersist()``-ed (Lucene evicts by ram_bytes; entry count is the
  Spark-side proxy since persisted sizes are executor-managed);
- keys are the frozen query-AST dataclasses (hashable by value, like
  Lucene's Query equals/hashCode contract).
"""

from __future__ import annotations

from collections import OrderedDict


class LRUQueryCache:
    """LRU of persisted filter match-set DataFrames."""

    def __init__(self, max_entries: int = 32, min_frequency: int = 2):
        self.max_entries = max_entries
        self.min_frequency = min_frequency
        self._counts: dict = {}
        self._cache: OrderedDict = OrderedDict()
        self.hits = 0
        self.misses = 0

    def get_or_compute(self, key, compute):
        """Return the (possibly cached) DataFrame for ``key``;
        ``compute`` builds it on miss."""
        if key in self._cache:
            self._cache.move_to_end(key)
            self.hits += 1
            return self._cache[key]
        self.misses += 1
        n = self._counts.get(key, 0) + 1
        self._counts[key] = n
        df = compute()
        if n >= self.min_frequency:
            df = df.persist()
            self._cache[key] = df
            if len(self._cache) > self.max_entries:
                _, evicted = self._cache.popitem(last=False)
                evicted.unpersist()
        return df

    def clear(self) -> None:
        for df in self._cache.values():
            df.unpersist()
        self._cache.clear()
        self._counts.clear()
