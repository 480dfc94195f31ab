"""Lucene intervals module (lucene/queries/src/java/org/apache/lucene/
queries/intervals) — minimal-interval algebra + IntervalQuery scoring.

Semantics re-expressed from the reference:

- An IntervalsSource yields per-document MINIMAL intervals — no
  produced interval contains another (IntervalIterator.java contract;
  the Clarke & Cormack GCL algebra).
- ``Intervals.term``: one [p, p] interval per position.
- ``Intervals.ordered`` (OrderedIntervalsSource.java): sub-intervals in
  order, each starting after the previous one ends; candidates are the
  greedy tightest chain from each leading interval, then minimized.
- ``Intervals.unordered`` (UnorderedIntervalsSource.java, overlaps
  allowed): the minimal windows covering one interval from each sub.
- ``Intervals.maxgaps`` (FilteredIntervalsSource.java): keeps intervals
  with  gaps = (end - start + 1) - minExtent  <= max_gaps.
- ``containing`` / ``containedBy`` / ``notContaining``
  (ContainingIntervalsSource.java etc.): interval-relation filters;
  the produced side is `big` / `small` / `big` respectively, and so is
  the reported minExtent.
- IntervalQuery scoring (IntervalScorer.java:66-68 +
  IntervalScoreFunction.java:69-73 saturation, pivot=1 default):
  freq(doc) = sum over intervals of 1 / max(length - minExtent + 1, 1),
  score = boost * (1 - pivot / (pivot + freq)).  The reference
  accumulates freq in float32; both backends here use float64 and the
  oracle mirrors the same double graph (same convention as the BM25
  path; the f32 mode is a separate kernel).

The algebra is pure python (this file), evaluated per candidate doc by
a vectorized pandas UDF — candidates are pre-filtered by the postings
docid intersection over the source's required terms, so the UDF only
ever sees docs that can match (TwoPhaseIterator shape).  The oracle SQL
for registered interval queries mirrors the two-term cases with DuckDB
list lambdas (see __spark_entry__.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple, Union

ISource = Union["ITerm", "IOrdered", "IUnordered", "IMaxGaps",
                "IContaining", "IContainedBy", "INotContaining"]

Interval = Tuple[int, int]


@dataclass(frozen=True)
class ITerm:
    term: str


@dataclass(frozen=True)
class IOrdered:
    sources: tuple


@dataclass(frozen=True)
class IUnordered:
    """Unordered with overlaps allowed (Intervals.unordered default).
    Two sources only — the common case; n-ary needs the full
    priority-queue sweep."""

    sources: tuple


@dataclass(frozen=True)
class IMaxGaps:
    max_gaps: int
    source: ISource


@dataclass(frozen=True)
class IContaining:
    big: ISource
    small: ISource


@dataclass(frozen=True)
class IContainedBy:
    small: ISource
    big: ISource


@dataclass(frozen=True)
class INotContaining:
    big: ISource
    small: ISource


def required_terms(src: ISource) -> set:
    """Terms a doc MUST contain to yield intervals (notContaining's
    small side is not required — its absence still matches)."""
    if isinstance(src, ITerm):
        return {src.term}
    if isinstance(src, (IOrdered, IUnordered)):
        out = set()
        for s in src.sources:
            out |= required_terms(s)
        return out
    if isinstance(src, IMaxGaps):
        return required_terms(src.source)
    if isinstance(src, IContaining):
        return required_terms(src.big) | required_terms(src.small)
    if isinstance(src, IContainedBy):
        return required_terms(src.small) | required_terms(src.big)
    if isinstance(src, INotContaining):
        return required_terms(src.big)
    raise TypeError(type(src).__name__)


def all_terms(src: ISource) -> set:
    if isinstance(src, INotContaining):
        return all_terms(src.big) | all_terms(src.small)
    if isinstance(src, ITerm):
        return {src.term}
    if isinstance(src, (IOrdered, IUnordered)):
        out = set()
        for s in src.sources:
            out |= all_terms(s)
        return out
    if isinstance(src, IMaxGaps):
        return all_terms(src.source)
    if isinstance(src, (IContaining, IContainedBy)):
        return all_terms(src.big) | all_terms(src.small)
    raise TypeError(type(src).__name__)


def min_extent(src: ISource) -> int:
    """IntervalsSource.minExtent — the tightest width the source can
    produce (BlockIntervalsSource.java:60 summation shape)."""
    if isinstance(src, ITerm):
        return 1
    if isinstance(src, (IOrdered, IUnordered)):
        return sum(min_extent(s) for s in src.sources)
    if isinstance(src, IMaxGaps):
        return min_extent(src.source)
    if isinstance(src, (IContaining, INotContaining)):
        return min_extent(src.big)
    if isinstance(src, IContainedBy):
        return min_extent(src.small)
    raise TypeError(type(src).__name__)


def _minimize(iv: list) -> list:
    """Drop any interval that strictly contains another (minimality)."""
    out = []
    for a in iv:
        if not any(b != a and a[0] <= b[0] and b[1] <= a[1] for b in iv):
            out.append(a)
    # dedupe, keep position order
    seen, res = set(), []
    for a in sorted(out):
        if a not in seen:
            seen.add(a)
            res.append(a)
    return res


def intervals_of(src: ISource, positions: dict) -> list:
    """Minimal intervals of ``src`` for one doc.  ``positions`` maps
    term -> sorted position list (missing/empty = term absent)."""
    if isinstance(src, ITerm):
        return [(p, p) for p in positions.get(src.term, ())]
    if isinstance(src, IOrdered):
        subs = [intervals_of(s, positions) for s in src.sources]
        if any(not s for s in subs):
            return []
        cands = []
        for (s0, e0) in subs[0]:
            prev_end, ok = e0, True
            for sub in subs[1:]:
                nxt = next((iv for iv in sub if iv[0] > prev_end), None)
                if nxt is None:
                    ok = False
                    break
                prev_end = nxt[1]
            if ok:
                cands.append((s0, prev_end))
        return _minimize(cands)
    if isinstance(src, IUnordered):
        if len(src.sources) != 2:
            raise TypeError("IUnordered supports exactly 2 sources")
        a = intervals_of(src.sources[0], positions)
        b = intervals_of(src.sources[1], positions)
        cands = [(min(x[0], y[0]), max(x[1], y[1]))
                 for x in a for y in b]
        return _minimize(cands)
    if isinstance(src, IMaxGaps):
        me = min_extent(src.source)
        return [iv for iv in intervals_of(src.source, positions)
                if (iv[1] - iv[0] + 1) - me <= src.max_gaps]
    if isinstance(src, IContaining):
        big = intervals_of(src.big, positions)
        small = intervals_of(src.small, positions)
        return [b for b in big
                if any(b[0] <= s[0] and s[1] <= b[1] for s in small)]
    if isinstance(src, IContainedBy):
        small = intervals_of(src.small, positions)
        big = intervals_of(src.big, positions)
        return [s for s in small
                if any(b[0] <= s[0] and s[1] <= b[1] for b in big)]
    if isinstance(src, INotContaining):
        big = intervals_of(src.big, positions)
        small = intervals_of(src.small, positions)
        return [b for b in big
                if not any(b[0] <= s[0] and s[1] <= b[1] for s in small)]
    raise TypeError(type(src).__name__)


def interval_freq(src: ISource, positions: dict) -> float:
    """IntervalScorer.ensureFreq (IntervalScorer.java:61-68), float64."""
    me = min_extent(src)
    freq = 0.0
    for (s, e) in intervals_of(src, positions):
        freq += 1.0 / max((e - s + 1) - me + 1, 1)
    return freq


def saturation_score(freq: float, pivot: float = 1.0,
                     boost: float = 1.0) -> float:
    """IntervalScoreFunction.saturationFunction
    (IntervalScoreFunction.java:69-73), float64."""
    if freq <= 0.0:
        return 0.0
    return boost * (1.0 - pivot / (pivot + freq))
