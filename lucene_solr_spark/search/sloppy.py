"""Sloppy phrase matching — exact SloppyPhraseMatcher semantics.

The reference scores a sloppy PhraseQuery by a float *frequency*: the
sum of 1/(1+matchLength) over the matches found by its
advance-least-position traversal (SEARCH/SloppyPhraseMatcher.java:56,
nextMatch :163-195, sloppyWeight :159-161; accumulated in
PhraseScorer.score, SEARCH/PhraseScorer.java:73-80). This module
reimplements that traversal for the no-repeats case (all phrase terms
distinct — initSimple, SloppyPhraseMatcher.java:362-374):

- ``sloppy_match_lengths`` is a direct reimplementation of the
  PhraseQueue-driven loop for any number of terms: pop the least
  phrase-position (ties by phrase offset, PhraseQueue.java:28-40),
  advance it while it stays <= the runner-up, minimizing
  ``end - position``; when it passes the runner-up a match of the
  minimized length is recorded.
- ``chain_match_lengths_2`` is the closed-form equivalent for TWO
  terms, derived from the loop: targets alternate between the two
  position lists, t1 = max of first positions (tie -> the later-offset
  list), t_{k+1} = least element of the opposite list > t_k, and each
  match length is t_k minus the greatest element of the *advancing*
  (opposite) list <= t_k. The DuckDB oracle's recursive CTE
  (oracle.py) mirrors this form; property tests assert
  chain == direct for random inputs.

Frequency accumulation: the reference sums 1/(1+L) in float32 in match
order. For the oracle-checkable double mode both backends instead sum
exactly: with D = lcm(1..slop+1), freq = (Σ D/(1+L)) / D — an integer
sum followed by one double division, bit-identical regardless of match
order in any IEEE754 engine. The float32 parity mode
(``sloppy_freq_f32``) keeps the reference's chain-order float32
accumulation. The double-vs-float32 difference is ulp-level and
invisible at round(score, 6).
"""

from __future__ import annotations

import heapq
import math
from functools import reduce

import numpy as np


def sloppy_match_lengths(position_lists: list, slop: int) -> list:
    """Match lengths (<= slop) in emission order for one document.

    ``position_lists[i]`` = sorted raw token positions of phrase term i;
    the i-th list is offset-adjusted by -i exactly like
    PhrasePositions.nextPosition (PhrasePositions.java:55-57). Requires
    distinct terms (the no-repeats case; SloppyPhraseMatcher falls into
    initSimple). Returns [] if any list is empty.
    """
    k = len(position_lists)
    adj = []
    for i, pl in enumerate(position_lists):
        arr = [int(p) - i for p in pl]
        if not arr:
            return []
        adj.append(arr)
    # heap entries: (position, offset); offset doubles as list id —
    # PhraseQueue.lessThan orders by position then phrase offset
    idx = [0] * k
    heap = [(adj[i][0], i) for i in range(k)]
    heapq.heapify(heap)
    end = max(adj[i][0] for i in range(k))
    out: list = []
    positioned = True
    while positioned:
        pos, i = heapq.heappop(heap)
        match_length = end - pos
        nxt = heap[0][0]
        while True:
            idx[i] += 1
            if idx[i] >= len(adj[i]):
                positioned = False
                break
            p = adj[i][idx[i]]
            if p > end:
                end = p
            if p > nxt:
                heapq.heappush(heap, (p, i))
                if match_length <= slop:
                    out.append(match_length)
                    break
                pos, i = heapq.heappop(heap)
                nxt = heap[0][0]
                match_length = end - pos
            else:
                match_length = min(match_length, end - p)
        if not positioned:
            if match_length <= slop:
                out.append(match_length)
            return out
    return out


def chain_match_lengths_2(pos_a: list, pos_b: list, slop: int) -> list:
    """Closed-form two-term equivalent of ``sloppy_match_lengths``.

    ``pos_a`` = raw positions of term 0; ``pos_b`` = raw positions of
    term 1 (adjusted by -1 internally). Mirrored by the oracle's
    recursive CTE — keep the two in lockstep.
    """
    a = [int(p) for p in pos_a]
    b = [int(p) - 1 for p in pos_b]
    if not a or not b:
        return []
    out: list = []
    if a[0] > b[0]:
        t, tag = a[0], 0       # target in A; advancing list = B
    else:
        t, tag = b[0], 1       # tie -> B (A pops first by offset)
    while True:
        adv = b if tag == 0 else a  # the list being advanced/minimized
        pred = None
        for y in adv:
            if y <= t:
                pred = y
            else:
                break
        ml = t - pred           # pred always exists (t >= both firsts)
        if ml <= slop:
            out.append(ml)
        opp = b if tag == 0 else a  # next target lives in the other list
        t2 = None
        for y in opp:
            if y > t:
                t2 = y
                break
        if t2 is None:
            return out
        t, tag = t2, 1 - tag


def freq_denominator(slop: int) -> int:
    """lcm(1..slop+1): common denominator making the sloppy freq an
    exact integer sum (order-independent across engines)."""
    return reduce(math.lcm, range(1, slop + 2), 1)


def sloppy_freq_f64(match_lengths: list, slop: int) -> float:
    """Exact-rational double freq: (Σ D/(1+L)) / D."""
    d = freq_denominator(slop)
    num = sum(d // (1 + m) for m in match_lengths)
    return num / d


def sloppy_freq_f32(match_lengths: list) -> np.float32:
    """Reference-exact float32 accumulation in match order
    (PhraseScorer.java:76-78)."""
    acc = np.float32(0.0)
    for m in match_lengths:
        acc = np.float32(acc + np.float32(1.0)
                         / (np.float32(1.0) + np.float32(m)))
    return acc


def chain_freqs_2_vec(a_lists: list, b_lists: list, slop: int) -> np.ndarray:
    """Vectorized ``chain_match_lengths_2`` + ``sloppy_freq_f64`` over a
    BATCH of documents — the hot path for two-term sloppy phrases.

    ``a_lists[d]`` / ``b_lists[d]`` are the sorted raw positions of the
    two phrase terms in document d. Returns a float64 freq per doc
    (0.0 when either list is empty or no match is within ``slop``).

    The per-doc chain walk (targets alternate lists; each step emits
    ``t - pred_other(t)``) is run in LOCKSTEP across all docs: the
    pred/succ links are precomputed with two global ``searchsorted``
    calls on doc-offset flat keys (the same flat-key trick as the
    packed phrase kernel), so each chain step is a pure vectorized
    gather. Exact-rational accumulation is order-independent, so
    per-match-length counts reproduce ``sloppy_freq_f64`` bit-exactly
    (property-tested against the scalar chain and the general
    matcher)."""
    n = len(a_lists)
    d_w = freq_denominator(slop)
    freqs = np.zeros(n, dtype=np.float64)
    if n == 0:
        return freqs
    len_a = np.fromiter((len(x) for x in a_lists), np.int64, n)
    len_b = np.fromiter((len(x) for x in b_lists), np.int64, n)
    live = (len_a > 0) & (len_b > 0)
    if not live.any():
        return freqs
    a_val = np.concatenate([np.asarray(a_lists[i], dtype=np.int64)
                            for i in range(n) if live[i]])
    b_val = np.concatenate([np.asarray(b_lists[i], dtype=np.int64) - 1
                            for i in range(n) if live[i]])
    la, lb = len_a[live], len_b[live]
    m = int(live.sum())
    offs_a = np.concatenate(([0], np.cumsum(la)[:-1]))
    offs_b = np.concatenate(([0], np.cumsum(lb)[:-1]))
    a_doc = np.repeat(np.arange(m), la)
    b_doc = np.repeat(np.arange(m), lb)
    # doc-offset flat keys (values shifted so the -1 adjustment stays
    # nonnegative); both flat arrays are globally sorted by key
    big = np.int64(max(int(a_val.max(initial=0)),
                       int(b_val.max(initial=0))) + 3)
    ka = a_doc * big + (a_val + 2)
    kb = b_doc * big + (b_val + 2)
    # pred/succ links A<->B (side='right': pred includes equal values,
    # matching the scalar chain's  y <= t)
    r_ab = np.searchsorted(kb, ka, side="right")
    pred_b_of_a = r_ab - 1          # valid by the chain invariant
    succ_b_of_a = r_ab
    succ_b_ok = (r_ab < kb.size)
    np.logical_and(succ_b_ok, b_doc[np.minimum(r_ab, kb.size - 1)]
                   == a_doc, out=succ_b_ok)
    r_ba = np.searchsorted(ka, kb, side="right")
    pred_a_of_b = r_ba - 1
    succ_a_of_b = r_ba
    succ_a_ok = (r_ba < ka.size)
    np.logical_and(succ_a_ok, a_doc[np.minimum(r_ba, ka.size - 1)]
                   == b_doc, out=succ_a_ok)

    counts = np.zeros((m, slop + 1), dtype=np.int64)
    # start: t = max(first a, first b adjusted); tie -> B (offset 1)
    a0, b0 = a_val[offs_a], b_val[offs_b]
    tag = np.where(a0 > b0, 0, 1).astype(np.int8)
    cur = np.where(tag == 0, offs_a, offs_b)
    active = np.ones(m, dtype=bool)
    while active.any():
        for t in (0, 1):
            sel = active & (tag == t)
            if not sel.any():
                continue
            i = cur[sel]
            if t == 0:   # target in A; advancing/opposite list = B
                ml = a_val[i] - b_val[pred_b_of_a[i]]
                ok = ml <= slop
                if ok.any():
                    np.add.at(counts, (a_doc[i][ok], ml[ok]), 1)
                nxt_ok = succ_b_of_a[i]
                alive = succ_b_ok[i]
            else:        # target in B; opposite list = A
                ml = b_val[i] - a_val[pred_a_of_b[i]]
                ok = ml <= slop
                if ok.any():
                    np.add.at(counts, (b_doc[i][ok], ml[ok]), 1)
                nxt_ok = succ_a_of_b[i]
                alive = succ_a_ok[i]
            idx = np.flatnonzero(sel)
            cur[idx] = np.where(alive, nxt_ok, cur[idx])
            active[idx[~alive]] = False
            tag[idx[alive]] = 1 - t
    w = np.array([d_w // (1 + L) for L in range(slop + 1)],
                 dtype=np.int64)
    freqs[live] = (counts @ w) / float(d_w)
    return freqs
