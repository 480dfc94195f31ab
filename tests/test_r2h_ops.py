"""Laws for the round-2h pipeline ops (pure python — the Spark/DuckDB
parity of the same formulas is pinned by the oracle rows
q_spell_wordbreak / t_chunk / v_quantize / t_shuffle)."""

import hashlib
import math

# mirror of the plan constants in __spark_entry__.py
CHUNK_N, CHUNK_OVERLAP = 40, 8
STEP = CHUNK_N - CHUNK_OVERLAP


def n_chunks(dl: int) -> int:
    return 1 if dl <= CHUNK_N else math.ceil((dl - CHUNK_OVERLAP) / STEP)


def chunks(dl: int):
    return [(k * STEP, min(CHUNK_N, dl - k * STEP))
            for k in range(n_chunks(dl))]


def test_chunks_tile_the_document():
    """Every token position is covered; consecutive chunks overlap by
    exactly CHUNK_OVERLAP except a shorter final chunk; no chunk is
    empty or past the end."""
    for dl in list(range(1, 130)) + [255, 256, 1000, 10007]:
        cs = chunks(dl)
        covered = set()
        for start, n in cs:
            assert n >= 1
            assert start + n <= dl
            covered.update(range(start, start + n))
        assert covered == set(range(dl)), dl
        for (s0, n0), (s1, n1) in zip(cs, cs[1:]):
            # chunk k+1 starts CHUNK_OVERLAP tokens before chunk k ends
            # whenever chunk k is full-size
            assert s1 == s0 + STEP
            if n0 == CHUNK_N:
                assert s0 + n0 - s1 == CHUNK_OVERLAP


def test_chunk_count_minimal():
    """One chunk fewer can never cover the doc (the formula is tight)."""
    for dl in range(CHUNK_N + 1, 400):
        k = n_chunks(dl)
        last_start = (k - 1) * STEP
        assert last_start < dl <= last_start + CHUNK_N
        if k > 1:
            assert (k - 2) * STEP + CHUNK_N < dl


def quantize_roundtrip(vec):
    """Mirror of the shared FLOOR(x/s + 0.5) SQL in _q_vq_err."""
    amax = max(abs(x) for x in vec)
    s = amax / 127.0
    q = [math.floor(x / s + 0.5) for x in vec]
    return s, q, [qi * s for qi in q]


def test_quantization_error_bound():
    """|x - q*s| <= s/2 (the defining property of symmetric scalar
    quantization) and every code fits int8."""
    vecs = [
        [0.3, -1.7, 0.002, 1.7],
        [127.0, -127.0, 0.5, -0.5],
        [1e-3, 2e-3, -3e-3, 5e-4],
        [math.sin(i * 0.7) * 3 for i in range(64)],
    ]
    for v in vecs:
        s, q, rec = quantize_roundtrip(v)
        for x, qi, r in zip(v, q, rec):
            assert abs(x - r) <= s / 2 + 1e-12
            assert -128 <= qi <= 127


def test_shuffle_is_deterministic_and_seed_sensitive():
    ids = list(range(1000))

    def perm(seed):
        return sorted(ids, key=lambda i: (hashlib.md5(
            (seed + str(i)).encode()).hexdigest(), i))

    assert perm("r2seed") == perm("r2seed")
    assert perm("r2seed") != perm("other")
    assert sorted(perm("r2seed")) == ids


def test_wordbreak_split_enumeration():
    """Every split of a compound is enumerated exactly once and the
    vocabulary filter keeps only fully-in-dictionary pairs."""
    vocab = {"hash", "join", "sort", "merge", "group", "key", "a"}
    word = "hashjoin"
    sugg = [(word[:i], word[i:]) for i in range(1, len(word))
            if word[:i] in vocab and word[i:] in vocab]
    assert sugg == [("hash", "join")]
    assert [(a, b) for a, b in
            ((w[:i], w[i:]) for w in ["xyzzy"] for i in range(1, 5))
            if a in vocab and b in vocab] == []


def test_chain_freqs_2_vec_matches_scalar_forms():
    """Lockstep-vectorized 2-term chain == scalar chain == general
    matcher (rational freq, bit-exact) over randomized batches."""
    import random

    from lucene_solr_spark.search.sloppy import (
        chain_freqs_2_vec, chain_match_lengths_2, sloppy_freq_f64,
        sloppy_match_lengths,
    )
    rng = random.Random(7)
    for _ in range(120):
        n = rng.randint(0, 30)
        slop = rng.randint(0, 6)
        a_lists = [sorted(rng.sample(range(60), rng.randint(0, 12)))
                   for _ in range(n)]
        b_lists = [sorted(rng.sample(range(60), rng.randint(0, 12)))
                   for _ in range(n)]
        vec = chain_freqs_2_vec(a_lists, b_lists, slop)
        for d in range(n):
            a, b = a_lists[d], b_lists[d]
            if not a or not b:
                assert vec[d] == 0.0
                continue
            exp = sloppy_freq_f64(chain_match_lengths_2(a, b, slop), slop)
            exp2 = sloppy_freq_f64(sloppy_match_lengths([a, b], slop), slop)
            assert vec[d] == exp
            assert abs(exp - exp2) < 1e-12
