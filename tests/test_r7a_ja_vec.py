"""Round-5: compiled Japanese Viterbi lattice (analysis/ja_vec).

The C kernel must stay differentially identical to the scalar
ja.ja_tokenize / ja.ja_analyze (which are themselves verified
token-for-token against the reference analyzer on the same
dictionary — test_r6d_ja.py), across the golden lines plus
adversarial pools: class-boundary runs, katakana prolonged marks,
astral codepoints (surrogate-pair units), punctuation runs, and
>1024-unit unbroken runs that trip the MAX_BACKTRACE_GAP branch the
kernel delegates to the scalar path."""

import json
import pathlib
import random

from lucene_solr_spark.analysis import ja_vec
from lucene_solr_spark.analysis.ja import (ja_analyze, ja_tokenize)

FIX = pathlib.Path(__file__).parent / "fixtures"

_POOLS = [
    [chr(c) for c in range(0x3041, 0x3097)],             # hiragana
    [chr(c) for c in range(0x30A1, 0x30FB)] + ["ー"],     # katakana
    [chr(c) for c in range(0x4E00, 0x4E80)],              # kanji
    list("abcXYZ019"),                                    # latin/digit
    list("。、・「」！？  .,-()"),                          # punct/space
    [chr(c) for c in range(0x1F600, 0x1F610)],            # astral
    ["田", "中", "本", "読", "学", "生", "私", "は", "を",
     "です", "サーバ", "データ"],                           # dict words
]


def _rand_texts(seed, count, maxlen):
    rng = random.Random(seed)
    out = []
    for _ in range(count):
        n = rng.randint(0, maxlen)
        parts = []
        while sum(len(x) for x in parts) < n:
            p = rng.choice(_POOLS)
            parts.append("".join(rng.choice(p)
                                 for _ in range(rng.randint(1, 12))))
        out.append("".join(parts))
    return out


def _corpus():
    g = json.loads((FIX / "ja_golden.json").read_text(encoding="utf-8"))
    texts = list(g["lines"])
    texts += _rand_texts(42, 200, 300)
    texts += ["漢" * 1500,                  # gap-prune: all-kanji run
              "ア" * 1100 + "。" + "あ" * 50,  # gap-prune then normal
              "", "\U0001F600\U0001F601", "ー" * 6]
    return texts


def test_kernel_available():
    # gcc is in this container; the dense fallback is exercised via
    # the scalar comparisons below regardless
    assert ja_vec._kernel() is not None


def test_tokenize_differential():
    texts = _corpus()
    got = ja_vec.ja_tokenize_batch(texts)
    for t, g in zip(texts, got):
        assert g == ja_tokenize(t), repr(t[:60])


def test_analyze_differential():
    texts = _corpus()
    got = ja_vec.ja_analyze_batch(texts)
    for t, g in zip(texts, got):
        assert g == ja_analyze(t), repr(t[:60])


def test_gap_prune_docs_fall_back_identically():
    texts = ["漢" * 1500]
    lib = ja_vec._kernel()
    assert lib is not None
    raw = ja_vec._lattice_raw(texts, lib)
    assert raw is not None
    fb = raw[-1]
    assert fb[0] == 1  # kernel reported the prune branch
    assert ja_vec.ja_tokenize_batch(texts)[0] == ja_tokenize(texts[0])


def test_chain_tables_match_scalar_chain():
    # every KNOWN word id's precomputed final equals the scalar chain
    from lucene_solr_spark.analysis import ja as _ja
    d = _ja._load()
    known_final, unk_stop, _ = ja_vec._chain_tables()
    assert len(known_final) == len(d.e_left)
    for surface, wids in d.by_surface.items():
        for wid in wids:
            base = d.e_base[wid]
            tok = (surface, d.e_pos[wid],
                   None if base == surface else base)
            terms, _pos = _ja._chain([tok])
            want = terms[0] if terms else None
            assert known_final[wid] == want, (surface, wid)
