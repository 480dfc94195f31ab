"""Multilingual analyzer starter set (round-3 VERDICT item 8): the
ten light stemmers' python twins must match the REFERENCE stemmer
classes on every fixture pair (tests/fixtures/lang_stems.json was
produced by running the compiled reference classes through
tools/gen_lang_fixtures.py); plus elision/stop/chain laws."""
import json
from pathlib import Path

import pytest

from lucene_solr_spark.analysis.lang import (
    ELISION_ARTICLES, STEMMERS, elide, lang_analyze)
from lucene_solr_spark.analysis.lang_stop import STOP_SETS

FIX = Path(__file__).parent / "fixtures" / "lang_stems.json"


@pytest.mark.parametrize("lang", sorted(STEMMERS))
def test_stemmer_matches_reference(lang):
    pairs = json.loads(FIX.read_text())[lang]
    assert len(pairs) > 1500
    stem = STEMMERS[lang]
    bad = [(w, want, stem(w)) for w, want in pairs.items()
           if stem(w) != want]
    assert not bad, f"{len(bad)} divergences, first: {bad[:3]}"


def test_stop_sets_present_and_plausible():
    assert set(STOP_SETS) >= set(STEMMERS)
    assert "und" in STOP_SETS["de"] and "le" in STOP_SETS["fr"]
    assert "и" in STOP_SETS["ru"] and "och" in STOP_SETS["sv"]
    for lang, s in STOP_SETS.items():
        assert len(s) > 100, lang


def test_elision():
    assert elide("fr", "l'avion") == "avion"
    assert elide("fr", "L'avion") == "avion"      # ignore-case match
    assert elide("fr", "qu'il") == "il"
    assert elide("fr", "d’été") == "été"          # U+2019 apostrophe
    assert elide("fr", "x'y") == "x'y"            # non-article kept
    assert elide("it", "dell'arte") == "arte"
    assert elide("de", "l'x") == "l'x"            # no articles for de
    # only the FIRST apostrophe is considered
    assert elide("fr", "aujourd'hui") == "aujourd'hui"


def test_chain_stop_gaps_and_stemming():
    terms, pos = lang_analyze("de", "Die Häusern der Kindern")
    assert terms == ["haus", "kind"]
    assert pos == [1, 3]                          # stop gaps kept
    terms, pos = lang_analyze("fr", "L'avion et les chevaux")
    assert terms == ["avion", "cheval"]
    assert pos == [0, 3]


def test_chain_uses_exact_tokenizer():
    # UAX#29 apostrophe joining feeds the elision filter ONE token
    # ("jusqu'aux"); elision yields "aux", which the snowball stop set
    # then removes — leaving a position gap before "portes"
    terms, pos = lang_analyze("fr", "jusqu'aux portes")
    assert terms == ["port"]
    assert pos == [1]
    assert "aux" in STOP_SETS["fr"]


def test_articles_match_reference_sets():
    assert "jusqu" in ELISION_ARTICLES["fr"]
    assert "dall" in ELISION_ARTICLES["it"]
    assert len(ELISION_ARTICLES["fr"]) == 13
    assert len(ELISION_ARTICLES["it"]) == 21


def test_build_index_with_lang_analyzer(spark):
    """build_index(analyzer='de'|'fr'|...) runs the per-language chain
    through the Arrow UDF path end-to-end."""
    from lucene_solr_spark.index.builder import build_index
    df = spark.createDataFrame(
        [(0, "Die Häusern der Kindern sind schön"),
         (1, "L'avion et les chevaux")],
        "doc_id long, text string")
    de = {r["term"] for r in
          build_index(df, analyzer="de").postings.collect()}
    assert {"haus", "kind", "schon"} <= de
    assert "die" not in de and "der" not in de      # stopped
    fr = {r["term"] for r in
          build_index(df, analyzer="fr").postings.collect()}
    assert {"avion", "cheval"} <= fr                # elision + stem
    assert "les" not in fr
    with pytest.raises(ValueError):
        build_index(df, analyzer="klingon")
