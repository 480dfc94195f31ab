#!/usr/bin/env python3
"""Generate the multilingual-analyzer artifacts from the reference:

1. tests/fixtures/lang_stems.json — (word -> stem) fixtures produced
   by RUNNING the reference light stemmer classes (compiled standalone
   in /tmp/stemmers with a tiny harness) over stop-list, inflected and
   random vocabularies per language; the pytest parity suite requires
   the python twins in analysis/lang.py to match every entry.
2. lucene_solr_spark/analysis/lang_stop.py — stop sets, read from the
   reference's published snowball/analyzer stop lists (public data;
   comment lines stripped, snowball '|' comments removed).
"""
import json
import random
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SCRATCH = Path("/tmp/stemmers")
REF = Path("/root/reference/lucene/analysis/common/src")
LANGS = {
    "de": ("de/GermanLightStemmer.java", "snowball/german_stop.txt"),
    "fr": ("fr/FrenchLightStemmer.java", "snowball/french_stop.txt"),
    "es": ("es/SpanishLightStemmer.java", "snowball/spanish_stop.txt"),
    "it": ("it/ItalianLightStemmer.java", "snowball/italian_stop.txt"),
    "pt": ("pt/PortugueseLightStemmer.java",
           "snowball/portuguese_stop.txt"),
    "ru": ("ru/RussianLightStemmer.java", "snowball/russian_stop.txt"),
    "sv": ("sv/SwedishLightStemmer.java", "snowball/swedish_stop.txt"),
    "no": ("no/NorwegianLightStemmer.java",
           "snowball/norwegian_stop.txt"),
    "fi": ("fi/FinnishLightStemmer.java", "snowball/finnish_stop.txt"),
    "hu": ("hu/HungarianLightStemmer.java",
           "snowball/hungarian_stop.txt"),
}
SUFFIXES = {
    "de": ["ern", "en", "er", "es", "e", "st", "est", "s", "n"],
    "fr": ["x", "aux", "s", "issement", "issant", "ement", "ficatrice",
           "ficateur", "catrice", "cateur", "atrice", "ateur", "trice",
           "ième", "teuse", "teur", "euse", "ère", "ive", "folle",
           "molle", "nnelle", "nnel", "ète", "ique", "esse", "inage",
           "isation", "isateur", "ation", "ition", "ie", "r", "e"],
    "es": ["o", "a", "e", "os", "as", "es", "eses", "ces"],
    "it": ["e", "i", "a", "o", "ie", "he", "hi", "ii", "ia", "io"],
    "pt": ["es", "ns", "eis", "éis", "ais", "óis", "is", "ões", "ães",
           "mente", "s", "inha", "iaca", "eira", "osa", "ica", "ida",
           "ada", "iva", "ama", "ona", "ora", "esa", "na", "a", "e",
           "o"],
    "ru": ["иями", "оями", "ами", "его", "ому", "ая", "ой", "ый",
           "ов", "а", "я", "ь", "и", "нн", "н"],
    "sv": ["s", "elser", "heten", "arne", "erna", "ande", "else",
           "aste", "orna", "aren", "are", "ast", "het", "ar", "er",
           "or", "en", "at", "te", "et", "t", "a", "e", "n"],
    "no": ["s", "heter", "heten", "dom", "het", "elser", "elsen",
           "ende", "else", "este", "eren", "ere", "est", "ene", "er",
           "en", "et", "st", "te", "a", "e", "n"],
    "fi": ["kin", "ko", "dellinen", "dellisuus", "lla", "tse", "sti",
           "ni", "aa", "nnen", "ntena", "tten", "eiden", "neen",
           "niin", "seen", "teen", "inen", "han", "den", "ksen",
           "ssa", "sta", "lta", "tta", "ksi", "lle", "na", "ne",
           "nei", "ja", "ta", "a", "n", "hde", "ei", "at"],
    "hu": ["kent", "nak", "nek", "val", "vel", "ban", "ben", "hoz",
           "al", "el", "at", "et", "ot", "on", "en", "t", "n", "a",
           "e", "atok", "etek", "itek", "unk", "tok", "juk", "ink",
           "am", "om", "uk", "nk", "ja", "je", "im", "ik", "k", "ak",
           "ok", "ek", "i", "o"],
}
ALPHA = {
    "ru": "абвгдежзиклмнопрстуйыьяё",
    "fi": "abdehijklmnoprstuvyäö",
    "hu": "abcdefghijklmnoprstuvzáéíóöőúüű",
    "de": "abcdefghiklmnopqrstuvwzäöüß",
    "fr": "abcdefghijlmnopqrstuvzàâçèéêîôû",
}


def build():
    SCRATCH.mkdir(exist_ok=True)
    for lang, (src, _) in LANGS.items():
        code = (REF / "java/org/apache/lucene/analysis" / src) \
            .read_text()
        code = re.sub(r"^package .*$", "", code, flags=re.M)
        code = code.replace(
            "import static org.apache.lucene.analysis.util."
            "StemmerUtil.*;", "")
        for fn in ("endsWith", "delete", "deleteN"):
            code = re.sub(rf"\b{fn}\(", f"StemmerUtil.{fn}(", code)
        (SCRATCH / Path(src).name).write_text(code)
    util = (REF / "java/org/apache/lucene/analysis/util/"
            "StemmerUtil.java").read_text()
    util = re.sub(r"^package .*$", "", util, flags=re.M)
    (SCRATCH / "StemmerUtil.java").write_text(util)
    (SCRATCH / "StemHarness.java").write_text(
        (REPO / "tools" / "uax29_harness" / "StemHarness.java")
        .read_text())
    subprocess.run(["javac", "-encoding", "UTF-8"] +
                   [p.name for p in SCRATCH.glob("*.java")],
                   cwd=SCRATCH, check=True)


def stop_words(lang):
    path = REF / "resources/org/apache/lucene/analysis" / \
        LANGS[lang][1]
    words = []
    for line in path.read_text(encoding="utf-8").splitlines():
        line = line.split("|")[0].strip()
        if line and not line.startswith("#"):
            for w in line.split():
                words.append(w)
    return words


def main():
    if not (SCRATCH / "StemHarness.class").exists():
        build()
    rng = random.Random(5)
    fixtures = {}
    stops = {}
    for lang in LANGS:
        stops[lang] = stop_words(lang)
        vocab = set(stops[lang])
        bases = [w for w in stops[lang] if len(w) > 3][:40] or \
            list(vocab)[:40]
        alpha = ALPHA.get(lang, "abcdefghijklmnoprstuv")
        for b in bases:
            for suf in SUFFIXES[lang]:
                vocab.add(b + suf)
        for _ in range(1500):
            k = rng.randint(1, 14)
            vocab.add("".join(rng.choice(alpha) for _ in range(k)))
        vocab = sorted(vocab)
        p = subprocess.run(
            ["java", "StemHarness", lang], cwd=SCRATCH,
            input="\n".join(vocab).encode("utf-8"),
            capture_output=True, check=True)
        pairs = {}
        for line in p.stdout.decode("utf-8").splitlines():
            w, s = line.split("\t")
            pairs[w] = s
        fixtures[lang] = pairs
        print(lang, len(pairs), "pairs,", len(stops[lang]),
              "stop words")
    dst = REPO / "tests" / "fixtures" / "lang_stems.json"
    dst.write_text(json.dumps(fixtures, ensure_ascii=False))
    out = REPO / "lucene_solr_spark" / "analysis" / "lang_stop.py"
    with open(out, "w", encoding="utf-8") as fo:
        fo.write('"""Stop sets for the multilingual analyzers — '
                 "GENERATED by\ntools/gen_lang_fixtures.py from the "
                 "published snowball stop lists\n(the same data the "
                 "reference analyzers load). Do not edit.\n"
                 '"""\n\nSTOP_SETS = {\n')
        for lang in sorted(stops):
            fo.write(f"    {lang!r}: frozenset((\n")
            row = []
            for w in stops[lang]:
                row.append(repr(w))
                if sum(len(x) for x in row) > 52:
                    fo.write("        " + ", ".join(row) + ",\n")
                    row = []
            if row:
                fo.write("        " + ", ".join(row) + ",\n")
            fo.write("    )),\n")
        fo.write("}\n")
    print(f"wrote {dst} and {out}")


if __name__ == "__main__":
    main()
