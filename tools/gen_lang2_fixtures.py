#!/usr/bin/env python3
"""Second-wave language analyzer artifacts from the reference:

1. lucene_solr_spark/analysis/lang2_stop.py — stop sets read verbatim
   from the reference analyzer resources (ar/fa/bg/cz/hi/id/lv
   stopwords.txt; public data; '#' comments stripped).
2. tests/fixtures/lang2_golden.json — golden (term, posInc) streams
   produced by RUNNING the compiled reference analyzers
   (ArabicAnalyzer, PersianAnalyzer, BulgarianAnalyzer, CzechAnalyzer,
   HindiAnalyzer, IndonesianAnalyzer, LatvianAnalyzer) over per-
   language corpora: the full stop list, suffixed/prefixed combos over
   stop bases, seeded random script-alphabet words, digits,
   normalization-sensitive sequences.  The python twins in
   analysis/lang2.py must match token-for-token.

Reuses the /tmp/kuromoji scratch compile (core + analysis-common).
"""

import json
import random
import subprocess
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SCRATCH = Path("/tmp/kuromoji")
REF = Path("/root/reference/lucene/analysis/common/src")

LANGS = {
    "ar": "ar/stopwords.txt",
    "fa": "fa/stopwords.txt",
    "bg": "bg/stopwords.txt",
    "cz": "cz/stopwords.txt",
    "hi": "hi/stopwords.txt",
    "id": "id/stopwords.txt",
    "lv": "lv/stopwords.txt",
}
ALPHA = {
    "ar": [chr(c) for c in range(0x0621, 0x064B)] + ["ـ", "ً", "ُ"],
    "fa": [chr(c) for c in range(0x0621, 0x064B)]
    + ["ی", "ک", "ۀ", "ہ", "ے", "گ", "پ", "چ", "ژ"],
    "bg": list("абвгдежзийклмнопрстуфхцчшщъьюя"),
    "cz": list("abcdefghijklmnoprstuvyzáéíýůžščřě"),
    "hi": [chr(c) for c in range(0x0905, 0x0940)]
    + [chr(c) for c in range(0x093C, 0x094E)] + ["ँ", "ं"],
    "id": list("abcdefghijklmnopqrstuvwyz"),
    "lv": list("abcdefghijklmnoprstuvzāčēģīķļņšūž"),
}
SUFFIXES = {
    "ar": ["ها", "ان", "ات", "ون", "ين", "يه", "ية", "ه", "ة", "ي"],
    "fa": ["ی", "ها", "ان"],
    "bg": ["ият", "ът", "то", "те", "та", "ия", "ят", "овци", "ове",
           "еве", "ища", "ци", "зи", "си", "и", "я", "а", "о", "е",
           "ен"],
    "cz": ["atech", "ětem", "etem", "atům", "ech", "ích", "ého",
           "ěmi", "ému", "ích", "ami", "ové", "ovi", "ými", "em",
           "ům", "ám", "ou", "a", "e", "i", "o", "u", "ě", "í",
           "ov", "in", "ův", "čt", "št", "c", "z"],
    "hi": ["ाएंगी", "ाइयों", "ाएगी", "ियों", "ाकर", "ाया", "ेगी",
           "ाने", "ाते", "कर", "ने", "ना", "ते", "ती", "ों", "ो",
           "े", "ी", "ा"],
    "id": ["kah", "lah", "pun", "ku", "mu", "nya", "kan", "an", "i"],
    "lv": ["ajiem", "ajai", "iem", "ais", "ām", "ēm", "us", "os",
           "u", "a", "i", "e", "ā", "s", "š"],
}
PREFIXES = {
    "ar": ["ال", "وال", "بال", "كال", "فال", "لل", "و"],
    "id": ["meng", "meny", "men", "mem", "me", "peng", "peny", "pen",
           "pem", "di", "ter", "ke", "ber", "per", "pe"],
}
EXTRA = {
    # normalization-sensitive material
    "ar": ["آالأمر", "الإسلام", "مدرسة", "كتاب", "مكتبة", "١٢٣",
           "٤٥٦٧", "قـــلم", "كتابًا"],
    "fa": ["می‌رود", "کتاب‌ها", "دانشگاهۀ", "۱۲۳۴", "ہمارا",
           "بزرگی"],
    "bg": ["градът", "книгите", "хубава", "езици", "мъже"],
    "cz": ["městech", "pražští", "čeština", "zelení", "mužové"],
    "hi": ["लड़के", "हिन्दी", "किताबें", "१२३४", "करेंगे",
           "बच्चों"],
    "id": ["membaca", "pembacaan", "keterbukaan", "belajar",
           "pelajar", "menyanyi", "penyanyi"],
    "lv": ["cilvēkiem", "grāmatas", "valodās", "bērniem", "kaķis"],
}


def stop_words(lang):
    path = REF / "resources/org/apache/lucene/analysis" / LANGS[lang]
    words = []
    for line in path.read_text(encoding="utf-8").splitlines():
        line = line.split("#")[0].strip()
        if line:
            words.extend(line.split())
    return words


def corpus(lang, stops, rng):
    lines = []
    # the whole stop list, batched
    for i in range(0, len(stops), 12):
        lines.append(" ".join(stops[i:i + 12]))
    bases = [w for w in stops if len(w) > 3][:30] or stops[:30]
    alpha = ALPHA[lang]
    combo = []
    for b in bases:
        for suf in SUFFIXES[lang]:
            combo.append(b + suf)
        for pre in PREFIXES.get(lang, []):
            combo.append(pre + b)
    for i in range(0, len(combo), 10):
        lines.append(" ".join(combo[i:i + 10]))
    rand = []
    for _ in range(1200):
        k = rng.randint(1, 12)
        rand.append("".join(rng.choice(alpha) for _ in range(k)))
    for i in range(0, len(rand), 10):
        lines.append(" ".join(rand[i:i + 10]))
    lines.append(" ".join(EXTRA[lang]))
    lines.append("hello world 42 " + " ".join(EXTRA[lang][:2]))
    lines.append("")
    return lines


def main():
    # compile the harness against the existing scratch classes
    subprocess.run(
        ["javac", "-encoding", "UTF-8", "-nowarn", "-cp", "classes",
         str(REPO / "tools/kuromoji_harness/AnalyzeLang.java"),
         "-d", "."], check=True, cwd=SCRATCH)
    res = (f"{SCRATCH}/classes:"
           f"{REF.parent.parent}/common/src/resources")
    rng = random.Random(20260821)
    golden = {}
    stops_all = {}
    for lang in LANGS:
        stops = stop_words(lang)
        stops_all[lang] = stops
        lines = corpus(lang, stops, rng)
        blob = "\n".join(lines) + "\n"
        p = subprocess.run(
            ["java", "-cp", f".:classes:"
             f"{REF}/resources", "AnalyzeLang", lang],
            cwd=SCRATCH, input=blob.encode("utf-8"),
            capture_output=True)
        if p.returncode != 0:
            raise RuntimeError(p.stderr.decode()[-2000:])
        docs = []
        cur = []
        for ln in p.stdout.decode("utf-8").split("\n"):
            if ln == "":
                docs.append(cur)
                cur = []
            else:
                cur.append(ln.split("\t"))
        golden[lang] = {"lines": lines, "docs": docs[:len(lines)]}
        ntok = sum(len(d) for d in golden[lang]["docs"])
        print(f"{lang}: {len(lines)} lines, {ntok} tokens,"
              f" {len(stops)} stopwords")

    dst = REPO / "tests" / "fixtures" / "lang2_golden.json"
    dst.write_text(json.dumps(golden, ensure_ascii=False),
                   encoding="utf-8")
    out = REPO / "lucene_solr_spark" / "analysis" / "lang2_stop.py"
    with open(out, "w", encoding="utf-8") as fo:
        fo.write('"""Stop sets for the second-wave analyzers — '
                 "GENERATED by\ntools/gen_lang2_fixtures.py from the "
                 "reference analyzer resources\n(the same data the "
                 "reference analyzers load). Do not edit.\n"
                 '"""\n\nSTOP_SETS2 = {\n')
        for lang in sorted(stops_all):
            fo.write(f"    {lang!r}: frozenset((\n")
            row = []
            for w in stops_all[lang]:
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
