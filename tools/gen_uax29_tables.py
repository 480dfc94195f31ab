#!/usr/bin/env python3
"""Generate exact UAX#29 word-break class tables by BEHAVIORAL probing
of the reference StandardTokenizer DFA (no code or data tables are
copied — every classification is inferred from the observable
tokenization of probe strings).

Pipeline (see tools/uax29_harness/README):
  1. copy + patch the generated StandardTokenizerImpl.java (drop the
     CharTermAttribute accessor, inline the type constants) into a
     scratch dir; compile with javac alongside Harness.java;
  2. `java Harness sweep` prints, for every codepoint, the token
     signature of 8 probe strings (the char alone; a_b; 1_1; lead;
     trail; hebrew-quote; char+skin-tone; thumbs-up+char);
  3. this script infers the WB/emoji class flags per codepoint from
     those signatures and writes lucene_solr_spark/analysis/
     uax29_tables.py as compact sorted range lists.

Probe-to-class logic (token types: 0 WORD 1 NUM 2 SA 3 IDEO 4 HIRA
5 KATAKANA 6 HANGUL 7 EMOJI):
  single==[(0,1)]        -> ALetter (Hebrew iff "c'" is one 2-cp token)
  single==[(1,1)]        -> Numeric     single==[(5,1)] -> Katakana
  single==[(6,1)]        -> Hangul      single==[(2,1)] -> SA
  single==[(3,1)]        -> Han         single==[(4,1)] -> Hiragana
  single==[(7,1)]        -> EmojiChar (modifier iff EMB+c is one token)
  trail "ac"==[(0,2)] & lead "ca"==[(0,2)] & single==[] -> ExtendNumLet
  trail==[(0,2)] & lead starts shorter & not above     -> Extend|Format|ZWJ
  single==[] & "acb"==[(0,3)] & "1c1"==[(1,3)]         -> MidNumLet
  single==[] & "acb"==[(0,3)] & "1c1" split            -> MidLetter
  single==[] & "1c1"==[(1,3)] & "acb" split            -> MidNum
  c+skin-tone one 2-cp EMOJI token                     -> Emoji_Mod_Base
Spec-constant singletons (positions fixed by UAX#29/TR51, verified by
the fuzz suite): ' " ZWJ FE0E FE0F 20E3 tags E0020-E007F RI [0-9#*].
"""
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SCRATCH = Path("/tmp/uax29")
REF = Path("/root/reference/lucene/core/src/java/org/apache/lucene/"
           "analysis/standard/StandardTokenizerImpl.java")


def build_harness():
    SCRATCH.mkdir(exist_ok=True)
    import re
    src = REF.read_text()
    src = src.replace("package org.apache.lucene.analysis.standard;", "")
    src = src.replace(
        "import org.apache.lucene.analysis.tokenattributes."
        "CharTermAttribute;", "")
    src = re.sub(r"  /\*\*\n   \* Fills CharTermAttribute.*?\n  \}\n",
                 "", src, flags=re.S)
    for k, v in {"ALPHANUM": 0, "NUM": 1, "SOUTHEAST_ASIAN": 2,
                 "IDEOGRAPHIC": 3, "HIRAGANA": 4, "KATAKANA": 5,
                 "HANGUL": 6, "EMOJI": 7}.items():
        src = src.replace(f"StandardTokenizer.{k}", str(v))
    (SCRATCH / "StandardTokenizerImpl.java").write_text(src)
    harness = REPO / "tools" / "uax29_harness" / "Harness.java"
    (SCRATCH / "Harness.java").write_text(harness.read_text())
    subprocess.run(["javac", "StandardTokenizerImpl.java",
                    "Harness.java"], cwd=SCRATCH, check=True)


def sig(s):
    if not s:
        return ()
    return tuple(tuple(int(x) for x in part.split(":"))
                 for part in s.split(";"))


def main():
    sweep = SCRATCH / "sweep.txt"
    if not sweep.exists():
        build_harness()
        with open(sweep, "w") as f:
            subprocess.run(["java", "Harness", "sweep"], cwd=SCRATCH,
                           stdout=f, check=True)

    flags = {}  # cp -> set of flag names

    def add(cp, f):
        flags.setdefault(cp, set()).add(f)

    W, N, SA, IDEO, HIRA, KATA, HANG, EMO = range(8)
    for line in open(sweep):
        parts = line.rstrip("\n").split("|")
        cp = int(parts[0])
        single, ab, oneone, lead, trail, hebq, cmod, embc = \
            (sig(p) for p in parts[1:9])
        if single == ((W, 1),):
            add(cp, "hebrew" if hebq == ((W, 2),) else "aletter")
        elif single == ((N, 1),):
            add(cp, "numeric")
        elif single == ((KATA, 1),):
            add(cp, "katakana")
        elif single == ((HANG, 1),):
            add(cp, "hangul")
        elif single == ((IDEO, 1),):
            add(cp, "han")
        elif single == ((HIRA, 1),):
            add(cp, "hiragana")
        elif single == ((EMO, 1),):
            if embc == ((EMO, 2),):
                add(cp, "emoji_mod")
            else:
                add(cp, "emoji_char")
        if single == ((SA, 1),):
            add(cp, "sa")
        enl = (trail == ((W, 2),) and lead == ((W, 2),)
               and single == ())
        if enl:
            add(cp, "extnumlet")
        if (trail == ((W, 2),) and not enl
                and single in ((), ((SA, 1),))
                and (not lead or lead[0][1] != 2)):
            add(cp, "extfmt")
        if single == () and not enl and "extfmt" not in flags.get(cp, ()):
            if ab == ((W, 3),) and oneone == ((N, 3),):
                add(cp, "midnumlet")
            elif ab == ((W, 3),):
                add(cp, "midletter")
            elif oneone == ((N, 3),):
                add(cp, "midnum")
        if cmod == ((EMO, 2),) and single == ((EMO, 1),):
            add(cp, "emoji_mod_base")

    # spec-constant singletons / ranges
    for cp, f in [(0x27, "squote"), (0x22, "dquote"), (0x200D, "zwj"),
                  (0xFE0E, "vs15"), (0xFE0F, "vs16"),
                  (0x20E3, "keycap"), (0xE007F, "tagterm"),
                  (0x23, "kcb"), (0x2A, "kcb")]:
        add(cp, f)
    for cp in range(0x30, 0x3A):
        add(cp, "kcb")
    for cp in range(0xE0020, 0xE007F):
        add(cp, "tagspec")
    for cp in range(0x1F1E6, 0x1F200):
        add(cp, "ri")

    # drop pure-probe-artifact empties, build ranges per flag
    names = sorted({f for s in flags.values() for f in s})
    ranges = {f: [] for f in names}
    for f in names:
        cps = sorted(cp for cp, s in flags.items() if f in s)
        start = prev = None
        for cp in cps:
            if start is None:
                start = prev = cp
            elif cp == prev + 1:
                prev = cp
            else:
                ranges[f].append((start, prev))
                start = prev = cp
        if start is not None:
            ranges[f].append((start, prev))

    # LowerCaseFilter parity: Java Character.toLowerCase(int) vs
    # python per-cp str.lower() — record the divergent cps (the
    # reference's simple 1:1 mapping, frozen at its Unicode version)
    lower_txt = SCRATCH / "lower.txt"
    if not lower_txt.exists():
        lj = REPO / "tools" / "uax29_harness" / "Lower.java"
        (SCRATCH / "Lower.java").write_text(lj.read_text())
        subprocess.run(["javac", "Lower.java"], cwd=SCRATCH, check=True)
        with open(lower_txt, "w") as f:
            subprocess.run(["java", "Lower"], cwd=SCRATCH, stdout=f,
                           check=True)
    javamap = {}
    for line in open(lower_txt):
        a, b = line.split()
        javamap[int(a)] = int(b)
    lower_exc = {}
    for cp in range(0x110000):
        if 0xD800 <= cp <= 0xDFFF:
            continue
        j = javamap.get(cp, cp)
        if chr(cp).lower() != chr(j):
            lower_exc[cp] = j

    out = REPO / "lucene_solr_spark" / "analysis" / "uax29_tables.py"
    with open(out, "w") as fo:
        fo.write('"""UAX#29 word-break / emoji class tables for the\n'
                 "reference StandardTokenizer's Unicode version —\n"
                 "GENERATED by tools/gen_uax29_tables.py via behavioral\n"
                 "probing of the reference DFA (no reference code or\n"
                 "UCD files copied). Do not edit by hand.\n"
                 '"""\n\n')
        fo.write("RANGES = {\n")
        for f in names:
            fo.write(f"    {f!r}: (\n")
            row = []
            for a, b in ranges[f]:
                row.append(f"({a},{b})")
                if len(row) == 6:
                    fo.write("        " + ",".join(row) + ",\n")
                    row = []
            if row:
                fo.write("        " + ",".join(row) + ",\n")
            fo.write("    ),\n")
        fo.write("}\n\n")
        fo.write("# codepoints where python str.lower() differs from "
                 "the reference's\n# per-codepoint simple lowercase "
                 "(Character.toLowerCase)\n")
        fo.write("LOWER_EXC = {\n")
        items = sorted(lower_exc.items())
        for i in range(0, len(items), 6):
            fo.write("    " + ", ".join(
                f"{a}: {b}" for a, b in items[i:i + 6]) + ",\n")
        fo.write("}\n")
    print(f"wrote {out}")
    for f in names:
        n = sum(b - a + 1 for a, b in ranges[f])
        print(f"  {f}: {len(ranges[f])} ranges, {n} cps")


if __name__ == "__main__":
    sys.exit(main())
