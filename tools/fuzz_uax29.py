#!/usr/bin/env python3
"""Differential fuzz of lucene_solr_spark.analysis.uax29.segment
against the reference StandardTokenizerImpl DFA (Java harness in
/tmp/uax29 — run tools/gen_uax29_tables.py first to build it).

Prints each divergence (input, expected, got); exit code 1 if any.
"""
import random
import subprocess
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from lucene_solr_spark.analysis.uax29 import segment  # noqa: E402
from lucene_solr_spark.analysis.uax29_tables import RANGES  # noqa: E402

SCRATCH = "/tmp/uax29"


def ref_tokens(docs):
    """[(type, char_start, cps)] per doc from the Java DFA."""
    payload = "\x00".join(docs).encode("utf-8")
    p = subprocess.run(["java", "Harness", "tok"], cwd=SCRATCH,
                       input=payload, capture_output=True, check=True)
    out = []
    cur = []
    for line in p.stdout.decode("utf-8").splitlines():
        if not line:
            out.append(cur)
            cur = []
            continue
        t, start, hexcps = line.split(",", 2)
        cps = "".join(chr(int(h, 16)) for h in hexcps.split("-"))
        cur.append((int(t), cps))
    while len(out) < len(docs):
        out.append(cur)
        cur = []
    return out


def my_tokens(doc):
    return [(t, doc[a:b]) for a, b, t in segment(doc)]


def pool():
    """Representative chars per class + plain ASCII + specials."""
    rng = random.Random(20260821)
    chars = list("abz19 .,:'\"_-#*\t\n")
    for f, ranges in RANGES.items():
        picks = []
        flat = [cp for a, b in ranges for cp in (a, b, (a + b) // 2)]
        picks = rng.sample(flat, min(12, len(flat)))
        chars += [chr(c) for c in picks]
    chars += [chr(c) for c in
              (0x200D, 0xFE0E, 0xFE0F, 0x20E3, 0xE0020, 0xE007F,
               0x1F1E6, 0x1F1E7, 0x1F3FB, 0x1F44D, 0x1F600, 0x0E01,
               0x0E31, 0xAC00, 0x4E00, 0x3042, 0x30A2, 0x05D0, 0x05F3,
               0x0301, 0x00AD, 0x070F, 0xFF10, 0xFF21, 0x0660)]
    return chars


def main():
    n_cases = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    rng = random.Random(seed)
    chars = pool()
    docs = []
    for _ in range(n_cases):
        k = rng.randint(0, 12)
        docs.append("".join(rng.choice(chars) for _ in range(k)))
    # fixed interesting cases
    docs += [
        "hello wor.ld 3.14 1,000 don't o'clock a_b_c",
        "א'ב א\"ב x:y 3:4",
        "\U0001F1EB\U0001F1F7\U0001F1EB\U0001F1F7\U0001F1EB",
        "3⃣ #️⃣ *⃣",
        "\U0001F469‍\U0001F4BB \U0001F44D\U0001F3FB",
        "\U0001F3F4\U000E0067\U000E0062\U000E0073\U000E0063\U000E0074"
        "\U000E007F",
        "กักก abćdef a­b",
        "アート あか 가나 中文",
        "a" * 260, "1" * 300, "一" * 5,
    ]
    refs = ref_tokens(docs)
    bad = 0
    for doc, want in zip(docs, refs):
        got = my_tokens(doc)
        if got != want:
            bad += 1
            if bad <= 20:
                print("DIVERGE on", repr(doc))
                print("  want:", want)
                print("  got :", got)
    print(f"{len(docs)} cases, {bad} divergences")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
