#!/usr/bin/env python3
"""Kuromoji-class Japanese analysis artifacts, generated from the
reference with its OWN machinery.

Feasibility note (round 4): the reference snapshot ships kuromoji's
code and most of the compiled IPADIC resources, but
``TokenInfoDictionary$buffer.dat`` (per-word costs/features of the
full 390k-entry IPADIC lexicon) is MISSING, so the stock
JapaneseAnalyzer cannot even instantiate in this sandbox and
full-IPADIC output can be neither produced nor verified here.  What
IS complete: ConnectionCosts.dat (the real 1316x1316 bigram cost
matrix), the UnknownDictionary (real per-character-class entries),
CharacterDefinition.dat, posDict.dat (real context-id -> POS), and
the stopword/stoptag resources.

So this harness builds a COMPACT lexicon (~190 entries: particles,
auxiliaries, conjugated verb/adjective forms with base forms, common
and proper nouns, katakana loanwords) in IPADIC CSV format using REAL
IPADIC context ids (looked up by POS from posDict.dat, so the real
connection matrix applies real bigram costs), compiles it with the
REFERENCE's TokenInfoDictionaryBuilder, and runs the REFERENCE
JapaneseTokenizer + the exact JapaneseAnalyzer filter chain over a
corpus to produce golden fixtures.  The python implementation
(analysis/ja.py) must match token-for-token; the dictionary artifact
format is exactly what a full IPADIC export would use, so a complete
lexicon can be dropped in without code changes.

Outputs:
  lucene_solr_spark/analysis/ja_dict/{lexicon.csv, entries.tsv.gz,
      costs.bin.gz, chardef.tsv.gz, unk.tsv.gz, stopwords.txt,
      stoptags.txt}
  tests/fixtures/ja_golden.json      (analyzer-level: term/posInc)
  tests/fixtures/ja_golden_tok.json  (tokenizer+baseform debug level)
"""

import gzip
import json
import random
import shutil
import subprocess
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SCRATCH = Path("/tmp/kuromoji")
REF = Path("/root/reference/lucene")
RES = (f"{REF}/analysis/kuromoji/src/resources:"
       f"{REF}/analysis/common/src/resources")
OUT = REPO / "lucene_solr_spark" / "analysis" / "ja_dict"
FIX = REPO / "tests" / "fixtures"


def build_scratch():
    SCRATCH.mkdir(exist_ok=True)
    classes = SCRATCH / "classes"
    if not (classes / "org/apache/lucene/analysis/ja/"
            "JapaneseTokenizer.class").exists():
        classes.mkdir(exist_ok=True)
        lists = {}
        for name, sub in (("core", "core/src/java"),
                          ("common", "analysis/common/src/java"),
                          ("kuro", "analysis/kuromoji/src/java")):
            files = sorted(str(p) for p in
                           (REF / sub).rglob("*.java"))
            lf = SCRATCH / f"{name}.list"
            lf.write_text("\n".join(files))
            lists[name] = lf
        subprocess.run(
            ["javac", "-encoding", "UTF-8", "-nowarn", "-d",
             str(classes)] + [f"@{p}" for p in lists.values()],
            check=True, cwd=SCRATCH)
    # the package-access shim + harness
    extra = SCRATCH / "extra/org/apache/lucene/analysis/ja/util"
    extra.mkdir(parents=True, exist_ok=True)
    shutil.copy(REPO / "tools/kuromoji_harness/MiniDictBuilder.java",
                extra)
    subprocess.run(
        ["javac", "-encoding", "UTF-8", "-nowarn", "-cp", "classes",
         "-d", "classes", str(extra / "MiniDictBuilder.java")],
        check=True, cwd=SCRATCH)
    shutil.copy(REPO / "tools/kuromoji_harness/DumpKuromoji.java",
                SCRATCH)
    subprocess.run(
        ["javac", "-encoding", "UTF-8", "-nowarn", "-cp", "classes",
         "-d", ".", "DumpKuromoji.java"], check=True, cwd=SCRATCH)


def harness(mode, *args, stdin=None):
    p = subprocess.run(
        ["java", "-cp", f".:classes:{RES}", "DumpKuromoji", mode,
         *args],
        cwd=SCRATCH, input=stdin.encode() if stdin else None,
        capture_output=True)
    if p.returncode != 0:
        raise RuntimeError(p.stderr.decode()[-3000:])
    return p.stdout.decode("utf-8")


def load_posdict():
    """(pos, conjType, conjForm) -> first real IPADIC context id."""
    first = {}
    for line in harness("posdict").splitlines():
        cid, pos, ctype, cform = (line.split("\t") + ["", ""])[:4]
        key = (pos, ctype, cform)
        first.setdefault(key, int(cid))
    return first


# --------------------------------------------------------------- lexicon
# (surface, posDict-style key, wordCost, baseForm-or-None)
# key = (dash-joined POS, conjType, conjForm); ids resolved against the
# REAL posDict so the REAL connection matrix scores transitions.

def lexicon_rows():
    P = []

    def e(surface, pos, cost, base=None, ctype="", cform=""):
        P.append((surface, (pos, ctype, cform), cost, base))

    # particles
    for s in ["が", "を", "に", "で", "と", "へ"]:
        e(s, "助詞-格助詞-一般", 500)
    e("から", "助詞-格助詞-一般", 600)
    for s in ["は", "も"]:
        e(s, "助詞-係助詞", 500)
    e("の", "助詞-連体化", 400)
    for s in ["か", "ね", "よ"]:
        e(s, "助詞-終助詞", 700)
    for s in ["て", "ながら"]:
        e(s, "助詞-接続助詞", 600)
    e("まで", "助詞-副助詞", 700)
    # auxiliaries
    e("です", "助動詞", 450, ctype="特殊・デス", cform="基本形")
    e("でし", "助動詞", 500, "です", ctype="特殊・デス",
      cform="連用形")
    e("ます", "助動詞", 450, ctype="特殊・マス", cform="基本形")
    e("まし", "助動詞", 500, "ます", ctype="特殊・マス",
      cform="連用形")
    e("た", "助動詞", 400, ctype="特殊・タ", cform="基本形")
    e("ない", "助動詞", 500, ctype="特殊・ナイ", cform="基本形")
    e("だ", "助動詞", 450, ctype="特殊・ダ", cform="基本形")
    e("な", "助動詞", 550, "だ", ctype="特殊・ダ", cform="体言接続")
    e("だっ", "助動詞", 500, "だ", ctype="特殊・ダ",
      cform="連用タ接続")
    # verbs (conjugated surfaces are separate IPADIC entries with the
    # dictionary form in the baseForm feature)
    e("する", "動詞-自立", 3500, ctype="サ変・スル", cform="基本形")
    e("し", "動詞-自立", 3600, "する", ctype="サ変・スル",
      cform="連用形")
    e("せ", "動詞-自立", 3700, "する", ctype="サ変・スル",
      cform="未然形")
    for base, forms in [
        ("食べる", [("食べる", "基本形", None),
                    ("食べ", "連用形", "食べる")]),
        ("見る", [("見る", "基本形", None), ("見", "連用形", "見る")]),
        ("いる", [("いる", "基本形", None), ("い", "連用形", "いる")]),
    ]:
        for surf, cform, b in forms:
            e(surf, "動詞-自立", 3500 if b is None else 3650, b,
              ctype="一段", cform=cform)
    e("行く", "動詞-自立", 3500, ctype="五段・カ行促音便",
      cform="基本形")
    e("行っ", "動詞-自立", 3650, "行く", ctype="五段・カ行促音便",
      cform="連用タ接続")
    e("行き", "動詞-自立", 3650, "行く", ctype="五段・カ行促音便",
      cform="連用形")
    e("書く", "動詞-自立", 3500, ctype="五段・カ行イ音便",
      cform="基本形")
    e("書い", "動詞-自立", 3650, "書く", ctype="五段・カ行イ音便",
      cform="連用タ接続")
    e("書き", "動詞-自立", 3650, "書く", ctype="五段・カ行イ音便",
      cform="連用形")
    e("話す", "動詞-自立", 3500, ctype="五段・サ行", cform="基本形")
    e("話し", "動詞-自立", 3650, "話す", ctype="五段・サ行",
      cform="連用形")
    for base, ta, ren in [("使う", "使っ", "使い"),
                          ("思う", "思っ", "思い"),
                          ("言う", "言っ", "言い")]:
        e(base, "動詞-自立", 3500, ctype="五段・ワ行促音便",
          cform="基本形")
        e(ta, "動詞-自立", 3650, base, ctype="五段・ワ行促音便",
          cform="連用タ接続")
        e(ren, "動詞-自立", 3650, base, ctype="五段・ワ行促音便",
          cform="連用形")
    for base, ta, ren in [("ある", "あっ", "あり"),
                          ("なる", "なっ", "なり")]:
        e(base, "動詞-自立", 3500, ctype="五段・ラ行", cform="基本形")
        e(ta, "動詞-自立", 3650, base, ctype="五段・ラ行",
          cform="連用タ接続")
        e(ren, "動詞-自立", 3650, base, ctype="五段・ラ行",
          cform="連用形")
    e("読む", "動詞-自立", 3500, ctype="五段・マ行", cform="基本形")
    e("読ん", "動詞-自立", 3650, "読む", ctype="五段・マ行",
      cform="連用タ接続")
    # adjectives
    for base in ["新しい", "大きい", "小さい", "高い", "早い"]:
        e(base, "形容詞-自立", 4000, ctype="形容詞・アウオ段",
          cform="基本形")
    e("早く", "形容詞-自立", 4100, "早い", ctype="形容詞・アウオ段",
      cform="連用テ接続")
    e("高かっ", "形容詞-自立", 4100, "高い", ctype="形容詞・アウオ段",
      cform="連用タ接続")
    # nouns: sahen (suru-compatible)
    for s in ["検索", "解析", "開発", "勉強", "旅行", "研究"]:
        e(s, "名詞-サ変接続", 3000)
    # nouns: general
    for s in ["索引", "文書", "言語", "辞書", "情報", "技術", "学生",
              "先生", "会社", "電車", "学校", "本", "水", "山", "犬",
              "猫", "人", "大学", "日本語", "形態素", "単語", "文字"]:
        e(s, "名詞-一般", 3200)
    for s in ["今日", "明日", "今"]:
        e(s, "名詞-副詞可能", 3200)
    # proper nouns
    for s in ["日本", "東京", "京都", "大阪"]:
        e(s, "名詞-固有名詞-地域-一般", 3800)
    for s in ["田中", "山田"]:
        e(s, "名詞-固有名詞-人名-姓", 4000)
    e("さん", "名詞-接尾-人名", 2500)
    e("語", "名詞-接尾-一般", 2800)
    # pronouns / adverbs / prenominals / conjunctions
    for s in ["私", "これ", "それ"]:
        e(s, "名詞-代名詞-一般", 3000)
    for s in ["とても", "もう"]:
        e(s, "副詞-一般", 3500)
    for s in ["この", "その"]:
        e(s, "連体詞", 3200)
    for s in ["しかし", "そして"]:
        e(s, "接続詞", 3500)
    # katakana loanwords (サーバー/メモリー exercise KatakanaStemFilter)
    for s in ["コンピュータ", "データ", "システム", "サーバー",
              "メモリー", "ソフトウェア", "エンジン", "ライブラリ"]:
        e(s, "名詞-一般", 3400)
    # punctuation as KNOWN entries (discarded at emission but real in
    # the lattice, like IPADIC)
    e("。", "記号-句点", 100)
    e("、", "記号-読点", 100)
    return P


def make_csv(posdict):
    rows = []
    for surface, key, cost, base in lexicon_rows():
        if key not in posdict:
            raise KeyError(f"no real context id for {key}")
        cid = posdict[key]
        pos, ctype, cform = key
        parts = (pos.split("-") + ["*", "*", "*"])[:4]
        ctype = ctype or "*"
        cform = cform or "*"
        baseform = base if base else surface
        # surface,leftId,rightId,wordCost,pos1..4,conjType,conjForm,
        # baseForm,reading,pronunciation
        rows.append(",".join([
            surface, str(cid), str(cid), str(cost), *parts, ctype,
            cform, baseform, "*", "*"]))
    return "\n".join(rows) + "\n"


def corpus(entries):
    lines = [
        "私は学生です。",
        "田中さんは東京の大学で日本語を勉強しています。",
        "検索エンジンの索引を開発した。",
        "形態素解析は言語情報技術です。",
        "コンピュータでデータを解析します。",
        "サーバーのメモリーがとても大きい。",
        "山田さんと京都へ行った。",
        "本を読む。",
        "犬と猫がいる。",
        "この辞書は新しい。",
        "その文書を書いた人は先生です。",
        "しかし電車はもう早く行きました。",
        "今日は会社で旅行の話しをした。",
        "日本語の単語と文字を研究する。",
        "高かったシステムを使っています。",
        "それは大阪の学校でした。",
        "水と山が高い。",
        "ソフトウェアのライブラリを使う。",
        "",
        "hello world 123",
        "ＡＢＣ１２３は全角です。",
        "カタカナノナガイレンゾクヲテスト",
        "2024年の開発。",
        "。。。",
        "   ",
        "日本Lucene検索ライブラリ",
        "未知漢字熟語連続",   # unknown kanji (not in lexicon)
        "ぴゃぴゅぴょ",        # unknown hiragana run
    ]
    # seeded random sentences over the lexicon
    rng = random.Random(20260821)
    surfaces = [r.split(",")[0] for r in entries.splitlines()]
    nouns = [s for s in surfaces if s in
             {"検索", "索引", "文書", "言語", "辞書", "情報", "技術",
              "学生", "先生", "会社", "電車", "学校", "本", "犬",
              "猫", "人", "大学", "日本語", "データ", "システム",
              "日本", "東京", "京都", "私", "これ"}]
    parts = ["は", "が", "を", "に", "で", "の", "と"]
    verbs = ["する", "した", "します", "行く", "見る", "使う",
             "読む", "ある", "いる", "書いた", "食べた"]
    for _ in range(60):
        n = rng.randint(1, 3)
        s = ""
        for _i in range(n):
            s += rng.choice(nouns) + rng.choice(parts)
        s += rng.choice(nouns) + rng.choice(parts) + \
            rng.choice(verbs) + "。"
        lines.append(s)
    return lines


def main():
    build_scratch()
    posdict = load_posdict()

    csv = make_csv(posdict)
    csvdir = SCRATCH / "lexcsv"
    if csvdir.exists():
        shutil.rmtree(csvdir)
    csvdir.mkdir()
    (csvdir / "lexicon.csv").write_text(csv, encoding="utf-8")

    dictdir = SCRATCH / "customdict"
    if dictdir.exists():
        shutil.rmtree(dictdir)
    dictdir.mkdir()
    print(harness("builddict", str(csvdir), str(dictdir)).strip())

    dumpdir = SCRATCH / "dump"
    if dumpdir.exists():
        shutil.rmtree(dumpdir)
    dumpdir.mkdir()
    print(harness("dump", str(dictdir), str(dumpdir)).strip())

    OUT.mkdir(parents=True, exist_ok=True)
    (OUT / "lexicon.csv").write_text(csv, encoding="utf-8")
    for name in ["entries.tsv", "costs.bin", "chardef.tsv",
                 "unk.tsv"]:
        data = (dumpdir / name).read_bytes()
        with gzip.open(OUT / (name + ".gz"), "wb", compresslevel=9) \
                as f:
            f.write(data)
    for name in ["stopwords.txt", "stoptags.txt"]:
        shutil.copy(dumpdir / name, OUT / name)

    lines = corpus(csv)
    blob = "\n".join(lines) + "\n"
    for mode, path in [("analyze", FIX / "ja_golden.json"),
                       ("tokenize", FIX / "ja_golden_tok.json")]:
        out = harness(mode, str(dictdir), stdin=blob)
        docs = []
        cur = []
        for line in out.split("\n"):
            if line == "":
                docs.append(cur)
                cur = []
                continue
            cur.append(line.split("\t"))
        docs = docs[:len(lines)]
        path.write_text(json.dumps(
            {"lines": lines, "docs": docs}, ensure_ascii=False),
            encoding="utf-8")
        print(f"{path.name}: {sum(len(d) for d in docs)} tokens over "
              f"{len(lines)} lines")


if __name__ == "__main__":
    main()
