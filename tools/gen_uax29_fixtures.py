#!/usr/bin/env python3
"""Generate tests/fixtures/uax29_parity.json: a multilingual corpus
tokenized by the REFERENCE StandardTokenizer DFA (Java harness built
by tools/gen_uax29_tables.py). The committed fixture lets the pytest
parity suite run offline; regenerate after any table change."""
import json
import random
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from tools.fuzz_uax29 import pool, ref_tokens  # noqa: E402

CASES = [
    # the corpus families VERDICT r2 called out: emoji, Hangul, Thai,
    # CJK, mixed alphanumerics
    "Hello, world! It's a test of don't-style apostrophes.",
    "pi=3.14159, price 1,234.56 USD; IPv4 127.0.0.1 a.b.c x86_64",
    "안녕하세요 세계 한국어 형태소 분석기 테스트",
    "สวัสดีครับ ภาษาไทยไม่มีการเว้นวรรค ระหว่างคำ",
    "日本語の文章です。漢字とひらがなとカタカナが混ざります。"
    "ソフトウェア開発",
    "中文分词测试：每个汉字单独成词。简体字与繁體字。",
    "Здравствуй мир, кириллица работает? Ёлки-палки 42-й",
    "مرحبا بالعالم اللغة العربية من اليمين إلى اليسار",
    "עברית עם גרשיים: צה\"ל ואות סופית; מה'תות",
    "Ελληνικά: ΣΟΦΟΣ σοφός τέλος ΤΈΛΟΣ",
    "emoji: 👍 👍🏽 👨‍👩‍👧‍👦 🇫🇷🇩🇪 #️⃣ 3⃣ 🏴󠁧󠁢󠁳󠁣󠁴󠁿 ©®™ ☂️ ☂︎",
    "İstanbul ĐỒNG ĐẠI việt-nam Tiếng_Việt ščžý Ñandú",
    "ख़ुशी हिन्दी क्षत्रिय ज़रूरी বাংলা ভাষা తెలుగు",
    "mixed: abc網頁def гиперссылка123 日本語ABCかな4.5アア",
    "half/full width: １２３ ＡＢＣ ｱｲｳ ﾊﾝｶｸ",
]


def main():
    rng = random.Random(20260821)
    chars = pool()
    cases = list(CASES)
    for _ in range(600):
        k = rng.randint(0, 40)
        cases.append("".join(rng.choice(chars) for _ in range(k)))
    refs = ref_tokens(cases)
    out = [{"text": t,
            "tokens": [[typ, tok] for typ, tok in want]}
           for t, want in zip(cases, refs)]
    dst = Path(__file__).resolve().parent.parent / "tests" / \
        "fixtures" / "uax29_parity.json"
    dst.parent.mkdir(exist_ok=True)
    dst.write_text(json.dumps(out, ensure_ascii=False, indent=0))
    print(f"wrote {dst}: {len(out)} cases, "
          f"{sum(len(c['tokens']) for c in out)} tokens")


if __name__ == "__main__":
    main()
