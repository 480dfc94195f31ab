"""Snowball stemmers (the DEFAULT stem filters of the reference's
per-language analyzers that this module's languages cover), each a
from-scratch Python realization of the published Snowball algorithm
(snowballstem.org; the reference ships machine-generated programs of
the same algorithms under org/tartarus/snowball/ext/ — e.g.
DanishStemmer.java, SwedishStemmer.java, NorwegianStemmer.java,
DutchStemmer.java, RomanianStemmer.java, TurkishStemmer.java — and
wires them in {Lang}Analyzer.createComponents via SnowballFilter).

Shared semantics (the Snowball runtime contract the programs rely on):

- R1 = the region after the first non-vowel following a vowel, with
  the Scandinavian/Dutch adjustment that R1 never starts before
  position 3; R2 = the same rule applied again inside R1.
- Suffix search ("find_among_b" with the backward limit at p1):
  pick the LONGEST table suffix that lies entirely inside R1 (or R2
  where the program says so); the selected entry's action then runs —
  a failed per-entry condition does NOT fall back to shorter entries.

Every stemmer is verified token-for-token against the COMPILED
reference analyzer via the AnalyzeLang harness
(tools/gen_snowball_fixtures.py, tests/test_r7c_snowball.py).
"""

from __future__ import annotations

from typing import Optional

# ---------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------


def _r1_min3(word: str, vowels: frozenset) -> int:
    """Snowball mark_regions for the Scandinavian languages: position
    after the first non-vowel that follows a vowel, but never before
    position 3; len(word) when no such position exists."""
    n = len(word)
    if n < 3:
        return n
    i = 0
    while i < n and word[i] not in vowels:
        i += 1
    while i < n and word[i] in vowels:
        i += 1
    if i >= n:
        return n
    # word[i] is the first non-vowel after a vowel; R1 starts after it
    return max(i + 1, 3)


def _longest_in_r1(word: str, p1: int, sufs) -> Optional[str]:
    """Longest suffix from ``sufs`` contained entirely in R1."""
    best = None
    for s in sufs:
        if word.endswith(s) and len(word) - len(s) >= p1:
            if best is None or len(s) > len(best):
                best = s
    return best


# ---------------------------------------------------------------------
# Danish (DanishStemmer.java — Snowball "danish")
# ---------------------------------------------------------------------

_DA_VOWELS = frozenset("aeiouyåæø")
_DA_S_END = frozenset("abcdfghjklmnoprtvyzå")
_DA_CONS = frozenset("bcdfghjklmnpqrstvwxz")
_DA_MAIN = ("hed", "ethed", "ered", "e", "erede", "ende", "erende",
            "ene", "erne", "ere", "en", "heden", "eren", "er",
            "heder", "erer", "s", "heds", "es", "endes", "erendes",
            "enes", "ernes", "eres", "ens", "hedens", "erens", "ers",
            "ets", "erets", "et", "eret")
_DA_PAIR = ("gd", "dt", "gt", "kt")
_DA_OTHER = ("ig", "lig", "elig", "els", "løst")


def _da_consonant_pair(word: str, p1: int) -> str:
    s = _longest_in_r1(word, p1, _DA_PAIR)
    if s is not None:
        return word[:-1]
    return word


def stem_da(word: str) -> str:
    p1 = _r1_min3(word, _DA_VOWELS)
    # main_suffix
    s = _longest_in_r1(word, p1, _DA_MAIN)
    if s == "s":
        if len(word) >= 2 and word[-2] in _DA_S_END:
            word = word[:-1]
    elif s is not None:
        word = word[:len(word) - len(s)]
    # consonant_pair
    word = _da_consonant_pair(word, p1)
    # other_suffix: "igst" loses "st" (whole-word check, outside R1)
    if word.endswith("igst"):
        word = word[:-2]
    s = _longest_in_r1(word, p1, _DA_OTHER)
    if s == "løst":
        word = word[:-1]
    elif s is not None:
        word = word[:len(word) - len(s)]
        word = _da_consonant_pair(word, p1)
    # undouble: final consonant within R1 doubled
    if (len(word) >= 2 and len(word) - 1 >= p1
            and word[-1] in _DA_CONS and word[-2] == word[-1]):
        word = word[:-1]
    return word


# ---------------------------------------------------------------------
# Norwegian (NorwegianStemmer.java — Snowball "norwegian")
# ---------------------------------------------------------------------

_NO_VOWELS = frozenset("aeiouyåæø")
_NO_S_END = frozenset("bcdfghjlmnoprtvyz")
_NO_MAIN = ("a", "e", "ede", "ande", "ende", "ane", "ene", "hetene",
            "erte", "en", "heten", "ar", "er", "heter", "s", "as",
            "es", "edes", "endes", "enes", "hetenes", "ens", "hetens",
            "ers", "ets", "et", "het", "ert", "ast")
_NO_PAIR = ("dt", "vt")
_NO_OTHER = ("leg", "eleg", "ig", "eig", "lig", "elig", "els", "lov",
             "elov", "slov", "hetslov")


def stem_no(word: str) -> str:
    p1 = _r1_min3(word, _NO_VOWELS)
    s = _longest_in_r1(word, p1, _NO_MAIN)
    if s == "s":
        # valid s-ending, or 'k' preceded by a non-vowel
        prev = word[-2] if len(word) >= 2 else ""
        ok = prev in _NO_S_END or (
            prev == "k" and len(word) >= 3
            and word[-3] not in _NO_VOWELS)
        if ok:
            word = word[:-1]
    elif s in ("erte", "ert"):
        word = word[:len(word) - len(s)] + "er"
    elif s is not None:
        word = word[:len(word) - len(s)]
    # consonant_pair
    if _longest_in_r1(word, p1, _NO_PAIR) is not None:
        word = word[:-1]
    # other_suffix
    s = _longest_in_r1(word, p1, _NO_OTHER)
    if s is not None:
        word = word[:len(word) - len(s)]
    return word


# ---------------------------------------------------------------------
# Swedish (SwedishStemmer.java — Snowball "swedish")
# ---------------------------------------------------------------------

_SV_VOWELS = frozenset("aeiouyäåö")
_SV_S_END = frozenset("bcdfghjklmnoprtvy")
_SV_MAIN = ("a", "arna", "erna", "heterna", "orna", "ad", "e", "ade",
            "ande", "arne", "are", "aste", "en", "anden", "aren",
            "heten", "ern", "ar", "er", "heter", "or", "s", "as",
            "arnas", "ernas", "ornas", "es", "ades", "andes", "ens",
            "arens", "hetens", "erns", "at", "andet", "het", "ast")
_SV_PAIR = ("dd", "gd", "nn", "dt", "gt", "kt", "tt")
_SV_OTHER = ("ig", "lig", "els", "fullt", "löst")


def stem_sv(word: str) -> str:
    p1 = _r1_min3(word, _SV_VOWELS)
    s = _longest_in_r1(word, p1, _SV_MAIN)
    if s == "s":
        if len(word) >= 2 and word[-2] in _SV_S_END:
            word = word[:-1]
    elif s is not None:
        word = word[:len(word) - len(s)]
    if _longest_in_r1(word, p1, _SV_PAIR) is not None:
        word = word[:-1]
    s = _longest_in_r1(word, p1, _SV_OTHER)
    if s == "fullt":
        word = word[:-1]
    elif s == "löst":
        word = word[:-1]
    elif s is not None:
        word = word[:len(word) - len(s)]
    return word


STEMMERS = {
    "da": stem_da,
    "no": stem_no,
    "sv": stem_sv,
}


# ---------------------------------------------------------------------
# Dutch (DutchStemmer.java — Snowball "dutch")
# ---------------------------------------------------------------------

_NL_VOWELS = frozenset("aeiouyè")
_NL_V_J = frozenset("aeiouyèj")
_NL_V_I = frozenset("aeiouyèI")
_NL_ACCENT = {"á": "a", "ä": "a", "é": "e", "ë": "e", "í": "i",
              "ï": "i", "ó": "o", "ö": "o", "ú": "u", "ü": "u"}
_NL_STD = ("ene", "se", "en", "heden", "s")
_NL_DERIV = ("end", "ig", "ing", "lijk", "baar", "bar")


def _nl_regions(word: str):
    n = len(word)
    p1 = p2 = n
    i = 0
    while i < n and word[i] not in _NL_VOWELS:
        i += 1
    while i < n and word[i] in _NL_VOWELS:
        i += 1
    if i < n:
        # Dutch clamps p1 to >=3 unconditionally (no min-length guard
        # like the Scandinavian programs), so p1 can exceed len(word)
        p1 = max(i + 1, 3)
        j = i + 1
        while j < n and word[j] not in _NL_VOWELS:
            j += 1
        while j < n and word[j] in _NL_VOWELS:
            j += 1
        if j < n:
            p2 = j + 1
    return p1, p2


def _nl_undouble(word: str) -> str:
    if word[-2:] in ("dd", "kk", "tt"):
        return word[:-1]
    return word


def _nl_e_ending(word: str, p1: int):
    """returns (word, e_found)"""
    if (word.endswith("e") and len(word) - 1 >= p1
            and len(word) >= 2 and word[-2] not in _NL_VOWELS):
        return _nl_undouble(word[:-1]), True
    return word, False


def _nl_en_ending(word: str, p1: int, suf_len: int):
    """delete an en/ene suffix: requires R1, a non-vowel before it and
    not the 'gem' prefix right before; returns (word, applied)"""
    base = len(word) - suf_len
    if base < p1:
        return word, False
    if base == 0 or word[base - 1] in _NL_VOWELS:
        return word, False
    if word[:base].endswith("gem"):
        return word, False
    return _nl_undouble(word[:base]), True


def stem_nl(word: str) -> str:
    # prelude: strip accents; y->Y initially; vowel+i+vowel -> I,
    # vowel+y -> Y (left to right, replacements visible downstream)
    s = [_NL_ACCENT.get(c, c) for c in word]
    if s and s[0] == "y":
        s[0] = "Y"
    for k in range(len(s) - 1):
        if s[k] in _NL_VOWELS:
            if s[k + 1] == "i" and k + 2 < len(s) \
                    and s[k + 2] in _NL_VOWELS:
                s[k + 1] = "I"
            elif s[k + 1] == "y":
                s[k + 1] = "Y"
    word = "".join(s)
    p1, p2 = _nl_regions(word)
    # standard_suffix part A
    s0 = None
    for t in _NL_STD:
        if word.endswith(t) and (s0 is None or len(t) > len(s0)):
            s0 = t
    if s0 == "heden":
        if len(word) - 5 >= p1:
            word = word[:-5] + "heid"
    elif s0 in ("en", "ene"):
        word, _ = _nl_en_ending(word, p1, len(s0))
    elif s0 in ("s", "se"):
        base = len(word) - len(s0)
        if base >= p1 and base >= 1 and word[base - 1] not in _NL_V_J:
            word = word[:base]
    # part B: e-ending
    word, e_found = _nl_e_ending(word, p1)
    # part C: heid (R2, not preceded by c) then en-ending
    if (word.endswith("heid") and len(word) - 4 >= p2
            and (len(word) < 5 or word[-5] != "c")):
        word = word[:-4]
        if word.endswith("en"):
            word, _ = _nl_en_ending(word, p1, 2)
    # part D: derivational
    s0 = None
    for t in _NL_DERIV:
        if word.endswith(t) and (s0 is None or len(t) > len(s0)):
            s0 = t
    if s0 in ("end", "ing"):
        if len(word) - len(s0) >= p2:
            word = word[:-len(s0)]
            if (word.endswith("ig") and len(word) - 2 >= p2
                    and (len(word) < 3 or word[-3] != "e")):
                word = word[:-2]
            else:
                word = _nl_undouble(word)
    elif s0 == "ig":
        if len(word) - 2 >= p2 and (len(word) < 3 or word[-3] != "e"):
            word = word[:-2]
    elif s0 == "lijk":
        if len(word) - 4 >= p2:
            word = word[:-4]
            word, e_found2 = _nl_e_ending(word, p1)
    elif s0 == "baar":
        if len(word) - 4 >= p2:
            word = word[:-4]
    elif s0 == "bar":
        if len(word) - 3 >= p2 and e_found:
            word = word[:-3]
    # part E: undouble vowel (C + aa/ee/oo/uu + consonant-final)
    if (len(word) >= 4 and word[-1] not in _NL_V_I
            and word[-2] == word[-3] and word[-2] in "aeou"
            and word[-4] not in _NL_VOWELS):
        word = word[:-2] + word[-1]
    # postlude
    return word.replace("Y", "y").replace("I", "i")


# ---------------------------------------------------------------------
# Romanian (RomanianStemmer.java — Snowball "romanian")
# ---------------------------------------------------------------------

_RO_VOWELS = frozenset("aeiouâîă")
# step 0: plural/article suffixes (R1); action per suffix
_RO_STEP0 = {
    "ul": "", "ului": "",
    "aua": "a",
    "ea": "e", "ele": "e", "elor": "e",
    "ii": "i", "iua": "i", "iei": "i", "iile": "i", "ilor": "i",
    "iilor": "i",
    "ile": "i",          # special: not after 'ab'
    "atei": "at",
    "aţia": "aţi", "aţie": "aţi",
}
_RO_COMBO = {
    "abilitate": "abil", "abilitati": "abil", "abilităi": "abil",
    "abilităţi": "abil",
    "ibilitate": "ibil",
    "ivitate": "iv", "ivitati": "iv", "ivităi": "iv", "ivităţi": "iv",
    "icitate": "ic", "icitati": "ic", "icităi": "ic", "icităţi": "ic",
    "icatori": "ic", "icator": "ic",
    "icala": "ic", "icale": "ic", "icali": "ic", "ical": "ic",
    "icală": "ic",
    "iciva": "ic", "icive": "ic", "icivi": "ic", "iciv": "ic",
    "icivă": "ic",
    "ativa": "at", "ative": "at", "ativi": "at", "ativ": "at",
    "ativă": "at", "aţiune": "at", "atoare": "at", "ator": "at",
    "atori": "at", "ătoare": "at", "ător": "at", "ători": "at",
    "itiva": "it", "itive": "it", "itivi": "it", "itiv": "it",
    "itivă": "it", "iţiune": "it", "itoare": "it", "itor": "it",
    "itori": "it",
}
_RO_STD_DEL = (
    "ica", "abila", "ibila", "oasa", "ata", "ita", "anta", "uta",
    "iva", "ic", "ice", "abile", "ibile", "oase", "ate", "itate",
    "ite", "ante", "ute", "ive", "ici", "abili", "ibili", "atori",
    "osi", "ati", "itati", "iti", "anti", "uti", "ivi", "ităi",
    "oşi", "ităţi", "abil", "ibil", "ator", "os", "at", "it", "ant",
    "ut", "iv", "ică", "abilă", "ibilă", "oasă", "ată", "ită",
    "antă", "ută", "ivă",
)
_RO_STD_IST = ("ista", "isme", "iste", "isti", "işti", "ism", "ist",
               "istă")
_RO_STD_IUNE = ("iune", "iuni")
_RO_VERB_DEL_COND = (   # case 1: needs consonant or 'u' before, in RV
    "ea", "ia", "esc", "ăsc", "ind", "ând", "are", "ere", "ire",
    "âre", "ase", "ise", "use", "âse", "eşte", "ăşte", "eze", "ai",
    "eai", "iai", "eşti", "ăşti", "ui", "ezi", "âi", "aşi", "aseşi",
    "iseşi", "useşi", "âseşi", "işi", "uşi", "âşi", "eaţi", "iaţi",
    "arăţi", "aserăţi", "iserăţi", "userăţi", "âserăţi", "irăţi",
    "urăţi", "ârăţi", "am", "eam", "iam", "asem", "isem", "usem",
    "âsem", "arăm", "aserăm", "iserăm", "userăm", "âserăm", "irăm",
    "urăm", "ârăm", "au", "eau", "iau", "indu", "ându", "ez",
    "ească", "ară", "aseră", "iseră", "useră", "âseră", "iră", "ură",
    "âră", "ează",
)
_RO_VERB_DEL_ALWAYS = (  # case 2: plain delete
    "se", "sese", "sei", "seşi", "seseşi", "aţi", "eţi", "iţi",
    "âţi", "serăţi", "seserăţi", "em", "im", "âm", "ăm", "serăm",
    "seserăm", "sesem", "seră", "seseră",
)
_RO_VOWEL_SUF = ("a", "e", "ie", "i", "ă")


def _ro_rv(word: str) -> int:
    n = len(word)
    if n < 2:
        return n
    V = _RO_VOWELS
    if word[0] in V:
        if word[1] not in V:
            for k in range(2, n):
                if word[k] in V:
                    return k + 1
            return n
        for k in range(2, n):
            if word[k] not in V:
                return k + 1
        return n
    if word[1] not in V:
        for k in range(2, n):
            if word[k] in V:
                return k + 1
        return n
    return 3 if n >= 3 else n


def _ro_p1p2(word: str):
    n = len(word)
    V = _RO_VOWELS
    p1 = p2 = n
    i = 0
    while i < n and word[i] not in V:
        i += 1
    while i < n and word[i] in V:
        i += 1
    if i < n:
        p1 = i + 1
        j = p1
        while j < n and word[j] not in V:
            j += 1
        while j < n and word[j] in V:
            j += 1
        if j < n:
            p2 = j + 1
    return p1, p2


def _longest_sfx(word: str, sufs):
    best = None
    for t in sufs:
        if word.endswith(t) and (best is None or len(t) > len(best)):
            best = t
    return best


def stem_ro(word: str) -> str:
    # prelude: vowel + u/i + vowel -> U/I
    s = list(word)
    for k in range(len(s) - 2):
        if s[k] in _RO_VOWELS and s[k + 2] in _RO_VOWELS:
            if s[k + 1] == "u":
                s[k + 1] = "U"
            elif s[k + 1] == "i":
                s[k + 1] = "I"
    word = "".join(s)
    pV = _ro_rv(word)
    p1, p2 = _ro_p1p2(word)
    # step 0 (R1 on the suffix start)
    s0 = _longest_sfx(word, _RO_STEP0)
    if s0 is not None and len(word) - len(s0) >= p1:
        if not (s0 == "ile" and word[:-3].endswith("ab")):
            word = word[:len(word) - len(s0)] + _RO_STEP0[s0]
    # combo suffixes: repeat while one applies (R1)
    removed = False
    while True:
        s0 = _longest_sfx(word, _RO_COMBO)
        if s0 is None or len(word) - len(s0) < p1:
            break
        word = word[:len(word) - len(s0)] + _RO_COMBO[s0]
        removed = True
    # standard suffix (R2)
    s0 = _longest_sfx(word,
                      _RO_STD_DEL + _RO_STD_IST + _RO_STD_IUNE)
    if s0 is not None and len(word) - len(s0) >= p2:
        if s0 in _RO_STD_IUNE:
            if word[:len(word) - len(s0)].endswith("ţ"):
                word = word[:len(word) - len(s0) - 1] + "t"
                removed = True
            # else: rule fails, nothing applied
        elif s0 in _RO_STD_IST:
            word = word[:len(word) - len(s0)] + "ist"
            removed = True
        else:
            word = word[:len(word) - len(s0)]
            removed = True
    # verb suffixes (only when nothing standard was removed; suffix
    # AND its condition chars must lie inside RV)
    if not removed:
        n = len(word)
        best = None
        for t in _RO_VERB_DEL_COND:
            if word.endswith(t) and n - len(t) >= pV \
                    and (best is None or len(t) > len(best[0])):
                best = (t, 1)
        for t in _RO_VERB_DEL_ALWAYS:
            if word.endswith(t) and n - len(t) >= pV \
                    and (best is None or len(t) > len(best[0])):
                best = (t, 2)
        if best is not None:
            t, case = best
            base = n - len(t)
            if case == 2:
                word = word[:base]
            else:
                # preceding char inside RV and a non-vowel or 'u'
                if base - 1 >= pV and (word[base - 1] not in _RO_VOWELS
                                       or word[base - 1] == "u"):
                    word = word[:base]
    # vowel suffix (RV)
    s0 = _longest_sfx(word, _RO_VOWEL_SUF)
    if s0 is not None and len(word) - len(s0) >= pV:
        word = word[:len(word) - len(s0)]
    # postlude
    return word.replace("I", "i").replace("U", "u")


# ---------------------------------------------------------------------
# Turkish (TurkishStemmer.java — Snowball "turkish")
#
# Transliterated from the published program's control flow: a tiny
# backward-cursor environment (_TrEnv) replicates the runtime's
# save/restore + suffix-consume semantics; every deletion in this
# program truncates at the cursor (ket is always the current end).
# Mutations made before an overall failure stick, exactly as
# SnowballFilter uses the mutated buffer regardless of stem()'s
# return value (SnowballFilter.java:95).
# ---------------------------------------------------------------------

_TR_VOWEL = frozenset("aeıioöuü")
_TR_U = frozenset("ıiuü")
_TR_HARMONY = {"a": frozenset("aıou"), "e": frozenset("eiöü"),
               "ı": frozenset("aı"), "i": frozenset("ei"),
               "o": frozenset("ou"), "ö": frozenset("öü"),
               "u": frozenset("ou"), "ü": frozenset("öü")}


class _TrEnv:
    __slots__ = ("s", "c", "continue_noun")

    def __init__(self, word: str):
        self.s = word
        self.c = len(word)
        self.continue_noun = True

    def save(self) -> int:
        return len(self.s) - self.c

    def restore(self, v: int) -> None:
        self.c = len(self.s) - v

    def trunc(self) -> None:
        """bra = cursor; slice_del() — ket is always the end here."""
        self.s = self.s[:self.c]

    def eq_b(self, t: str) -> bool:
        if self.c >= len(t) and self.s[self.c - len(t):self.c] == t:
            self.c -= len(t)
            return True
        return False

    def among_b(self, sufs) -> bool:
        best = None
        for t in sufs:
            if len(t) <= self.c \
                    and self.s[self.c - len(t):self.c] == t \
                    and (best is None or len(t) > len(best)):
                best = t
        if best is None:
            return False
        self.c -= len(best)
        return True


def _tr_harmony(e: _TrEnv) -> bool:
    s, c = e.s, e.c
    i = c
    while i > 0 and s[i - 1] not in _TR_VOWEL:
        i -= 1
    if i <= 0:
        return False
    grp = _TR_HARMONY[s[i - 1]]
    j = i - 1
    while j > 0 and s[j - 1] not in grp:
        j -= 1
    return j > 0


def _tr_opt_cons(e: _TrEnv, ch: str) -> bool:
    """(ch test vowel) or (not(test ch) test(next vowel))"""
    s, c = e.s, e.c
    if c >= 1 and s[c - 1] == ch:
        if c - 1 > 0 and s[c - 2] in _TR_VOWEL:
            e.c = c - 1
            return True
        return False
    if c <= 0 or c - 1 <= 0:
        return False
    return s[c - 2] in _TR_VOWEL


def _tr_opt_U(e: _TrEnv) -> bool:
    s, c = e.s, e.c
    if c >= 1 and s[c - 1] in _TR_U:
        if c - 1 > 0 and s[c - 2] not in _TR_VOWEL:
            e.c = c - 1
            return True
        return False
    if c <= 0 or c - 1 <= 0:
        return False
    return s[c - 2] not in _TR_VOWEL


# -- mark rules (consume the suffix on success) -----------------------

def _m_poss(e):
    return e.among_b(("m", "n", "miz", "niz", "muz", "nuz", "müz",
                      "nüz", "mız", "nız")) and _tr_opt_U(e)


def _m_sU(e):
    if not _tr_harmony(e):
        return False
    if e.c >= 1 and e.s[e.c - 1] in _TR_U:
        e.c -= 1
        return _tr_opt_cons(e, "s")
    return False


def _m_lArI(e):
    return e.among_b(("leri", "ları"))


def _m_yU(e):
    if not _tr_harmony(e):
        return False
    if e.c >= 1 and e.s[e.c - 1] in _TR_U:
        e.c -= 1
        return _tr_opt_cons(e, "y")
    return False


def _m_nU(e):
    return _tr_harmony(e) and e.among_b(("ni", "nu", "nü", "nı"))


def _m_nUn(e):
    return _tr_harmony(e) and e.among_b(("in", "un", "ün", "ın")) \
        and _tr_opt_cons(e, "n")


def _m_yA(e):
    return _tr_harmony(e) and e.among_b(("a", "e")) \
        and _tr_opt_cons(e, "y")


def _m_nA(e):
    return _tr_harmony(e) and e.among_b(("na", "ne"))


def _m_DA(e):
    return _tr_harmony(e) and e.among_b(("da", "ta", "de", "te"))


def _m_ndA(e):
    return _tr_harmony(e) and e.among_b(("nda", "nde"))


def _m_DAn(e):
    return _tr_harmony(e) and e.among_b(("dan", "tan", "den", "ten"))


def _m_ndAn(e):
    return _tr_harmony(e) and e.among_b(("ndan", "nden"))


def _m_ylA(e):
    return _tr_harmony(e) and e.among_b(("la", "le")) \
        and _tr_opt_cons(e, "y")


def _m_ki(e):
    return e.eq_b("ki")


def _m_ncA(e):
    return _tr_harmony(e) and e.among_b(("ca", "ce")) \
        and _tr_opt_cons(e, "n")


def _m_yUm(e):
    return _tr_harmony(e) and e.among_b(("im", "um", "üm", "ım")) \
        and _tr_opt_cons(e, "y")


def _m_sUn(e):
    return _tr_harmony(e) and e.among_b(("sin", "sun", "sün", "sın"))


def _m_yUz(e):
    return _tr_harmony(e) and e.among_b(("iz", "uz", "üz", "ız")) \
        and _tr_opt_cons(e, "y")


def _m_sUnUz(e):
    return e.among_b(("siniz", "sunuz", "sünüz", "sınız"))


def _m_lAr(e):
    return _tr_harmony(e) and e.among_b(("lar", "ler"))


def _m_nUz(e):
    return _tr_harmony(e) and e.among_b(("niz", "nuz", "nüz", "nız"))


def _m_DUr(e):
    return _tr_harmony(e) and e.among_b(
        ("dir", "tir", "dur", "tur", "dür", "tür", "dır", "tır"))


def _m_cAsInA(e):
    return e.among_b(("casına", "cesine"))


_TR_YDU = ("di", "ti", "dik", "tik", "duk", "tuk", "dük", "tük",
           "dık", "tık", "dim", "tim", "dum", "tum", "düm", "tüm",
           "dım", "tım", "din", "tin", "dun", "tun", "dün", "tün",
           "dın", "tın", "du", "tu", "dü", "tü", "dı", "tı")


def _m_yDU(e):
    return _tr_harmony(e) and e.among_b(_TR_YDU) \
        and _tr_opt_cons(e, "y")


def _m_ysA(e):
    return e.among_b(("sa", "se", "sak", "sek", "sam", "sem", "san",
                      "sen")) and _tr_opt_cons(e, "y")


def _m_ymUs(e):
    return _tr_harmony(e) and e.among_b(("miş", "muş", "müş", "mış")) \
        and _tr_opt_cons(e, "y")


def _m_yken(e):
    return e.eq_b("ken") and _tr_opt_cons(e, "y")


# -- composite rules --------------------------------------------------

def _tr_nominal_verb(e: _TrEnv) -> bool:
    e.continue_noun = True
    v1 = e.save()
    while True:  # single-pass alternation; break = chosen
        # alt 1: ymUs | yDU | ysA | yken
        matched = False
        for m in (_m_ymUs, _m_yDU, _m_ysA, _m_yken):
            e.restore(v1)
            if m(e):
                matched = True
                break
        if matched:
            break
        # alt 2: cAsInA (sUnUz|lAr|yUm|sUn|yUz|eps) ymUs
        e.restore(v1)
        if _m_cAsInA(e):
            v3 = e.save()
            hit = False
            for m in (_m_sUnUz, _m_lAr, _m_yUm, _m_sUn, _m_yUz):
                e.restore(v3)
                if m(e):
                    hit = True
                    break
            if not hit:
                e.restore(v3)
            if _m_ymUs(e):
                break
        # alt 3: lAr! then optional (DUr|yDU|ysA|ymUs); stops noun pass
        e.restore(v1)
        if _m_lAr(e):
            e.trunc()
            v4 = e.save()
            hit = False
            for m in (_m_DUr, _m_yDU, _m_ysA, _m_ymUs):
                e.restore(v4)
                if m(e):
                    hit = True
                    break
            if not hit:
                e.restore(v4)
            e.continue_noun = False
            break
        # alt 4: nUz (yDU|ysA)
        e.restore(v1)
        if _m_nUz(e):
            v6 = e.save()
            if _m_yDU(e):
                break
            e.restore(v6)
            if _m_ysA(e):
                break
        # alt 5: (sUnUz|yUz|sUn|yUm)! then optional ymUs
        e.restore(v1)
        hit = False
        for m in (_m_sUnUz, _m_yUz, _m_sUn, _m_yUm):
            e.restore(v1)
            if m(e):
                hit = True
                break
        if hit:
            e.trunc()
            v8 = e.save()
            if not _m_ymUs(e):
                e.restore(v8)
            break
        # alt 6: DUr! then optional ((sUnUz|lAr|yUm|sUn|yUz|eps) ymUs)
        e.restore(v1)
        if not _m_DUr(e):
            return False
        e.trunc()
        v9 = e.save()
        hit = False
        for m in (_m_sUnUz, _m_lAr, _m_yUm, _m_sUn, _m_yUz):
            e.restore(v9)
            if m(e):
                hit = True
                break
        if not hit:
            e.restore(v9)
        if not _m_ymUs(e):
            e.restore(v9)
        break
    e.trunc()
    return True


def _tr_ki_chain(e: _TrEnv) -> bool:
    if not _m_ki(e):
        return False
    v1 = e.save()
    # alt A: DA
    if _m_DA(e):
        e.trunc()
        v2 = e.save()
        v3 = e.save()
        if _m_lAr(e):
            e.trunc()
            v4 = e.save()
            if not _tr_ki_chain(e):
                e.restore(v4)
        else:
            e.restore(v3)
            if _m_poss(e):
                e.trunc()
                v5 = e.save()
                if _m_lAr(e):
                    e.trunc()
                    if not _tr_ki_chain(e):
                        e.restore(v5)
                else:
                    e.restore(v5)
            else:
                e.restore(v2)
        return True
    e.restore(v1)
    # alt B: nUn
    if _m_nUn(e):
        e.trunc()
        v6 = e.save()
        v7 = e.save()
        if _m_lArI(e):
            e.trunc()
        else:
            e.restore(v7)
            v8 = e.save()
            ok = _m_poss(e)
            if not ok:
                e.restore(v8)
                ok = _m_sU(e)
            if ok:
                e.trunc()
                v9 = e.save()
                if _m_lAr(e):
                    e.trunc()
                    if not _tr_ki_chain(e):
                        e.restore(v9)
                else:
                    e.restore(v9)
            else:
                e.restore(v7)
                if not _tr_ki_chain(e):
                    e.restore(v6)
        return True
    e.restore(v1)
    # alt C: ndA (required)
    if not _m_ndA(e):
        return False
    v10 = e.save()
    if _m_lArI(e):
        e.trunc()
    else:
        e.restore(v10)
        if _m_sU(e):
            e.trunc()
            v11 = e.save()
            if _m_lAr(e):
                e.trunc()
                if not _tr_ki_chain(e):
                    e.restore(v11)
            else:
                e.restore(v11)
        else:
            e.restore(v10)
            if not _tr_ki_chain(e):
                return False
    return True


def _tr_noun_suffixes(e: _TrEnv) -> bool:
    v1 = e.save()
    # alt 1: lAr
    if _m_lAr(e):
        e.trunc()
        v2 = e.save()
        if not _tr_ki_chain(e):
            e.restore(v2)
        return True
    e.restore(v1)
    # alt 2: ncA
    if _m_ncA(e):
        e.trunc()
        v3 = e.save()
        v4 = e.save()
        if _m_lArI(e):
            e.trunc()
        else:
            e.restore(v4)
            v5 = e.save()
            ok = _m_poss(e)
            if not ok:
                e.restore(v5)
                ok = _m_sU(e)
            if ok:
                e.trunc()
                v6 = e.save()
                if _m_lAr(e):
                    e.trunc()
                    if not _tr_ki_chain(e):
                        e.restore(v6)
                else:
                    e.restore(v6)
            else:
                e.restore(v4)
                if _m_lAr(e):
                    e.trunc()
                    if not _tr_ki_chain(e):
                        e.restore(v3)
                else:
                    e.restore(v3)
        return True
    e.restore(v1)
    # alt 3: (ndA | nA)
    v7 = e.save()
    ok = _m_ndA(e)
    if not ok:
        e.restore(v7)
        ok = _m_nA(e)
    if ok:
        v8 = e.save()
        if _m_lArI(e):
            e.trunc()
            return True
        e.restore(v8)
        if _m_sU(e):
            e.trunc()
            v9 = e.save()
            if _m_lAr(e):
                e.trunc()
                if not _tr_ki_chain(e):
                    e.restore(v9)
            else:
                e.restore(v9)
            return True
        e.restore(v8)
        if _tr_ki_chain(e):
            return True
    e.restore(v1)
    # alt 4: (ndAn | nU)
    v10 = e.save()
    ok = _m_ndAn(e)
    if not ok:
        e.restore(v10)
        ok = _m_nU(e)
    if ok:
        v11 = e.save()
        if _m_sU(e):
            e.trunc()
            v12 = e.save()
            if _m_lAr(e):
                e.trunc()
                if not _tr_ki_chain(e):
                    e.restore(v12)
            else:
                e.restore(v12)
            return True
        e.restore(v11)
        if _m_lArI(e):
            # NOTE: the program matches lArI here WITHOUT deleting
            # (no slice in this branch — TurkishStemmer.java:1658)
            return True
    e.restore(v1)
    # alt 5: DAn
    if _m_DAn(e):
        e.trunc()
        v13 = e.save()
        v14 = e.save()
        if _m_poss(e):
            e.trunc()
            v15 = e.save()
            if _m_lAr(e):
                e.trunc()
                if not _tr_ki_chain(e):
                    e.restore(v15)
            else:
                e.restore(v15)
        else:
            e.restore(v14)
            if _m_lAr(e):
                e.trunc()
                v16 = e.save()
                if not _tr_ki_chain(e):
                    e.restore(v16)
            else:
                e.restore(v14)
                if not _tr_ki_chain(e):
                    e.restore(v13)
        return True
    e.restore(v1)
    # alt 6: (nUn | ylA)
    v17 = e.save()
    ok = _m_nUn(e)
    if not ok:
        e.restore(v17)
        ok = _m_ylA(e)
    if ok:
        e.trunc()
        v18 = e.save()
        v19 = e.save()
        done = False
        if _m_lAr(e):
            e.trunc()
            if _tr_ki_chain(e):
                done = True
        if not done:
            e.restore(v19)
            v20 = e.save()
            ok2 = _m_poss(e)
            if not ok2:
                e.restore(v20)
                ok2 = _m_sU(e)
            if ok2:
                e.trunc()
                v21 = e.save()
                if _m_lAr(e):
                    e.trunc()
                    if not _tr_ki_chain(e):
                        e.restore(v21)
                else:
                    e.restore(v21)
            else:
                e.restore(v19)
                if not _tr_ki_chain(e):
                    e.restore(v18)
        return True
    e.restore(v1)
    # alt 7: lArI
    if _m_lArI(e):
        e.trunc()
        return True
    e.restore(v1)
    # alt 8: bare ki chain
    if _tr_ki_chain(e):
        return True
    e.restore(v1)
    # alt 9: (DA | yU | yA)
    v22 = e.save()
    ok = _m_DA(e)
    if not ok:
        e.restore(v22)
        ok = _m_yU(e)
    if not ok:
        e.restore(v22)
        ok = _m_yA(e)
    if ok:
        e.trunc()
        v23 = e.save()
        v24 = e.save()
        hit = False
        if _m_poss(e):
            e.trunc()
            v25 = e.save()
            if not _m_lAr(e):
                e.restore(v25)
            hit = True
        else:
            e.restore(v24)
            hit = _m_lAr(e)
        if hit:
            e.trunc()
            if not _tr_ki_chain(e):
                e.restore(v23)
        else:
            e.restore(v23)
        return True
    e.restore(v1)
    # alt 10: (poss | sU) — required
    v26 = e.save()
    ok = _m_poss(e)
    if not ok:
        e.restore(v26)
        ok = _m_sU(e)
    if not ok:
        return False
    e.trunc()
    v27 = e.save()
    if _m_lAr(e):
        e.trunc()
        if not _tr_ki_chain(e):
            e.restore(v27)
    else:
        e.restore(v27)
    return True


_TR_APPEND_U = {"a": "ı", "ı": "ı", "e": "i", "i": "i",
                "o": "u", "u": "u", "ö": "ü", "ü": "ü"}
_TR_LAST_CONS = {"b": "p", "c": "ç", "d": "t", "ğ": "k"}


def stem_tr(word: str) -> str:
    if sum(1 for ch in word if ch in _TR_VOWEL) < 2:
        return word  # more_than_one_syllable_word fails: untouched
    e = _TrEnv(word)
    _tr_nominal_verb(e)
    if not e.continue_noun:
        return e.s  # mutations made so far stick (see module note)
    e.c = len(e.s)
    _tr_noun_suffixes(e)
    s = e.s
    # postlude
    if s in ("ad", "soyad"):  # is_reserved_word: skip postlude
        return s
    if s.endswith(("d", "g")):
        for ch in reversed(s):
            if ch in _TR_VOWEL:
                s = s + _TR_APPEND_U[ch]
                break
    if s and s[-1] in _TR_LAST_CONS:
        s = s[:-1] + _TR_LAST_CONS[s[-1]]
    return s


STEMMERS["nl"] = stem_nl
STEMMERS["ro"] = stem_ro
STEMMERS["tr"] = stem_tr
