"""Snowball stemmers (pure Python): Danish, Norwegian, Swedish,
Russian, English Porter2, German, Dutch, Romanian, Irish, Hungarian,
Finnish, Spanish, Portuguese, Italian, german2, Nepali, Turkish,
Lovins, Kraaij-Pohlmann — nineteen published algorithm variants
(snowballstem.org; the reference runs the generated forms under
``org/tartarus/snowball/ext/``). Every Snowball-DEFAULT analyzer
(da/nl/ro/ga/hu/fi/sv/no/ru/tr) gets its true default stemmer here;
the Romance + German + Porter2 ports are the in-box alternatives to
the light stemmers. Each is bit-exact on the Snowball project's own
~2,000-word vocabulary shipped in the reference test data — languages
WITHOUT such a vocabulary (French, Catalan, Basque, Armenian,
Lithuanian) are deliberately NOT ported:
the vocabulary diff caught subtle bugs in nearly every language here,
so an unverifiable port would not meet the repo's evidence standard.

Shared machinery (the Snowball runtime's semantics, re-expressed):

- ``R1`` = the region after the first non-vowel following a vowel,
  adjusted so at least 3 characters precede it; words shorter than 3
  have R1 = the whole-word end (no region).
- a suffix rule applies only if the suffix lies ENTIRELY inside R1
  (match start >= p1) — ``find_among_b`` with ``limit_backward = p1``;
- among tables take the LONGEST suffix that both matches and fits
  (a longer match that crosses p1 falls back to a shorter one);
- p1 is a fixed POSITION computed once on the input; later deletions
  shorten the string but never move p1 (all stages compare against it).

Parity contract: ``tests/test_snowball.py`` diffs each stemmer against
the reference's own full Snowball vocabulary files
(``analysis/snowball/{danish,norwegian,swedish}.zip`` voc.txt →
output.txt), bit-exact, and re-verifies the SQL twins in DuckDB.
"""

from __future__ import annotations

__all__ = [
    "swedish_snowball_stem",
    "norwegian_snowball_stem",
    "danish_snowball_stem",
    "russian_snowball_stem",
    "porter2_stem",
    "german_snowball_stem",
    "dutch_snowball_stem",
    "romanian_snowball_stem",
    "irish_snowball_stem",
    "hungarian_snowball_stem",
    "finnish_snowball_stem",
    "spanish_snowball_stem",
    "portuguese_snowball_stem",
    "italian_snowball_stem",
    "german2_snowball_stem",
    "nepali_snowball_stem",
    "turkish_snowball_stem",
    "lovins_stem",
    "kraaij_pohlmann_stem",
    "SWEDISH_SNOWBALL_SQL",
    "NORWEGIAN_SNOWBALL_SQL",
    "DANISH_SNOWBALL_SQL",
    "RUSSIAN_SNOWBALL_SQL",
    "PORTER2_SQL",
    "GERMAN_SNOWBALL_SQL",
    "DUTCH_SNOWBALL_SQL",
    "ROMANIAN_SNOWBALL_SQL",
    "IRISH_SNOWBALL_SQL",
    "HUNGARIAN_SNOWBALL_SQL",
    "FINNISH_SNOWBALL_SQL",
    "SPANISH_SNOWBALL_SQL",
    "PORTUGUESE_SNOWBALL_SQL",
    "ITALIAN_SNOWBALL_SQL",
    "GERMAN2_SNOWBALL_SQL",
    "NEPALI_SNOWBALL_SQL",
]

_SV_VOWELS = frozenset("aeiouyäåö")
_NO_VOWELS = frozenset("aeiouyåæø")
_DA_VOWELS = frozenset("aeiouyåæø")


def _p1(s: str, vowels: frozenset[str]) -> int:
    """Snowball mark_regions: position after the first non-vowel that
    follows a vowel, floored at 3; len(s) if absent or len(s) < 3."""
    n = len(s)
    if n < 3:
        return n
    p1 = n
    for i in range(n - 1):
        if s[i] in vowels and s[i + 1] not in vowels:
            p1 = i + 2
            break
    return max(p1, 3)


def _longest_fit(s: str, p1: int, suffixes) -> str | None:
    """Longest suffix (from an iterable pre-sorted longest-first) that
    matches AND lies entirely in R1."""
    for suf in suffixes:
        if s.endswith(suf) and len(s) - len(suf) >= p1:
            return suf
    return None


def _by_len(*sufs: str) -> tuple[str, ...]:
    return tuple(sorted(sufs, key=len, reverse=True))


# ---------------------------------------------------------------------------
# Swedish (SwedishStemmer.java among tables a_0/a_1/a_2)
# ---------------------------------------------------------------------------

_SV_MAIN = _by_len(
    "a", "arna", "erna", "heterna", "orna", "ad", "e", "ade", "ande",
    "arne", "are", "aste", "en", "anden", "aren", "heten", "ern", "ar",
    "er", "heter", "or", "s", "as", "arnas", "ernas", "ornas", "es",
    "ades", "andes", "ens", "arens", "hetens", "erns", "at", "andet",
    "het", "ast",
)
_SV_S_END = frozenset("bcdfghjklmnoprtvy")
_SV_PAIRS = ("dd", "gd", "nn", "dt", "gt", "kt", "tt")
_SV_OTHER = _by_len("ig", "lig", "els", "fullt", "löst")


def swedish_snowball_stem(term: str) -> str:
    s = term
    p1 = _p1(s, _SV_VOWELS)
    # main suffix
    suf = _longest_fit(s, p1, _SV_MAIN)
    if suf == "s":
        if len(s) >= 2 and s[-2] in _SV_S_END:
            s = s[:-1]
    elif suf:
        s = s[: -len(suf)]
    # consonant pair: listed pair entirely in R1 → drop last letter
    if len(s) >= 2 and s[-2:] in _SV_PAIRS and len(s) - 2 >= p1:
        s = s[:-1]
    # other suffix
    suf = _longest_fit(s, p1, _SV_OTHER)
    if suf == "löst":
        s = s[:-1]  # löst → lös
    elif suf == "fullt":
        s = s[:-1]  # fullt → full
    elif suf:
        s = s[: -len(suf)]
    return s


# ---------------------------------------------------------------------------
# Norwegian (NorwegianStemmer.java among tables)
# ---------------------------------------------------------------------------

_NO_MAIN = _by_len(
    "a", "e", "ede", "ande", "ende", "ane", "ene", "hetene", "erte",
    "en", "heten", "ar", "er", "heter", "s", "as", "es", "edes",
    "endes", "enes", "hetenes", "ens", "hetens", "ers", "ets", "et",
    "het", "ert", "ast",
)
_NO_S_END = frozenset("bcdfghjlmnoprtvyz")  # k handled by the vowel rule
_NO_PAIRS = ("dt", "vt")
_NO_OTHER = _by_len(
    "leg", "eleg", "ig", "eig", "lig", "elig", "els", "lov", "elov",
    "slov", "hetslov",
)


def norwegian_snowball_stem(term: str) -> str:
    s = term
    p1 = _p1(s, _NO_VOWELS)
    suf = _longest_fit(s, p1, _NO_MAIN)
    if suf == "s":
        # s-ending, or 'k' itself preceded by a non-vowel (a char must
        # exist — word-initial 'k' does not qualify)
        prev = s[-2] if len(s) >= 2 else ""
        if prev in _NO_S_END or (
            prev == "k" and len(s) >= 3 and s[-3] not in _NO_VOWELS
        ):
            s = s[:-1]
    elif suf in ("erte", "ert"):
        s = s[: -len(suf)] + "er"
    elif suf:
        s = s[: -len(suf)]
    if len(s) >= 2 and s[-2:] in _NO_PAIRS and len(s) - 2 >= p1:
        s = s[:-1]
    suf = _longest_fit(s, p1, _NO_OTHER)
    if suf:
        s = s[: -len(suf)]
    return s


# ---------------------------------------------------------------------------
# Danish (DanishStemmer.java among tables)
# ---------------------------------------------------------------------------

_DA_MAIN = _by_len(
    "hed", "ethed", "ered", "e", "erede", "ende", "erende", "ene",
    "erne", "ere", "en", "heden", "eren", "er", "heder", "erer", "s",
    "heds", "es", "endes", "erendes", "enes", "ernes", "eres", "ens",
    "hedens", "erens", "ers", "ets", "erets", "et", "eret",
)
_DA_S_END = frozenset("abcdfghjklmnoprtvyzå")
_DA_PAIRS = ("gd", "dt", "gt", "kt")
_DA_OTHER = _by_len("ig", "lig", "elig", "els", "løst")
_DA_CONS = frozenset("bcdfghjklmnpqrstvwxz")


def _da_consonant_pair(s: str, p1: int) -> str:
    if len(s) >= 2 and s[-2:] in _DA_PAIRS and len(s) - 2 >= p1:
        return s[:-1]
    return s


# ---------------------------------------------------------------------------
# SQL twins — generated from the same suffix tables. The R1 fit check
# ``start >= p1`` factors into two string-local conditions (start >= 3,
# and the prefix of length ``start`` contains a vowel followed by a
# non-vowel), so no position arithmetic is needed; deletions only ever
# shorten the tail, so prefixes — and therefore fit — are stable across
# layers.
# ---------------------------------------------------------------------------


def _fit_sql(k: int, vcls: str) -> str:
    return (
        f"length(term)-{k} >= 3 AND "
        f"regexp_matches(left(term, length(term)-{k}), '[{vcls}][^{vcls}]')"
    )


def _lits(chars) -> str:
    return ", ".join(f"'{c}'" for c in sorted(chars))


def _main_case_sql(sufs, vcls: str, s_cond: str) -> str:
    """Longest-first delete CASE; the 's' entry carries the s-ending
    predicate ``s_cond`` (a SQL boolean over ``term``). A longer match
    that fails fit falls through to a shorter one — exactly
    find_among_b's longest-that-fits walk."""
    rows = []
    for suf in sorted(sufs, key=len, reverse=True):
        k = len(suf)
        cond = f"right(term, {k}) = '{suf}' AND {_fit_sql(k, vcls)}"
        if suf == "s":
            cond += f" AND ({s_cond})"
        rows.append(f"WHEN {cond} THEN left(term, length(term)-{k})")
    body = "\n        ".join(rows)
    return f"CASE\n        {body}\n        ELSE term END"


def _pair_case_sql(pairs, vcls: str) -> str:
    plist = ", ".join(f"'{p}'" for p in pairs)
    return (
        f"CASE WHEN right(term, 2) IN ({plist}) AND {_fit_sql(2, vcls)} "
        f"THEN left(term, length(term)-1) ELSE term END"
    )


_SV_V = "aeiouyäåö"
_NO_V = "aeiouyåæø"
_DA_V = "aeiouyåæø"

SWEDISH_SNOWBALL_SQL = (
    _main_case_sql(
        _SV_MAIN,
        _SV_V,
        f"substr(term, length(term)-1, 1) IN ({_lits(_SV_S_END)})",
    ),
    _pair_case_sql(_SV_PAIRS, _SV_V),
    # other suffix: fullt→full / löst→lös are drop-one-letter rewrites
    f"""CASE
        WHEN right(term, 5) = 'fullt' AND {_fit_sql(5, _SV_V)} THEN left(term, length(term)-1)
        WHEN right(term, 4) = 'löst' AND {_fit_sql(4, _SV_V)} THEN left(term, length(term)-1)
        WHEN right(term, 3) = 'lig' AND {_fit_sql(3, _SV_V)} THEN left(term, length(term)-3)
        WHEN right(term, 3) = 'els' AND {_fit_sql(3, _SV_V)} THEN left(term, length(term)-3)
        WHEN right(term, 2) = 'ig' AND {_fit_sql(2, _SV_V)} THEN left(term, length(term)-2)
        ELSE term END""",
)

_NO_S_COND = (
    f"substr(term, length(term)-1, 1) IN ({_lits(_NO_S_END)}) OR "
    f"(substr(term, length(term)-1, 1) = 'k' AND length(term) >= 3 AND "
    f"substr(term, length(term)-2, 1) NOT IN ({_lits(_NO_VOWELS)}))"
)


def _no_main_sql() -> str:
    rows = []
    for suf in sorted(_NO_MAIN, key=len, reverse=True):
        k = len(suf)
        cond = f"right(term, {k}) = '{suf}' AND {_fit_sql(k, _NO_V)}"
        if suf == "s":
            cond += f" AND ({_NO_S_COND})"
        if suf in ("erte", "ert"):
            then = f"left(term, length(term)-{k}) || 'er'"
        else:
            then = f"left(term, length(term)-{k})"
        rows.append(f"WHEN {cond} THEN {then}")
    body = "\n        ".join(rows)
    return f"CASE\n        {body}\n        ELSE term END"


NORWEGIAN_SNOWBALL_SQL = (
    _no_main_sql(),
    _pair_case_sql(_NO_PAIRS, _NO_V),
    _main_case_sql(_NO_OTHER, _NO_V, "FALSE"),
)

# Danish: the other-suffix deletions (ig/lig/elig/els) re-run the
# consonant-pair rule — a chr(2)/chr(3) marker pair routes ONLY those
# through the second pair layer (the reference calls r_consonant_pair
# from case 1 only).
_DA_PAIR = _pair_case_sql(_DA_PAIRS, _DA_V)
DANISH_SNOWBALL_SQL = (
    _main_case_sql(
        _DA_MAIN,
        _DA_V,
        f"substr(term, length(term)-1, 1) IN ({_lits(_DA_S_END)})",
    ),
    _DA_PAIR,
    # igst → drop 'st': unconditional, no R1 check (DanishStemmer
    # r_other_suffix's leading block)
    "CASE WHEN right(term, 4) = 'igst' THEN left(term, length(term)-2) ELSE term END",
    # other suffix: mark ig/lig/elig/els deletions with chr(2)
    f"""CASE
        WHEN right(term, 4) = 'løst' AND {_fit_sql(4, _DA_V)} THEN left(term, length(term)-1)
        WHEN right(term, 4) = 'elig' AND {_fit_sql(4, _DA_V)} THEN chr(2) || left(term, length(term)-4)
        WHEN right(term, 3) = 'lig' AND {_fit_sql(3, _DA_V)} THEN chr(2) || left(term, length(term)-3)
        WHEN right(term, 3) = 'els' AND {_fit_sql(3, _DA_V)} THEN chr(2) || left(term, length(term)-3)
        WHEN right(term, 2) = 'ig' AND {_fit_sql(2, _DA_V)} THEN chr(2) || left(term, length(term)-2)
        ELSE term END""",
    # swap markers: deleted → bare (runs the pair layer), untouched →
    # chr(3) (skips it)
    "CASE WHEN left(term, 1) = chr(2) THEN substr(term, 2) ELSE chr(3) || term END",
    f"""CASE
        WHEN left(term, 1) = chr(3) THEN term
        WHEN right(term, 2) IN ('gd', 'dt', 'gt', 'kt') AND {_fit_sql(2, _DA_V)} THEN left(term, length(term)-1)
        ELSE term END""",
    "CASE WHEN left(term, 1) = chr(3) THEN substr(term, 2) ELSE term END",
    # undouble: final double consonant whose second char sits in R1
    f"""CASE
        WHEN right(term, 1) IN ({_lits(_DA_CONS)})
         AND substr(term, length(term)-1, 1) = right(term, 1)
         AND {_fit_sql(1, _DA_V)}
        THEN left(term, length(term)-1)
        ELSE term END""",
)


def danish_snowball_stem(term: str) -> str:
    s = term
    p1 = _p1(s, _DA_VOWELS)
    suf = _longest_fit(s, p1, _DA_MAIN)
    if suf == "s":
        if len(s) >= 2 and s[-2] in _DA_S_END:
            s = s[:-1]
    elif suf:
        s = s[: -len(suf)]
    s = _da_consonant_pair(s, p1)
    # other_suffix: the 'igst' → drop 'st' strip is UNCONDITIONAL (no R1
    # check — DanishStemmer.r_other_suffix's leading eq_s_b block)
    if s.endswith("igst"):
        s = s[:-2]
    suf = _longest_fit(s, p1, _DA_OTHER)
    if suf == "løst":
        s = s[:-1]  # løst → løs
    elif suf:
        s = s[: -len(suf)]
        s = _da_consonant_pair(s, p1)  # re-run pair after the deletion
    # undouble: final double consonant whose SECOND char sits in R1
    if (
        len(s) >= 2
        and s[-1] in _DA_CONS
        and s[-2] == s[-1]
        and len(s) - 1 >= p1
    ):
        s = s[:-1]
    return s


# ---------------------------------------------------------------------------
# Russian (snowballstem.org Russian; generated form at
# org/tartarus/snowball/ext/RussianStemmer.java). Structure: ё→е
# pre-map; RV = after the first vowel, R2 = after the second
# vowel→non-vowel transition; step 1 = perfective gerund OR
# [reflexive; adjectival|verb|noun]; step 2 = drop final 'и'; step 3 =
# derivational ост/ость in R2; step 4 = tidy-up (superlative ейш(е) +
# undouble нн, soft sign).
#
# Semantics notes carried from the generated code:
# - every suffix must lie entirely in RV (limit_backward = pV);
# - group-1 entries (в/вши/вшись, participles ем/нн/вш/щ/ющ, verb
#   endings л/н/на/…) require a PRECEDING а or я, itself inside RV;
#   when the longest match's precondition fails the whole rule fails —
#   no retry with a shorter entry (find_among_b semantics);
# - tidy-up case 1 deletes ейше/ейш IMMEDIATELY, then conditionally
#   undoubles a following нн (slice_del happens before the check, so
#   the superlative strip persists even when the нн check fails).
# ---------------------------------------------------------------------------

_RU_SB_V = frozenset("аеиоуыэюя")

#: (suffix, needs_preceding_a_ya) — perfective gerund (a_0)
_RU_GERUND = [
    ("ывшись", False), ("ившись", False), ("вшись", True),
    ("ывши", False), ("ивши", False), ("вши", True),
    ("ыв", False), ("ив", False), ("в", True),
]
#: adjective endings (a_1), plain delete
_RU_ADJ = sorted(
    "ее ие ое ые ими ыми ей ий ой ый ем им ом ым его ого ему ому их ых "
    "ею ою ую юю ая яя".split(),
    key=len,
    reverse=True,
)
#: participle (a_2): (suffix, needs_preceding_a_ya)
_RU_PART = [
    ("ующ", False), ("ивш", False), ("ывш", False),
    ("ющ", True), ("вш", True), ("ем", True), ("нн", True), ("щ", True),
]
_RU_REFLEX = ["сь", "ся"]
#: verb endings (a_4): (suffix, case) where case 1 needs preceding а/я
_RU_VERB = [
    ("ла", 1), ("ила", 2), ("ыла", 2), ("на", 1), ("ена", 2),
    ("ете", 1), ("ите", 2), ("йте", 1), ("ейте", 2), ("уйте", 2),
    ("ли", 1), ("или", 2), ("ыли", 2), ("й", 1), ("ей", 2), ("уй", 2),
    ("л", 1), ("ил", 2), ("ыл", 2), ("ем", 1), ("им", 2), ("ым", 2),
    ("н", 1), ("ен", 2), ("ло", 1), ("ило", 2), ("ыло", 2), ("но", 1),
    ("ено", 2), ("нно", 1), ("ет", 1), ("ует", 2), ("ит", 2), ("ыт", 2),
    ("ют", 1), ("уют", 2), ("ят", 2), ("ны", 1), ("ены", 2), ("ть", 1),
    ("ить", 2), ("ыть", 2), ("ешь", 1), ("ишь", 2), ("ю", 2), ("ую", 2),
]
_RU_VERB.sort(key=lambda e: len(e[0]), reverse=True)
#: noun endings (a_5), plain delete
_RU_NOUN = sorted(
    "а ев ов е ие ье и еи ии ами ями иями й ей ией ий ой ам ем ием ом "
    "ям иям о у ах ях иях ы ь ю ию ью я ия ья".split(),
    key=len,
    reverse=True,
)
_RU_DERIV = ["ость", "ост"]


def _ru_regions(s: str) -> tuple[int, int]:
    n = len(s)

    def scan(i: int, want_vowel: bool) -> int | None:
        while i < n:
            if (s[i] in _RU_SB_V) == want_vowel:
                return i + 1
            i += 1
        return None

    pV = scan(0, True)
    if pV is None:
        return n, n
    a = scan(pV, False)
    b = scan(a, True) if a is not None else None
    c = scan(b, False) if b is not None else None
    return pV, (c if c is not None else n)


def _ru_longest(s: str, pV: int, entries):
    """Longest suffix in RV; entries are (suffix, case) pairs or plain
    suffix strings (case None). Returns (suffix, case) or (None, None).
    Mirrors find_among_b: the longest FITTING match is selected before
    any precondition runs."""
    for e in entries:
        suf, case = e if isinstance(e, tuple) else (e, None)
        if s.endswith(suf) and len(s) - len(suf) >= pV:
            return suf, case
    return None, None


def _ru_prec_aya(s: str, start: int, pV: int) -> bool:
    """Preceding а/я, itself inside RV (eq_s_b under limit_backward=pV)."""
    return start - 1 >= pV and s[start - 1] in "ая"


def russian_snowball_stem(term: str) -> str:
    s = term.replace("ё", "е")
    pV, p2 = _ru_regions(s)

    # --- step 1 ---------------------------------------------------------
    suf, needs = _ru_longest(s, pV, _RU_GERUND)
    done = False
    if suf is not None and (
        not needs or _ru_prec_aya(s, len(s) - len(suf), pV)
    ):
        s = s[: -len(suf)]
        done = True
    if not done:
        suf, _ = _ru_longest(s, pV, _RU_REFLEX)
        if suf:
            s = s[: -len(suf)]
        suf, _ = _ru_longest(s, pV, _RU_ADJ)
        if suf:  # adjectival: adjective + optional participle
            s = s[: -len(suf)]
            psuf, _ = _ru_longest(s, pV, _RU_PART)
            if psuf is not None:
                needs = dict(_RU_PART)[psuf]
                if not needs or _ru_prec_aya(s, len(s) - len(psuf), pV):
                    s = s[: -len(psuf)]
        else:
            vsuf, vcase = _ru_longest(s, pV, _RU_VERB)
            ok = False
            if vsuf is not None and (
                vcase == 2 or _ru_prec_aya(s, len(s) - len(vsuf), pV)
            ):
                s = s[: -len(vsuf)]
                ok = True
            if not ok:
                nsuf, _ = _ru_longest(s, pV, _RU_NOUN)
                if nsuf:
                    s = s[: -len(nsuf)]

    # --- step 2: final 'и' in RV ----------------------------------------
    if s.endswith("и") and len(s) - 1 >= pV:
        s = s[:-1]

    # --- step 3: derivational, must sit in R2 ---------------------------
    suf, _ = _ru_longest(s, pV, _RU_DERIV)
    if suf and len(s) - len(suf) >= p2:
        s = s[: -len(suf)]

    # --- step 4: tidy up -------------------------------------------------
    suf, _ = _ru_longest(s, pV, ["ейше", "ейш"])
    if suf:
        s = s[: -len(suf)]  # persists even if the нн check below fails
        if s.endswith("нн") and len(s) - 2 >= pV:
            s = s[:-1]
    elif s.endswith("н") and len(s) - 1 >= pV:
        if s.endswith("нн") and len(s) - 2 >= pV:
            s = s[:-1]
    elif s.endswith("ь") and len(s) - 1 >= pV:
        s = s[:-1]
    return s


# --- Russian SQL twin -------------------------------------------------------
# RV fit: suffix start >= pV ⟺ the prefix before the suffix contains a
# vowel. R2 fit: the prefix contains the subsequence vowel, non-vowel,
# vowel, non-vowel (the first-occurrence chain is minimal, so ANY such
# subsequence ⟺ start >= p2). Step-1's OR-chain (gerund ELSE
# [reflexive; adjectival|verb|noun]) threads a chr(2) done-marker and a
# chr(3) adjective-pending-participle marker; CASE fall-through on a
# failed а/я precondition is outcome-identical to find_among_b's
# fail-the-rule semantics for every colliding suffix pair in these
# tables (verified over the full vocabulary in tests).

_RU_VC = "аеиоуыэюя"


def _ru_rv(k: int, t: str = "term") -> str:
    return f"regexp_matches(left({t}, length({t})-{k}), '[{_RU_VC}]')"


def _ru_prec_sql(k: int, t: str = "term") -> str:
    return (
        f"substr({t}, length({t})-{k}, 1) IN ('а', 'я') AND "
        f"regexp_matches(left({t}, length({t})-{k}-1), '[{_RU_VC}]')"
    )


def _ru_del_rows(entries, t: str = "term", then_prefix: str = "") -> list[str]:
    """CASE rows for a (suffix, needs_prec|case) table over column
    expression ``t``; deletion result optionally prefixed (marker)."""
    rows = []
    norm = []
    for e in entries:
        if isinstance(e, tuple):
            suf, c = e
            needs = (c is True) or (c == 1)
        else:
            suf, needs = e, False
        norm.append((suf, needs))
    for suf, needs in sorted(norm, key=lambda x: len(x[0]), reverse=True):
        k = len(suf)
        cond = f"right({t}, {k}) = '{suf}' AND {_ru_rv(k, t)}"
        if needs:
            cond += f" AND {_ru_prec_sql(k, t)}"
        then = f"left({t}, length({t})-{k})"
        if then_prefix:
            then = f"{then_prefix} || {then}"
        rows.append(f"WHEN {cond} THEN {then}")
    return rows


def _ru_sql() -> tuple[str, ...]:
    done = "left(term, 1) = chr(2)"
    adjm = "left(term, 1) = chr(3)"
    sub = "substr(term, 2)"
    nl = "\n        "

    gerund = (
        "CASE\n        "
        + nl.join(_ru_del_rows(_RU_GERUND, then_prefix="chr(2)"))
        + "\n        ELSE term END"
    )
    reflexive = (
        f"CASE\n        WHEN {done} THEN term\n        "
        + nl.join(_ru_del_rows(_RU_REFLEX))
        + "\n        ELSE term END"
    )
    adjective = (
        f"CASE\n        WHEN {done} THEN term\n        "
        + nl.join(_ru_del_rows(_RU_ADJ, then_prefix="chr(3)"))
        + "\n        ELSE term END"
    )
    # participle: only chr(3) rows; result always re-marked done
    part_rows = _ru_del_rows(_RU_PART, t=sub, then_prefix="chr(2)")
    participle = (
        "CASE\n"
        f"        WHEN NOT ({adjm}) THEN term\n        "
        + nl.join(f"WHEN {adjm} AND {r[5:]}" for r in part_rows)
        + f"\n        WHEN {adjm} THEN chr(2) || {sub}\n        ELSE term END"
    )
    verb = (
        f"CASE\n        WHEN {done} THEN term\n        "
        + nl.join(_ru_del_rows(_RU_VERB, then_prefix="chr(2)"))
        + "\n        ELSE term END"
    )
    noun = (
        f"CASE\n        WHEN {done} THEN term\n        "
        + nl.join(_ru_del_rows(_RU_NOUN))
        + "\n        ELSE term END"
    )
    unmark = f"CASE WHEN {done} THEN {sub} ELSE term END"
    step2 = (
        f"CASE WHEN right(term, 1) = 'и' AND {_ru_rv(1)} "
        "THEN left(term, length(term)-1) ELSE term END"
    )
    r2 = (
        "regexp_matches(left(term, length(term)-{k}), "
        f"'[{_RU_VC}].*[^{_RU_VC}].*[{_RU_VC}].*[^{_RU_VC}]')"
    )
    deriv = (
        "CASE\n"
        f"        WHEN right(term, 4) = 'ость' AND {_ru_rv(4)} AND {r2.format(k=4)} THEN left(term, length(term)-4)\n"
        f"        WHEN right(term, 3) = 'ост' AND {_ru_rv(3)} AND {r2.format(k=3)} THEN left(term, length(term)-3)\n"
        "        ELSE term END"
    )
    tidy_rows = []
    for suf in ("ейше", "ейш"):
        k = len(suf)
        tidy_rows.append(
            f"WHEN right(term, {k}) = '{suf}' AND {_ru_rv(k)} AND "
            f"substr(term, length(term)-{k + 1}, 2) = 'нн' AND {_ru_rv(k + 2)} "
            f"THEN left(term, length(term)-{k + 1})"
        )
        tidy_rows.append(
            f"WHEN right(term, {k}) = '{suf}' AND {_ru_rv(k)} "
            f"THEN left(term, length(term)-{k})"
        )
    tidy_rows.append(
        f"WHEN right(term, 2) = 'нн' AND {_ru_rv(1)} AND {_ru_rv(2)} "
        "THEN left(term, length(term)-1)"
    )
    tidy_rows.append(
        f"WHEN right(term, 1) = 'ь' AND {_ru_rv(1)} "
        "THEN left(term, length(term)-1)"
    )
    tidy = "CASE\n        " + nl.join(tidy_rows) + "\n        ELSE term END"

    return (
        "replace(term, 'ё', 'е')",
        gerund,
        reflexive,
        adjective,
        participle,
        verb,
        noun,
        unmark,
        step2,
        deriv,
        tidy,
    )


RUSSIAN_SNOWBALL_SQL = _ru_sql()


# ---------------------------------------------------------------------------
# English "Porter2" (snowballstem.org english; generated form at
# org/tartarus/snowball/ext/EnglishStemmer.java). The SnowballFilter
# path of the reference's English analysis (EnglishAnalyzer's default
# stays the original Porter in oracle/porter.py; Porter2 is the
# SnowballPorterFilterFactory(language=English) surface).
#
# Semantics notes carried from the generated code:
# - exception1 runs on the WHOLE word before anything else; words
#   shorter than 3 are returned untouched;
# - prelude: strip one leading apostrophe, then mark y at position 0
#   and every y after a vowel as consonant 'Y';
# - R1 starts after gener/commun/arsen when the word begins with one,
#   else after the first vowel→non-vowel; R2 continues from R1;
# - step 4 tests R2 on the LONGEST match only — 'ement' failing R2
#   does NOT fall back to 'ment' (find_among_b then-fail semantics);
# - step 1b's post-deletion among includes the EMPTY string: 'at/bl/iz'
#   append e, doubled consonants undouble, and a stem ending exactly at
#   R1 with a short-vowel shape appends e.
# ---------------------------------------------------------------------------

_EN_V = frozenset("aeiouy")
_EN_V_WXY = frozenset("aeiouywxY")
_EN_VALID_LI = frozenset("cdeghkmnrt")
_EN_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_EN_EXC1 = {
    "skis": "ski", "skies": "sky", "dying": "die", "lying": "lie",
    "tying": "tie", "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe", "atlas": "atlas",
    "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}
_EN_EXC2 = frozenset(
    ["inning", "outing", "canning", "herring", "earring", "proceed",
     "exceed", "succeed"]
)
_EN_STEP2 = [
    ("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
    ("ousness", "ous"), ("iveness", "ive"), ("tional", "tion"),
    ("biliti", "ble"), ("lessli", "less"), ("entli", "ent"),
    ("ation", "ate"), ("alism", "al"), ("aliti", "al"), ("ousli", "ous"),
    ("iviti", "ive"), ("fulli", "ful"), ("enci", "ence"), ("anci", "ance"),
    ("abli", "able"), ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
    ("bli", "ble"), ("ogi", None), ("li", None),
]
_EN_STEP3 = [
    ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
    ("icate", "ic"), ("iciti", "ic"), ("ative", ""), ("ical", "ic"),
    ("ness", ""), ("ful", ""),
]
_EN_STEP4 = sorted(
    ["al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
     "ment", "ent", "ism", "ate", "iti", "ous", "ive", "ize", "ion"],
    key=len,
    reverse=True,
)


def _en_regions(s: str) -> tuple[int, int]:
    n = len(s)
    p1 = n
    for pre in ("gener", "commun", "arsen"):
        if s.startswith(pre):
            p1 = len(pre)
            break
    else:
        for i in range(n - 1):
            if s[i] in _EN_V and s[i + 1] not in _EN_V:
                p1 = i + 2
                break
    p2 = n
    for i in range(p1, n - 1):
        if s[i] in _EN_V and s[i + 1] not in _EN_V:
            p2 = i + 2
            break
    return p1, p2


def _en_shortv(s: str) -> bool:
    """short-vowel shape at the END of s: non-vowel-WXY, vowel,
    non-vowel — or vowel, non-vowel at the very start ('ox')."""
    n = len(s)
    if (
        n >= 3
        and s[-1] not in _EN_V_WXY
        and s[-2] in _EN_V
        and s[-3] not in _EN_V
    ):
        return True
    return n == 2 and s[-1] not in _EN_V and s[-2] in _EN_V


def porter2_stem(term: str) -> str:  # noqa: C901 — mirrors the step list
    if term in _EN_EXC1:
        return _EN_EXC1[term]
    if len(term) < 3:
        return term
    s = term
    y_found = False
    # prelude
    if s.startswith("'"):
        s = s[1:]
    chars = list(s)
    if chars and chars[0] == "y":
        chars[0] = "Y"
        y_found = True
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _EN_V:
            chars[i] = "Y"
            y_found = True
    s = "".join(chars)
    p1, p2 = _en_regions(s)

    # step 0: longest of ' / 's / 's'
    for suf in ("'s'", "'s", "'"):
        if s.endswith(suf):
            s = s[: -len(suf)]
            break

    # step 1a — longest of a_2
    if s.endswith("sses"):
        s = s[:-2]
    elif s.endswith(("ied", "ies")):
        s = s[:-3] + ("i" if len(s) - 3 >= 2 else "ie")
    elif s.endswith(("ss", "us")):
        pass
    elif s.endswith("s"):
        if any(c in _EN_V for c in s[: len(s) - 2]):
            s = s[:-1]

    if s in _EN_EXC2:
        return s

    # step 1b — longest of a_4
    suf = next(
        (
            x
            for x in ("eedly", "ingly", "edly", "eed", "ing", "ed")
            if s.endswith(x)
        ),
        None,
    )
    if suf in ("eed", "eedly"):
        if len(s) - len(suf) >= p1:
            s = s[: -len(suf)] + "ee"
    elif suf is not None:
        start = len(s) - len(suf)
        if any(c in _EN_V for c in s[:start]):
            s = s[:start]
            if s.endswith(("at", "bl", "iz")):
                s += "e"
            elif s.endswith(_EN_DOUBLES):
                s = s[:-1]
            elif len(s) == p1 and _en_shortv(s):
                s += "e"

    # step 1c: final y/Y after a non-vowel that is not the first char
    if (
        len(s) >= 3
        and s[-1] in "yY"
        and s[-2] not in _EN_V
    ):
        s = s[:-1] + "i"

    # step 2 (longest in the table; then R1 gate on THAT match)
    for suf, rep in _EN_STEP2:
        if s.endswith(suf):
            if len(s) - len(suf) >= p1:
                if suf == "ogi":
                    if s.endswith("logi"):
                        s = s[:-1]  # ogi → og after l
                elif suf == "li":
                    if len(s) >= 3 and s[-3] in _EN_VALID_LI:
                        s = s[:-2]
                else:
                    s = s[: -len(suf)] + rep
            break

    # step 3
    for suf, rep in _EN_STEP3:
        if s.endswith(suf):
            if len(s) - len(suf) >= p1:
                if suf == "ative":
                    if len(s) - 5 >= p2:
                        s = s[:-5]
                else:
                    s = s[: -len(suf)] + rep
            break

    # step 4 (R2 gate on the longest match only)
    for suf in _EN_STEP4:
        if s.endswith(suf):
            if len(s) - len(suf) >= p2:
                if suf == "ion":
                    if len(s) >= 4 and s[-4] in "st":
                        s = s[:-3]
                else:
                    s = s[: -len(suf)]
            break

    # step 5
    if s.endswith("e"):
        if len(s) - 1 >= p2 or (
            len(s) - 1 >= p1 and not _en_shortv(s[:-1])
        ):
            s = s[:-1]
    elif s.endswith("l") and len(s) - 1 >= p2 and len(s) >= 2 and s[-2] == "l":
        s = s[:-1]

    if y_found:
        s = s.replace("Y", "y")
    return s


# --- Porter2 SQL twin -------------------------------------------------------
# The y→Y prelude is one global regex (post-vowel y); R1/R2 fits factor
# into vowel / vowel-nonvowel-subsequence regexes with the
# gener/commun/arsen prefix override; len==p1 (the step-1b short-word
# test) is fit(0) AND NOT fit(1). Words shorter than 3 and exception-1
# words short-circuit via a chr(1)/chr(2) marker pair; exception-2
# words mark done after step 1a.

_EN_VC = "aeiouy"


def _en_fit1(k) -> str:
    """start = length(term)-k >= p1, prefix-override aware."""
    pfx = " OR ".join(
        f"(left(term, {len(p)}) = '{p}' AND length(term)-({k}) >= {len(p)})"
        for p in ("gener", "commun", "arsen")
    )
    std = (
        f"(NOT (left(term, 5) = 'gener' OR left(term, 6) = 'commun' OR left(term, 5) = 'arsen') AND "
        f"regexp_matches(left(term, length(term)-({k})), '[{_EN_VC}][^{_EN_VC}]'))"
    )
    return f"({pfx} OR {std})"


def _en_fit2(k) -> str:
    """start >= p2: past the special prefix (or the first v→nv), the
    remaining prefix contains another v→nv subsequence."""
    rows = []
    for p in ("gener", "commun", "arsen"):
        rows.append(
            f"(left(term, {len(p)}) = '{p}' AND regexp_matches("
            f"substr(left(term, length(term)-({k})), {len(p) + 1}), "
            f"'[{_EN_VC}].*[^{_EN_VC}]'))"
        )
    rows.append(
        f"(NOT (left(term, 5) = 'gener' OR left(term, 6) = 'commun' OR left(term, 5) = 'arsen') AND "
        f"regexp_matches(left(term, length(term)-({k})), "
        f"'[{_EN_VC}].*[^{_EN_VC}].*[{_EN_VC}].*[^{_EN_VC}]'))"
    )
    return "(" + " OR ".join(rows) + ")"


def _en_shortv_sql(t: str) -> str:
    return (
        f"(regexp_matches({t}, '[^{_EN_VC}][{_EN_VC}][^aeiouywxY]$') OR "
        f"regexp_matches({t}, '^[{_EN_VC}][^{_EN_VC}]$'))"
    )


def _porter2_sql() -> tuple[str, ...]:
    skip = "left(term, 1) = chr(1)"
    done = "left(term, 1) = chr(2)"
    guard = f"({skip} OR {done})"
    nl = "\n        "

    exc1_rows = nl.join(
        f"WHEN term = '{w}' THEN chr(2) || '{r}'"
        for w, r in sorted(_EN_EXC1.items())
    )
    layer0 = (
        "CASE\n        "
        + exc1_rows
        + "\n        WHEN length(term) < 3 THEN chr(1) || term"
        + "\n        ELSE term END"
    )
    prelude = (
        f"CASE WHEN {guard} THEN term ELSE "
        "regexp_replace("
        f"regexp_replace(CASE WHEN left(term, 1) = '''' THEN substr(term, 2) ELSE term END, '^y', 'Y'), "
        f"'([{_EN_VC}])y', '\\1Y', 'g') END"
    )
    step0 = (
        f"""CASE
        WHEN {guard} THEN term
        WHEN right(term, 3) = '''s''' THEN left(term, length(term)-3)
        WHEN right(term, 2) = '''s' THEN left(term, length(term)-2)
        WHEN right(term, 1) = '''' THEN left(term, length(term)-1)
        ELSE term END"""
    )
    step1a = (
        f"""CASE
        WHEN {guard} THEN term
        WHEN right(term, 4) = 'sses' THEN left(term, length(term)-2)
        WHEN right(term, 3) IN ('ied', 'ies') AND length(term) >= 5 THEN left(term, length(term)-3) || 'i'
        WHEN right(term, 3) IN ('ied', 'ies') THEN left(term, length(term)-3) || 'ie'
        WHEN right(term, 2) IN ('ss', 'us') THEN term
        WHEN right(term, 1) = 's' AND regexp_matches(left(term, length(term)-2), '[{_EN_VC}]') THEN left(term, length(term)-1)
        ELSE term END"""
    )
    exc2_rows = ", ".join(f"'{w}'" for w in sorted(_EN_EXC2))
    exc2 = (
        f"CASE WHEN NOT {guard} AND term IN ({exc2_rows}) "
        "THEN chr(2) || term ELSE term END"
    )
    # step 1b: enumerate (suffix, post-action) rows; r = the deleted form
    rows_1b = []
    for suf in ("eedly", "eed"):
        k = len(suf)
        rows_1b.append(
            f"WHEN right(term, {k}) = '{suf}' AND {_en_fit1(k)} "
            f"THEN left(term, length(term)-{k}) || 'ee'"
        )
        rows_1b.append(f"WHEN right(term, {k}) = '{suf}' THEN term")
    for suf in ("ingly", "edly", "ing", "ed"):
        k = len(suf)
        r = f"left(term, length(term)-{k})"
        has_v = f"regexp_matches({r}, '[{_EN_VC}]')"
        dbl = ", ".join(f"'{d}'" for d in _EN_DOUBLES)
        # len(r)==p1 ⟺ fit(k) AND NOT fit(k+1)
        at_p1 = f"({_en_fit1(k)} AND NOT {_en_fit1(k + 1)})"
        rows_1b.append(
            f"WHEN right(term, {k}) = '{suf}' AND {has_v} AND "
            f"right({r}, 2) IN ('at', 'bl', 'iz') THEN {r} || 'e'"
        )
        rows_1b.append(
            f"WHEN right(term, {k}) = '{suf}' AND {has_v} AND "
            f"right({r}, 2) IN ({dbl}) THEN left(term, length(term)-{k + 1})"
        )
        rows_1b.append(
            f"WHEN right(term, {k}) = '{suf}' AND {has_v} AND {at_p1} AND "
            f"{_en_shortv_sql(r)} THEN {r} || 'e'"
        )
        rows_1b.append(
            f"WHEN right(term, {k}) = '{suf}' AND {has_v} THEN {r}"
        )
        rows_1b.append(f"WHEN right(term, {k}) = '{suf}' THEN term")
    step1b = (
        f"CASE\n        WHEN {guard} THEN term\n        "
        + nl.join(rows_1b)
        + "\n        ELSE term END"
    )
    step1c = (
        f"""CASE
        WHEN {guard} THEN term
        WHEN length(term) >= 3 AND right(term, 1) IN ('y', 'Y')
         AND substr(term, length(term)-1, 1) NOT IN ('a','e','i','o','u','y')
        THEN left(term, length(term)-1) || 'i'
        ELSE term END"""
    )
    rows_2 = []
    for suf, rep in _EN_STEP2:
        k = len(suf)
        if suf == "ogi":
            rows_2.append(
                f"WHEN right(term, 3) = 'ogi' AND {_en_fit1(3)} AND "
                "substr(term, length(term)-3, 1) = 'l' "
                "THEN left(term, length(term)-1)"
            )
        elif suf == "li":
            lits = ", ".join(f"'{c}'" for c in sorted(_EN_VALID_LI))
            rows_2.append(
                f"WHEN right(term, 2) = 'li' AND {_en_fit1(2)} AND "
                f"substr(term, length(term)-2, 1) IN ({lits}) "
                "THEN left(term, length(term)-2)"
            )
        else:
            rows_2.append(
                f"WHEN right(term, {k}) = '{suf}' AND {_en_fit1(k)} "
                f"THEN left(term, length(term)-{k}) || '{rep}'"
            )
        rows_2.append(f"WHEN right(term, {k}) = '{suf}' THEN term")
    step2 = (
        f"CASE\n        WHEN {guard} THEN term\n        "
        + nl.join(rows_2)
        + "\n        ELSE term END"
    )
    rows_3 = []
    for suf, rep in _EN_STEP3:
        k = len(suf)
        if suf == "ative":
            rows_3.append(
                f"WHEN right(term, 5) = 'ative' AND {_en_fit1(5)} AND "
                f"{_en_fit2(5)} THEN left(term, length(term)-5)"
            )
        else:
            rows_3.append(
                f"WHEN right(term, {k}) = '{suf}' AND {_en_fit1(k)} "
                f"THEN left(term, length(term)-{k}) || '{rep}'"
            )
        rows_3.append(f"WHEN right(term, {k}) = '{suf}' THEN term")
    step3 = (
        f"CASE\n        WHEN {guard} THEN term\n        "
        + nl.join(rows_3)
        + "\n        ELSE term END"
    )
    rows_4 = []
    for suf in _EN_STEP4:
        k = len(suf)
        if suf == "ion":
            rows_4.append(
                f"WHEN right(term, 3) = 'ion' AND {_en_fit2(3)} AND "
                "substr(term, length(term)-3, 1) IN ('s', 't') "
                "THEN left(term, length(term)-3)"
            )
        else:
            rows_4.append(
                f"WHEN right(term, {k}) = '{suf}' AND {_en_fit2(k)} "
                f"THEN left(term, length(term)-{k})"
            )
        rows_4.append(f"WHEN right(term, {k}) = '{suf}' THEN term")
    step4 = (
        f"CASE\n        WHEN {guard} THEN term\n        "
        + nl.join(rows_4)
        + "\n        ELSE term END"
    )
    step5 = (
        f"""CASE
        WHEN {guard} THEN term
        WHEN right(term, 1) = 'e' AND ({_en_fit2(1)} OR ({_en_fit1(1)} AND NOT {_en_shortv_sql("left(term, length(term)-1)")})) THEN left(term, length(term)-1)
        WHEN right(term, 1) = 'l' AND {_en_fit2(1)} AND substr(term, length(term)-1, 1) = 'l' THEN left(term, length(term)-1)
        ELSE term END"""
    )
    postlude = (
        f"CASE WHEN {skip} OR {done} THEN substr(term, 2) "
        "ELSE replace(term, 'Y', 'y') END"
    )
    return (
        layer0, prelude, step0, step1a, exc2, step1b, step1c,
        step2, step3, step4, step5, postlude,
    )


PORTER2_SQL = _porter2_sql()


# ---------------------------------------------------------------------------
# German (snowballstem.org german; generated form at
# org/tartarus/snowball/ext/GermanStemmer.java) — the GermanAnalyzer's
# Snowball ALTERNATIVE (its default is the light stemmer).
#
# Semantics notes:
# - prelude: ß→ss everywhere, then ONE left-to-right scan marking u/y
#   between vowels as consonant U/Y (a marked char cannot enable a
#   later mark — the scan sees the mutated string);
# - R1 = first vowel→non-vowel, floored at 3 (like Swedish); R2
#   continues; vowels include ä/ö/ü;
# - three INDEPENDENT passes: a_1 in R1 (with the -niss→-nis tail and
#   the s-ending gate), a_2 in R1 (st needs an st-ending with ≥3 chars
#   before it), a_4 in R2 (with the ig-not-after-e gates and the
#   conditional second deletions);
# - postlude: U→u, Y→y, fold ä/ö/ü.
# ---------------------------------------------------------------------------

_DE_SB_V = frozenset("aeiouyäöü")
_DE_SB_S_END = frozenset("bdfghklmnrt")
_DE_SB_ST_END = frozenset("bdfghklmnt")


def _de_prelude(term: str) -> str:
    s = list(term.replace("ß", "ss"))
    i = 0
    while i + 2 < len(s):
        if (
            s[i] in _DE_SB_V
            and s[i + 1] in ("u", "y")
            and s[i + 2] in _DE_SB_V
        ):
            s[i + 1] = s[i + 1].upper()
        i += 1
    return "".join(s)


def _de_sb_regions(s: str) -> tuple[int, int]:
    n = len(s)
    p1 = p2 = n
    for i in range(n - 1):
        if s[i] in _DE_SB_V and s[i + 1] not in _DE_SB_V:
            p1 = i + 2
            break
    if p1 < n:
        for i in range(p1, n - 1):
            if s[i] in _DE_SB_V and s[i + 1] not in _DE_SB_V:
                p2 = i + 2
                break
    return max(p1, 3) if p1 < n or n >= 3 else n, p2


_DE_POST = str.maketrans({"U": "u", "Y": "y", "ä": "a", "ö": "o", "ü": "u"})


def _de_sb_core(s: str) -> str:
    """The post-prelude German pipeline, shared with german2 (the two
    generated stemmers differ only in the prelude — German2Stemmer.java
    is GermanStemmer.java with shifted table indices)."""
    n = len(s)
    # mark_regions fails for words shorter than 3 → p1 = p2 = len
    if n < 3:
        p1 = p2 = n
    else:
        p1, p2 = _de_sb_regions(s)
    # pass 1 (a_1, R1)
    suf = _longest_fit(s, p1, ("ern", "em", "en", "er", "es", "e", "s"))
    if suf == "s":
        if len(s) >= 2 and s[-2] in _DE_SB_S_END:
            s = s[:-1]
    elif suf in ("e", "en", "es"):
        s = s[: -len(suf)]
        if s.endswith("niss"):
            s = s[:-1]
    elif suf:
        s = s[: -len(suf)]
    # pass 2 (a_2, R1)
    suf = _longest_fit(s, p1, ("est", "en", "er", "st"))
    if suf == "st":
        if len(s) >= 3 and s[-3] in _DE_SB_ST_END and len(s) >= 6:
            s = s[:-2]
    elif suf:
        s = s[: -len(suf)]
    # pass 3 (a_4, R2)
    suf = _longest_fit(s, p2, ("lich", "isch", "heit", "keit", "end", "ung", "ig", "ik"))
    if suf in ("end", "ung"):
        s = s[: -len(suf)]
        if (
            s.endswith("ig")
            and not s.endswith("eig")
            and len(s) - 2 >= p2
        ):
            s = s[:-2]
    elif suf in ("ig", "isch", "ik"):
        if not s.endswith("e" + suf):
            s = s[: -len(suf)]
    elif suf in ("lich", "heit"):
        s = s[: -len(suf)]
        t = _longest_fit(s, p1, ("er", "en"))
        if t:
            s = s[: -len(t)]
    elif suf == "keit":
        s = s[:-4]
        t = _longest_fit(s, p2, ("lich", "ig"))
        if t:
            s = s[: -len(t)]
    return s.translate(_DE_POST)


def german_snowball_stem(term: str) -> str:
    return _de_sb_core(_de_prelude(term))


def german2_snowball_stem(term: str) -> str:
    """Snowball 'german2' (German2Stemmer.java = GermanStemmer.java
    with a different prelude): the u/y marking runs FIRST, then a fold
    pass rewrites ß→ss and ae/oe/ue into umlauts while skipping past
    'qu' — a marked U breaks 'ue' sequences, which is the variant's
    point ('aue' must not become 'aü')."""
    chars = list(term)
    for i in range(1, len(chars) - 1):
        if (
            chars[i] in ("u", "y")
            and chars[i - 1] in _DE_SB_V
            and chars[i + 1] in _DE_SB_V
        ):
            chars[i] = chars[i].upper()
    s = "".join(chars)
    out = []
    i = 0
    n = len(s)
    while i < n:
        two = s[i : i + 2]
        if s[i] == "ß":
            out.append("ss")
            i += 1
        elif two == "ae":
            out.append("ä")
            i += 2
        elif two == "oe":
            out.append("ö")
            i += 2
        elif two == "ue":
            out.append("ü")
            i += 2
        elif two == "qu":
            out.append("qu")
            i += 2
        else:
            out.append(s[i])
            i += 1
    return _de_sb_core("".join(out))




# --- German SQL twin --------------------------------------------------------
# The prelude's single left-to-right u/y-between-vowels scan is
# reproduced by ITERATING a leftmost-nonoverlapping 3-char regex pass
# (mark via a chr(4) sentinel, then case-flip): each pass marks every
# other link of a shared-vowel chain (v u v u v), so K passes cover
# chains of length 2^K — 3 passes are far beyond any real word, and the
# fixpoint equals the scan (marking only ever DISABLES later marks).
# R1 floors at 3 like Swedish; R2 is the second v→nv subsequence (the
# floor does not shift R2's scan start).

_DE_VC = "aeiouyäöü"

_DE_MARK_PASS = (
    "replace(replace(regexp_replace(term, "
    f"'([{_DE_VC}])([uy])([{_DE_VC}])', '\\1\x04\\2\\3', 'g'), "
    "'\x04u', 'U'), '\x04y', 'Y')"
)


def _de_fit2(k) -> str:
    return (
        f"regexp_matches(left(term, length(term)-({k})), "
        f"'[{_DE_VC}].*[^{_DE_VC}].*[{_DE_VC}].*[^{_DE_VC}]')"
    )


def _german_sb_sql() -> tuple[str, ...]:
    nl = "\n        "
    f1 = lambda k: _fit_sql(k, _DE_VC)  # noqa: E731

    rows1 = []
    for suf in ("ern", "em", "en", "er", "es", "e", "s"):
        k = len(suf)
        if suf == "s":
            rows1.append(
                f"WHEN right(term, 1) = 's' AND {f1(1)} AND "
                f"substr(term, length(term)-1, 1) IN ({_lits(_DE_SB_S_END)}) "
                "THEN left(term, length(term)-1)"
            )
        elif suf in ("e", "en", "es"):
            rows1.append(
                f"WHEN right(term, {k}) = '{suf}' AND {f1(k)} AND "
                f"right(left(term, length(term)-{k}), 4) = 'niss' "
                f"THEN left(term, length(term)-{k + 1})"
            )
            rows1.append(
                f"WHEN right(term, {k}) = '{suf}' AND {f1(k)} "
                f"THEN left(term, length(term)-{k})"
            )
        else:
            rows1.append(
                f"WHEN right(term, {k}) = '{suf}' AND {f1(k)} "
                f"THEN left(term, length(term)-{k})"
            )
    pass1 = "CASE\n        " + nl.join(rows1) + "\n        ELSE term END"

    rows2 = [
        f"WHEN right(term, 3) = 'est' AND {f1(3)} THEN left(term, length(term)-3)",
        f"WHEN right(term, 2) IN ('en', 'er') AND {f1(2)} THEN left(term, length(term)-2)",
        f"WHEN right(term, 2) = 'st' AND {f1(2)} AND "
        f"substr(term, length(term)-2, 1) IN ({_lits(_DE_SB_ST_END)}) AND length(term) >= 6 "
        "THEN left(term, length(term)-2)",
    ]
    pass2 = "CASE\n        " + nl.join(rows2) + "\n        ELSE term END"

    rows3 = []
    for suf in ("lich", "heit"):
        r = f"left(term, length(term)-4)"
        rows3.append(
            f"WHEN right(term, 4) = '{suf}' AND {_de_fit2(4)} AND "
            f"right({r}, 2) IN ('er', 'en') AND {f1(6)} "
            "THEN left(term, length(term)-6)"
        )
        rows3.append(
            f"WHEN right(term, 4) = '{suf}' AND {_de_fit2(4)} THEN {r}"
        )
    rows3.append(
        f"WHEN right(term, 4) = 'keit' AND {_de_fit2(4)} AND "
        f"right(left(term, length(term)-4), 4) = 'lich' AND {_de_fit2(8)} "
        "THEN left(term, length(term)-8)"
    )
    rows3.append(
        f"WHEN right(term, 4) = 'keit' AND {_de_fit2(4)} AND "
        f"right(left(term, length(term)-4), 2) = 'ig' AND {_de_fit2(6)} "
        "THEN left(term, length(term)-6)"
    )
    rows3.append(
        f"WHEN right(term, 4) = 'keit' AND {_de_fit2(4)} THEN left(term, length(term)-4)"
    )
    rows3.append(
        f"WHEN right(term, 4) = 'isch' AND {_de_fit2(4)} AND "
        "substr(term, length(term)-4, 1) != 'e' THEN left(term, length(term)-4)"
    )
    for suf in ("end", "ung"):
        rows3.append(
            f"WHEN right(term, 3) = '{suf}' AND {_de_fit2(3)} AND "
            f"right(left(term, length(term)-3), 2) = 'ig' AND "
            f"right(left(term, length(term)-3), 3) != 'eig' AND {_de_fit2(5)} "
            "THEN left(term, length(term)-5)"
        )
        rows3.append(
            f"WHEN right(term, 3) = '{suf}' AND {_de_fit2(3)} "
            "THEN left(term, length(term)-3)"
        )
    for suf in ("ig", "ik"):
        rows3.append(
            f"WHEN right(term, 2) = '{suf}' AND {_de_fit2(2)} AND "
            f"substr(term, length(term)-2, 1) != 'e' THEN left(term, length(term)-2)"
        )
    pass3 = "CASE\n        " + nl.join(rows3) + "\n        ELSE term END"

    return (
        "replace(term, 'ß', 'ss')",
        _DE_MARK_PASS,
        _DE_MARK_PASS,
        _DE_MARK_PASS,
        pass1,
        pass2,
        pass3,
        "translate(term, 'UYäöü', 'uyaou')",
    )


GERMAN_SNOWBALL_SQL = _german_sb_sql()

#: german2 twin: u/y marking FIRST (same iterated passes), then the
#: fold layer (qu protected via a sentinel so its u never folds),
#: then German's suffix layers and postlude unchanged.
GERMAN2_SNOWBALL_SQL = (
    _DE_MARK_PASS,
    _DE_MARK_PASS,
    _DE_MARK_PASS,
    "replace(replace(replace(replace(replace(replace("
    "term, 'qu', '\x05'), 'ß', 'ss'), 'ae', 'ä'), 'oe', 'ö'), "
    "'ue', 'ü'), '\x05', 'qu')",
) + GERMAN_SNOWBALL_SQL[4:]


# ---------------------------------------------------------------------------
# Dutch (snowballstem.org dutch; generated form at
# org/tartarus/snowball/ext/DutchStemmer.java) — the DutchAnalyzer's
# DEFAULT stem filter (StandardTokenizer → LowerCase → Stop →
# [StemmerOverride] → SnowballFilter).
#
# Semantics notes:
# - prelude: fold á/ä→a é/ë→e í/ï→i ó/ö→o ú/ü→u; initial y→Y; one scan
#   marking i-between-vowels as I and y-after-vowel as Y;
# - R1 = first v→nv floored at 3; R2 continues (unfloored scan start);
# - the among tables are searched WITHOUT a region limit — the R1/R2
#   checks run on the LONGEST match and a failure ends the rule (no
#   shorter-entry retry);
# - e/en endings require a preceding non-vowel and trigger the
#   dd/kk/tt undouble; 'en' additionally must not follow 'gem';
# - 'bar' only strips when THIS word's e-ending rule fired (B_e_found);
# - final step: collapse aa/ee/oo/uu between a non-vowel and a final
#   non-vowel-non-I char.
# ---------------------------------------------------------------------------

_NL_V = frozenset("aeiouyè")
_NL_V_J = _NL_V | {"j"}
_NL_V_I = _NL_V | {"I"}
_NL_FOLD = str.maketrans("áäéëíïóöúü", "aaeeiioouu")
_NL_POST = str.maketrans("IY", "iy")


def _nl_prelude(term: str) -> str:
    s = list(term.translate(_NL_FOLD))
    if s and s[0] == "y":
        s[0] = "Y"
    i = 0
    while i < len(s):
        if s[i] in _NL_V:
            if i + 2 < len(s) and s[i + 1] == "i" and s[i + 2] in _NL_V:
                s[i + 1] = "I"
            elif i + 1 < len(s) and s[i + 1] == "y":
                s[i + 1] = "Y"
        i += 1
    return "".join(s)


def _nl_regions(s: str) -> tuple[int, int]:
    n = len(s)
    p1 = p2 = n
    for i in range(n - 1):
        if s[i] in _NL_V and s[i + 1] not in _NL_V:
            p1 = i + 2
            break
    if p1 < n:
        for i in range(p1, n - 1):
            if s[i] in _NL_V and s[i + 1] not in _NL_V:
                p2 = i + 2
                break
    return max(p1, 3), p2


def _longest_match(s: str, suffixes):
    for suf in sorted(suffixes, key=len, reverse=True):
        if s.endswith(suf):
            return suf
    return None


def _nl_undouble(s: str) -> str:
    if s.endswith(("dd", "kk", "tt")):
        return s[:-1]
    return s


def dutch_snowball_stem(term: str) -> str:
    s = _nl_prelude(term)
    p1, p2 = _nl_regions(s)
    e_found = False

    def en_ending(x: str, k: int) -> str | None:
        """Delete a k-char en/ene suffix: R1, preceded by a non-vowel,
        not by 'gem'; then undouble. None = rule fails (no change)."""
        start = len(x) - k
        if start < p1:
            return None
        if start == 0 or x[start - 1] in _NL_V:
            return None
        if x[:start].endswith("gem"):
            return None
        return _nl_undouble(x[:start])

    # part A (a_3)
    suf = _longest_match(s, ("heden", "ene", "en", "se", "s"))
    if suf == "heden":
        if len(s) - 5 >= p1:
            s = s[:-5] + "heid"
    elif suf in ("ene", "en"):
        r = en_ending(s, len(suf))
        if r is not None:
            s = r
    elif suf in ("se", "s"):
        if len(s) - len(suf) >= p1 and (
            len(s) > len(suf) and s[-len(suf) - 1] not in _NL_V_J
        ):
            s = s[: -len(suf)]

    # part B: e-ending
    if (
        s.endswith("e")
        and len(s) - 1 >= p1
        and len(s) >= 2
        and s[-2] not in _NL_V
    ):
        s = _nl_undouble(s[:-1])
        e_found = True

    # part C: heid (exact), R2, not after c; then an en-ending
    if s.endswith("heid") and len(s) - 4 >= p2 and (
        len(s) < 5 or s[-5] != "c"
    ):
        s = s[:-4]
        if s.endswith("en"):
            r = en_ending(s, 2)
            if r is not None:
                s = r

    # part D (a_4)
    suf = _longest_match(s, ("lijk", "baar", "end", "ing", "bar", "ig"))
    if suf in ("end", "ing"):
        if len(s) - len(suf) >= p2:
            s = s[: -len(suf)]
            if (
                s.endswith("ig")
                and len(s) - 2 >= p2
                and not s.endswith("eig")
            ):
                s = s[:-2]
            else:
                s = _nl_undouble(s)
    elif suf == "ig":
        if len(s) - 2 >= p2 and not s.endswith("eig"):
            s = s[:-2]
    elif suf == "lijk":
        if len(s) - 4 >= p2:
            s = s[:-4]
            if (
                s.endswith("e")
                and len(s) - 1 >= p1
                and len(s) >= 2
                and s[-2] not in _NL_V
            ):
                s = _nl_undouble(s[:-1])
                e_found = True
    elif suf == "baar":
        if len(s) - 4 >= p2:
            s = s[:-4]
    elif suf == "bar":
        if len(s) - 3 >= p2 and e_found:
            s = s[:-3]

    # part E: collapse VV between a non-vowel and a final non-vowel/I
    if (
        len(s) >= 4
        and s[-1] not in _NL_V_I
        and s[-3:-1] in ("aa", "ee", "oo", "uu")
        and s[-4] not in _NL_V
    ):
        s = s[:-2] + s[-1]

    return s.translate(_NL_POST)


# --- Dutch SQL twin ---------------------------------------------------------
# The prelude's combined i/y scan is reproduced by iterating a
# LEFTMOST-SINGLE replacement (regexp_replace without 'g'): each layer
# performs exactly the scan's next mark on the current string, so K
# layers ≡ the scan's first K marks — 4 covers any real word (the
# vocabulary needs at most 1). The e-found flag (consumed only by the
# 'bar' rule) rides as a chr(2) prefix; every later layer is emitted
# twice via a column-expression parameter, once for bare terms and once
# looking through the marker.

_NL_VC = "aeiouyè"

_NL_MARK_STEP = (
    "replace(replace(regexp_replace(term, "
    f"'([{_NL_VC}])(i[{_NL_VC}]|y)', '\\1\x04\\2'), "
    "'\x04i', 'I'), '\x04y', 'Y')"
)


def _nl_sql() -> tuple[str, ...]:
    nl = "\n        "
    marked = "left(term, 1) = chr(2)"
    v = _lits(sorted(_NL_V))
    vj = _lits(sorted(_NL_V_J))
    vI = _lits(sorted(_NL_V_I))

    def fit1(t: str, k) -> str:
        return (
            f"length({t})-({k}) >= 3 AND "
            f"regexp_matches(left({t}, length({t})-({k})), '[{_NL_VC}][^{_NL_VC}]')"
        )

    def fit2(t: str, k) -> str:
        return (
            f"regexp_matches(left({t}, length({t})-({k})), "
            f"'[{_NL_VC}].*[^{_NL_VC}].*[{_NL_VC}].*[^{_NL_VC}]')"
        )

    def cut(t: str, k: int) -> str:
        return f"left({t}, length({t})-{k})"

    def wrap(rows_fn, set_mark: bool = False) -> str:
        """Emit a layer CASE twice: bare, and looking through chr(2).
        ``rows_fn(t, mark)`` returns rows whose results are over ``t``;
        ``mark`` is prepended to every result by the builder when the
        input was marked (or when the row itself sets the flag)."""
        bare = "CASE\n        " + nl.join(rows_fn("term", "")) + "\n        ELSE term END"
        thru = (
            "CASE\n        "
            + nl.join(rows_fn("substr(term, 2)", "chr(2) || "))
            + "\n        ELSE term END"
        )
        return f"CASE WHEN {marked} THEN ({thru}) ELSE ({bare}) END"

    def en_rows(t, mark, k, suf):
        r = cut(t, k)
        base = (
            f"right({t}, {k}) = '{suf}' AND {fit1(t, k)} AND "
            f"substr({t}, length({t})-{k}, 1) NOT IN ({v}) AND "
            f"right({r}, 3) != 'gem'"
        )
        return [
            f"WHEN {base} AND right({r}, 2) IN ('dd', 'kk', 'tt') THEN {mark}{cut(t, k + 1)}",
            f"WHEN {base} THEN {mark}{r}",
        ]

    def rows_a(t, mark):
        rows = [
            f"WHEN right({t}, 5) = 'heden' AND {fit1(t, 5)} THEN {mark}{cut(t, 5)} || 'heid'",
            f"WHEN right({t}, 5) = 'heden' THEN {mark}{t}",
            *en_rows(t, mark, 3, "ene"),
            f"WHEN right({t}, 3) = 'ene' THEN {mark}{t}",
            *en_rows(t, mark, 2, "en"),
            f"WHEN right({t}, 2) = 'en' THEN {mark}{t}",
        ]
        for suf in ("se", "s"):
            k = len(suf)
            rows.append(
                f"WHEN right({t}, {k}) = '{suf}' AND {fit1(t, k)} AND "
                f"substr({t}, length({t})-{k}, 1) NOT IN ({vj}) THEN {mark}{cut(t, k)}"
            )
            rows.append(f"WHEN right({t}, {k}) = '{suf}' THEN {mark}{t}")
        return rows

    def rows_b(t, mark):
        # success SETS the e-found marker regardless of input state
        r = cut(t, 1)
        base = (
            f"right({t}, 1) = 'e' AND {fit1(t, 1)} AND "
            f"substr({t}, length({t})-1, 1) NOT IN ({v})"
        )
        return [
            f"WHEN {base} AND right({r}, 2) IN ('dd', 'kk', 'tt') THEN chr(2) || {cut(t, 2)}",
            f"WHEN {base} THEN chr(2) || {r}",
        ]

    def rows_c(t, mark):
        rc = cut(t, 4)
        base = (
            f"right({t}, 4) = 'heid' AND {fit2(t, 4)} AND "
            f"substr({t}, length({t})-4, 1) != 'c'"
        )
        rc_en = cut(t, 6)
        en_base = (
            f"{base} AND right({rc}, 2) = 'en' AND {fit1(t, 6)} AND "
            f"substr({t}, length({t})-6, 1) NOT IN ({v}) AND "
            f"right({rc_en}, 3) != 'gem'"
        )
        return [
            f"WHEN {en_base} AND right({rc_en}, 2) IN ('dd', 'kk', 'tt') THEN {mark}{cut(t, 7)}",
            f"WHEN {en_base} THEN {mark}{rc_en}",
            f"WHEN {base} THEN {mark}{rc}",
        ]

    def rows_d(t, mark):
        rows = []
        for suf in ("end", "ing"):
            k = len(suf)
            r = cut(t, k)
            base = f"right({t}, {k}) = '{suf}' AND {fit2(t, k)}"
            rows.append(
                f"WHEN {base} AND right({r}, 2) = 'ig' AND {fit2(t, k + 2)} AND "
                f"right({r}, 3) != 'eig' THEN {mark}{cut(t, k + 2)}"
            )
            rows.append(
                f"WHEN {base} AND right({r}, 2) IN ('dd', 'kk', 'tt') THEN {mark}{cut(t, k + 1)}"
            )
            rows.append(f"WHEN {base} THEN {mark}{r}")
            rows.append(f"WHEN right({t}, {k}) = '{suf}' THEN {mark}{t}")
        rl = cut(t, 4)
        l_base = f"right({t}, 4) = 'lijk' AND {fit2(t, 4)}"
        l_e = (
            f"{l_base} AND right({rl}, 1) = 'e' AND {fit1(t, 5)} AND "
            f"substr({t}, length({t})-5, 1) NOT IN ({v})"
        )
        rle = cut(t, 5)
        rows += [
            # lijk + e-ending SETS the flag (harmless: bar can no longer
            # match a word that just lost 'lijk'+e, but keep parity)
            f"WHEN {l_e} AND right({rle}, 2) IN ('dd', 'kk', 'tt') THEN chr(2) || {cut(t, 6)}",
            f"WHEN {l_e} THEN chr(2) || {rle}",
            f"WHEN {l_base} THEN {mark}{rl}",
            f"WHEN right({t}, 4) = 'lijk' THEN {mark}{t}",
            f"WHEN right({t}, 4) = 'baar' AND {fit2(t, 4)} THEN {mark}{cut(t, 4)}",
            f"WHEN right({t}, 4) = 'baar' THEN {mark}{t}",
        ]
        if mark:  # e-found path: bar strips
            rows.append(
                f"WHEN right({t}, 3) = 'bar' AND {fit2(t, 3)} THEN {mark}{cut(t, 3)}"
            )
        rows.append(f"WHEN right({t}, 3) = 'bar' THEN {mark}{t}")
        rows.append(
            f"WHEN right({t}, 2) = 'ig' AND {fit2(t, 2)} AND "
            f"substr({t}, length({t})-2, 1) != 'e' THEN {mark}{cut(t, 2)}"
        )
        return rows

    def rows_e(t, mark):
        return [
            f"""WHEN length({t}) >= 4 AND right({t}, 1) NOT IN ({vI})
         AND substr({t}, length({t})-2, 2) IN ('aa', 'ee', 'oo', 'uu')
         AND substr({t}, length({t})-3, 1) NOT IN ({v})
        THEN {mark}{cut(t, 2)} || right({t}, 1)"""
        ]

    unmark = f"CASE WHEN {marked} THEN substr(term, 2) ELSE term END"
    return (
        "regexp_replace(translate(term, 'áäéëíïóöúü', 'aaeeiioouu'), '^y', 'Y')",
        _NL_MARK_STEP,
        _NL_MARK_STEP,
        _NL_MARK_STEP,
        _NL_MARK_STEP,
        wrap(rows_a),
        wrap(rows_b),
        wrap(rows_c),
        wrap(rows_d),
        wrap(rows_e),
        unmark,
        "translate(term, 'IY', 'iy')",
    )


DUTCH_SNOWBALL_SQL = _nl_sql()


# ---------------------------------------------------------------------------
# Romanian (snowballstem.org romanian; generated form at
# org/tartarus/snowball/ext/RomanianStemmer.java) — the
# RomanianAnalyzer's DEFAULT stem filter.
#
# Semantics notes:
# - prelude: one scan marking u/i between vowels as U/I;
# - Spanish-style RV (consonant 2nd → after next vowel; two leading
#   vowels → after next consonant; consonant+vowel → position 3),
#   plain unfloored R1/R2;
# - step 0 (plural/article, R1-checked on the longest match) uses
#   REPLACEMENTS (ea→e, ii→i, atei→at, aţia→aţi, …; ile→i unless
#   preceded by 'ab');
# - combo suffixes (icala→abil-family, R1) LOOP until no match and set
#   the standard-removed flag; the a_3 pass (R2) then deletes/rewrites
#   (ţiune→t, ist-family→ist);
# - verb suffixes run ONLY when no standard suffix was removed, inside
#   RV (fit-limited among), with the preceded-by-consonant-or-u gate on
#   group 1;
# - final vowel (a/e/ie/i/ă) drops in RV; postlude unmarks I/U.
# ---------------------------------------------------------------------------

_RO_V = frozenset("aeiouâîă")

_RO_STEP0 = [
    ("iilor", "i"), ("aţia", "aţi"), ("aţie", "aţi"), ("iile", "i"),
    ("atei", "at"), ("ului", ""), ("elor", "e"), ("ilor", "i"),
    ("aua", "a"), ("iua", "i"), ("ele", "e"), ("ile", "i"),
    ("iei", "i"), ("ea", "e"), ("ii", "i"), ("ul", ""),
]
_RO_COMBO = [
    ("abilitate", "abil"), ("abilitati", "abil"), ("abilităi", "abil"),
    ("abilităţi", "abil"), ("ibilitate", "ibil"), ("ivitate", "iv"),
    ("ivitati", "iv"), ("ivităi", "iv"), ("ivităţi", "iv"),
    ("icitate", "ic"), ("icitati", "ic"), ("icităi", "ic"),
    ("icităţi", "ic"), ("icatori", "ic"), ("icator", "ic"),
    ("icala", "ic"), ("icale", "ic"), ("icali", "ic"), ("ical", "ic"),
    ("icală", "ic"), ("iciva", "ic"), ("icive", "ic"), ("icivi", "ic"),
    ("iciv", "ic"), ("icivă", "ic"),
    ("ativa", "at"), ("ative", "at"), ("ativi", "at"), ("ativ", "at"),
    ("ativă", "at"), ("aţiune", "at"), ("atoare", "at"), ("atori", "at"),
    ("ator", "at"), ("ătoare", "at"), ("ători", "at"), ("ător", "at"),
    ("itiva", "it"), ("itive", "it"), ("itivi", "it"), ("itiv", "it"),
    ("itivă", "it"), ("iţiune", "it"), ("itoare", "it"), ("itori", "it"),
    ("itor", "it"),
]
_RO_COMBO.sort(key=lambda e: len(e[0]), reverse=True)
_RO_A3_DEL = [
    "itate", "itati", "ităţi", "abila", "abile", "abili", "abilă",
    "ibila", "ibile", "ibili", "ibilă", "atori", "ităi", "oasa",
    "oasă", "oase", "anta", "ante", "anti", "antă", "ator", "abil",
    "ibil", "ica", "ice", "ici", "ică", "ata", "ată", "ati", "ate",
    "uta", "ută", "uti", "ute", "ita", "ită", "iti", "ite", "iva",
    "ive", "ivi", "ivă", "osi", "oşi", "ant", "at", "it", "ut", "iv",
    "ic", "os",
]
_RO_A3_IST = ["ista", "iste", "isti", "istă", "işti", "ist", "isme", "ism"]
_RO_A3_IUNE = ["iune", "iuni"]
_RO_A3 = (
    [(s, "del") for s in _RO_A3_DEL]
    + [(s, "ist") for s in _RO_A3_IST]
    + [(s, "iune") for s in _RO_A3_IUNE]
)
_RO_A3.sort(key=lambda e: len(e[0]), reverse=True)
#: verb suffixes (a_4): (suffix, case) — case 1 needs a preceding
#: consonant or 'u' (inside RV)
_RO_VERB = [
    ("aserăţi", 1), ("seserăţi", 2), ("iserăţi", 1), ("userăţi", 1),
    ("âserăţi", 1), ("serăţi", 2), ("arăţi", 1), ("irăţi", 1),
    ("urăţi", 1), ("ârăţi", 1), ("aserăm", 1), ("seserăm", 2),
    ("iserăm", 1), ("userăm", 1), ("âserăm", 1),
    ("serăm", 2), ("arăm", 1), ("irăm", 1), ("urăm", 1), ("ârăm", 1),
    ("aseşi", 1), ("seseşi", 2), ("iseşi", 1), ("useşi", 1),
    ("âseşi", 1), ("seşi", 2), ("asem", 1), ("sesem", 2), ("isem", 1),
    ("usem", 1), ("âsem", 1), ("ească", 1), ("aseră", 1),
    ("seseră", 2), ("iseră", 1), ("useră", 1), ("âseră", 1),
    ("seră", 2), ("ară", 1), ("iră", 1), ("ură", 1), ("âră", 1),
    ("eaţi", 1), ("iaţi", 1), ("sese", 2), ("ase", 1), ("ise", 1),
    ("use", 1), ("âse", 1), ("eşte", 1), ("ăşte", 1), ("eşti", 1),
    ("ăşti", 1), ("ează", 1), ("eze", 1),
    ("ezi", 1), ("esc", 1), ("ăsc", 1), ("ind", 1), ("ând", 1),
    ("indu", 1), ("ându", 1), ("are", 1), ("ere", 1), ("ire", 1),
    ("âre", 1), ("aşi", 1), ("işi", 1), ("uşi", 1), ("âşi", 1),
    ("aţi", 2), ("eţi", 2), ("iţi", 2), ("âţi", 2), ("eai", 1),
    ("iai", 1), ("sei", 2), ("eam", 1), ("iam", 1), ("eau", 1),
    ("iau", 1), ("ea", 1), ("ia", 1), ("ai", 1), ("ui", 1), ("âi", 1),
    ("ez", 1), ("am", 1), ("em", 2), ("im", 2), ("âm", 2), ("ăm", 2),
    ("au", 1), ("se", 2),
]
_RO_VERB.sort(key=lambda e: len(e[0]), reverse=True)


def _ro_prelude(term: str) -> str:
    s = list(term)
    i = 0
    while i < len(s):
        if s[i] in _RO_V and i + 2 < len(s) and s[i + 1] in ("u", "i") and s[i + 2] in _RO_V:
            s[i + 1] = s[i + 1].upper()
        i += 1
    return "".join(s)


def _ro_regions(s: str) -> tuple[int, int, int]:
    n = len(s)
    pV = p1 = p2 = n

    def nx(i, want_vowel):
        while i < n:
            if (s[i] in _RO_V) == want_vowel:
                return i + 1
            i += 1
        return None

    if n >= 1:
        if s[0] in _RO_V:
            if n >= 2 and s[1] not in _RO_V:
                r = nx(2, True)
                if r is not None:
                    pV = r
            elif n >= 2 and s[1] in _RO_V:
                r = nx(2, False)
                if r is not None:
                    pV = r
        else:
            if n >= 2 and s[1] not in _RO_V:
                r = nx(2, True)
                if r is not None:
                    pV = r
            elif n >= 2 and s[1] in _RO_V:
                if n >= 3:
                    pV = 3
    a = nx(0, True)
    b = nx(a, False) if a is not None else None
    if b is not None:
        p1 = b
        c = nx(b, True)
        d = nx(c, False) if c is not None else None
        if d is not None:
            p2 = d
    return pV, p1, p2


def romanian_snowball_stem(term: str) -> str:
    s = _ro_prelude(term)
    pV, p1, p2 = _ro_regions(s)

    # step 0 (a_1, R1 on the longest match)
    for suf, rep in _RO_STEP0:
        if s.endswith(suf):
            if len(s) - len(suf) >= p1:
                if suf == "ile" and s[: -3].endswith("ab"):
                    break
                s = s[: -len(suf)] + rep
            break

    # standard suffix: loop combo, then a_3
    removed = False
    while True:
        hit = False
        for suf, rep in _RO_COMBO:
            if s.endswith(suf):
                if len(s) - len(suf) >= p1:
                    s = s[: -len(suf)] + rep
                    removed = True
                    hit = True
                break
        if not hit:
            break
    for suf, action in _RO_A3:
        if s.endswith(suf):
            if len(s) - len(suf) >= p2:
                if action == "del":
                    s = s[: -len(suf)]
                    removed = True
                elif action == "ist":
                    s = s[: -len(suf)] + "ist"
                    removed = True
                else:  # iune/iuni: must follow ţ; ţ+suffix → t
                    k = len(suf)
                    if len(s) > k and s[-k - 1] == "ţ":
                        s = s[: -k - 1] + "t"
                        removed = True
            break

    # verb suffix (only when nothing standard was removed), inside RV
    if not removed:
        for suf, case in _RO_VERB:
            if s.endswith(suf) and len(s) - len(suf) >= pV:
                start = len(s) - len(suf)
                if case == 2:
                    s = s[:start]
                else:
                    if start - 1 >= pV and (
                        s[start - 1] not in _RO_V or s[start - 1] == "u"
                    ):
                        s = s[:start]
                break

    # vowel suffix in RV
    for suf in ("ie", "a", "e", "i", "ă"):
        if s.endswith(suf):
            if len(s) - len(suf) >= pV:
                s = s[: -len(suf)]
            break

    return s.replace("I", "i").replace("U", "u")


# --- Romanian SQL twin ------------------------------------------------------
# RV factors into four prefix-shape regexes (the Spanish-style
# definition); R1/R2 are the usual subsequence conditions. The combo
# loop is unrolled 4× (the vocabulary needs at most 2). Blocker rows
# pin the no-fallback among semantics for precondition failures (e.g.
# 'ase' failing its consonant-or-u gate must NOT fall through to 'se').

_RO_VC = "aeiouâîă"


def _ro_rv_sql(k) -> str:
    """start = length(term)-k >= pV."""
    p = f"left(term, length(term)-({k}))"
    return (
        f"(regexp_matches({p}, '^[{_RO_VC}][^{_RO_VC}].*[{_RO_VC}]') OR "
        f"regexp_matches({p}, '^[{_RO_VC}][{_RO_VC}].*[^{_RO_VC}]') OR "
        f"regexp_matches({p}, '^[^{_RO_VC}][^{_RO_VC}].*[{_RO_VC}]') OR "
        f"(regexp_matches(term, '^[^{_RO_VC}][{_RO_VC}]') AND length(term)-({k}) >= 3))"
    )


def _ro_r1_sql(k) -> str:
    return (
        f"regexp_matches(left(term, length(term)-({k})), "
        f"'[{_RO_VC}][^{_RO_VC}]')"
    )


def _ro_r2_sql(k) -> str:
    return (
        f"regexp_matches(left(term, length(term)-({k})), "
        f"'[{_RO_VC}].*[^{_RO_VC}].*[{_RO_VC}].*[^{_RO_VC}]')"
    )


_RO_MARK_STEP = (
    "replace(replace(regexp_replace(term, "
    f"'([{_RO_VC}])(u[{_RO_VC}]|i[{_RO_VC}])', '\\1\x04\\2'), "
    "'\x04u', 'U'), '\x04i', 'I')"
)


def _ro_sql() -> tuple[str, ...]:
    nl = "\n        "
    # the standard-suffix-removed flag rides as chr(2); verb layer only
    # fires on unmarked terms
    done = "left(term, 1) = chr(2)"

    rows0 = []
    for suf, rep in _RO_STEP0:
        k = len(suf)
        cond = f"right(term, {k}) = '{suf}' AND {_ro_r1_sql(k)}"
        if suf == "ile":
            cond += " AND right(term, 5) != 'abile'"
        rows0.append(
            f"WHEN {cond} THEN left(term, length(term)-{k}) || '{rep}'"
        )
        rows0.append(f"WHEN right(term, {k}) = '{suf}' THEN term")
    step0 = "CASE\n        " + nl.join(rows0) + "\n        ELSE term END"

    combo_rows = []
    for suf, rep in _RO_COMBO:
        k = len(suf)
        combo_rows.append(
            f"WHEN right(term, {k}) = '{suf}' AND {_ro_r1_sql(k)} "
            f"THEN chr(2) || left(term, length(term)-{k}) || '{rep}'"
        )
        combo_rows.append(f"WHEN right(term, {k}) = '{suf}' THEN term")
    combo_bare = "CASE\n        " + nl.join(combo_rows) + "\n        ELSE term END"
    combo_marked_rows = [
        r.replace("term", "__t__").replace("__t__", "substr(term, 2)")
        for r in combo_rows
    ]
    combo = (
        f"CASE WHEN {done} THEN (CASE\n        "
        + nl.join(combo_marked_rows).replace(
            "THEN substr(term, 2)", "THEN chr(2) || substr(term, 2)"
        )
        + "\n        ELSE term END) ELSE ("
        + combo_bare
        + ") END"
    )

    a3_rows = []
    for suf, action in _RO_A3:
        k = len(suf)
        if action == "iune":
            a3_rows.append(
                f"WHEN right(term, {k}) = '{suf}' AND {_ro_r2_sql(k)} AND "
                f"substr(term, length(term)-{k}, 1) = 'ţ' "
                f"THEN chr(2) || left(term, length(term)-{k + 1}) || 't'"
            )
        elif action == "ist":
            a3_rows.append(
                f"WHEN right(term, {k}) = '{suf}' AND {_ro_r2_sql(k)} "
                f"THEN chr(2) || left(term, length(term)-{k}) || 'ist'"
            )
        else:
            a3_rows.append(
                f"WHEN right(term, {k}) = '{suf}' AND {_ro_r2_sql(k)} "
                f"THEN chr(2) || left(term, length(term)-{k})"
            )
        a3_rows.append(f"WHEN right(term, {k}) = '{suf}' THEN term")
    a3_bare = "CASE\n        " + nl.join(a3_rows) + "\n        ELSE term END"
    a3_marked_rows = [
        r.replace("term", "__t__").replace("__t__", "substr(term, 2)")
        for r in a3_rows
    ]
    a3 = (
        f"CASE WHEN {done} THEN (CASE\n        "
        + nl.join(a3_marked_rows).replace(
            "THEN substr(term, 2)", "THEN chr(2) || substr(term, 2)"
        )
        + "\n        ELSE term END) ELSE ("
        + a3_bare
        + ") END"
    )

    verb_rows = []
    for suf, case in _RO_VERB:
        k = len(suf)
        base = f"right(term, {k}) = '{suf}' AND {_ro_rv_sql(k)}"
        if case == 2:
            verb_rows.append(f"WHEN {base} THEN left(term, length(term)-{k})")
        else:
            verb_rows.append(
                f"WHEN {base} AND {_ro_rv_sql(k + 1)} AND "
                f"(substr(term, length(term)-{k}, 1) NOT IN "
                f"({_lits(sorted(_RO_V))}) OR substr(term, length(term)-{k}, 1) = 'u') "
                f"THEN left(term, length(term)-{k})"
            )
            verb_rows.append(f"WHEN {base} THEN term")
    verb = (
        f"CASE WHEN {done} THEN term\n        "
        + nl.join(verb_rows)
        + "\n        ELSE term END"
    )
    unmark = f"CASE WHEN {done} THEN substr(term, 2) ELSE term END"

    vowel_rows = []
    for suf in ("ie", "a", "e", "i", "ă"):
        k = len(suf)
        vowel_rows.append(
            f"WHEN right(term, {k}) = '{suf}' AND {_ro_rv_sql(k)} "
            f"THEN left(term, length(term)-{k})"
        )
        vowel_rows.append(f"WHEN right(term, {k}) = '{suf}' THEN term")
    vowel = "CASE\n        " + nl.join(vowel_rows) + "\n        ELSE term END"

    return (
        _RO_MARK_STEP,
        _RO_MARK_STEP,
        _RO_MARK_STEP,
        _RO_MARK_STEP,
        step0,
        combo,
        combo,
        combo,
        combo,
        a3,
        verb,
        unmark,
        vowel,
        "replace(replace(term, 'I', 'i'), 'U', 'u')",
    )


ROMANIAN_SNOWBALL_SQL = _ro_sql()


# ---------------------------------------------------------------------------
# Irish (snowballstem.org irish; generated form at
# org/tartarus/snowball/ext/IrishStemmer.java) — the IrishAnalyzer's
# DEFAULT stem filter. Structure: initial-mutation PREFIX strip
# (eclipsis/lenition: bhf→f, gc→c, mb→b, …, longest prefix wins),
# RV = after the first vowel (no floor), standard R1/R2, then noun
# (R1/R2), derivational (R2, with stem rewrites), and verb (RV/R1)
# suffix passes — each checked on the longest match, no fallback.
# ---------------------------------------------------------------------------

_GA_V = frozenset("aeiouáéíóú")
#: initial mutations, longest-first: prefix → replacement
_GA_PREFIX = [
    ("d'fh", "f"), ("bhf", "f"), ("b'", ""), ("bh", "b"), ("bp", "p"),
    ("ch", "c"), ("d'", ""), ("dh", "d"), ("dt", "t"), ("fh", "f"),
    ("gc", "c"), ("gh", "g"), ("h-", ""), ("m'", ""), ("mb", "b"),
    ("mh", "m"), ("n-", ""), ("nd", "d"), ("ng", "g"), ("ph", "p"),
    ("sh", "s"), ("t-", ""), ("th", "t"), ("ts", "s"),
]
_GA_PREFIX.sort(key=lambda e: len(e[0]), reverse=True)
#: noun suffixes: (suffix, region) — region 1 = R1, 2 = R2
_GA_NOUN = [
    ("aíochta", 1), ("íochta", 1), ("aíocht", 1), ("íocht", 1),
    ("eabh", 1), ("eamh", 1), ("aibh", 1), ("aimh", 1), ("airí", 2),
    ("aire", 2), ("abh", 1), ("amh", 1), ("ibh", 1), ("imh", 1),
    ("irí", 2), ("ire", 2),
]
_GA_NOUN.sort(key=lambda e: len(e[0]), reverse=True)
#: derivational: (suffix, replacement or None=R2-delete)
_GA_DERIV = [
    ("grafaíochtaí", "graf"), ("grafaíochta", "graf"),
    ("grafaíocht", "graf"), ("grafaíoch", "graf"),
    ("arcachtaí", "arc"), ("arcachta", "arc"), ("arcacht", "arc"),
    ("óideacha", "óid"), ("óideach", "óid"), ("óidigh", "óid"),
    ("patacha", "paite"), ("pataigh", "paite"), ("patach", "paite"),
    ("paite", "paite"), ("gineach", "gin"), ("gineas", "gin"),
    ("ginis", "gin"), ("eachtúil", None), ("achtúil", None),
    ("eachta", None), ("achta", None), ("eacht", None), ("acht", None),
    ("each", None), ("ach", None),
]
_GA_DERIV.sort(key=lambda e: len(e[0]), reverse=True)
#: verb: (suffix, region) — region 0 = RV, 1 = R1
_GA_VERB = [
    ("aimid", 0), ("aímid", 0), ("imid", 0), ("ímid", 0),
    ("faidh", 0), ("eadh", 1), ("fidh", 0), ("tear", 1), ("adh", 1),
    ("áil", 1), ("ain", 1), ("tar", 1),
]
_GA_VERB.sort(key=lambda e: len(e[0]), reverse=True)


def _ga_regions(s: str) -> tuple[int, int, int]:
    n = len(s)
    pV = p1 = p2 = n
    for i in range(n):
        if s[i] in _GA_V:
            pV = i + 1
            break
    for i in range(n - 1):
        if s[i] in _GA_V and s[i + 1] not in _GA_V:
            p1 = i + 2
            break
    if p1 < n:
        for i in range(p1, n - 1):
            if s[i] in _GA_V and s[i + 1] not in _GA_V:
                p2 = i + 2
                break
    return pV, p1, p2


def irish_snowball_stem(term: str) -> str:
    s = term
    for pre, rep in _GA_PREFIX:
        if s.startswith(pre):
            s = rep + s[len(pre) :]
            break
    pV, p1, p2 = _ga_regions(s)
    for suf, reg in _GA_NOUN:
        if s.endswith(suf):
            if len(s) - len(suf) >= (p1 if reg == 1 else p2):
                s = s[: -len(suf)]
            break
    for suf, rep in _GA_DERIV:
        if s.endswith(suf):
            if rep is None:
                if len(s) - len(suf) >= p2:
                    s = s[: -len(suf)]
            else:
                s = s[: -len(suf)] + rep
            break
    for suf, reg in _GA_VERB:
        if s.endswith(suf):
            if len(s) - len(suf) >= (pV if reg == 0 else p1):
                s = s[: -len(suf)]
            break
    return s


# --- Irish SQL twin ---------------------------------------------------------

_GA_VC = "aeiouáéíóú"


def _ga_sql() -> tuple[str, ...]:
    nl = "\n        "
    rows_p = [
        f"WHEN left(term, {len(pre)}) = '{pre.replace(chr(39), chr(39) * 2)}' "
        f"THEN '{rep}' || substr(term, {len(pre) + 1})"
        for pre, rep in _GA_PREFIX
    ]
    prefix = "CASE\n        " + nl.join(rows_p) + "\n        ELSE term END"

    def rv(k):
        return f"regexp_matches(left(term, length(term)-({k})), '[{_GA_VC}]')"

    def r1(k):
        return (
            f"regexp_matches(left(term, length(term)-({k})), "
            f"'[{_GA_VC}][^{_GA_VC}]')"
        )

    def r2(k):
        return (
            f"regexp_matches(left(term, length(term)-({k})), "
            f"'[{_GA_VC}].*[^{_GA_VC}].*[{_GA_VC}].*[^{_GA_VC}]')"
        )

    def pass_case(entries) -> str:
        rows = []
        for suf, action in entries:
            k = len(suf)
            if action is None or isinstance(action, int):
                fit = {None: r2, 0: rv, 1: r1, 2: r2}[action](k)
                rows.append(
                    f"WHEN right(term, {k}) = '{suf}' AND {fit} "
                    f"THEN left(term, length(term)-{k})"
                )
            else:
                rows.append(
                    f"WHEN right(term, {k}) = '{suf}' "
                    f"THEN left(term, length(term)-{k}) || '{action}'"
                )
            rows.append(f"WHEN right(term, {k}) = '{suf}' THEN term")
        return "CASE\n        " + nl.join(rows) + "\n        ELSE term END"

    return (
        prefix,
        pass_case(_GA_NOUN),
        pass_case(_GA_DERIV),
        pass_case(_GA_VERB),
    )


IRISH_SNOWBALL_SQL = _ga_sql()


# ---------------------------------------------------------------------------
# Hungarian (snowballstem.org hungarian; generated form at
# org/tartarus/snowball/ext/HungarianStemmer.java) — the
# HungarianAnalyzer's DEFAULT stem filter.
#
# Semantics notes:
# - R1: for vowel-initial words, after the first non-vowel EXTENDED
#   through a digraph (cs/dzs/gy/ly/ny/sz/ty/zs) when one starts there;
#   for consonant-initial words, after the first vowel;
# - nine sequential passes (instrumental, case+v-ending, special cases,
#   -stul family, factive, owned, singular/plural owner, plural), each
#   R1-checked on the longest match with no fallback;
# - instrumental (al/el) and factive (á/é) require the preceding stem
#   to end in a DOUBLED consonant (incl. ccs/ggy/lly/nny/ssz/tty/zzs)
#   and undouble it after the deletion;
# - the case pass rewrites a trailing á/é of the remaining stem to a/e.
# ---------------------------------------------------------------------------

_HU_SB_V = frozenset("aeiouáéíóöúüőű")
_HU_DIGRAPHS = ("dzs", "cs", "gy", "ly", "ny", "sz", "ty", "zs")
_HU_DOUBLES2 = (
    "bb", "cc", "dd", "ff", "gg", "jj", "kk", "ll", "mm", "nn", "pp",
    "rr", "ss", "tt", "vv", "zz",
)
_HU_DOUBLES3 = ("ccs", "ggy", "lly", "nny", "ssz", "tty", "zzs")
_HU_CASE = sorted(
    [
        "ba", "ra", "be", "re", "ig", "nak", "nek", "val", "vel", "ul",
        "nál", "nél", "ból", "ról", "tól", "ül", "ből", "ről", "től",
        "n", "an", "ban", "en", "ben", "képpen", "on", "ön", "képp",
        "kor", "t", "at", "et", "ként", "anként", "enként", "onként",
        "ot", "ért", "öt", "hez", "hoz", "höz", "vá", "vé",
    ],
    key=len,
    reverse=True,
)
_HU_OWNED = [
    ("áéi", "a"), ("ééi", "e"), ("éi", ""), ("aké", ""), ("eké", ""),
    ("oké", ""), ("áké", "a"), ("éké", "e"), ("öké", ""), ("ké", ""),
    ("éé", "e"), ("é", ""),
]
_HU_OWNED.sort(key=lambda e: len(e[0]), reverse=True)
_HU_SING = [
    ("ja", ""), ("je", ""), ("ád", "a"), ("éd", "e"), ("ad", ""),
    ("ed", ""), ("od", ""), ("öd", ""), ("unk", ""), ("ánk", "a"),
    ("énk", "e"), ("ünk", ""), ("nk", ""), ("ájuk", "a"), ("juk", ""),
    ("uk", ""), ("éjük", "e"), ("jük", ""), ("ük", ""), ("am", ""),
    ("em", ""), ("om", ""), ("ám", "a"), ("ém", "e"), ("m", ""),
    ("a", ""), ("e", ""), ("o", ""), ("á", "a"), ("é", "e"), ("d", ""),
]
_HU_SING.sort(key=lambda e: len(e[0]), reverse=True)
_HU_PLUR = [
    ("jaid", ""), ("jeid", ""), ("aid", ""), ("eid", ""), ("áid", "a"),
    ("éid", "e"), ("id", ""), ("jai", ""), ("jei", ""), ("ai", ""),
    ("ei", ""), ("ái", "a"), ("éi", "e"), ("i", ""), ("jeitek", ""),
    ("eitek", ""), ("éitek", "e"), ("itek", ""), ("jaik", ""),
    ("jeik", ""), ("aik", ""), ("eik", ""), ("áik", "a"), ("éik", "e"),
    ("ik", ""), ("jaink", ""), ("jeink", ""), ("aink", ""),
    ("eink", ""), ("áink", "a"), ("éink", "e"), ("ink", ""),
    ("jaitok", ""), ("áitok", "a"), ("aitok", ""), ("jaim", ""),
    ("jeim", ""), ("aim", ""), ("eim", ""), ("áim", "a"), ("éim", "e"),
    ("im", ""),
]
_HU_PLUR.sort(key=lambda e: len(e[0]), reverse=True)
_HU_PLURAL = [
    ("ák", "a"), ("ék", "e"), ("ak", ""), ("ek", ""), ("ok", ""),
    ("ök", ""), ("k", ""),
]
_HU_PLURAL.sort(key=lambda e: len(e[0]), reverse=True)


def _hu_p1(s: str) -> int:
    n = len(s)
    if n == 0:
        return 0
    if s[0] in _HU_SB_V:
        j = None
        for i in range(n):
            if s[i] not in _HU_SB_V:
                j = i
                break
        if j is None:
            return n
        for d in _HU_DIGRAPHS:
            if s.startswith(d, j):
                return j + len(d)
        return j + 1
    for i in range(n):
        if s[i] in _HU_SB_V:
            return i + 1
    return n


def _hu_ends_double(s: str) -> bool:
    return s.endswith(_HU_DOUBLES3) or s.endswith(_HU_DOUBLES2)


def _hu_undouble(s: str) -> str:
    return s[:-2] + s[-1]


def hungarian_snowball_stem(term: str) -> str:
    s = term
    p1 = _hu_p1(s)

    def in_r1(k: int) -> bool:
        return len(s) - k >= p1

    # instrumental: al/el in R1 after a doubled consonant
    if s.endswith(("al", "el")) and in_r1(2) and _hu_ends_double(s[:-2]):
        s = _hu_undouble(s[:-2])
    # case endings, then a trailing á/é rewrites
    for suf in _HU_CASE:
        if s.endswith(suf):
            if in_r1(len(suf)):
                s = s[: -len(suf)]
                if s.endswith("á") and len(s) - 1 >= p1:
                    s = s[:-1] + "a"
                elif s.endswith("é") and len(s) - 1 >= p1:
                    s = s[:-1] + "e"
            break
    # case_special: án/ánként → a, én → e
    for suf, rep in (("ánként", "a"), ("án", "a"), ("én", "e")):
        if s.endswith(suf):
            if in_r1(len(suf)):
                s = s[: -len(suf)] + rep
            break
    # case_other: stul family
    for suf, rep in (
        ("ástul", "a"), ("éstül", "e"), ("astul", ""), ("estül", ""),
        ("stul", ""), ("stül", ""),
    ):
        if s.endswith(suf):
            if in_r1(len(suf)):
                s = s[: -len(suf)] + rep
            break
    # factive: á/é in R1 after a doubled consonant
    if s.endswith(("á", "é")) and in_r1(1) and _hu_ends_double(s[:-1]):
        s = _hu_undouble(s[:-1])
    # owned / sing_owner / plur_owner / plural
    for table in (_HU_OWNED, _HU_SING, _HU_PLUR, _HU_PLURAL):
        for suf, rep in table:
            if s.endswith(suf):
                if in_r1(len(suf)):
                    s = s[: -len(suf)] + rep
                break
    return s


# --- Hungarian SQL twin -----------------------------------------------------
# R1 factors into three prefix shapes: consonant-initial (prefix
# contains a vowel), vowel-initial with a digraph at the first
# non-vowel (the prefix must extend through the digraph), vowel-initial
# plain. Doubled-consonant gates and the undouble are string-local.

_HU_VC = "aeiouáéíóöúüőű"
_HU_DIG_ALT = "|".join(_HU_DIGRAPHS)


def _hu_fit_sql(k) -> str:
    p = f"left(term, length(term)-({k}))"
    dig = f"regexp_matches(term, '^[{_HU_VC}]+({_HU_DIG_ALT})')"
    return (
        f"((regexp_matches(term, '^[^{_HU_VC}]') AND regexp_matches({p}, '[{_HU_VC}]')) OR "
        f"(regexp_matches(term, '^[{_HU_VC}]') AND {dig} AND regexp_matches({p}, '^[{_HU_VC}]+({_HU_DIG_ALT})')) OR "
        f"(regexp_matches(term, '^[{_HU_VC}]') AND NOT {dig} AND regexp_matches({p}, '^[{_HU_VC}]+[^{_HU_VC}]')))"
    )


def _hu_sql() -> tuple[str, ...]:
    nl = "\n        "
    d2 = ", ".join(f"'{p}'" for p in _HU_DOUBLES2)
    d3 = ", ".join(f"'{p}'" for p in _HU_DOUBLES3)

    def dbl(r: str) -> str:
        return f"(right({r}, 3) IN ({d3}) OR right({r}, 2) IN ({d2}))"

    def undbl(k: int) -> str:
        """delete + undouble: drop suffix of len k, then the char at
        position len-k-2."""
        return (
            f"left(term, length(term)-{k + 2}) || "
            f"substr(term, length(term)-{k}, 1)"
        )

    def table_case(entries) -> str:
        rows = []
        for suf, rep in entries:
            k = len(suf)
            then = f"left(term, length(term)-{k})"
            if rep:
                then += f" || '{rep}'"
            rows.append(
                f"WHEN right(term, {k}) = '{suf}' AND {_hu_fit_sql(k)} THEN {then}"
            )
            rows.append(f"WHEN right(term, {k}) = '{suf}' THEN term")
        return "CASE\n        " + nl.join(rows) + "\n        ELSE term END"

    instrum = (
        f"""CASE
        WHEN right(term, 2) IN ('al', 'el') AND {_hu_fit_sql(2)}
         AND {dbl("left(term, length(term)-2)")}
        THEN {undbl(2)}
        ELSE term END"""
    )
    rows_case = []
    for suf in _HU_CASE:
        k = len(suf)
        r = f"left(term, length(term)-{k})"
        base = f"right(term, {k}) = '{suf}' AND {_hu_fit_sql(k)}"
        rows_case.append(
            f"WHEN {base} AND right({r}, 1) = 'á' AND {_hu_fit_sql(k + 1)} "
            f"THEN left(term, length(term)-{k + 1}) || 'a'"
        )
        rows_case.append(
            f"WHEN {base} AND right({r}, 1) = 'é' AND {_hu_fit_sql(k + 1)} "
            f"THEN left(term, length(term)-{k + 1}) || 'e'"
        )
        rows_case.append(f"WHEN {base} THEN {r}")
        rows_case.append(f"WHEN right(term, {k}) = '{suf}' THEN term")
    case_ = "CASE\n        " + nl.join(rows_case) + "\n        ELSE term END"
    case_special = table_case([("ánként", "a"), ("án", "a"), ("én", "e")])
    case_other = table_case(
        [("ástul", "a"), ("éstül", "e"), ("astul", ""), ("estül", ""),
         ("stul", ""), ("stül", "")]
    )
    factive = (
        f"""CASE
        WHEN right(term, 1) IN ('á', 'é') AND {_hu_fit_sql(1)}
         AND {dbl("left(term, length(term)-1)")}
        THEN {undbl(1)}
        ELSE term END"""
    )
    return (
        instrum,
        case_,
        case_special,
        case_other,
        factive,
        table_case(_HU_OWNED),
        table_case(_HU_SING),
        table_case(_HU_PLUR),
        table_case(_HU_PLURAL),
    )


HUNGARIAN_SNOWBALL_SQL = _hu_sql()


# ---------------------------------------------------------------------------
# Finnish (snowballstem.org finnish; generated form at
# org/tartarus/snowball/ext/FinnishStemmer.java) — the FinnishAnalyzer's
# DEFAULT stem filter (distinct from the UniNE finnish_light).
#
# Semantics notes:
# - every among here IS fit-limited (limit_backward = p1/p2), unlike
#   the German/Dutch ones — a longer match crossing the region falls
#   back to a shorter entry;
# - a_6 carries METHOD entries (den/tten/siin need i-after-restricted-
#   vowel, seen needs a long vowel pair, both checked INSIDE the match
#   and falling back to 'n' on failure), while ACTION conditions
#   (han→a…, the V1+C gate on final a/ä) abort the rule with no
#   fallback;
# - case 7 ('n') extends the deletion one char left when a long pair or
#   'ie' precedes; i-plural runs only if a case ending was removed,
#   else t-plural (with its own mma-in-R2 tail);
# - tidy: drop one of a trailing long pair (pair in R1), a/e/i/ä after
#   a consonant, j after o/u, o after j — then undouble the LAST
#   consonant of the word when only vowels follow it.
# ---------------------------------------------------------------------------

_FI2_V1 = frozenset("aeiouyäö")
_FI2_V2 = frozenset("aeiouäö")
_FI2_AEI = frozenset("aeiä")
_FI2_C = frozenset("bcdfghjklmnpqrstvwxz")
_FI2_PART_END = _FI2_V1 | {"n", "t"}
_FI2_LONG = ("aa", "ee", "ii", "oo", "uu", "ää", "öö")
_FI2_PARTICLE = sorted(
    ["pa", "sti", "kaan", "han", "kin", "hän", "kään", "ko", "pä", "kö"],
    key=len, reverse=True,
)
_FI2_AN_PREC = ("lla", "ssa", "lta", "sta", "na", "ta")
_FI2_AEN_PREC = ("llä", "ssä", "ltä", "stä", "nä", "tä")
_FI2_EN_PREC = ("lle", "ine")
#: a_6: (suffix, kind) — kind: "del", ("eq", ch), "n", "aä", ("vi",),
#: ("long",)
_FI2_CASE = [
    ("seen", "long"), ("tten", "vi"), ("siin", "vi"), ("den", "vi"),
    ("han", ("eq", "a")), ("hen", ("eq", "e")), ("hin", ("eq", "i")),
    ("hon", ("eq", "o")), ("hän", ("eq", "ä")), ("hön", ("eq", "ö")),
    ("lla", "del"), ("ssa", "del"), ("lta", "del"), ("sta", "del"),
    ("tta", ("eq", "e")), ("llä", "del"), ("ssä", "del"), ("ltä", "del"),
    ("stä", "del"), ("ttä", ("eq", "e")), ("lle", "del"), ("ine", "del"),
    ("ksi", "del"), ("na", "del"), ("ta", "del"), ("nä", "del"),
    ("tä", "del"), ("n", "n"), ("a", "aä"), ("ä", "aä"),
]
_FI2_CASE.sort(key=lambda e: len(e[0]), reverse=True)
_FI2_OTHER_PLAIN = ("imma", "impa", "immi", "impi", "immä", "impä", "eja", "ejä")
_FI2_OTHER_PO = ("mma", "mpa", "mmi", "mpi", "mmä", "mpä")


def _fi2_regions(s: str) -> tuple[int, int]:
    n = len(s)
    p1 = p2 = n
    i = 0
    while i < n and s[i] not in _FI2_V1:
        i += 1
    while i < n and s[i] in _FI2_V1:
        i += 1
    if i < n:
        p1 = i + 1
        i += 1
        while i < n and s[i] not in _FI2_V1:
            i += 1
        while i < n and s[i] in _FI2_V1:
            i += 1
        if i < n:
            p2 = i + 1
    return p1, p2


def finnish_snowball_stem(term: str) -> str:  # noqa: C901 — mirrors the steps
    s = term
    p1, p2 = _fi2_regions(s)
    ending_removed = False

    # --- particle etc (a_0, fit p1) --------------------------------------
    for suf in _FI2_PARTICLE:
        if s.endswith(suf) and len(s) - len(suf) >= p1:
            start = len(s) - len(suf)
            if suf == "sti":
                if start >= p2:
                    s = s[:start]
            else:
                if start >= 1 and s[start - 1] in _FI2_PART_END:
                    s = s[:start]
            break

    # --- possessive (a_4, fit p1) -----------------------------------------
    for suf in ("nsa", "nsä", "mme", "nne", "ni", "si", "an", "en", "än"):
        if s.endswith(suf) and len(s) - len(suf) >= p1:
            start = len(s) - len(suf)
            if suf == "si":
                if not (start >= 1 and s[start - 1] == "k"):
                    s = s[:start]
            elif suf == "ni":
                s = s[:start]
                if s.endswith("kse"):
                    s = s[:-1] + "i"
            elif suf in ("nsa", "nsä", "mme", "nne"):
                s = s[:start]
            elif suf == "an":
                if s[:start].endswith(_FI2_AN_PREC):
                    s = s[:start]
            elif suf == "än":
                if s[:start].endswith(_FI2_AEN_PREC):
                    s = s[:start]
            elif suf == "en":
                if s[:start].endswith(_FI2_EN_PREC):
                    s = s[:start]
            break

    # --- case ending (a_6, fit p1; method entries fall back) -------------
    for suf, kind in _FI2_CASE:
        if not (s.endswith(suf) and len(s) - len(suf) >= p1):
            continue
        start = len(s) - len(suf)
        if kind == "vi":
            # method: 'i' after a restricted vowel, both inside R1
            # (eq_s_b('i') needs start-1 >= p1; in_grouping_b needs
            # start-2 >= p1); failure falls back to shorter entries
            if not (
                start - 2 >= p1
                and s[start - 1] == "i"
                and s[start - 2] in _FI2_V2
            ):
                continue
            s = s[:start]
            ending_removed = True
            break
        if kind == "long":
            if not (start - 2 >= p1 and s[start - 2 : start] in _FI2_LONG):
                continue
            s = s[:start]
            ending_removed = True
            break
        # non-method entry selected: action conditions abort on failure
        if isinstance(kind, tuple):  # ("eq", ch)
            if start >= 1 and s[start - 1] == kind[1]:
                s = s[:start]
                ending_removed = True
            break
        if kind == "aä":
            if start >= 2 and s[start - 1] in _FI2_V1 and s[start - 2] in _FI2_C:
                s = s[:start]
                ending_removed = True
            break
        if kind == "n":
            if (
                start >= 2
                and (s[start - 2 : start] in _FI2_LONG or s[start - 2 : start] == "ie")
                and start - 1 >= 1
            ):
                s = s[: start - 1]
            else:
                s = s[:start]
            ending_removed = True
            break
        s = s[:start]  # plain delete
        ending_removed = True
        break

    # --- other endings (a_7, fit p2) --------------------------------------
    for suf in sorted(_FI2_OTHER_PLAIN + _FI2_OTHER_PO, key=len, reverse=True):
        if s.endswith(suf) and len(s) - len(suf) >= p2:
            start = len(s) - len(suf)
            if suf in _FI2_OTHER_PO:
                if not s[:start].endswith("po"):
                    s = s[:start]
            else:
                s = s[:start]
            break

    # --- i_plural / t_plural ----------------------------------------------
    if ending_removed:
        if s.endswith(("i", "j")) and len(s) - 1 >= p1:
            s = s[:-1]
    else:
        # t_plural: final 't' in R1, preceded by a V1 vowel that is
        # ALSO inside R1 (the in_grouping_b runs under limit_backward =
        # p1, so the vowel position len-2 must be >= p1); then the
        # mma/imma tail in R2 with the po-guard
        if (
            s.endswith("t")
            and len(s) - 1 >= p1
            and len(s) - 2 >= p1
            and s[-2] in _FI2_V1
        ):
            s = s[:-1]
            for suf in ("imma", "mma"):
                if s.endswith(suf) and len(s) - len(suf) >= p2:
                    start = len(s) - len(suf)
                    if suf == "mma":
                        if not s[:start].endswith("po"):
                            s = s[:start]
                    else:
                        s = s[:start]
                    break

    # --- tidy ---------------------------------------------------------------
    if s.endswith(_FI2_LONG) and len(s) - 2 >= p1:
        s = s[:-1]
    if (
        len(s) >= 2
        and s[-1] in _FI2_AEI
        and len(s) > p1
        and s[-2] in _FI2_C
        and len(s) - 1 > p1
    ):
        s = s[:-1]
    if s.endswith(("oj", "uj")) and len(s) - 1 >= p1 and len(s) - 2 >= p1:
        s = s[:-1]
    if s.endswith("jo") and len(s) - 1 >= p1 and len(s) - 2 >= p1:
        s = s[:-1]
    # undouble the final consonant (only vowels may follow it)
    i = len(s)
    while i > 0 and s[i - 1] in _FI2_V1:
        i -= 1
    if i >= 2 and s[i - 1] in _FI2_C and s[i - 2] == s[i - 1]:
        s = s[: i - 1] + s[i:]
    return s


# --- Finnish SQL twin -------------------------------------------------------
# Every among is fit-limited, so CASE fall-through on a failed fit or
# METHOD condition reproduces find_among_b exactly; only ACTION
# conditions (han→a…, the V1+C gate, the po-guards) need blocker rows.
# The ending-removed flag rides as chr(2) to split i-plural from
# t-plural; the final undouble enumerates the consonant alphabet in
# place of a backreference (RE2 has none).

_FI2_VC = "aeiouyäö"


def _fi2_fit1(k, t="term") -> str:
    return (
        f"regexp_matches(left({t}, length({t})-({k})), "
        f"'[{_FI2_VC}].*[^{_FI2_VC}]')"
    )


def _fi2_fit2(k, t="term") -> str:
    return (
        f"regexp_matches(left({t}, length({t})-({k})), "
        f"'[{_FI2_VC}].*[^{_FI2_VC}].*[{_FI2_VC}].*[^{_FI2_VC}]')"
    )


def _fi2_sql() -> tuple[str, ...]:
    nl = "\n        "
    marked = "left(term, 1) = chr(2)"
    pe = _lits(sorted(_FI2_PART_END))
    v1 = _lits(sorted(_FI2_V1))
    v2 = _lits(sorted(_FI2_V2))
    aei = _lits(sorted(_FI2_AEI))
    cs = _lits(sorted(_FI2_C))
    longs = ", ".join(f"'{p}'" for p in _FI2_LONG)

    rows_p = []
    for suf in _FI2_PARTICLE:
        k = len(suf)
        base = f"right(term, {k}) = '{suf}' AND {_fi2_fit1(k)}"
        if suf == "sti":
            rows_p.append(f"WHEN {base} AND {_fi2_fit2(k)} THEN left(term, length(term)-{k})")
        else:
            rows_p.append(
                f"WHEN {base} AND length(term) > {k} AND "
                f"substr(term, length(term)-{k}, 1) IN ({pe}) "
                f"THEN left(term, length(term)-{k})"
            )
        rows_p.append(f"WHEN {base} THEN term")
    particle = "CASE\n        " + nl.join(rows_p) + "\n        ELSE term END"

    rows_po = []
    for suf in ("nsa", "nsä", "mme", "nne", "ni", "si", "an", "en", "än"):
        k = len(suf)
        base = f"right(term, {k}) = '{suf}' AND {_fi2_fit1(k)}"
        r = f"left(term, length(term)-{k})"
        if suf == "si":
            rows_po.append(
                f"WHEN {base} AND substr(term, length(term)-{k}, 1) != 'k' THEN {r}"
            )
        elif suf == "ni":
            rows_po.append(
                f"WHEN {base} AND right({r}, 3) = 'kse' "
                f"THEN left(term, length(term)-{k + 1}) || 'i'"
            )
            rows_po.append(f"WHEN {base} THEN {r}")
        elif suf in ("nsa", "nsä", "mme", "nne"):
            rows_po.append(f"WHEN {base} THEN {r}")
        else:
            prec = {"an": _FI2_AN_PREC, "än": _FI2_AEN_PREC, "en": _FI2_EN_PREC}[suf]
            conds = " OR ".join(
                f"right({r}, {len(p)}) = '{p}'" for p in prec
            )
            rows_po.append(f"WHEN {base} AND ({conds}) THEN {r}")
        rows_po.append(f"WHEN {base} THEN term")
    possessive = "CASE\n        " + nl.join(rows_po) + "\n        ELSE term END"

    rows_c = []
    for suf, kind in _FI2_CASE:
        k = len(suf)
        base = f"right(term, {k}) = '{suf}' AND {_fi2_fit1(k)}"
        r = f"chr(2) || left(term, length(term)-{k})"
        if kind == "vi":
            rows_c.append(
                f"WHEN {base} AND {_fi2_fit1(k + 2)} AND "
                f"substr(term, length(term)-{k}, 1) = 'i' AND "
                f"substr(term, length(term)-{k}-1, 1) IN ({v2}) THEN {r}"
            )  # method fail → fall through, NO blocker
        elif kind == "long":
            rows_c.append(
                f"WHEN {base} AND {_fi2_fit1(k + 2)} AND "
                f"substr(term, length(term)-{k}-1, 2) IN ({longs}) THEN {r}"
            )
        elif isinstance(kind, tuple):
            rows_c.append(
                f"WHEN {base} AND substr(term, length(term)-{k}, 1) = '{kind[1]}' THEN {r}"
            )
            rows_c.append(f"WHEN {base} THEN term")
        elif kind == "aä":
            rows_c.append(
                f"WHEN {base} AND length(term) > 2 AND "
                f"substr(term, length(term)-1, 1) IN ({v1}) AND "
                f"substr(term, length(term)-2, 1) IN ({cs}) THEN {r}"
            )
            rows_c.append(f"WHEN {base} THEN term")
        elif kind == "n":
            rows_c.append(
                f"WHEN {base} AND length(term) >= 3 AND "
                f"(substr(term, length(term)-2, 2) IN ({longs}) OR "
                f"substr(term, length(term)-2, 2) = 'ie') "
                f"THEN chr(2) || left(term, length(term)-2)"
            )
            rows_c.append(f"WHEN {base} THEN {r}")
        else:
            rows_c.append(f"WHEN {base} THEN {r}")
    case_ = "CASE\n        " + nl.join(rows_c) + "\n        ELSE term END"

    def thread(rows_fn) -> str:
        bare = "CASE\n        " + nl.join(rows_fn("term", "")) + "\n        ELSE term END"
        thru = (
            "CASE\n        "
            + nl.join(rows_fn("substr(term, 2)", "chr(2) || "))
            + "\n        ELSE term END"
        )
        return f"CASE WHEN {marked} THEN ({thru}) ELSE ({bare}) END"

    def rows_other(t, mark):
        rows = []
        for suf in sorted(
            _FI2_OTHER_PLAIN + _FI2_OTHER_PO, key=len, reverse=True
        ):
            k = len(suf)
            base = f"right({t}, {k}) = '{suf}' AND {_fi2_fit2(k, t)}"
            r = f"{mark}left({t}, length({t})-{k})"
            if suf in _FI2_OTHER_PO:
                rows.append(
                    f"WHEN {base} AND right(left({t}, length({t})-{k}), 2) != 'po' THEN {r}"
                )
            else:
                rows.append(f"WHEN {base} THEN {r}")
            rows.append(f"WHEN {base} THEN {mark}{t}")
        return rows

    other = thread(rows_other)

    # i_plural (marked) / t_plural (unmarked, with mma tail)
    sub = "substr(term, 2)"
    iplural = (
        f"""CASE
        WHEN {marked} AND right({sub}, 1) IN ('i', 'j') AND {_fi2_fit1(1, sub)}
        THEN chr(2) || left({sub}, length({sub})-1)
        WHEN {marked} THEN term"""
    )
    rt = "left(term, length(term)-1)"
    t_rows = []
    for suf in ("imma", "mma"):
        k = len(suf)
        base = (
            f"right(term, 1) = 't' AND {_fi2_fit1(1)} AND {_fi2_fit1(2)} AND "
            f"substr(term, length(term)-1, 1) IN ({v1}) AND "
            f"right({rt}, {k}) = '{suf}' AND {_fi2_fit2(k + 1)}"
        )
        r = f"left(term, length(term)-{k + 1})"
        if suf == "mma":
            t_rows.append(
                f"WHEN {base} AND right(left(term, length(term)-{k + 1}), 2) != 'po' THEN {r}"
            )
        else:
            t_rows.append(f"WHEN {base} THEN {r}")
        t_rows.append(f"WHEN {base} THEN {rt}")
    t_rows.append(
        f"WHEN right(term, 1) = 't' AND {_fi2_fit1(1)} AND {_fi2_fit1(2)} AND "
        f"substr(term, length(term)-1, 1) IN ({v1}) THEN {rt}"
    )
    plural = iplural + "\n        " + nl.join(t_rows) + "\n        ELSE term END"
    unmark = f"CASE WHEN {marked} THEN substr(term, 2) ELSE term END"

    tidy1 = (
        f"CASE WHEN right(term, 2) IN ({longs}) AND {_fi2_fit1(2)} "
        "THEN left(term, length(term)-1) ELSE term END"
    )
    tidy2 = (
        f"CASE WHEN right(term, 1) IN ({aei}) AND {_fi2_fit1(1)} AND "
        f"{_fi2_fit1(2)} AND substr(term, length(term)-1, 1) IN ({cs}) "
        "THEN left(term, length(term)-1) ELSE term END"
    )
    tidy3 = (
        f"CASE WHEN right(term, 2) IN ('oj', 'uj') AND {_fi2_fit1(2)} "
        "THEN left(term, length(term)-1) ELSE term END"
    )
    tidy4 = (
        f"CASE WHEN right(term, 2) = 'jo' AND {_fi2_fit1(2)} "
        "THEN left(term, length(term)-1) ELSE term END"
    )
    und_rows = [
        f"WHEN regexp_matches(term, '{c}{c}[{_FI2_VC}]*$') "
        f"THEN regexp_replace(term, '{c}{c}([{_FI2_VC}]*)$', '{c}\\1')"
        for c in sorted(_FI2_C)
    ]
    undouble = "CASE\n        " + nl.join(und_rows) + "\n        ELSE term END"

    return (
        particle,
        possessive,
        case_,
        other,
        plural,
        unmark,
        tidy1,
        tidy2,
        tidy3,
        tidy4,
        undouble,
    )


FINNISH_SNOWBALL_SQL = _fi2_sql()


# ---------------------------------------------------------------------------
# Spanish (snowballstem.org spanish; generated form at
# org/tartarus/snowball/ext/SpanishStemmer.java) — the SpanishAnalyzer's
# Snowball ALTERNATIVE (its default is the light stemmer).
# ---------------------------------------------------------------------------

_ES_SB_V = frozenset("aeiouáéíóúü")
_ES_PRON = sorted(
    ["la", "sela", "le", "me", "se", "lo", "selo", "las", "selas",
     "les", "los", "selos", "nos"],
    key=len, reverse=True,
)
#: gerund/infinitive before a pronoun: (form, replacement or None)
_ES_PRON_PRE = [
    ("iéndo", "iendo"), ("ándo", "ando"), ("ando", None), ("iendo", None),
    ("yendo", "y"), ("ár", "ar"), ("ér", "er"), ("ír", "ir"),
    ("ar", None), ("er", None), ("ir", None),
]
_ES_PRON_PRE.sort(key=lambda e: len(e[0]), reverse=True)
_ES_STD = [
    ("amientos", 1), ("imientos", 1), ("amiento", 1), ("imiento", 1),
    ("aciones", 2), ("uciones", 4), ("logías", 3), ("idades", 8),
    ("encias", 5), ("ancias", 2), ("adoras", 2), ("adores", 2),
    ("amente", 6), ("antes", 2), ("ación", 2), ("ución", 4),
    ("logía", 3), ("encia", 5), ("ancia", 2), ("adora", 2),
    ("mente", 7), ("ables", 1), ("ibles", 1), ("istas", 1),
    ("able", 1), ("ible", 1), ("ante", 2), ("ista", 1), ("osas", 1),
    ("osos", 1), ("ismo", 1), ("ismos", 1), ("ivas", 9), ("ivos", 9),
    ("idad", 8), ("ador", 2), ("icas", 1), ("icos", 1), ("osa", 1),
    ("oso", 1), ("iva", 9), ("ivo", 9), ("ica", 1), ("ico", 1),
    ("anza", 1), ("anzas", 1),
]
_ES_STD.sort(key=lambda e: len(e[0]), reverse=True)
_ES_Y_VERB = sorted(
    ["ya", "ye", "yan", "yen", "yeron", "yendo", "yo", "yas", "yes",
     "yais", "yamos", "yó"],
    key=len, reverse=True,
)
_ES_VERB1 = ("éis", "emos", "en", "es")  # case 1: strip a preceding gu's u
_ES_VERB2 = sorted(
    ["aba", "ada", "ida", "ara", "iera", "ía", "aría", "ería", "iría",
     "ad", "ed", "id", "ase", "iese", "aste", "iste", "an", "aban",
     "aran", "ieran", "ían", "arían", "erían", "irían", "asen",
     "iesen", "aron", "ieron", "arán", "erán", "irán", "ado", "ido",
     "ando", "iendo", "ar", "er", "ir", "as", "abas", "adas", "idas",
     "aras", "ieras", "ías", "arías", "erías", "irías", "ases",
     "ieses", "abais", "arais", "ierais", "íais", "aríais", "eríais",
     "iríais", "aseis", "ieseis", "asteis", "isteis", "áis", "aréis",
     "eréis", "iréis", "ados", "idos", "amos", "ábamos", "áramos",
     "iéramos", "íamos", "aríamos", "eríamos", "iríamos", "aremos",
     "eremos", "iremos", "ásemos", "iésemos", "imos", "arás", "erás",
     "irás", "ís", "ará", "erá", "irá", "aré", "eré", "iré", "ió"],
    key=len, reverse=True,
)
_ES_VERB_ALL = sorted(
    [(s, 1) for s in _ES_VERB1] + [(s, 2) for s in _ES_VERB2],
    key=lambda e: len(e[0]), reverse=True,
)
_ES_RESID = [
    ("os", 1), ("a", 1), ("o", 1), ("á", 1), ("í", 1), ("ó", 1),
    ("e", 2), ("é", 2),
]
_ES_RESID.sort(key=lambda e: len(e[0]), reverse=True)
_ES_POST = str.maketrans("áéíóú", "aeiou")


def _es_regions(s: str) -> tuple[int, int, int]:
    n = len(s)
    pV = p1 = p2 = n

    def nx(i, want_vowel):
        while i < n:
            if (s[i] in _ES_SB_V) == want_vowel:
                return i + 1
            i += 1
        return None

    if n >= 2:
        if s[0] in _ES_SB_V:
            if s[1] not in _ES_SB_V:
                r = nx(2, True)
                if r is not None:
                    pV = r
            else:
                r = nx(2, False)
                if r is not None:
                    pV = r
        else:
            if s[1] not in _ES_SB_V:
                r = nx(2, True)
                if r is not None:
                    pV = r
            else:
                if n >= 3:
                    pV = 3
    a = nx(0, True)
    b = nx(a, False) if a is not None else None
    if b is not None:
        p1 = b
        c = nx(b, True)
        d = nx(c, False) if c is not None else None
        if d is not None:
            p2 = d
    return pV, p1, p2


def spanish_snowball_stem(term: str) -> str:  # noqa: C901
    s = term
    pV, p1, p2 = _es_regions(s)

    # attached pronoun
    for pron in _ES_PRON:
        if s.endswith(pron):
            base = s[: -len(pron)]
            for pre, rep in _ES_PRON_PRE:
                if base.endswith(pre):
                    start = len(base) - len(pre)
                    if start < pV:
                        break
                    if pre == "yendo":
                        if start >= 1 and base[start - 1] == "u":
                            s = base  # delete pronoun only
                    elif rep is None:
                        s = base
                    else:
                        s = base[:start] + rep
                    break
            break

    # standard OR y-verb OR verb
    done = False
    for suf, case in _ES_STD:
        if s.endswith(suf):
            start = len(s) - len(suf)
            reg = p1 if case == 6 else p2
            if start >= reg:
                if case == 3:
                    s = s[:start] + "log"
                elif case == 4:
                    s = s[:start] + "u"
                elif case == 5:
                    s = s[:start] + "ente"
                elif case == 6:  # amente (R1) + optional iv(+at)/os/ic/ad
                    s = s[:start]
                    for sub in ("iv", "os", "ic", "ad"):
                        if s.endswith(sub) and len(s) - 2 >= p2:
                            s = s[:-2]
                            if sub == "iv" and s.endswith("at") and len(s) - 2 >= p2:
                                s = s[:-2]
                            break
                elif case == 7:  # mente (R2) + optional able/ible/ante
                    s = s[:start]
                    for sub in ("able", "ible", "ante"):
                        if s.endswith(sub) and len(s) - 4 >= p2:
                            s = s[:-4]
                            break
                elif case == 8:  # idad (R2) + optional abil/ic/iv
                    s = s[:start]
                    for sub in ("abil", "ic", "iv"):
                        if s.endswith(sub) and len(s) - len(sub) >= p2:
                            s = s[: -len(sub)]
                            break
                elif case == 9:  # iva/ivo (R2) + optional at
                    s = s[:start]
                    if s.endswith("at") and len(s) - 2 >= p2:
                        s = s[:-2]
                elif case == 2:  # + optional ic
                    s = s[:start]
                    if s.endswith("ic") and len(s) - 2 >= p2:
                        s = s[:-2]
                else:
                    s = s[:start]
                done = True
            break
    if not done:
        for suf in _ES_Y_VERB:
            if s.endswith(suf) and len(s) - len(suf) >= pV:
                start = len(s) - len(suf)
                if start >= 1 and s[start - 1] == "u":
                    s = s[:start]
                    done = True
                break
    if not done:
        for suf, case in _ES_VERB_ALL:
            if s.endswith(suf) and len(s) - len(suf) >= pV:
                start = len(s) - len(suf)
                if case == 1 and s[:start].endswith("gu"):
                    s = s[: start - 1]
                else:
                    s = s[:start]
                break

    # residual suffix
    for suf, case in _ES_RESID:
        if s.endswith(suf):
            start = len(s) - len(suf)
            if start >= pV:
                s = s[:start]
                # the RV gate sits at the 'u' position (the generated
                # code restores the cursor past the g probe before r_RV)
                if case == 2 and s.endswith("gu") and len(s) - 1 >= pV:
                    s = s[:-1]
            break

    return s.translate(_ES_POST)


# --- Spanish SQL twin -------------------------------------------------------
# Same machinery as Romanian: Spanish-style RV as four prefix-shape
# regexes, the standard|y-verb|verb OR-chain threaded with a chr(2)
# marker, blocker rows pinning no-fallback action semantics, and the
# attached-pronoun pass enumerated as (pronoun × preceding-form) rows.

_ES_VCC = "aeiouáéíóúü"


def _es_rv_sql(k) -> str:
    p = f"left(term, length(term)-({k}))"
    return (
        f"(regexp_matches({p}, '^[{_ES_VCC}][^{_ES_VCC}].*[{_ES_VCC}]') OR "
        f"regexp_matches({p}, '^[{_ES_VCC}][{_ES_VCC}].*[^{_ES_VCC}]') OR "
        f"regexp_matches({p}, '^[^{_ES_VCC}][^{_ES_VCC}].*[{_ES_VCC}]') OR "
        f"(regexp_matches(term, '^[^{_ES_VCC}][{_ES_VCC}]') AND length(term)-({k}) >= 3))"
    )


def _es_r1_sql(k) -> str:
    return (
        f"regexp_matches(left(term, length(term)-({k})), "
        f"'[{_ES_VCC}][^{_ES_VCC}]')"
    )


def _es_r2_sql(k) -> str:
    return (
        f"regexp_matches(left(term, length(term)-({k})), "
        f"'[{_ES_VCC}].*[^{_ES_VCC}].*[{_ES_VCC}].*[^{_ES_VCC}]')"
    )


def _es_sql() -> tuple[str, ...]:
    nl = "\n        "
    done = "left(term, 1) = chr(2)"

    rows_pr = []
    for pron in _ES_PRON:
        kp = len(pron)
        for pre, rep in _ES_PRON_PRE:
            k = kp + len(pre)
            cond = (
                f"right(term, {k}) = '{pre}{pron}' AND {_es_rv_sql(k)}"
            )
            if pre == "yendo":
                cond += f" AND substr(term, length(term)-{k}, 1) = 'u'"
                then = f"left(term, length(term)-{kp})"
            elif rep is None:
                then = f"left(term, length(term)-{kp})"
            else:
                then = f"left(term, length(term)-{k}) || '{rep}'"
            rows_pr.append(f"WHEN {cond} THEN {then}")
        rows_pr.append(f"WHEN right(term, {kp}) = '{pron}' THEN term")
    pronoun = "CASE\n        " + nl.join(rows_pr) + "\n        ELSE term END"

    rows_s = []
    for suf, case in _ES_STD:
        k = len(suf)
        reg = _es_r1_sql(k) if case == 6 else _es_r2_sql(k)
        base = f"right(term, {k}) = '{suf}' AND {reg}"
        r = f"left(term, length(term)-{k})"
        mk = "chr(2) || "
        if case == 3:
            rows_s.append(f"WHEN {base} THEN {mk}{r} || 'log'")
        elif case == 4:
            rows_s.append(f"WHEN {base} THEN {mk}{r} || 'u'")
        elif case == 5:
            rows_s.append(f"WHEN {base} THEN {mk}{r} || 'ente'")
        elif case == 6:
            rows_s.append(
                f"WHEN {base} AND right({r}, 2) = 'iv' AND {_es_r2_sql(k + 2)} "
                f"AND right(left(term, length(term)-{k + 2}), 2) = 'at' AND {_es_r2_sql(k + 4)} "
                f"THEN {mk}left(term, length(term)-{k + 4})"
            )
            rows_s.append(
                f"WHEN {base} AND right({r}, 2) IN ('iv', 'os', 'ic', 'ad') "
                f"AND {_es_r2_sql(k + 2)} THEN {mk}left(term, length(term)-{k + 2})"
            )
            rows_s.append(f"WHEN {base} THEN {mk}{r}")
        elif case == 7:
            rows_s.append(
                f"WHEN {base} AND right({r}, 4) IN ('able', 'ible', 'ante') "
                f"AND {_es_r2_sql(k + 4)} THEN {mk}left(term, length(term)-{k + 4})"
            )
            rows_s.append(f"WHEN {base} THEN {mk}{r}")
        elif case == 8:
            rows_s.append(
                f"WHEN {base} AND right({r}, 4) = 'abil' AND {_es_r2_sql(k + 4)} "
                f"THEN {mk}left(term, length(term)-{k + 4})"
            )
            rows_s.append(
                f"WHEN {base} AND right({r}, 2) IN ('ic', 'iv') AND {_es_r2_sql(k + 2)} "
                f"THEN {mk}left(term, length(term)-{k + 2})"
            )
            rows_s.append(f"WHEN {base} THEN {mk}{r}")
        elif case == 9:
            rows_s.append(
                f"WHEN {base} AND right({r}, 2) = 'at' AND {_es_r2_sql(k + 2)} "
                f"THEN {mk}left(term, length(term)-{k + 2})"
            )
            rows_s.append(f"WHEN {base} THEN {mk}{r}")
        elif case == 2:
            rows_s.append(
                f"WHEN {base} AND right({r}, 2) = 'ic' AND {_es_r2_sql(k + 2)} "
                f"THEN {mk}left(term, length(term)-{k + 2})"
            )
            rows_s.append(f"WHEN {base} THEN {mk}{r}")
        else:
            rows_s.append(f"WHEN {base} THEN {mk}{r}")
        rows_s.append(f"WHEN right(term, {k}) = '{suf}' THEN term")
    std = "CASE\n        " + nl.join(rows_s) + "\n        ELSE term END"

    rows_y = [f"WHEN {done} THEN term"]
    for suf in _ES_Y_VERB:
        k = len(suf)
        rows_y.append(
            f"WHEN right(term, {k}) = '{suf}' AND {_es_rv_sql(k)} AND "
            f"substr(term, length(term)-{k}, 1) = 'u' "
            f"THEN chr(2) || left(term, length(term)-{k})"
        )
        rows_y.append(
            f"WHEN right(term, {k}) = '{suf}' AND {_es_rv_sql(k)} THEN term"
        )
    yverb = "CASE\n        " + nl.join(rows_y) + "\n        ELSE term END"

    rows_v = [f"WHEN {done} THEN term"]
    for suf, case in _ES_VERB_ALL:
        k = len(suf)
        base = f"right(term, {k}) = '{suf}' AND {_es_rv_sql(k)}"
        if case == 1:
            rows_v.append(
                f"WHEN {base} AND right(left(term, length(term)-{k}), 2) = 'gu' "
                f"THEN left(term, length(term)-{k + 1})"
            )
        rows_v.append(f"WHEN {base} THEN left(term, length(term)-{k})")
    verb = "CASE\n        " + nl.join(rows_v) + "\n        ELSE term END"
    unmark = f"CASE WHEN {done} THEN substr(term, 2) ELSE term END"

    rows_r = []
    for suf, case in _ES_RESID:
        k = len(suf)
        base = f"right(term, {k}) = '{suf}' AND {_es_rv_sql(k)}"
        r = f"left(term, length(term)-{k})"
        if case == 2:
            rows_r.append(
                f"WHEN {base} AND right({r}, 2) = 'gu' AND {_es_rv_sql(k + 1)} "
                f"THEN left(term, length(term)-{k + 1})"
            )
        rows_r.append(f"WHEN {base} THEN {r}")
        rows_r.append(f"WHEN right(term, {k}) = '{suf}' THEN term")
    resid = "CASE\n        " + nl.join(rows_r) + "\n        ELSE term END"

    return (
        pronoun,
        std,
        yverb,
        verb,
        unmark,
        resid,
        "translate(term, 'áéíóú', 'aeiou')",
    )


SPANISH_SNOWBALL_SQL = _es_sql()


# ---------------------------------------------------------------------------
# Portuguese (snowballstem.org portuguese; generated form at
# org/tartarus/snowball/ext/PortugueseStemmer.java) — the
# PortugueseAnalyzer's Snowball ALTERNATIVE (default is the light
# stemmer). The prelude encodes the nasal vowels ã/õ as 'a~'/'o~'
# (postlude reverses), so the suffix tables carry literal '~'.
# ---------------------------------------------------------------------------

_PT_SB_V = frozenset("aeiouáâéêíóôú")
_PT_STD = [
    ("amento", 1), ("imento", 1), ("amentos", 1), ("imentos", 1),
    ("logias", 2), ("logia", 2), ("uça~o", 3), ("uço~es", 3),
    ("ências", 4), ("ência", 4), ("amente", 5), ("mente", 6),
    ("idades", 7), ("idade", 7), ("ivas", 8), ("ivos", 8), ("iva", 8),
    ("ivo", 8), ("iras", 9), ("ira", 9), ("aça~o", 1), ("aço~es", 1),
    ("adoras", 1), ("adores", 1), ("adora", 1), ("ador", 1),
    ("ância", 1), ("antes", 1), ("ante", 1),
    ("ismos", 1), ("ismo", 1), ("istas", 1), ("ista", 1), ("osas", 1),
    ("osos", 1), ("osa", 1), ("oso", 1), ("icas", 1), ("icos", 1),
    ("ica", 1), ("ico", 1), ("ezas", 1), ("eza", 1), ("ável", 1),
    ("ível", 1),
]
_PT_STD.sort(key=lambda e: len(e[0]), reverse=True)
_PT_VERB = sorted(
    """ada ida ia aria eria iria ara era ira ava asse esse isse aste
    este iste ei arei erei irei am iam ariam eriam iriam aram eram
    iram avam em arem erem irem assem essem issem ado ido ando endo
    indo ara~o era~o ira~o ar er ir as adas idas ias arias erias irias
    aras eras iras avas es ardes erdes irdes ares eres ires asses
    esses isses astes estes istes is ais eis areis ereis ireis áreis
    éreis íreis ásseis ésseis ísseis áveis íeis aríeis eríeis iríeis
    ados idos amos áramos éramos íramos ávamos íamos aríamos eríamos
    iríamos emos aremos eremos iremos ássemos êssemos íssemos imos
    armos ermos irmos ámos arás erás irás eu iu ou ará erá irá""".split(),
    key=len, reverse=True,
)
_PT_RESID = sorted(["a", "i", "o", "os", "á", "í", "ó"], key=len, reverse=True)


def _pt_sb_regions(s: str) -> tuple[int, int, int]:
    n = len(s)
    pV = p1 = p2 = n

    def nx(i, want_vowel):
        while i < n:
            if (s[i] in _PT_SB_V) == want_vowel:
                return i + 1
            i += 1
        return None

    if n >= 2:
        if s[0] in _PT_SB_V:
            if s[1] not in _PT_SB_V:
                r = nx(2, True)
                if r is not None:
                    pV = r
            else:
                r = nx(2, False)
                if r is not None:
                    pV = r
        else:
            if s[1] not in _PT_SB_V:
                r = nx(2, True)
                if r is not None:
                    pV = r
            else:
                if n >= 3:
                    pV = 3
    a = nx(0, True)
    b = nx(a, False) if a is not None else None
    if b is not None:
        p1 = b
        c = nx(b, True)
        d = nx(c, False) if c is not None else None
        if d is not None:
            p2 = d
    return pV, p1, p2


def portuguese_snowball_stem(term: str) -> str:  # noqa: C901
    s = term.replace("ã", "a~").replace("õ", "o~")
    pV, p1, p2 = _pt_sb_regions(s)

    def std() -> bool:
        nonlocal s
        for suf, case in _PT_STD:
            if s.endswith(suf):
                start = len(s) - len(suf)
                if case == 5:
                    if start < p1:
                        return False
                    s = s[:start]
                    for sub in ("iv", "os", "ic", "ad"):
                        if s.endswith(sub) and len(s) - 2 >= p2:
                            s = s[:-2]
                            if sub == "iv" and s.endswith("at") and len(s) - 2 >= p2:
                                s = s[:-2]
                            break
                    return True
                if case == 9:
                    if start < pV or not (start >= 1 and s[start - 1] == "e"):
                        return False
                    s = s[:start] + "ir"
                    return True
                if start < p2:
                    return False
                if case == 2:
                    s = s[:start] + "log"
                elif case == 3:
                    s = s[:start] + "u"
                elif case == 4:
                    s = s[:start] + "ente"
                elif case == 6:
                    s = s[:start]
                    for sub in ("ante", "avel", "ível"):
                        if s.endswith(sub) and len(s) - 4 >= p2:
                            s = s[:-4]
                            break
                elif case == 7:
                    s = s[:start]
                    for sub in ("abil", "ic", "iv"):
                        if s.endswith(sub) and len(s) - len(sub) >= p2:
                            s = s[: -len(sub)]
                            break
                elif case == 8:
                    s = s[:start]
                    if s.endswith("at") and len(s) - 2 >= p2:
                        s = s[:-2]
                else:
                    s = s[:start]
                return True
        return False

    def verb() -> bool:
        nonlocal s
        for suf in _PT_VERB:
            if s.endswith(suf) and len(s) - len(suf) >= pV:
                s = s[: -len(suf)]
                return True
        return False

    if std() or verb():
        # the c-i strip after a successful suffix removal
        if s.endswith("ci") and len(s) - 1 >= pV:
            s = s[:-1]
    else:
        for suf in _PT_RESID:
            if s.endswith(suf):
                if len(s) - len(suf) >= pV:
                    s = s[: -len(suf)]
                break

    # residual form
    for suf, case in (("e", 1), ("é", 1), ("ê", 1), ("ç", 2)):
        if s.endswith(suf):
            if case == 2:
                s = s[:-1] + "c"
            else:
                if len(s) - 1 >= pV:
                    s = s[:-1]
                    if (
                        (s.endswith("gu") or s.endswith("ci"))
                        and len(s) - 1 >= pV
                    ):
                        s = s[:-1]
            break

    return s.replace("a~", "ã").replace("o~", "õ")


# --- Portuguese SQL twin ----------------------------------------------------
# Nasal vowels ride as 'a~'/'o~' exactly like the reference prelude;
# the std|verb OR-chain and the ci-strip thread the chr(2) marker.

_PT_VCC = "aeiouáâéêíóôú"


def _pt_rv_sql(k) -> str:
    p = f"left(term, length(term)-({k}))"
    return (
        f"(regexp_matches({p}, '^[{_PT_VCC}][^{_PT_VCC}].*[{_PT_VCC}]') OR "
        f"regexp_matches({p}, '^[{_PT_VCC}][{_PT_VCC}].*[^{_PT_VCC}]') OR "
        f"regexp_matches({p}, '^[^{_PT_VCC}][^{_PT_VCC}].*[{_PT_VCC}]') OR "
        f"(regexp_matches(term, '^[^{_PT_VCC}][{_PT_VCC}]') AND length(term)-({k}) >= 3))"
    )


def _pt_r1_sql(k) -> str:
    return (
        f"regexp_matches(left(term, length(term)-({k})), "
        f"'[{_PT_VCC}][^{_PT_VCC}]')"
    )


def _pt_r2_sql(k) -> str:
    return (
        f"regexp_matches(left(term, length(term)-({k})), "
        f"'[{_PT_VCC}].*[^{_PT_VCC}].*[{_PT_VCC}].*[^{_PT_VCC}]')"
    )


def _pt_sql() -> tuple[str, ...]:
    nl = "\n        "
    done = "left(term, 1) = chr(2)"

    rows_s = []
    for suf, case in _PT_STD:
        k = len(suf)
        lit = suf.replace("'", "''")
        r = f"left(term, length(term)-{k})"
        mk = "chr(2) || "
        if case == 5:
            base = f"right(term, {k}) = '{lit}' AND {_pt_r1_sql(k)}"
            rows_s.append(
                f"WHEN {base} AND right({r}, 2) = 'iv' AND {_pt_r2_sql(k + 2)} "
                f"AND right(left(term, length(term)-{k + 2}), 2) = 'at' AND {_pt_r2_sql(k + 4)} "
                f"THEN {mk}left(term, length(term)-{k + 4})"
            )
            rows_s.append(
                f"WHEN {base} AND right({r}, 2) IN ('iv', 'os', 'ic', 'ad') "
                f"AND {_pt_r2_sql(k + 2)} THEN {mk}left(term, length(term)-{k + 2})"
            )
            rows_s.append(f"WHEN {base} THEN {mk}{r}")
        elif case == 9:
            base = (
                f"right(term, {k}) = '{lit}' AND {_pt_rv_sql(k)} AND "
                f"substr(term, length(term)-{k}, 1) = 'e'"
            )
            rows_s.append(f"WHEN {base} THEN {mk}{r} || 'ir'")
        else:
            base = f"right(term, {k}) = '{lit}' AND {_pt_r2_sql(k)}"
            if case == 2:
                rows_s.append(f"WHEN {base} THEN {mk}{r} || 'log'")
            elif case == 3:
                rows_s.append(f"WHEN {base} THEN {mk}{r} || 'u'")
            elif case == 4:
                rows_s.append(f"WHEN {base} THEN {mk}{r} || 'ente'")
            elif case == 6:
                rows_s.append(
                    f"WHEN {base} AND right({r}, 4) IN ('ante', 'avel', 'ível') "
                    f"AND {_pt_r2_sql(k + 4)} THEN {mk}left(term, length(term)-{k + 4})"
                )
                rows_s.append(f"WHEN {base} THEN {mk}{r}")
            elif case == 7:
                rows_s.append(
                    f"WHEN {base} AND right({r}, 4) = 'abil' AND {_pt_r2_sql(k + 4)} "
                    f"THEN {mk}left(term, length(term)-{k + 4})"
                )
                rows_s.append(
                    f"WHEN {base} AND right({r}, 2) IN ('ic', 'iv') AND {_pt_r2_sql(k + 2)} "
                    f"THEN {mk}left(term, length(term)-{k + 2})"
                )
                rows_s.append(f"WHEN {base} THEN {mk}{r}")
            elif case == 8:
                rows_s.append(
                    f"WHEN {base} AND right({r}, 2) = 'at' AND {_pt_r2_sql(k + 2)} "
                    f"THEN {mk}left(term, length(term)-{k + 2})"
                )
                rows_s.append(f"WHEN {base} THEN {mk}{r}")
            else:
                rows_s.append(f"WHEN {base} THEN {mk}{r}")
        rows_s.append(f"WHEN right(term, {k}) = '{lit}' THEN term")
    std = "CASE\n        " + nl.join(rows_s) + "\n        ELSE term END"

    rows_v = [f"WHEN {done} THEN term"]
    for suf in _PT_VERB:
        k = len(suf)
        rows_v.append(
            f"WHEN right(term, {k}) = '{suf}' AND {_pt_rv_sql(k)} "
            f"THEN chr(2) || left(term, length(term)-{k})"
        )
    verb = "CASE\n        " + nl.join(rows_v) + "\n        ELSE term END"

    sub = "substr(term, 2)"
    def _rv_over(t, k):
        p = f"left({t}, length({t})-({k}))"
        return (
            f"(regexp_matches({p}, '^[{_PT_VCC}][^{_PT_VCC}].*[{_PT_VCC}]') OR "
            f"regexp_matches({p}, '^[{_PT_VCC}][{_PT_VCC}].*[^{_PT_VCC}]') OR "
            f"regexp_matches({p}, '^[^{_PT_VCC}][^{_PT_VCC}].*[{_PT_VCC}]') OR "
            f"(regexp_matches({t}, '^[^{_PT_VCC}][{_PT_VCC}]') AND length({t})-({k}) >= 3))"
        )

    ci = (
        f"""CASE
        WHEN {done} AND right({sub}, 2) = 'ci' AND {_rv_over(sub, 1)}
        THEN chr(2) || left({sub}, length({sub})-1)
        ELSE term END"""
    )
    rows_r = [f"WHEN {done} THEN term"]
    for suf in _PT_RESID:
        k = len(suf)
        rows_r.append(
            f"WHEN right(term, {k}) = '{suf}' AND {_pt_rv_sql(k)} "
            f"THEN left(term, length(term)-{k})"
        )
        rows_r.append(f"WHEN right(term, {k}) = '{suf}' THEN term")
    resid = "CASE\n        " + nl.join(rows_r) + "\n        ELSE term END"
    unmark = f"CASE WHEN {done} THEN substr(term, 2) ELSE term END"

    rf = f"left(term, length(term)-1)"
    form_rows = []
    for suf in ("e", "é", "ê"):
        base = f"right(term, 1) = '{suf}' AND {_pt_rv_sql(1)}"
        form_rows.append(
            f"WHEN {base} AND (right({rf}, 2) = 'gu' OR right({rf}, 2) = 'ci') "
            f"AND {_pt_rv_sql(2)} THEN left(term, length(term)-2)"
        )
        form_rows.append(f"WHEN {base} THEN {rf}")
        form_rows.append(f"WHEN right(term, 1) = '{suf}' THEN term")
    form_rows.append(
        "WHEN right(term, 1) = 'ç' THEN left(term, length(term)-1) || 'c'"
    )
    form = "CASE\n        " + nl.join(form_rows) + "\n        ELSE term END"

    return (
        "replace(replace(term, 'ã', 'a~'), 'õ', 'o~')",
        std,
        verb,
        ci,
        resid,
        unmark,
        form,
        "replace(replace(term, 'a~', 'ã'), 'o~', 'õ')",
    )


PORTUGUESE_SNOWBALL_SQL = _pt_sql()


# ---------------------------------------------------------------------------
# Italian (snowballstem.org italian; generated form at
# org/tartarus/snowball/ext/ItalianStemmer.java) — the ItalianAnalyzer's
# Snowball ALTERNATIVE (default is the light stemmer).
# ---------------------------------------------------------------------------

_IT_SB_V = frozenset("aeiouàèìòù")
_IT_AEIO = frozenset("aeioàèìò")
_IT_ACUTE = str.maketrans("áéíóú", "àèìòù")
_IT_PRON = sorted(
    """la cela gliela mela tela vela le cele gliele mele tele vele ne
    cene gliene mene sene tene vene ci li celi glieli meli teli veli
    gli mi si ti vi lo celo glielo melo telo velo""".split(),
    key=len, reverse=True,
)
_IT_PRON_PRE = [("ando", 1), ("endo", 1), ("ar", 2), ("er", 2), ("ir", 2)]
_IT_PRON_PRE.sort(key=lambda e: len(e[0]), reverse=True)
_IT_STD = [
    ("amente", 7), ("atrice", 1), ("atrici", 1), ("logia", 3),
    ("logie", 3), ("usione", 4), ("usioni", 4), ("azione", 2),
    ("azioni", 2), ("uzione", 4), ("uzioni", 4), ("amenti", 6),
    ("imenti", 6), ("amento", 6), ("imento", 6), ("atore", 2),
    ("atori", 2), ("abile", 1), ("ibile", 1), ("abili", 1),
    ("ibili", 1), ("mente", 1), ("enza", 5), ("enze", 5), ("anza", 1),
    ("anze", 1), ("ante", 1), ("anti", 1), ("iche", 1), ("ichi", 1), ("ismi", 1), ("ismo", 1),
    ("ista", 1), ("iste", 1), ("isti", 1), ("istà", 1), ("istè", 1),
    ("istì", 1), ("ica", 1), ("ice", 1), ("ici", 1), ("ico", 1),
    ("osa", 1), ("ose", 1), ("osi", 1), ("oso", 1), ("iva", 9),
    ("ive", 9), ("ivi", 9), ("ivo", 9), ("ità", 8),
]
_IT_STD.sort(key=lambda e: len(e[0]), reverse=True)
_IT_VERB = sorted(
    """isca enda ata ita uta ava eva iva erebbe irebbe isce ende are
    ere ire asse ate avate evate ivate ete erete irete ite ereste
    ireste ute erai irai isci endi erei irei assi ati iti eresti
    iresti uti avi evi ivi isco ando endo Yamo iamo avamo evamo ivamo
    eremo iremo assimo ammo emmo eremmo iremmo immo ano iscano avano
    evano ivano eranno iranno ono iscono arono erono irono erebbero
    irebbero assero essero issero ato ito uto avo evo ivo ar ir erà
    irà erò irò""".split(),
    key=len, reverse=True,
)


def _it_prelude(term: str) -> str:
    s = term.translate(_IT_ACUTE).replace("qu", "qU")
    chars = list(s)
    for i in range(len(chars) - 2):
        if (
            chars[i] in _IT_SB_V
            and chars[i + 1] in ("u", "i")
            and chars[i + 2] in _IT_SB_V
        ):
            chars[i + 1] = chars[i + 1].upper()
    return "".join(chars)


def _it_regions(s: str) -> tuple[int, int, int]:
    n = len(s)
    pV = p1 = p2 = n

    def nx(i, want_vowel):
        while i < n:
            if (s[i] in _IT_SB_V) == want_vowel:
                return i + 1
            i += 1
        return None

    if n >= 2:
        if s[0] in _IT_SB_V:
            if s[1] not in _IT_SB_V:
                r = nx(2, True)
                if r is not None:
                    pV = r
            else:
                r = nx(2, False)
                if r is not None:
                    pV = r
        else:
            if s[1] not in _IT_SB_V:
                r = nx(2, True)
                if r is not None:
                    pV = r
            else:
                if n >= 3:
                    pV = 3
    a = nx(0, True)
    b = nx(a, False) if a is not None else None
    if b is not None:
        p1 = b
        c = nx(b, True)
        d = nx(c, False) if c is not None else None
        if d is not None:
            p2 = d
    return pV, p1, p2


def italian_snowball_stem(term: str) -> str:  # noqa: C901
    s = _it_prelude(term)
    pV, p1, p2 = _it_regions(s)

    # attached pronoun: pronoun preceded by ando/endo (delete pronoun)
    # or ar/er/ir (pronoun → e), gated on RV at the preceding form
    for pron in _IT_PRON:
        if s.endswith(pron):
            base = s[: -len(pron)]
            for pre, case in _IT_PRON_PRE:
                if base.endswith(pre):
                    if len(base) - len(pre) >= pV:
                        if case == 1:
                            s = base
                        else:
                            s = base + "e"
                    break
            break

    done = False
    for suf, case in _IT_STD:
        if s.endswith(suf):
            start = len(s) - len(suf)
            reg = {6: pV, 7: p1}.get(case, p2)
            if start >= reg:
                if case == 3:
                    s = s[:start] + "log"
                elif case == 4:
                    s = s[:start] + "u"
                elif case == 5:
                    s = s[:start] + "ente"
                elif case == 7:  # amente (R1) + ic/abil/os/iv(+at)
                    s = s[:start]
                    for sub in ("abil", "iv", "os", "ic"):
                        if s.endswith(sub) and len(s) - len(sub) >= p2:
                            s = s[: -len(sub)]
                            if sub == "iv" and s.endswith("at") and len(s) - 2 >= p2:
                                s = s[:-2]
                            break
                elif case == 8:  # ità (R2) + ic/abil/iv
                    s = s[:start]
                    for sub in ("abil", "ic", "iv"):
                        if s.endswith(sub) and len(s) - len(sub) >= p2:
                            s = s[: -len(sub)]
                            break
                elif case == 9:  # iva… (R2) + at(+ic)
                    s = s[:start]
                    if s.endswith("at") and len(s) - 2 >= p2:
                        s = s[:-2]
                        if s.endswith("ic") and len(s) - 2 >= p2:
                            s = s[:-2]
                elif case == 2:  # azione… (R2) + ic
                    s = s[:start]
                    if s.endswith("ic") and len(s) - 2 >= p2:
                        s = s[:-2]
                else:
                    s = s[:start]
                done = True
            break
    if not done:
        for suf in _IT_VERB:
            if s.endswith(suf) and len(s) - len(suf) >= pV:
                s = s[: -len(suf)]
                break

    # vowel suffix: final AEIO vowel in RV (then a remaining i in RV)
    if s and s[-1] in _IT_AEIO and len(s) - 1 >= pV:
        s = s[:-1]
        if s.endswith("i") and len(s) - 1 >= pV:
            s = s[:-1]
    # final h after c/g — the RV gate sits at the c/g position
    if s.endswith(("ch", "gh")) and len(s) - 2 >= pV:
        s = s[:-1]

    return s.replace("I", "i").replace("U", "u")


# --- Italian SQL twin -------------------------------------------------------

_IT_VCC = "aeiouàèìòù"

_IT_MARK_STEP = (
    "replace(replace(regexp_replace(term, "
    f"'([{_IT_VCC}])(u[{_IT_VCC}]|i[{_IT_VCC}])', '\\1\x04\\2'), "
    "'\x04u', 'U'), '\x04i', 'I')"
)


def _it_rv_sql(k) -> str:
    p = f"left(term, length(term)-({k}))"
    return (
        f"(regexp_matches({p}, '^[{_IT_VCC}][^{_IT_VCC}].*[{_IT_VCC}]') OR "
        f"regexp_matches({p}, '^[{_IT_VCC}][{_IT_VCC}].*[^{_IT_VCC}]') OR "
        f"regexp_matches({p}, '^[^{_IT_VCC}][^{_IT_VCC}].*[{_IT_VCC}]') OR "
        f"(regexp_matches(term, '^[^{_IT_VCC}][{_IT_VCC}]') AND length(term)-({k}) >= 3))"
    )


def _it_r1_sql(k) -> str:
    return (
        f"regexp_matches(left(term, length(term)-({k})), "
        f"'[{_IT_VCC}][^{_IT_VCC}]')"
    )


def _it_r2_sql(k) -> str:
    return (
        f"regexp_matches(left(term, length(term)-({k})), "
        f"'[{_IT_VCC}].*[^{_IT_VCC}].*[{_IT_VCC}].*[^{_IT_VCC}]')"
    )


def _it_sql() -> tuple[str, ...]:
    nl = "\n        "
    done = "left(term, 1) = chr(2)"

    rows_pr = []
    for pron in _IT_PRON:
        kp = len(pron)
        for pre, case in _IT_PRON_PRE:
            k = kp + len(pre)
            cond = f"right(term, {k}) = '{pre}{pron}' AND {_it_rv_sql(k)}"
            if case == 1:
                then = f"left(term, length(term)-{kp})"
            else:
                then = f"left(term, length(term)-{kp}) || 'e'"
            rows_pr.append(f"WHEN {cond} THEN {then}")
        rows_pr.append(f"WHEN right(term, {kp}) = '{pron}' THEN term")
    pronoun = "CASE\n        " + nl.join(rows_pr) + "\n        ELSE term END"

    rows_s = []
    for suf, case in _IT_STD:
        k = len(suf)
        reg = {6: _it_rv_sql, 7: _it_r1_sql}.get(case, _it_r2_sql)(k)
        base = f"right(term, {k}) = '{suf}' AND {reg}"
        r = f"left(term, length(term)-{k})"
        mk = "chr(2) || "
        if case == 3:
            rows_s.append(f"WHEN {base} THEN {mk}{r} || 'log'")
        elif case == 4:
            rows_s.append(f"WHEN {base} THEN {mk}{r} || 'u'")
        elif case == 5:
            rows_s.append(f"WHEN {base} THEN {mk}{r} || 'ente'")
        elif case == 7:
            rows_s.append(
                f"WHEN {base} AND right({r}, 2) = 'iv' AND {_it_r2_sql(k + 2)} "
                f"AND right(left(term, length(term)-{k + 2}), 2) = 'at' AND {_it_r2_sql(k + 4)} "
                f"THEN {mk}left(term, length(term)-{k + 4})"
            )
            rows_s.append(
                f"WHEN {base} AND right({r}, 4) = 'abil' AND {_it_r2_sql(k + 4)} "
                f"THEN {mk}left(term, length(term)-{k + 4})"
            )
            rows_s.append(
                f"WHEN {base} AND right({r}, 2) IN ('iv', 'os', 'ic') AND {_it_r2_sql(k + 2)} "
                f"THEN {mk}left(term, length(term)-{k + 2})"
            )
            rows_s.append(f"WHEN {base} THEN {mk}{r}")
        elif case == 8:
            rows_s.append(
                f"WHEN {base} AND right({r}, 4) = 'abil' AND {_it_r2_sql(k + 4)} "
                f"THEN {mk}left(term, length(term)-{k + 4})"
            )
            rows_s.append(
                f"WHEN {base} AND right({r}, 2) IN ('ic', 'iv') AND {_it_r2_sql(k + 2)} "
                f"THEN {mk}left(term, length(term)-{k + 2})"
            )
            rows_s.append(f"WHEN {base} THEN {mk}{r}")
        elif case == 9:
            rows_s.append(
                f"WHEN {base} AND right({r}, 2) = 'at' AND {_it_r2_sql(k + 2)} "
                f"AND right(left(term, length(term)-{k + 2}), 2) = 'ic' AND {_it_r2_sql(k + 4)} "
                f"THEN {mk}left(term, length(term)-{k + 4})"
            )
            rows_s.append(
                f"WHEN {base} AND right({r}, 2) = 'at' AND {_it_r2_sql(k + 2)} "
                f"THEN {mk}left(term, length(term)-{k + 2})"
            )
            rows_s.append(f"WHEN {base} THEN {mk}{r}")
        elif case == 2:
            rows_s.append(
                f"WHEN {base} AND right({r}, 2) = 'ic' AND {_it_r2_sql(k + 2)} "
                f"THEN {mk}left(term, length(term)-{k + 2})"
            )
            rows_s.append(f"WHEN {base} THEN {mk}{r}")
        else:
            rows_s.append(f"WHEN {base} THEN {mk}{r}")
        rows_s.append(f"WHEN right(term, {k}) = '{suf}' THEN term")
    std = "CASE\n        " + nl.join(rows_s) + "\n        ELSE term END"

    rows_v = [f"WHEN {done} THEN term"]
    for suf in _IT_VERB:
        k = len(suf)
        rows_v.append(
            f"WHEN right(term, {k}) = '{suf}' AND {_it_rv_sql(k)} "
            f"THEN left(term, length(term)-{k})"
        )
    verb = "CASE\n        " + nl.join(rows_v) + "\n        ELSE term END"
    unmark = f"CASE WHEN {done} THEN substr(term, 2) ELSE term END"

    aeio = _lits(sorted(_IT_AEIO))
    vowel = (
        f"""CASE
        WHEN right(term, 1) IN ({aeio}) AND {_it_rv_sql(1)}
         AND substr(term, length(term)-1, 1) = 'i' AND {_it_rv_sql(2)}
        THEN left(term, length(term)-2)
        WHEN right(term, 1) IN ({aeio}) AND {_it_rv_sql(1)}
        THEN left(term, length(term)-1)
        ELSE term END"""
    )
    hrule = (
        f"""CASE
        WHEN right(term, 2) IN ('ch', 'gh') AND {_it_rv_sql(2)}
        THEN left(term, length(term)-1)
        ELSE term END"""
    )
    return (
        "replace(translate(term, 'áéíóú', 'àèìòù'), 'qu', 'qU')",
        _IT_MARK_STEP,
        _IT_MARK_STEP,
        _IT_MARK_STEP,
        _IT_MARK_STEP,
        pronoun,
        std,
        verb,
        unmark,
        vowel,
        hrule,
        "replace(replace(term, 'I', 'i'), 'U', 'u')",
    )


ITALIAN_SNOWBALL_SQL = _it_sql()


# ---------------------------------------------------------------------------
# Nepali (snowballstem.org nepali; generated form at
# org/tartarus/snowball/ext/NepaliStemmer.java) — the reference exposes
# it through SnowballPorterFilterFactory(language=Nepali). Three
# Devanagari passes: postposition strip (का/कि/… kept after ए/े), then
# a LOOP of optional ँ/ं-after-यौ/छौ/नौ/थे and ै-after-त्र deletions
# followed by the 91-entry verb-suffix table until it stops matching.
# Suffix tables are extracted from the generated source's escapes.
# ---------------------------------------------------------------------------

_NE_CAT1 = [('मार्फत', 1), ('द्वारा', 1), ('सँगै', 1), ('लाइ', 1), ('लाई', 1), ('सँग', 1), ('संग', 1), ('पछि', 1), ('रत', 1), ('का', 2), ('मा', 1), ('कि', 2), ('की', 2), ('ले', 1), ('कै', 2), ('मै', 1), ('को', 2)]
_NE_CAT3 = ['हुनेछ', 'हुन्छ', 'नेछन्', 'थिइस्', 'नेछस्', 'इन्छ', 'िन्छ', 'इएका', 'िएका', 'नेका', 'देखि', 'माथि', 'इएकी', 'िएकी', 'देखी', 'नेछु', 'नेकै', 'इएको', 'िएको', 'नेको', 'थियो', 'दियो', 'थ्यो', 'नेछौ', 'थियौ', 'छ्यौ', 'थ्यौ', 'इछन्', 'एछन्', 'िछन्', 'ेछन्', 'लान्', 'छिन्', 'थिन्', 'इछस्', 'एछस्', 'िछस्', 'ेछस्', 'थिस्', 'छेस्', 'होस्', 'थिए', 'नेछ', 'एका', 'ेका', 'इदा', 'िदा', 'एकी', 'ेकी', 'एछु', 'ेछु', 'हरु', 'हरू', 'एकै', 'ेकै', 'इदै', 'िदै', 'एको', 'ेको', 'इदो', 'िदो', 'इयो', 'भयो', 'ियो', 'इछौ', 'एछौ', 'िछौ', 'ेछौ', 'छन्', 'पर्', 'इस्', 'छस्', 'िस्', 'इछ', 'एछ', 'िछ', 'ेछ', 'दा', 'थी', 'दी', 'छु', 'नु', 'छे', 'थे', 'ने', 'दै', 'दो', 'यो', 'छौ', 'यौ', 'छ']


def nepali_snowball_stem(term: str) -> str:
    s = term
    for suf, case in _NE_CAT1:
        if s.endswith(suf):
            start = len(s) - len(suf)
            if case == 2:
                if not s[:start].endswith(("ए", "े")):
                    s = s[:start]
            else:
                s = s[:start]
            break
    while True:
        if s.endswith(("ँ", "ं")):
            if s[:-1].endswith(("यौ", "छौ", "नौ", "थे")):
                s = s[:-1]
        elif s.endswith("ै"):
            if s[:-1].endswith("त्र"):
                s = s[:-1]
        for suf in _NE_CAT3:
            if s.endswith(suf):
                s = s[: -len(suf)]
                break
        else:
            break
    return s


# --- Nepali SQL twin --------------------------------------------------------
# The cat2+cat3 loop unrolls 6× (the vocabulary needs at most 4); each
# round is a cat2 conditional layer followed by a cat3 delete layer.


def _ne_sql() -> tuple[str, ...]:
    nl = "\n        "
    rows1 = []
    for suf, case in _NE_CAT1:
        k = len(suf)
        if case == 2:
            rows1.append(
                f"WHEN right(term, {k}) = '{suf}' AND "
                f"substr(term, length(term)-{k}, 1) NOT IN ('ए', 'े') "
                f"THEN left(term, length(term)-{k})"
            )
            rows1.append(f"WHEN right(term, {k}) = '{suf}' THEN term")
        else:
            rows1.append(
                f"WHEN right(term, {k}) = '{suf}' THEN left(term, length(term)-{k})"
            )
    cat1 = "CASE\n        " + nl.join(rows1) + "\n        ELSE term END"

    cat2 = (
        """CASE
        WHEN right(term, 1) IN ('ँ', 'ं')
         AND substr(term, length(term)-2, 2) IN ('यौ', 'छौ', 'नौ', 'थे')
        THEN left(term, length(term)-1)
        WHEN right(term, 1) = 'ै' AND substr(term, length(term)-3, 3) = 'त्र'
        THEN left(term, length(term)-1)
        ELSE term END"""
    )
    rows3 = []
    for suf in _NE_CAT3:
        k = len(suf)
        rows3.append(
            f"WHEN right(term, {k}) = '{suf}' THEN left(term, length(term)-{k})"
        )
    cat3 = "CASE\n        " + nl.join(rows3) + "\n        ELSE term END"
    return (cat1,) + (cat2, cat3) * 6


NEPALI_SNOWBALL_SQL = _ne_sql()


# ---------------------------------------------------------------------------
# Turkish (snowballstem.org turkish; generated form at
# org/tartarus/snowball/ext/TurkishStemmer.java) — the TurkishAnalyzer's
# DEFAULT stem filter, and the largest Snowball machine in the
# reference (8-class vowel harmony, optional buffer consonants, a
# recursive ki-suffix chain, and vowel-restoring post-processing).
#
# The port runs on a tiny backward-cursor state: saves are END-relative
# offsets (they survive slices, exactly like the generated v_n = limit
# - cursor bookkeeping), slices are irreversible (cursor restores only
# reposition), and each r_ rule translates 1:1 in structure.
# ---------------------------------------------------------------------------

_TR_V = frozenset("aeıioöuü")
_TR_U = frozenset("ıiuü")
_TR_HARMONY = {
    "a": frozenset("aıou"),
    "e": frozenset("eiöü"),
    "ı": frozenset("aı"),
    "i": frozenset("ei"),
    "o": frozenset("ou"),
    "ö": frozenset("öü"),
    "u": frozenset("ou"),
    "ü": frozenset("öü"),
}


class _TrState:
    __slots__ = ("s", "c", "bra", "ket", "cont")

    def __init__(self, s: str):
        self.s = s
        self.c = len(s)
        self.bra = self.ket = len(s)
        self.cont = True

    # --- primitive ops (backward mode) -----------------------------------
    def save(self) -> int:
        return len(self.s) - self.c

    def restore(self, v: int) -> None:
        self.c = len(self.s) - v

    def eq(self, t: str) -> bool:
        n = len(t)
        if self.c < n or self.s[self.c - n : self.c] != t:
            return False
        self.c -= n
        return True

    def grp(self, g) -> bool:
        if self.c <= 0 or self.s[self.c - 1] not in g:
            return False
        self.c -= 1
        return True

    def outgrp(self, g) -> bool:
        if self.c <= 0 or self.s[self.c - 1] in g:
            return False
        self.c -= 1
        return True

    def among(self, sufs) -> bool:
        """longest-first suffix list; consumes on match."""
        for t in sufs:
            if self.eq(t):
                return True
        return False

    def slice_del(self) -> None:
        self.s = self.s[: self.bra] + self.s[self.ket :]

    def slice_from(self, t: str) -> None:
        self.s = self.s[: self.bra] + t + self.s[self.ket :]


def _by_len_t(*sufs):
    return tuple(sorted(sufs, key=len, reverse=True))


_TR_A0 = _by_len_t("m", "n", "miz", "niz", "muz", "nuz", "müz", "nüz", "mız", "nız")
_TR_A1 = _by_len_t("leri", "ları")
_TR_A2 = _by_len_t("ni", "nu", "nü", "nı")
_TR_A3 = _by_len_t("in", "un", "ün", "ın")
_TR_A4 = _by_len_t("a", "e")
_TR_A5 = _by_len_t("na", "ne")
_TR_A6 = _by_len_t("da", "ta", "de", "te")
_TR_A7 = _by_len_t("nda", "nde")
_TR_A8 = _by_len_t("dan", "tan", "den", "ten")
_TR_A9 = _by_len_t("ndan", "nden")
_TR_A10 = _by_len_t("la", "le")
_TR_A11 = _by_len_t("ca", "ce")
_TR_A12 = _by_len_t("im", "um", "üm", "ım")
_TR_A13 = _by_len_t("sin", "sun", "sün", "sın")
_TR_A14 = _by_len_t("iz", "uz", "üz", "ız")
_TR_A15 = _by_len_t("siniz", "sunuz", "sünüz", "sınız")
_TR_A16 = _by_len_t("lar", "ler")
_TR_A17 = _by_len_t("niz", "nuz", "nüz", "nız")
_TR_A18 = _by_len_t("dir", "tir", "dur", "tur", "dür", "tür", "dır", "tır")
_TR_A19 = _by_len_t("casına", "cesine")
_TR_A20 = _by_len_t(
    "di", "ti", "dik", "tik", "duk", "tuk", "dük", "tük", "dık", "tık",
    "dim", "tim", "dum", "tum", "düm", "tüm", "dım", "tım", "din",
    "tin", "dun", "tun", "dün", "tün", "dın", "tın", "du", "tu", "dü",
    "tü", "dı", "tı",
)
_TR_A21 = _by_len_t("sa", "se", "sak", "sek", "sam", "sem", "san", "sen")
_TR_A22 = _by_len_t("miş", "muş", "müş", "mış")


def _tr_harmony(t: _TrState) -> bool:
    """check_vowel_harmony: the last vowel must agree with SOME earlier
    vowel of its harmony class (test-wrapped: cursor untouched)."""
    s, c = t.s, t.c
    lv = None
    for i in range(c - 1, -1, -1):
        if s[i] in _TR_V:
            lv = i
            break
    if lv is None:
        return False
    cls = _TR_HARMONY[s[lv]]
    return any(s[j] in cls for j in range(lv))


def _tr_opt_cons(t: _TrState, ch: str) -> bool:
    """mark_suffix_with_optional_{n,s,y}_consonant."""
    v1 = t.save()
    if t.eq(ch):
        v2 = t.save()
        if t.grp(_TR_V):
            t.restore(v2)
            return True
        t.restore(v1)
    else:
        t.restore(v1)
    # the non-consonant branch: next char must not be ch, and the char
    # one further back must be a vowel (both peeked)
    v3 = t.save()
    if t.eq(ch):
        t.restore(v3)
        return False
    t.restore(v3)
    v5 = t.save()
    if t.c <= 0:
        return False
    t.c -= 1
    if not t.grp(_TR_V):
        return False
    t.restore(v5)
    return True


def _tr_opt_U(t: _TrState) -> bool:
    """mark_suffix_with_optional_U_vowel."""
    v1 = t.save()
    if t.grp(_TR_U):
        v2 = t.save()
        if t.outgrp(_TR_V):
            t.restore(v2)
            return True
        t.restore(v1)
    else:
        t.restore(v1)
    v3 = t.save()
    if t.grp(_TR_U):
        t.restore(v3)
        return False
    t.restore(v3)
    v5 = t.save()
    if t.c <= 0:
        return False
    t.c -= 1
    if not t.outgrp(_TR_V):
        return False
    t.restore(v5)
    return True


# --- Turkish mark rules ------------------------------------------------------


def _tr_mark_possessives(t):
    return t.among(_TR_A0) and _tr_opt_U(t)


def _tr_mark_sU(t):
    return _tr_harmony(t) and t.grp(_TR_U) and _tr_opt_cons(t, "s")


def _tr_mark_lArI(t):
    return t.among(_TR_A1)


def _tr_mark_yU(t):
    return _tr_harmony(t) and t.grp(_TR_U) and _tr_opt_cons(t, "y")


def _tr_mark_nU(t):
    return _tr_harmony(t) and t.among(_TR_A2)


def _tr_mark_nUn(t):
    return _tr_harmony(t) and t.among(_TR_A3) and _tr_opt_cons(t, "n")


def _tr_mark_yA(t):
    return _tr_harmony(t) and t.among(_TR_A4) and _tr_opt_cons(t, "y")


def _tr_mark_nA(t):
    return _tr_harmony(t) and t.among(_TR_A5)


def _tr_mark_DA(t):
    return _tr_harmony(t) and t.among(_TR_A6)


def _tr_mark_ndA(t):
    return _tr_harmony(t) and t.among(_TR_A7)


def _tr_mark_DAn(t):
    return _tr_harmony(t) and t.among(_TR_A8)


def _tr_mark_ndAn(t):
    return _tr_harmony(t) and t.among(_TR_A9)


def _tr_mark_ylA(t):
    return _tr_harmony(t) and t.among(_TR_A10) and _tr_opt_cons(t, "y")


def _tr_mark_ki(t):
    return t.eq("ki")


def _tr_mark_ncA(t):
    return _tr_harmony(t) and t.among(_TR_A11) and _tr_opt_cons(t, "n")


def _tr_mark_yUm(t):
    return _tr_harmony(t) and t.among(_TR_A12) and _tr_opt_cons(t, "y")


def _tr_mark_sUn(t):
    return _tr_harmony(t) and t.among(_TR_A13)


def _tr_mark_yUz(t):
    return _tr_harmony(t) and t.among(_TR_A14) and _tr_opt_cons(t, "y")


def _tr_mark_sUnUz(t):
    return t.among(_TR_A15)


def _tr_mark_lAr(t):
    return _tr_harmony(t) and t.among(_TR_A16)


def _tr_mark_nUz(t):
    return _tr_harmony(t) and t.among(_TR_A17)


def _tr_mark_DUr(t):
    return _tr_harmony(t) and t.among(_TR_A18)


def _tr_mark_cAsInA(t):
    return t.among(_TR_A19)


def _tr_mark_yDU(t):
    return _tr_harmony(t) and t.among(_TR_A20) and _tr_opt_cons(t, "y")


def _tr_mark_ysA(t):
    return t.among(_TR_A21) and _tr_opt_cons(t, "y")


def _tr_mark_ymUs(t):
    return _tr_harmony(t) and t.among(_TR_A22) and _tr_opt_cons(t, "y")


def _tr_mark_yken(t):
    return t.eq("ken") and _tr_opt_cons(t, "y")


def _tr_try(t, fn) -> bool:
    """Attempt fn; on failure restore the cursor (slices persist,
    exactly like the generated code's v_n bookkeeping)."""
    v = t.save()
    if fn(t):
        return True
    t.restore(v)
    return False


def _tr_nominal_verb(t: _TrState) -> None:
    t.ket = t.c
    t.cont = True
    v1 = t.save()
    while True:  # emulate lab0 with single-pass branches
        # A: ymUs | yDU | ysA | yken
        if (
            _tr_try(t, _tr_mark_ymUs)
            or _tr_try(t, _tr_mark_yDU)
            or _tr_try(t, _tr_mark_ysA)
            or _tr_try(t, _tr_mark_yken)
        ):
            break
        t.restore(v1)
        # B: cAsInA + (sUnUz|lAr|yUm|sUn|yUz|ymUs)
        if _tr_try(t, _tr_mark_cAsInA):
            if (
                _tr_try(t, _tr_mark_sUnUz)
                or _tr_try(t, _tr_mark_lAr)
                or _tr_try(t, _tr_mark_yUm)
                or _tr_try(t, _tr_mark_sUn)
                or _tr_try(t, _tr_mark_yUz)
                or _tr_mark_ymUs(t)
            ):
                break
        t.restore(v1)
        # C: lAr (slice now) + optional (DUr|yDU|ysA|ymUs); cont = False
        if _tr_try(t, _tr_mark_lAr):
            t.bra = t.c
            t.slice_del()
            v4 = t.save()
            t.ket = t.c
            if not (
                _tr_try(t, _tr_mark_DUr)
                or _tr_try(t, _tr_mark_yDU)
                or _tr_try(t, _tr_mark_ysA)
                or _tr_try(t, _tr_mark_ymUs)
            ):
                t.restore(v4)
                t.ket = t.c
            t.cont = False
            break
        t.restore(v1)
        # D: nUz + (yDU|ysA)
        if _tr_try(t, _tr_mark_nUz):
            if _tr_try(t, _tr_mark_yDU) or _tr_mark_ysA(t):
                break
        t.restore(v1)
        # E: (sUnUz|yUz|sUn|yUm) slice now + optional ymUs
        if (
            _tr_try(t, _tr_mark_sUnUz)
            or _tr_try(t, _tr_mark_yUz)
            or _tr_try(t, _tr_mark_sUn)
            or _tr_try(t, _tr_mark_yUm)
        ):
            t.bra = t.c
            t.slice_del()
            v8 = t.save()
            t.ket = t.c
            if not _tr_try(t, _tr_mark_ymUs):
                t.restore(v8)
                t.ket = t.c
            break
        t.restore(v1)
        # F: DUr slice now + [optional one of (sUnUz|lAr|yUm|sUn|yUz)]
        # then REQUIRED ymUs — 'bilmişlerdir' strips dir, then ler+miş
        if _tr_mark_DUr(t):
            t.bra = t.c
            t.slice_del()
            v9 = t.save()
            t.ket = t.c
            (
                _tr_try(t, _tr_mark_sUnUz)
                or _tr_try(t, _tr_mark_lAr)
                or _tr_try(t, _tr_mark_yUm)
                or _tr_try(t, _tr_mark_sUn)
                or _tr_try(t, _tr_mark_yUz)
            )
            if not _tr_try(t, _tr_mark_ymUs):
                t.restore(v9)
                t.ket = t.c
            break
        return  # nothing matched
    t.bra = t.c
    t.slice_del()


def _tr_ki_chain(t: _TrState) -> bool:
    """stem_suffix_chain_before_ki (recursive; slices persist even when
    a deeper link fails — only the cursor rolls back)."""
    t.ket = t.c
    if not _tr_mark_ki(t):
        return False
    v1 = t.save()
    # DA + ki
    if _tr_try(t, _tr_mark_DA):
        t.bra = t.c
        t.slice_del()
        v2 = t.save()
        t.ket = t.c
        if _tr_try(t, _tr_mark_lAr):
            t.bra = t.c
            t.slice_del()
            v4 = t.save()
            if not _tr_ki_chain(t):
                t.restore(v4)
        elif _tr_try(t, _tr_mark_possessives):
            t.bra = t.c
            t.slice_del()
            v5 = t.save()
            t.ket = t.c
            if _tr_try(t, _tr_mark_lAr):
                t.bra = t.c
                t.slice_del()
                if not _tr_ki_chain(t):
                    t.restore(v5)
            else:
                t.restore(v5)
        else:
            t.restore(v2)
        return True
    t.restore(v1)
    # nUn + ki
    if _tr_try(t, _tr_mark_nUn):
        t.bra = t.c
        t.slice_del()
        v6 = t.save()
        t.ket = t.c
        if _tr_try(t, _tr_mark_lArI):
            t.bra = t.c
            t.slice_del()
        else:
            done = False
            v7 = t.save()
            t.ket = t.c
            if _tr_try(t, _tr_mark_possessives) or _tr_try(t, _tr_mark_sU):
                t.bra = t.c
                t.slice_del()
                v9 = t.save()
                t.ket = t.c
                if _tr_try(t, _tr_mark_lAr):
                    t.bra = t.c
                    t.slice_del()
                    if not _tr_ki_chain(t):
                        t.restore(v9)
                else:
                    t.restore(v9)
                done = True
            if not done:
                t.restore(v7)
                if not _tr_ki_chain(t):
                    t.restore(v6)
        return True
    t.restore(v1)
    # ndA + ki
    if not _tr_mark_ndA(t):
        return False
    v10 = t.save()
    if _tr_try(t, _tr_mark_lArI):
        t.bra = t.c
        t.slice_del()
        return True
    t.restore(v10)
    if _tr_try(t, _tr_mark_sU):
        t.bra = t.c
        t.slice_del()
        v11 = t.save()
        t.ket = t.c
        if _tr_try(t, _tr_mark_lAr):
            t.bra = t.c
            t.slice_del()
            if not _tr_ki_chain(t):
                t.restore(v11)
        else:
            t.restore(v11)
        return True
    t.restore(v10)
    return _tr_ki_chain(t)


def _tr_noun_suffixes(t: _TrState) -> None:  # noqa: C901 — mirrors the chain
    v1 = t.save()

    def opt_lar_ki(vk: int) -> None:
        """the recurring [ket; lAr → slice; ki-chain REQUIRED else
        cursor-restore] coda (slices persist)."""
        t.ket = t.c
        if _tr_try(t, _tr_mark_lAr):
            t.bra = t.c
            t.slice_del()
            if not _tr_ki_chain(t):
                t.restore(vk)
        else:
            t.restore(vk)

    # 1: lAr + optional ki-chain
    t.ket = t.c
    if _tr_try(t, _tr_mark_lAr):
        t.bra = t.c
        t.slice_del()
        v2 = t.save()
        if not _tr_ki_chain(t):
            t.restore(v2)
        return
    t.restore(v1)
    # 2: ncA + optional continuations
    t.ket = t.c
    if _tr_try(t, _tr_mark_ncA):
        t.bra = t.c
        t.slice_del()
        v3 = t.save()
        t.ket = t.c
        if _tr_try(t, _tr_mark_lArI):
            t.bra = t.c
            t.slice_del()
        else:
            t.restore(v3)
            t.ket = t.c
            if _tr_try(t, _tr_mark_possessives) or _tr_try(t, _tr_mark_sU):
                t.bra = t.c
                t.slice_del()
                v6 = t.save()
                opt_lar_ki(v6)
            else:
                t.restore(v3)
                t.ket = t.c
                if _tr_try(t, _tr_mark_lAr):
                    t.bra = t.c
                    t.slice_del()
                    if not _tr_ki_chain(t):
                        t.restore(v3)
                else:
                    t.restore(v3)
        return
    t.restore(v1)
    # 3: (ndA|nA) + {lArI | sU [+lAr+ki] | ki-chain}
    t.ket = t.c
    if _tr_try(t, _tr_mark_ndA) or _tr_try(t, _tr_mark_nA):
        v8 = t.save()
        if _tr_try(t, _tr_mark_lArI):
            t.bra = t.c
            t.slice_del()
            return
        t.restore(v8)
        if _tr_try(t, _tr_mark_sU):
            t.bra = t.c
            t.slice_del()
            v9 = t.save()
            opt_lar_ki(v9)
            return
        t.restore(v8)
        if _tr_ki_chain(t):
            return
    t.restore(v1)
    # 4: (ndAn|nU) + {sU [+lAr+ki] | lArI}
    t.ket = t.c
    if _tr_try(t, _tr_mark_ndAn) or _tr_try(t, _tr_mark_nU):
        v11 = t.save()
        if _tr_try(t, _tr_mark_sU):
            t.bra = t.c
            t.slice_del()
            v12 = t.save()
            opt_lar_ki(v12)
            return
        t.restore(v11)
        if _tr_mark_lArI(t):
            t.bra = t.c
            t.slice_del()
            return
    t.restore(v1)
    # 5: DAn (slice) + optional {possessives [+lAr+ki] | lAr [+ki] | ki}
    t.ket = t.c
    if _tr_try(t, _tr_mark_DAn):
        t.bra = t.c
        t.slice_del()
        v13 = t.save()
        t.ket = t.c
        if _tr_try(t, _tr_mark_possessives):
            t.bra = t.c
            t.slice_del()
            v15 = t.save()
            opt_lar_ki(v15)
        elif _tr_try(t, _tr_mark_lAr):
            t.bra = t.c
            t.slice_del()
            v16 = t.save()
            if not _tr_ki_chain(t):
                t.restore(v16)
        elif not _tr_ki_chain(t):
            t.restore(v13)
        return
    t.restore(v1)
    # 6: (nUn|ylA) slice + optional {lAr+ki | (poss|sU) [+lAr+ki] | ki}
    t.ket = t.c
    if _tr_try(t, _tr_mark_nUn) or _tr_try(t, _tr_mark_ylA):
        t.bra = t.c
        t.slice_del()
        v18 = t.save()
        done = False
        v19 = t.save()
        t.ket = t.c
        if _tr_try(t, _tr_mark_lAr):
            t.bra = t.c
            t.slice_del()
            if _tr_ki_chain(t):
                done = True
            else:
                t.restore(v19)
        if not done:
            t.restore(v19)
            t.ket = t.c
            if _tr_try(t, _tr_mark_possessives) or _tr_try(t, _tr_mark_sU):
                t.bra = t.c
                t.slice_del()
                v21 = t.save()
                opt_lar_ki(v21)
                done = True
            if not done:
                t.restore(v19)
                if not _tr_ki_chain(t):
                    t.restore(v18)
        return
    t.restore(v1)
    # 7: lArI
    t.ket = t.c
    if _tr_try(t, _tr_mark_lArI):
        t.bra = t.c
        t.slice_del()
        return
    t.restore(v1)
    # 8: bare ki-chain
    if _tr_ki_chain(t):
        return
    t.restore(v1)
    # 9: (DA|yU|yA) slice + optional {poss [+lAr] | lAr} + ki
    t.ket = t.c
    if (
        _tr_try(t, _tr_mark_DA)
        or _tr_try(t, _tr_mark_yU)
        or _tr_try(t, _tr_mark_yA)
    ):
        t.bra = t.c
        t.slice_del()
        v23 = t.save()
        t.ket = t.c
        matched = False
        if _tr_try(t, _tr_mark_possessives):
            t.bra = t.c
            t.slice_del()
            v25 = t.save()
            t.ket = t.c
            if not _tr_try(t, _tr_mark_lAr):
                t.restore(v25)
            matched = True
        elif _tr_try(t, _tr_mark_lAr):
            matched = True
        if matched:
            t.bra = t.c
            t.slice_del()
            t.ket = t.c
            if not _tr_ki_chain(t):
                t.restore(v23)
        else:
            t.restore(v23)
        return
    t.restore(v1)
    # 10: (possessives|sU) slice + optional lAr+ki
    t.ket = t.c
    if _tr_try(t, _tr_mark_possessives) or _tr_try(t, _tr_mark_sU):
        t.bra = t.c
        t.slice_del()
        v27 = t.save()
        opt_lar_ki(v27)


def _tr_post_last_consonant(t: _TrState) -> None:
    t.c = len(t.s)
    t.ket = t.c
    for suf, rep in (("b", "p"), ("c", "ç"), ("d", "t"), ("ğ", "k")):
        v = t.save()
        if t.eq(suf):
            t.bra = t.c
            t.slice_from(rep)
            return
        t.restore(v)


def _tr_append_U(t: _TrState) -> None:
    s = t.s
    if not s.endswith(("d", "g")):
        return
    lv = None
    for i in range(len(s) - 1, -1, -1):
        if s[i] in _TR_V:
            lv = s[i]
            break
    if lv in ("a", "ı"):
        t.s = s + "ı"
    elif lv in ("e", "i"):
        t.s = s + "i"
    elif lv in ("o", "u"):
        t.s = s + "u"
    elif lv in ("ö", "ü"):
        t.s = s + "ü"
    t.c = len(t.s)


def turkish_snowball_stem(term: str) -> str:
    # more_than_one_syllable_word: at least two vowels
    if sum(1 for ch in term if ch in _TR_V) < 2:
        return term
    t = _TrState(term)
    v1 = t.save()
    _tr_nominal_verb(t)
    t.restore(v1)
    # a plural verb ending stops ALL further stemming — including the
    # postlude — but the deletion itself stands (the filter takes the
    # buffer regardless of stem()'s boolean)
    if not t.cont:
        return t.s
    v2 = t.save()
    _tr_noun_suffixes(t)
    t.restore(v2)
    # postlude: reserved words abort BEFORE the vowel/consonant fixes —
    # SnowballFilter ignores stem()'s boolean, so the suffix-stripped
    # form still wins (SnowballFilter.java:91-95 takes the buffer
    # unconditionally)
    if t.s in ("ad", "soyad"):
        return t.s
    _tr_append_U(t)
    _tr_post_last_consonant(t)
    return t.s


# ---------------------------------------------------------------------------
# Lovins (snowballstem.org lovins; generated form at
# org/tartarus/snowball/ext/LovinsStemmer.java) — the classic 1968
# Lovins English stemmer, exposed via
# SnowballPorterFilterFactory(language=Lovins). One longest-match pass
# over 294 endings, each gated by one of 29 published context
# conditions (a failed condition falls back to shorter endings — they
# are METHOD conditions inside the among); then undouble and a 35-rule
# respell pass whose conditions do NOT fall back.
# ---------------------------------------------------------------------------

_LOVINS_ENDINGS = [('alistically', 'r_B'), ('izationally', 'r_B'), ('arizability', 'r_A'), ('arisations', 'r_A'), ('arizations', 'r_A'), ('antialness', 'r_A'), ('entialness', 'r_A'), ('entialize', 'r_A'), ('izational', 'r_A'), ('entiation', 'r_A'), ('arisation', 'r_A'), ('arization', 'r_A'), ('entations', 'r_A'), ('eableness', 'r_E'), ('ativeness', 'r_A'), ('ionalness', 'r_A'), ('itousness', 'r_A'), ('antaneous', 'r_A'), ('allically', 'r_C'), ('istically', 'r_A'), ('ationally', 'r_B'), ('antiality', 'r_A'), ('entiality', 'r_A'), ('izability', 'r_A'), ('arizable', 'r_A'), ('ionalize', 'r_A'), ('ionalism', 'r_A'), ('entation', 'r_A'), ('izations', 'r_A'), ('ableness', 'r_A'), ('ibleness', 'r_A'), ('icalness', 'r_A'), ('lessness', 'r_A'), ('eousness', 'r_A'), ('iousness', 'r_A'), ('entially', 'r_A'), ('ionality', 'r_A'), ('alistic', 'r_B'), ('aristic', 'r_A'), ('ivistic', 'r_A'), ('elihood', 'r_E'), ('encible', 'r_A'), ('entiate', 'r_A'), ('icalize', 'r_A'), ('arizing', 'r_A'), ('istical', 'r_A'), ('ational', 'r_B'), ('icalism', 'r_A'), ('ativism', 'r_A'), ('ication', 'r_G'), ('ination', 'r_A'), ('isation', 'r_A'), ('ization', 'r_F'), ('alities', 'r_A'), ('ivities', 'r_A'), ('entials', 'r_A'), ('ateness', 'r_A'), ('iteness', 'r_A'), ('iveness', 'r_A'), ('ingness', 'r_A'), ('ishness', 'r_A'), ('ariness', 'r_E'), ('fulness', 'r_A'), ('ousness', 'r_A'), ('entness', 'r_A'), ('izement', 'r_A'), ('icalist', 'r_A'), ('atively', 'r_A'), ('atingly', 'r_A'), ('aically', 'r_A'), ('oidally', 'r_A'), ('ionally', 'r_A'), ('entally', 'r_A'), ('icianry', 'r_A'), ('icality', 'r_A'), ('ability', 'r_A'), ('ibility', 'r_A'), ('arized', 'r_A'), ('icance', 'r_A'), ('atable', 'r_A'), ('izable', 'r_E'), ('eature', 'r_Z'), ('ionate', 'r_D'), ('ialize', 'r_A'), ('ancing', 'r_B'), ('encing', 'r_A'), ('ioning', 'r_A'), ('enting', 'r_C'), ('ancial', 'r_A'), ('ential', 'r_A'), ('oidism', 'r_A'), ('action', 'r_G'), ('ariser', 'r_A'), ('arizer', 'r_A'), ('istics', 'r_A'), ('ancies', 'r_A'), ('encies', 'r_A'), ('nesses', 'r_A'), ('atives', 'r_A'), ('ionals', 'r_A'), ('icians', 'r_A'), ('ations', 'r_B'), ('alness', 'r_A'), ('icists', 'r_A'), ('aceous', 'r_A'), ('acious', 'r_B'), ('ialist', 'r_A'), ('ionist', 'r_A'), ('entist', 'r_A'), ('ically', 'r_A'), ('efully', 'r_A'), ('ifully', 'r_A'), ('lessly', 'r_A'), ('eously', 'r_A'), ('iously', 'r_A'), ('iality', 'r_A'), ('allic', 'r_BB'), ('antic', 'r_C'), ('istic', 'r_A'), ('anced', 'r_B'), ('enced', 'r_A'), ('ished', 'r_A'), ('ioned', 'r_A'), ('ented', 'r_C'), ('aroid', 'r_A'), ('ehood', 'r_A'), ('ihood', 'r_A'), ('icide', 'r_A'), ('otide', 'r_A'), ('idine', 'r_I'), ('ature', 'r_E'), ('inate', 'r_A'), ('ative', 'r_A'), ('alize', 'r_A'), ('arize', 'r_A'), ('aging', 'r_B'), ('ening', 'r_E'), ('ating', 'r_I'), ('izing', 'r_F'), ('aical', 'r_A'), ('oidal', 'r_A'), ('arial', 'r_A'), ('ional', 'r_A'), ('ental', 'r_A'), ('icism', 'r_A'), ('alism', 'r_B'), ('inism', 'r_J'), ('ician', 'r_A'), ('ation', 'r_B'), ('ances', 'r_B'), ('ences', 'r_A'), ('oides', 'r_A'), ('acies', 'r_A'), ('aries', 'r_A'), ('ities', 'r_A'), ('izers', 'r_F'), ('ators', 'r_A'), ('eless', 'r_A'), ('eness', 'r_E'), ('iness', 'r_A'), ('itous', 'r_A'), ('icant', 'r_A'), ('ement', 'r_A'), ('icist', 'r_A'), ('alist', 'r_A'), ('iedly', 'r_A'), ('ately', 'r_A'), ('ively', 'r_A'), ('ingly', 'r_B'), ('arily', 'r_A'), ('ially', 'r_A'), ('fully', 'r_A'), ('early', 'r_Y'), ('ously', 'r_A'), ('ently', 'r_A'), ('atory', 'r_A'), ('acity', 'r_A'), ('icity', 'r_A'), ('ality', 'r_A'), ('elity', 'r_A'), ('inity', 'r_CC'), ('arity', 'r_B'), ('ivity', 'r_A'), ('aric', 'r_A'), ('atic', 'r_B'), ('itic', 'r_H'), ('ened', 'r_E'), ('ated', 'r_I'), ('ized', 'r_F'), ('hood', 'r_A'), ('ward', 'r_A'), ('ance', 'r_B'), ('ence', 'r_A'), ('able', 'r_A'), ('ible', 'r_A'), ('wise', 'r_A'), ('ying', 'r_B'), ('yish', 'r_A'), ('ical', 'r_A'), ('eful', 'r_A'), ('iful', 'r_A'), ('ogen', 'r_A'), ('izer', 'r_F'), ('ator', 'r_A'), ('ides', 'r_L'), ('ages', 'r_B'), ('ines', 'r_M'), ('ates', 'r_A'), ('ings', 'r_N'), ('ials', 'r_A'), ('isms', 'r_B'), ('ians', 'r_A'), ('ions', 'r_B'), ('iers', 'r_A'), ('less', 'r_A'), ('ness', 'r_A'), ('ants', 'r_B'), ('ists', 'r_A'), ('eous', 'r_A'), ('ious', 'r_A'), ('ancy', 'r_B'), ('ency', 'r_A'), ('ealy', 'r_Y'), ('ably', 'r_A'), ('ibly', 'r_A'), ('edly', 'r_E'), ('lily', 'r_A'), ('ally', 'r_B'), ('enly', 'r_E'), ('arly', 'r_K'), ('eity', 'r_A'), ('ata', 'r_A'), ('aic', 'r_A'), ('ied', 'r_A'), ('oid', 'r_A'), ('ide', 'r_L'), ('age', 'r_B'), ('ene', 'r_E'), ('ine', 'r_M'), ('one', 'r_R'), ('ese', 'r_A'), ('ate', 'r_A'), ('ite', 'r_AA'), ('ive', 'r_A'), ('ize', 'r_F'), ('ing', 'r_N'), ('ish', 'r_C'), ('eal', 'r_Y'), ('ial', 'r_A'), ('ful', 'r_A'), ('ism', 'r_B'), ('ium', 'r_A'), ('ian', 'r_A'), ('ion', 'r_Q'), ('ear', 'r_Y'), ('ier', 'r_A'), ('ics', 'r_A'), ('ies', 'r_P'), ('als', 'r_BB'), ('ars', 'r_O'), ('ous', 'r_A'), ('ant', 'r_B'), ('ent', 'r_C'), ('ist', 'r_A'), ('acy', 'r_A'), ('ely', 'r_E'), ('ily', 'r_A'), ('ary', 'r_F'), ('ery', 'r_E'), ('ity', 'r_A'), ("s'", 'r_A'), ('ia', 'r_A'), ('ic', 'r_A'), ('ed', 'r_E'), ('ae', 'r_A'), ('al', 'r_BB'), ('yl', 'r_R'), ('um', 'r_U'), ('en', 'r_F'), ('on', 'r_S'), ('ar', 'r_X'), ('or', 'r_T'), ("'s", 'r_A'), ('as', 'r_B'), ('es', 'r_E'), ('is', 'r_A'), ('us', 'r_V'), ('ly', 'r_B'), ('a', 'r_A'), ('e', 'r_A'), ('i', 'r_A'), ('o', 'r_A'), ('s', 'r_W'), ('y', 'r_B')]


def _lov_cond(cond: str, st: str) -> bool:  # noqa: C901 — the 29 conditions
    p = len(st)
    if cond == "r_A":
        return p >= 2
    if cond == "r_B":
        return p >= 3
    if cond == "r_C":
        return p >= 4
    if cond == "r_D":
        return p >= 5
    if cond == "r_E":
        return p >= 2 and not st.endswith("e")
    if cond == "r_F":
        return p >= 3 and not st.endswith("e")
    if cond == "r_G":
        return p >= 3 and st.endswith("f")
    if cond == "r_H":
        return p >= 2 and (st.endswith("t") or st.endswith("ll"))
    if cond == "r_I":
        return p >= 2 and not st.endswith(("o", "e"))
    if cond == "r_J":
        return p >= 2 and not st.endswith(("a", "e"))
    if cond == "r_K":
        return p >= 3 and (
            st.endswith(("l", "i"))
            or (st.endswith("e") and p >= 3 and st[p - 3] == "u")
        )
    if cond == "r_L":
        if p < 2 or st.endswith(("u", "x")):
            return False
        return not (st.endswith("s") and not st.endswith("os"))
    if cond == "r_M":
        return p >= 2 and not st.endswith(("a", "c", "e", "m"))
    if cond == "r_N":
        return p >= 3 and (st[p - 3] != "s" or p >= 4)
    if cond == "r_O":
        return p >= 2 and st.endswith(("l", "i"))
    if cond == "r_P":
        return p >= 2 and not st.endswith("c")
    if cond == "r_Q":
        return p >= 3 and not st.endswith(("l", "n"))
    if cond == "r_R":
        return p >= 2 and st.endswith(("n", "r"))
    if cond == "r_S":
        return p >= 2 and (
            st.endswith("dr") or (st.endswith("t") and not st.endswith("tt"))
        )
    if cond == "r_T":
        return p >= 2 and (
            st.endswith("s") or (st.endswith("t") and not st.endswith("ot"))
        )
    if cond == "r_U":
        return p >= 2 and st.endswith(("l", "m", "n", "r"))
    if cond == "r_V":
        return p >= 2 and st.endswith("c")
    if cond == "r_W":
        return p >= 2 and not st.endswith(("s", "u"))
    if cond == "r_X":
        return p >= 2 and (
            st.endswith(("l", "i"))
            or (st.endswith("e") and p >= 3 and st[p - 3] == "u")
        )
    if cond == "r_Y":
        return p >= 2 and st.endswith("in")
    if cond == "r_Z":
        return p >= 2 and not st.endswith("f")
    if cond == "r_AA":
        return p >= 2 and st.endswith(
            ("d", "f", "ph", "th", "l", "er", "or", "es", "t")
        )
    if cond == "r_BB":
        return p >= 3 and not st.endswith(("met", "ryst"))
    if cond == "r_CC":
        return p >= 2 and st.endswith("l")
    raise ValueError(cond)


_LOVINS_RESPELL = [
    ("iev", "ief", None), ("uct", "uc", None), ("umpt", "um", None),
    ("rpt", "rb", None), ("urs", "ur", None), ("istr", "ister", None),
    ("metr", "meter", None), ("olv", "olut", None),
    ("ul", "l", ("a", "i", "o")), ("bex", "bic", None),
    ("dex", "dic", None), ("pex", "pic", None), ("tex", "tic", None),
    ("ax", "ac", None), ("ex", "ec", None), ("ix", "ic", None),
    ("lux", "luc", None), ("uad", "uas", None), ("vad", "vas", None),
    ("cid", "cis", None), ("lid", "lis", None), ("erid", "eris", None),
    ("pand", "pans", None), ("end", "ens", ("s",)), ("ond", "ons", None),
    ("lud", "lus", None), ("rud", "rus", None),
    ("her", "hes", ("p", "t")), ("mit", "mis", None),
    ("ent", "ens", ("m",)), ("ert", "ers", None), ("et", "es", ("n",)),
    ("yt", "ys", None), ("yz", "ys", None),
]
_LOVINS_RESPELL.sort(key=lambda e: len(e[0]), reverse=True)


def lovins_stem(term: str) -> str:
    s = term
    # endings: longest match whose condition passes (method fallback)
    for suf, cond in _LOVINS_ENDINGS:
        if s.endswith(suf) and _lov_cond(cond, s[: -len(suf)]):
            s = s[: -len(suf)]
            break
    # undouble
    if len(s) >= 2 and s[-1] == s[-2] and s[-1] in "bdglmnprst":
        s = s[:-1]
    # respell: longest match; a failed context does NOT fall back
    for suf, rep, not_after in _LOVINS_RESPELL:
        if s.endswith(suf):
            st = s[: -len(suf)]
            if not_after is None or not st.endswith(not_after):
                s = st + rep
            break
    return s


# ---------------------------------------------------------------------------
# Kraaij-Pohlmann (snowballstem.org kraaij_pohlmann; generated form at
# org/tartarus/snowball/ext/KpStemmer.java) — the alternative Dutch
# stemmer, exposed via SnowballPorterFilterFactory(language=Kp).
#
# Notable machinery: 'ij' counts as ONE vowel unit in the measure and
# the V/C context tests; deleted endings can trigger vowel
# RE-LENGTHENING (tak→taak) and consonant restoration (ene→ +en,
# ieve→ief); the ge- prefix and -ge- infix are removed with a
# re-measure; a final undoubling pass also devoices lone v→f / z→s.
# ---------------------------------------------------------------------------

_KP_V = frozenset("aeiouy")
_KP_V_WX = frozenset("aeiouywx")
_KP_AOU = frozenset("aou")
_KP_AIOU = frozenset("aiou")


def _kp_measure(s: str) -> tuple[int, int]:
    n = len(s)
    i = 0
    p1 = p2 = n

    def vowel_run(i):
        cnt = 0
        while i < n:
            if s[i : i + 2] == "ij":
                i += 2
            elif s[i] in _KP_V:
                i += 1
            else:
                break
            cnt += 1
        return i, cnt

    while i < n and s[i] not in _KP_V:
        i += 1
    i, c1 = vowel_run(i)
    if c1 >= 1 and i < n and s[i] not in _KP_V:
        i += 1
        p1 = i
        while i < n and s[i] not in _KP_V:
            i += 1
        i, c2 = vowel_run(i)
        if c2 >= 1 and i < n and s[i] not in _KP_V:
            p2 = i + 1
    return p1, p2


def _kp_V(s, c):
    return c >= 1 and (s[c - 1] in _KP_V or s[max(0, c - 2) : c] == "ij")


def _kp_VX(s, c):
    return c >= 2 and (s[c - 2] in _KP_V or s[max(0, c - 3) : c - 1] == "ij")


def _kp_C(s, c):
    return c >= 1 and s[max(0, c - 2) : c] != "ij" and s[c - 1] not in _KP_V


def _kp_lengthen_V(s: str, c: int) -> str:
    """Double a short a/o/u (or guarded e) before the final consonant
    of the stem ending at position c (never fails; returns the new
    string — the caller's cursor is end-relative and unaffected)."""
    if c < 1 or s[c - 1] in _KP_V_WX:
        return s
    if c >= 2 and s[c - 2] in _KP_AOU:
        if (c - 2 == 0) or (c >= 3 and s[c - 3] not in _KP_V):
            return s[: c - 1] + s[c - 2] + s[c - 1 :]
        return s
    if c >= 2 and s[c - 2] == "e":
        # the e must sit after a consonant (CONSUMED — the later guards
        # shift one position left) or at the word start
        if c - 2 > 0:
            if s[c - 3] in _KP_V:
                return s
            if c >= 4 and s[c - 4] in _KP_AIOU:
                return s
            if c >= 6 and s[c - 5] in _KP_AIOU and s[c - 6] not in _KP_V:
                return s
        return s[: c - 1] + "e" + s[c - 1 :]
    return s


def kraaij_pohlmann_stem(term: str) -> str:  # noqa: C901 — mirrors the steps
    # y marking: initial y and y-after-vowel become consonant Y
    chars = list(term)
    y_found = False
    if chars and chars[0] == "y":
        chars[0] = "Y"
        y_found = True
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _KP_V:
            chars[i] = "Y"
            y_found = True
    s = "".join(chars)
    p = list(_kp_measure(s))  # [p1, p2], re-measured after ge-removal

    def r1(pos):
        return pos >= p[0]

    def r2(pos):
        return pos >= p[1]

    stemmed = False
    ge_removed = False

    def step1() -> bool:
        nonlocal s
        for suf, case in (
            ("nde", 7), ("ies", 3), ("aus", 5), ("'s", 1), ("en", 6),
            ("es", 4), ("s", 2),
        ):
            if not s.endswith(suf):
                continue
            st = len(s) - len(suf)
            if case == 1:
                s = s[:st]
                return True
            if case == 2:
                if not r1(st):
                    return False
                if s[:st].endswith("t") and r1(st - 1):
                    return False
                if not _kp_C(s, st):
                    return False
                s = s[:st]
                return True
            if case == 3:
                if not r1(st):
                    return False
                s = s[:st] + "ie"
                return True
            if case == 4:
                if s[:st].endswith("ar") and r1(st - 2) and _kp_C(s, st - 2):
                    s = s[: st - 2]
                    s = _kp_lengthen_V(s, len(s))
                    return True
                if s[:st].endswith("er") and r1(st - 2) and _kp_C(s, st - 2):
                    s = s[: st - 2]
                    return True
                if not (r1(st) and _kp_C(s, st)):
                    return False
                s = s[:st] + "e"
                return True
            if case == 5:
                if not (r1(st) and _kp_V(s, st)):
                    return False
                s = s[:st] + "au"
                return True
            if case == 6:
                st2 = st
                if s[:st2].endswith("hed") and r1(st2 - 3):
                    s = s[: st2 - 3] + "heid"
                    return True
                if s[:st2].endswith("nd"):
                    s = s[:st2]
                    return True
                if s[:st2].endswith("d") and r1(st2 - 1) and _kp_C(s, st2 - 1):
                    s = s[: st2 - 1]
                    return True
                if s[:st2].endswith(("i", "j")) and _kp_V(s, st2 - 1):
                    s = s[:st2]
                    return True
                if not (r1(st2) and _kp_C(s, st2)):
                    return False
                s = s[:st2]
                s = _kp_lengthen_V(s, len(s))
                return True
            if case == 7:
                s = s[:st] + "nd"
                return True
        return False

    def step2() -> bool:
        nonlocal s
        for suf, case in (
            ("ische", 4), ("lijke", 3), ("ieve", 11), ("ene", 10),
            ("de", 5), ("ge", 2), ("je", 1), ("le", 9), ("re", 8),
            ("se", 7), ("te", 6),
        ):
            if not s.endswith(suf):
                continue
            st = len(s) - len(suf)
            if case == 1:
                base = s[:st]
                if base.endswith("'t"):
                    s = base[:-2] + "e"[0:0] + s[st:][2:]  # placeholder
                    s = base[:-2]
                    return True
                if base.endswith("et"):
                    if r1(st - 2) and _kp_C(s, st - 2):
                        s = base[:-2]
                        return True
                    # fall through to shorter alternatives below
                if base.endswith("rnt"):
                    s = base[:-3] + "rn"
                    return True
                if base.endswith("t") and r1(st - 1) and _kp_VX(s, st - 1):
                    s = base[:-1]
                    return True
                if base.endswith("ink"):
                    s = base[:-3] + "ing"
                    return True
                if base.endswith("mp"):
                    s = base[:-2] + "m"
                    return True
                if base.endswith("'"):
                    if r1(st - 1):
                        s = base[:-1]
                        return True
                    return False
                if not (r1(st) and _kp_C(s, st)):
                    return False
                s = base
                return True
            if case == 2:
                if not r1(st):
                    return False
                s = s[:st] + "g"
                return True
            if case == 3:
                if not r1(st):
                    return False
                s = s[:st] + "lijk"
                return True
            if case == 4:
                if not r1(st):
                    return False
                s = s[:st] + "isch"
                return True
            if case == 5:
                if not (r1(st) and _kp_C(s, st)):
                    return False
                s = s[:st]
                return True
            if case == 6:
                if not r1(st):
                    return False
                s = s[:st] + "t"
                return True
            if case == 7:
                if not r1(st):
                    return False
                s = s[:st] + "s"
                return True
            if case == 8:
                if not r1(st):
                    return False
                s = s[:st] + "r"
                return True
            if case == 9:
                if not r1(st):
                    return False
                s = s[:st] + "l"
                s = _kp_lengthen_V(s, len(s))
                return True
            if case == 10:
                if not (r1(st) and _kp_C(s, st)):
                    return False
                s = s[:st] + "en"
                s = _kp_lengthen_V(s, len(s))
                return True
            if case == 11:
                if not (r1(st) and _kp_C(s, st)):
                    return False
                s = s[:st] + "ief"
                return True
        return False

    def step3() -> bool:
        nonlocal s
        for suf, case in (
            ("iteit", 2), ("heid", 3), ("atie", 1), ("isme", 2),
            ("arij", 5), ("erij", 2), ("rder", 4), ("ster", 3),
            ("fie", 6), ("gie", 7), ("ing", 2), ("sel", 3), ("dst", 9),
            ("tst", 8),
        ):
            if not s.endswith(suf):
                continue
            st = len(s) - len(suf)
            if case == 1:
                if not r1(st):
                    return False
                s = s[:st] + "eer"
                return True
            if case == 2:
                if not r1(st):
                    return False
                s = s[:st]
                s = _kp_lengthen_V(s, len(s))
                return True
            if case == 3:
                if not r1(st):
                    return False
                s = s[:st]
                return True
            if case == 4:
                s = s[:st] + "r"
                return True
            if case == 5:
                if not (r1(st) and _kp_C(s, st)):
                    return False
                s = s[:st] + "aar"
                return True
            if case == 6:
                if not r2(st):
                    return False
                s = s[:st] + "f"
                s = _kp_lengthen_V(s, len(s))
                return True
            if case == 7:
                if not r2(st):
                    return False
                s = s[:st] + "g"
                s = _kp_lengthen_V(s, len(s))
                return True
            if case == 8:
                if not (r1(st) and _kp_C(s, st)):
                    return False
                s = s[:st] + "t"
                return True
            if case == 9:
                if not (r1(st) and _kp_C(s, st)):
                    return False
                s = s[:st] + "d"
                return True
        return False

    def step4() -> bool:
        nonlocal s
        for suf, case in (
            ("achtiger", 3), ("achtigst", 3), ("achtig", 3),
            ("ioneel", 1), ("atief", 2), ("eriger", 9), ("erigst", 9),
            ("lijker", 8), ("lijkst", 8), ("erig", 9), ("baar", 3),
            ("laar", 5), ("naar", 4), ("raar", 6), ("tant", 7),
            ("end", 9),
        ):
            if not s.endswith(suf):
                continue
            st = len(s) - len(suf)
            if case == 1:
                if not r1(st):
                    break
                s = s[:st] + "ie"
                return True
            if case == 2:
                if not r1(st):
                    break
                s = s[:st] + "eer"
                return True
            if case == 3:
                if not r1(st):
                    break
                s = s[:st]
                return True
            if case == 4:
                if not (r1(st) and _kp_V(s, st)):
                    break
                s = s[:st] + "n"
                return True
            if case == 5:
                if not (r1(st) and _kp_V(s, st)):
                    break
                s = s[:st] + "l"
                return True
            if case == 6:
                if not (r1(st) and _kp_V(s, st)):
                    break
                s = s[:st] + "r"
                return True
            if case == 7:
                if not r1(st):
                    break
                s = s[:st] + "teer"
                return True
            if case == 8:
                if not r1(st):
                    break
                s = s[:st] + "lijk"
                return True
            if case == 9:
                if not (r1(st) and _kp_C(s, st)):
                    break
                s = s[:st]
                s = _kp_lengthen_V(s, len(s))
                return True
            break
        # second chance: the ig family
        for suf in ("iger", "igst", "ig"):
            if s.endswith(suf):
                st = len(s) - len(suf)
                if not (r1(st) and _kp_C(s, st)):
                    return False
                s = s[:st]
                s = _kp_lengthen_V(s, len(s))
                return True
        return False

    def step7() -> bool:
        nonlocal s
        for suf, rep in (("kt", "k"), ("ft", "f"), ("pt", "p")):
            if s.endswith(suf):
                s = s[: -len(suf)] + rep
                return True
        return False

    def step6() -> bool:
        nonlocal s
        for suf, rep in (
            ("vv", "v"), ("zz", "z"), ("bb", "b"), ("cc", "c"),
            ("dd", "d"), ("ff", "f"), ("gg", "g"), ("hh", "h"),
            ("jj", "j"), ("kk", "k"), ("ll", "l"), ("mm", "m"),
            ("nn", "n"), ("pp", "p"), ("qq", "q"), ("rr", "r"),
            ("ss", "s"), ("tt", "t"), ("ww", "w"), ("xx", "x"),
            ("v", "f"), ("z", "s"),
        ):
            if s.endswith(suf):
                s = s[: -len(suf)] + rep
                return True
        return False

    def step1c() -> bool:
        nonlocal s
        for suf, case in (("d", 1), ("t", 2)):
            if not s.endswith(suf):
                continue
            st = len(s) - 1
            if not (r1(st) and _kp_C(s, st)):
                return False
            if case == 1:
                if s[:st].endswith("n") and r1(st - 1):
                    return False
            else:
                if s[:st].endswith("h") and r1(st - 1):
                    return False
            s = s[:st]
            return True
        return False

    def lose_prefix() -> bool:
        nonlocal s, ge_removed
        if not s.startswith("ge") or len(s) < 5:
            return False
        rest = s[2:]
        vi = next((k for k, ch in enumerate(rest) if ch in _KP_V), None)
        if vi is None:
            return False
        if not any(ch not in _KP_V for ch in rest[vi:]):
            return False
        ge_removed = True
        s = rest
        return True

    def lose_infix() -> bool:
        nonlocal s, ge_removed
        gi = s.find("ge", 1)
        if gi < 0:
            return False
        if len(s) - (gi + 2) < 3:
            return False
        rest = s[gi + 2 :]
        vi = next((k for k, ch in enumerate(rest) if ch in _KP_V), None)
        if vi is None:
            return False
        if not any(ch not in _KP_V for ch in rest[vi:]):
            return False
        ge_removed = True
        s = s[:gi] + rest
        return True

    if step1():
        stemmed = True
    if step2():
        stemmed = True
    if step3():
        stemmed = True
    if step4():
        stemmed = True
    ge_removed = False
    if lose_prefix():
        p[:] = _kp_measure(s)
    if ge_removed:
        step1c()
    ge_removed = False
    if lose_infix():
        p[:] = _kp_measure(s)
    if ge_removed:
        step1c()
    if step7():
        stemmed = True
    if stemmed or ge_removed:
        step6()
    if y_found:
        s = s.replace("Y", "y")
    return s
