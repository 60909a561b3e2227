"""UniNE "light" stemmers + language normalizers (pure Python).

Re-expresses the reference's light language-analysis kernels — the
algorithms are published (Jacques Savoy, *Light Stemming Approaches for
the French, Portuguese, German and Hungarian Languages*, ACM SAC 2006,
and *Report on CLEF-2001 Experiments*; reference code at
members.unine.ch/jacques.savoy/clef/):

- ``german_light_stem`` — ``analysis/common/.../de/GermanLightStemmer.java``
  (vowel-accent fold + two plural/inflection suffix steps);
- ``german_normalize`` — ``de/GermanNormalizationFilter.java`` (the
  Snowball *german2* heuristic: ß→ss, umlaut fold, and ae/oe/ue → a/o/u
  via a 3-state FSM that protects ``que``/``aue``-style sequences);
- ``french_light_stem`` — ``fr/FrenchLightStemmer.java`` (full UniNE
  rule cascade + ``norm()`` repeated-letter dedup and final truncation);
- ``french_elide`` — ``util/ElisionFilter.java`` with
  ``fr/FrenchAnalyzer.java:56-62``'s default article set (l', qu', …)
  and ``it/ItalianAnalyzer.java:48-54``'s Italian set;
- ``spanish_light_stem`` — ``es/SpanishLightStemmer.java``;
- ``italian_light_stem`` — ``it/ItalianLightStemmer.java``;
- ``portuguese_light_stem`` — ``pt/PortugueseLightStemmer.java``;
- ``swedish_light_stem`` — ``sv/SwedishLightStemmer.java`` (CLEF-2003);
- ``hungarian_light_stem`` — ``hu/HungarianLightStemmer.java``;
- ``russian_light_stem`` — ``ru/RussianLightStemmer.java`` (Dolamic &
  Savoy, *Indexing and Searching Strategies for the Russian Language*);
- ``finnish_light_stem`` — ``fi/FinnishLightStemmer.java`` (CLEF-2003);
- ``norwegian_light_stem`` — ``no/NorwegianLightStemmer.java``
  (BOKMAAL/NYNORSK flag parity).

Parity contract: ``tests/test_light_stemmers.py`` diffs every function
against the reference's own published vocabulary expectations
(``delight.txt`` 35,033 pairs, ``frlight.txt`` 20,403, ``eslight.txt``
28,377, ``itlight.txt`` 35,494, ``ptlight.txt`` 32,016, ``svlight.txt``
30,623, ``hulight.txt`` 30,000, ``rulight.txt`` 49,673, ``filight.txt``
50,000 — 311,619 total — plus the hand-crafted ``nb_light.txt`` /
``nn_light.txt`` Norwegian files) and the inline ``checkOneTerm``
goldens from the reference test classes, fuzzes ``german_normalize``
against the regex-chain decomposition used by the DuckDB oracle gate,
and re-verifies every ``*_SQL`` twin below against the same
vocabularies in DuckDB itself.

All functions take and return ``str`` and are applied once per DISTINCT
term via dictionary-encode in the batch tokenizer (the Porter pattern),
so none of them adds per-token Python to the hot path.
"""

from __future__ import annotations

import re

__all__ = [
    "german_light_stem",
    "german_normalize",
    "german_normalize_regex",
    "french_light_stem",
    "french_elide",
    "spanish_light_stem",
    "FRENCH_ARTICLES",
    "ELISION_REGEX",
    "STEMMERS",
    "resolve",
    "elision_regex",
    "FRENCH_STOP_WORDS",
    "GERMAN_STOP_WORDS",
    "SPANISH_STOP_WORDS",
    "italian_light_stem",
    "portuguese_light_stem",
    "swedish_light_stem",
    "hungarian_light_stem",
    "russian_light_stem",
    "finnish_light_stem",
    "norwegian_light_stem",
    "ITALIAN_ARTICLES",
    "ITALIAN_STOP_WORDS",
    "IRISH_ARTICLES",
    "IRISH_HYPHENATIONS",
    "IRISH_STOP_WORDS",
    "IRISH_LOWER_SQL",
    "irish_lower",
    "TURKISH_STOP_WORDS",
    "TURKISH_FOLD_SQL",
    "turkish_lower",
    "apostrophe_strip",
    "PORTUGUESE_STOP_WORDS",
    "RUSSIAN_STOP_WORDS",
    "FINNISH_STOP_WORDS",
    "SWEDISH_STOP_WORDS",
    "HUNGARIAN_STOP_WORDS",
]

# ---------------------------------------------------------------------------
# German — GermanLightStemmer.java (UniNE SAC-2006 German light)
# ---------------------------------------------------------------------------

_DE_FOLD = str.maketrans(
    "äàáâöòóôïìíîüùúû",
    "aaaaooooiiiiuuuu",
)

#: consonants that may precede a dropped 's'/'st' (stEnding)
_DE_ST = frozenset("bdfghklmnt")


def german_light_stem(term: str) -> str:
    """GermanLightStemmer.stem: fold accented vowels, then drop plural /
    case suffixes in two ordered first-match-wins steps."""
    s = term.translate(_DE_FOLD)
    n = len(s)
    # step 1 (GermanLightStemmer.java:115-133)
    if n > 5 and s.endswith("ern"):
        n -= 3
    elif n > 4 and s[n - 2] == "e" and s[n - 1] in "mnrs":
        n -= 2
    elif n > 3 and s[n - 1] == "e":
        n -= 1
    elif n > 3 and s[n - 1] == "s" and s[n - 2] in _DE_ST:
        n -= 1
    # step 2 (:135-143) on the step-1 stem
    if n > 5 and s[n - 3 : n] == "est":
        n -= 3
    elif n > 4 and s[n - 2] == "e" and s[n - 1] in "rn":
        n -= 2
    elif n > 4 and s[n - 2 : n] == "st" and s[n - 3] in _DE_ST:
        n -= 2
    return s[:n]


def german_normalize(term: str) -> str:
    """GermanNormalizationFilter: ß→ss; ä/ö/ü→a/o/u; drop 'e' of ae/oe
    and of ue-not-after-vowel/q — the 3-state FSM (N/V/U) verbatim from
    ``de/GermanNormalizationFilter.java:41-103``."""
    N, V, U = 0, 1, 2
    state = N
    out: list[str] = []
    for c in term:
        if c in "ao":
            out.append(c)
            state = U
        elif c == "u":
            out.append(c)
            state = U if state == N else V
        elif c == "e":
            if state != U:
                out.append(c)
            state = V
        elif c in "iqy":
            out.append(c)
            state = V
        elif c == "ä":
            out.append("a")
            state = V
        elif c == "ö":
            out.append("o")
            state = V
        elif c == "ü":
            out.append("u")
            state = V
        elif c == "ß":
            out.append("ss")
            state = N
        else:
            out.append(c)
            state = N
    return "".join(out)


# The SQL-expressible decomposition of the FSM, used by the DuckDB
# oracle gate and fuzz-verified equivalent in tests: because deletions
# only ever remove 'e' and every rule's context survives the other
# rule's deletions, the FSM factors into two sequential global regex
# passes over the ß-expanded string, folding umlauts last.
_DE_NORM_AOE = re.compile(r"([ao])e")
_DE_NORM_UE = re.compile(r"(^|[^aeiouqyäöü])ue")
_DE_UMLAUT = str.maketrans("äöü", "aou")


def german_normalize_regex(term: str) -> str:
    """Regex-chain twin of :func:`german_normalize` (the oracle form)."""
    s = term.replace("ß", "ss")
    s = _DE_NORM_AOE.sub(r"\1", s)
    s = _DE_NORM_UE.sub(r"\1u", s)
    return s.translate(_DE_UMLAUT)


# ---------------------------------------------------------------------------
# French — FrenchLightStemmer.java (UniNE SAC-2006 French light)
# ---------------------------------------------------------------------------

_FR_FOLD = str.maketrans("àáâôèéêùûîç", "aaaoeeeuuic")


def _fr_norm(s: list[str]) -> list[str]:
    """FrenchLightStemmer.norm (``fr/FrenchLightStemmer.java:212-257``):
    accent fold + collapse repeated letters (len>4 only), drop trailing
    'ie', then final r/e/e/double-letter truncation (len>4 re-checked
    per the reference's single guard)."""
    if len(s) > 4:
        s = list("".join(s).translate(_FR_FOLD))
        # collapse consecutive equal letters; ch only advances on change
        out: list[str] = [s[0]]
        ch = s[0]
        for c in s[1:]:
            if c == ch and ch.isalpha():
                continue
            out.append(c)
            ch = c
        s = out
    if len(s) > 4 and s[-2] == "i" and s[-1] == "e":
        s = s[:-2]
    if len(s) > 4:
        if s[-1] == "r":
            s = s[:-1]
        if s and s[-1] == "e":
            s = s[:-1]
        if s and s[-1] == "e":
            s = s[:-1]
        if len(s) >= 2 and s[-1] == s[-2] and s[-1].isalpha():
            s = s[:-1]
    return s


def french_light_stem(term: str) -> str:  # noqa: C901 — mirrors the rule list
    """FrenchLightStemmer.stem: the ordered UniNE suffix-rewrite cascade
    (``fr/FrenchLightStemmer.java:63-210``), then :func:`_fr_norm`."""
    s = list(term)

    def ends(suf: str) -> bool:
        return len(s) >= len(suf) and "".join(s[-len(suf) :]) == suf

    if len(s) > 5 and s[-1] == "x":
        if s[-3] == "a" and s[-2] == "u" and s[-4] != "e":
            s[-2] = "l"
        s = s[:-1]
    if len(s) > 3 and s[-1] == "x":
        s = s[:-1]
    if len(s) > 3 and s[-1] == "s":
        s = s[:-1]

    if len(s) > 9 and ends("issement"):
        s = s[:-6]
        s[-1] = "r"
        return "".join(_fr_norm(s))
    if len(s) > 8 and ends("issant"):
        s = s[:-4]
        s[-1] = "r"
        return "".join(_fr_norm(s))
    if len(s) > 6 and ends("ement"):
        s = s[:-4]
        if len(s) > 3 and ends("ive"):
            s = s[:-1]
            s[-1] = "f"
        return "".join(_fr_norm(s))
    if len(s) > 11 and ends("ficatrice"):
        s = s[:-5]
        s[-2] = "e"
        s[-1] = "r"
        return "".join(_fr_norm(s))
    if len(s) > 10 and ends("ficateur"):
        s = s[:-4]
        s[-2] = "e"
        s[-1] = "r"
        return "".join(_fr_norm(s))
    if len(s) > 9 and ends("catrice"):
        s = s[:-3]
        s[-4] = "q"
        s[-3] = "u"
        s[-2] = "e"  # s[-1] already 'r'
        return "".join(_fr_norm(s))
    if len(s) > 8 and ends("cateur"):
        s = s[:-2]
        s[-4] = "q"
        s[-3] = "u"
        s[-2] = "e"
        s[-1] = "r"
        return "".join(_fr_norm(s))
    if len(s) > 8 and ends("atrice"):
        s = s[:-4]
        s[-2] = "e"
        s[-1] = "r"
        return "".join(_fr_norm(s))
    if len(s) > 7 and ends("ateur"):
        s = s[:-3]
        s[-2] = "e"
        s[-1] = "r"
        return "".join(_fr_norm(s))
    if len(s) > 6 and ends("trice"):
        s = s[:-1]
        s[-3] = "e"
        s[-2] = "u"
        s[-1] = "r"
        # falls through (no return in the reference)
    if len(s) > 5 and ends("ième"):
        return "".join(_fr_norm(s[:-4]))
    if len(s) > 7 and ends("teuse"):
        s = s[:-2]
        s[-1] = "r"
        return "".join(_fr_norm(s))
    if len(s) > 6 and ends("teur"):
        s = s[:-1]
        s[-1] = "r"
        return "".join(_fr_norm(s))
    if len(s) > 5 and ends("euse"):
        return "".join(_fr_norm(s[:-2]))
    if len(s) > 8 and ends("ère"):
        s = s[:-1]
        s[-2] = "e"
        return "".join(_fr_norm(s))
    if len(s) > 7 and ends("ive"):
        s = s[:-1]
        s[-1] = "f"
        return "".join(_fr_norm(s))
    if len(s) > 4 and (ends("folle") or ends("molle")):
        s = s[:-2]
        s[-1] = "u"
        return "".join(_fr_norm(s))
    if len(s) > 9 and ends("nnelle"):
        return "".join(_fr_norm(s[:-5]))
    if len(s) > 9 and ends("nnel"):
        return "".join(_fr_norm(s[:-3]))
    if len(s) > 4 and ends("ète"):
        s = s[:-1]
        s[-2] = "e"
        # falls through
    if len(s) > 8 and ends("ique"):
        s = s[:-4]
        # falls through
    if len(s) > 8 and ends("esse"):
        return "".join(_fr_norm(s[:-3]))
    if len(s) > 7 and ends("inage"):
        return "".join(_fr_norm(s[:-3]))
    if len(s) > 9 and ends("isation"):
        s = s[:-7]
        if len(s) > 5 and ends("ual"):
            s[-2] = "e"
        return "".join(_fr_norm(s))
    if len(s) > 9 and ends("isateur"):
        return "".join(_fr_norm(s[:-7]))
    if len(s) > 8 and ends("ation"):
        return "".join(_fr_norm(s[:-5]))
    if len(s) > 8 and ends("ition"):
        return "".join(_fr_norm(s[:-5]))
    return "".join(_fr_norm(s))


#: FrenchAnalyzer.DEFAULT_ARTICLES (``fr/FrenchAnalyzer.java:56-62``)
FRENCH_ARTICLES = frozenset(
    ["l", "m", "t", "qu", "n", "s", "j", "d", "c", "jusqu", "quoiqu", "lorsqu", "puisqu"]
)

#: longest-first alternation so RE2/``re`` pick the whole article —
#: also the exact pattern of the DuckDB oracle gate
ELISION_REGEX = r"^(?:jusqu|quoiqu|lorsqu|puisqu|qu|c|d|j|l|m|n|s|t)['’]"
_ELISION_RE = re.compile(ELISION_REGEX, re.IGNORECASE)


def french_elide(term: str, articles: frozenset[str] = FRENCH_ARTICLES) -> str:
    """ElisionFilter: if the prefix before the FIRST apostrophe (either
    ``'`` or ``’``) is an article, drop prefix + apostrophe
    (``util/ElisionFilter.java:46-63``; match is case-insensitive like
    the CharArraySet(…, true) article set)."""
    if articles is FRENCH_ARTICLES:
        return _ELISION_RE.sub("", term, count=1)
    for i, ch in enumerate(term):
        if ch in "'’":
            if term[:i].lower() in articles:
                return term[i + 1 :]
            return term
    return term


# ---------------------------------------------------------------------------
# Spanish — SpanishLightStemmer.java (Savoy CLEF-2001)
# ---------------------------------------------------------------------------

_ES_FOLD = str.maketrans(
    "àáâäòóôöèéêëùúûüìíîï",
    "aaaaooooeeeeuuuuiiii",
)


def spanish_light_stem(term: str) -> str:
    """SpanishLightStemmer.stem: accent fold + final-vowel / plural
    suffix drop (``es/SpanishLightStemmer.java:62-114``)."""
    if len(term) < 5:
        return term
    s = term.translate(_ES_FOLD)
    last = s[-1]
    if last in "oae":
        return s[:-1]
    if last == "s":
        if s[-4:-1] == "ese":
            return s[:-2]
        if s[-3:-1] == "ce":
            return s[:-3] + "z"
        if s[-2] in "oae":
            return s[:-2]
    return s


# ---------------------------------------------------------------------------
# stemmer registry — the `stemmer=` seam of the batch tokenizer
# ---------------------------------------------------------------------------


def _german_chain(term: str) -> str:
    """GermanAnalyzer's stem stage (``de/GermanAnalyzer.java:121-127``):
    GermanNormalizationFilter then GermanLightStemFilter."""
    return german_light_stem(german_normalize(term))


# ---------------------------------------------------------------------------
# Italian — ItalianLightStemmer.java (Savoy CLEF-2001)
# ---------------------------------------------------------------------------

_IT_FOLD = str.maketrans(
    "àáâäòóôöèéêëùúûüìíîï",
    "aaaaooooeeeeuuuuiiii",
)


def italian_light_stem(term: str) -> str:
    """ItalianLightStemmer.stem (``it/ItalianLightStemmer.java:60-115``):
    accent fold + final-vowel drop with plural-marker lookbehind
    (ie/he → 2, hi/ii → 2, ia/io → 2, else 1); len<6 untouched."""
    if len(term) < 6:
        return term
    s = term.translate(_IT_FOLD)
    last, prev = s[-1], s[-2]
    if last == "e":
        return s[:-2] if prev in "ih" else s[:-1]
    if last == "i":
        return s[:-2] if prev in "hi" else s[:-1]
    if last == "a":
        return s[:-2] if prev == "i" else s[:-1]
    if last == "o":
        return s[:-2] if prev == "i" else s[:-1]
    return s


#: ItalianAnalyzer.DEFAULT_ARTICLES (``it/ItalianAnalyzer.java:48-54``)
ITALIAN_ARTICLES = frozenset(
    [
        "c", "l", "all", "dall", "dell", "nell", "sull", "coll", "pell",
        "gl", "agl", "dagl", "degl", "negl", "sugl", "un", "m", "t", "s",
        "v", "d",
    ]
)

#: IrishAnalyzer.DEFAULT_ARTICLES (``ga/IrishAnalyzer.java:45-46``)
IRISH_ARTICLES = frozenset(["d", "m", "b"])

#: IrishAnalyzer.HYPHENATIONS (``ga/IrishAnalyzer.java:48-54``): a
#: position-preserving StopFilter applied BEFORE elision/case-folding so
#: that pre-hyphenated text ("n-athair" → tokens "n", "athair") keeps the
#: same positions as unhyphenated "nAthair" (which IrishLowerCaseFilter
#: rewrites to one "n-athair" token) — phrase queries then agree.
IRISH_HYPHENATIONS = frozenset(["h", "n", "t"])

_IRISH_UPPER_VOWELS = frozenset("AEIOUÁÉÍÓÚ")


def irish_lower(term: str) -> str:
    """IrishLowerCaseFilter (``ga/IrishLowerCaseFilter.java:37-62``):
    a token starting with lowercase 'n'/'t' followed by an UPPERCASE
    vowel (plain or fada) is t-prothesis / n-eclipsis — insert a hyphen
    after the mutation consonant and lowercase the rest ("nAthair" →
    "n-athair", "tUISCE" → "t-uisce"); anything else lowercases whole
    ("hARD" → "hard" — 'h' never gains a hyphen)."""
    if (
        len(term) > 1
        and (term[0] == "n" or term[0] == "t")
        and term[1] in _IRISH_UPPER_VOWELS
    ):
        return term[0] + "-" + term[1:].lower()
    return term.lower()


#: exact SQL twin of :func:`irish_lower` over a column named ``term``
IRISH_LOWER_SQL = (
    "CASE WHEN length(term) > 1 AND substr(term, 1, 1) IN ('n', 't') "
    "AND substr(term, 2, 1) IN "
    "('A','E','I','O','U','Á','É','Í','Ó','Ú') "
    "THEN substr(term, 1, 1) || '-' || lower(substr(term, 2)) "
    "ELSE lower(term) END"
)


def apostrophe_strip(term: str) -> str:
    """ApostropheFilter (``tr/ApostropheFilter.java:43-53``): truncate
    the token at the FIRST apostrophe (``'`` or ``’``) — Turkish uses
    apostrophes to attach suffixes to proper names ("Kıbrıs'ta" →
    "Kıbrıs")."""
    for i, ch in enumerate(term):
        if ch == "'" or ch == "’":
            return term[:i]
    return term


#: Java ``Character.toLowerCase`` is the SIMPLE per-codepoint map;
#: Python ``str.lower()`` applies the FULL map for İ (U+0130 → "i"+U+0307,
#: two codepoints) — pin the simple mapping Java uses.
_JAVA_LOWER_SPECIAL = {"İ": "i"}


def turkish_lower(term: str) -> str:  # noqa: C901 — mirrors the filter loop
    """TurkishLowerCaseFilter (``tr/TurkishLowerCaseFilter.java:49-90``):
    dotted/dotless-i casing. 'I' lowers to dotless 'ı' unless followed
    (skipping other combining marks) by U+0307 COMBINING DOT ABOVE, in
    which case it lowers to 'i' and the dot is DELETED (mimics composed
    lowercase); a combining dot above in i-or-after state is deleted;
    everything else takes the per-codepoint simple lowercase ('İ' → 'i',
    the Java simple map)."""
    import unicodedata

    n = len(term)
    out: list[str] = []
    i_or_after = False
    i = 0
    while i < n:
        ch = term[i]
        i_or_after = ch == "I" or (
            i_or_after and unicodedata.category(ch) == "Mn"
        )
        if i_or_after:
            if ch == "\u0307":
                i += 1  # delete the combining dot
                continue
            if ch == "I":
                # lookahead over other combining marks for a dot above
                j = i + 1
                before_dot = False
                while j < n:
                    c2 = term[j]
                    if unicodedata.category(c2) != "Mn":
                        break
                    if c2 == "\u0307":
                        before_dot = True
                        break
                    j += 1
                if before_dot:
                    out.append("i")
                else:
                    out.append("ı")
                    i_or_after = False  # the reference's optimization
                i += 1
                continue
        lo = _JAVA_LOWER_SPECIAL.get(ch)
        if lo is None:
            lo = ch.lower()
            if len(lo) != 1:
                lo = ch  # no simple mapping beyond İ matters here
        out.append(lo)
        i += 1
    return "".join(out)


#: exact SQL twin of ApostropheFilter → TurkishLowerCaseFilter over a
#: column named ``term``, valid on combining-mark-free text (the gate
#: corpus is; the decomposed-form cases are pinned in pytest instead)
TURKISH_FOLD_SQL = (
    "lower(translate(regexp_replace(term, '[''’].*', ''), 'Iİ', 'ıi'))"
)


# ---------------------------------------------------------------------------
# Portuguese — PortugueseLightStemmer.java (UniNE SAC-2006 Portuguese light)
# ---------------------------------------------------------------------------

_PT_FOLD = str.maketrans(
    "àáâäãòóôöõèéêëùúûüìíîïç",
    "aaaaaoooooeeeeuuuuiiiic",
)

#: consonants allowed before a dropped 'es' plural
_PT_ES = frozenset("rslz")


def _pt_remove_suffix(s: str) -> str:
    """removeSuffix (``pt/PortugueseLightStemmer.java:120-166``):
    plural / adverb endings, first match wins."""
    n = len(s)
    if n > 4 and s.endswith("es") and s[-3] in _PT_ES:
        return s[:-2]
    if n > 3 and s.endswith("ns"):
        return s[:-2] + "m"
    if n > 4 and (s.endswith("eis") or s.endswith("éis")):
        return s[:-3] + "el"
    if n > 4 and s.endswith("ais"):
        return s[:-2] + "l"
    if n > 4 and s.endswith("óis"):
        return s[:-3] + "ol"
    if n > 4 and s.endswith("is"):
        return s[:-1] + "l"
    if n > 3 and (s.endswith("ões") or s.endswith("ães")):
        return s[:-3] + "ão"
    if n > 6 and s.endswith("mente"):
        return s[:-5]
    if n > 3 and s[-1] == "s":
        return s[:-1]
    return s


def _pt_norm_feminine(s: str) -> str:
    """normFeminine (``:168-209``) — only reached when the suffix-
    stripped form still ends in 'a'."""
    n = len(s)
    if n > 7 and (
        s.endswith("inha") or s.endswith("iaca") or s.endswith("eira")
    ):
        return s[:-1] + "o"
    if n > 6:
        if s[-3:] in ("osa", "ica", "ida", "ada", "iva", "ama"):
            return s[:-1] + "o"
        if s.endswith("ona"):
            return s[:-3] + "ão"
        if s.endswith("ora"):
            return s[:-1]
        if s.endswith("esa"):
            return s[:-3] + "ês"
        if s.endswith("na"):
            return s[:-1] + "o"
    return s


def portuguese_light_stem(term: str) -> str:
    """PortugueseLightStemmer.stem (``pt/PortugueseLightStemmer.java:
    63-118``): suffix strip → feminine normalization → final-vowel drop
    → accent fold (fold LAST — the suffix rules match accented forms);
    len<4 untouched (and unfolded)."""
    if len(term) < 4:
        return term
    s = _pt_remove_suffix(term)
    if len(s) > 3 and s[-1] == "a":
        s = _pt_norm_feminine(s)
    if len(s) > 4 and s[-1] in "eao":
        s = s[:-1]
    return s.translate(_PT_FOLD)


# ---------------------------------------------------------------------------
# Swedish — SwedishLightStemmer.java (Savoy CLEF-2003)
# ---------------------------------------------------------------------------


def swedish_light_stem(term: str) -> str:
    """SwedishLightStemmer.stem (``sv/SwedishLightStemmer.java:64-100``):
    optional plural 's' drop, then one ordered suffix cascade."""
    s = term
    if len(s) > 4 and s[-1] == "s":
        s = s[:-1]
    n = len(s)
    if n > 7 and (s.endswith("elser") or s.endswith("heten")):
        return s[:-5]
    if n > 6 and s[-4:] in ("arne", "erna", "ande", "else", "aste", "orna", "aren"):
        return s[:-4]
    if n > 5 and s[-3:] in ("are", "ast", "het"):
        return s[:-3]
    if n > 4 and s[-2:] in ("ar", "er", "or", "en", "at", "te", "et"):
        return s[:-2]
    if n > 3 and s[-1] in "taen":
        return s[:-1]
    return s


# ---------------------------------------------------------------------------
# Hungarian — HungarianLightStemmer.java (UniNE SAC-2006 Hungarian light)
# ---------------------------------------------------------------------------

_HU_FOLD = str.maketrans("áëéíóőõöúűũûü", "aeeioooouuuuu")
_HU_VOWELS = frozenset("aeiouy")


def _hu_remove_case(s: str) -> str:
    """removeCase (``hu/HungarianLightStemmer.java:96-147``)."""
    n = len(s)
    if n > 6 and s.endswith("kent"):
        return s[:-4]
    if n > 5:
        if s[-3:] in (
            "nak", "nek", "val", "vel", "ert", "rol", "ban", "ben",
            "bol", "nal", "nel", "hoz", "hez", "tol",
        ):
            return s[:-3]
        if s[-2:] in ("al", "el") and s[-3] not in _HU_VOWELS and s[-3] == s[-4]:
            return s[:-3]
    if n > 4:
        if s[-2:] in ("at", "et", "ot", "va", "ve", "ra", "re", "ba", "be", "ul", "ig"):
            return s[:-2]
        if s[-2:] in ("on", "en") and s[-3] not in _HU_VOWELS:
            return s[:-2]
        if s[-1] in "tn":
            return s[:-1]
        if s[-1] in "ae" and s[-2] == s[-3] and s[-2] not in _HU_VOWELS:
            return s[:-2]
    return s


def _hu_remove_possessive(s: str) -> str:
    """removePossessive (``:149-201``)."""
    n = len(s)
    if n > 6:
        if s[-5] not in _HU_VOWELS and s[-4:] in ("atok", "otok", "etek"):
            return s[:-4]
        if s[-4:] in ("itek", "itok"):
            return s[:-4]
    if n > 5:
        if s[-4] not in _HU_VOWELS and s[-3:] in ("unk", "tok", "tek"):
            return s[:-3]
        if s[-4] in _HU_VOWELS and s[-3:] == "juk":
            return s[:-3]
        if s[-3:] == "ink":
            return s[:-3]
    if n > 4:
        if s[-3] not in _HU_VOWELS and s[-2:] in (
            "am", "em", "om", "ad", "ed", "od", "uk",
        ):
            return s[:-2]
        if s[-3] in _HU_VOWELS and s[-2:] in ("nk", "ja", "je"):
            return s[:-2]
        if s[-2:] in ("im", "id", "ik"):
            return s[:-2]
    if n > 3:
        if s[-1] in "ae" and s[-2] not in _HU_VOWELS:
            return s[:-1]
        if s[-1] in "md" and s[-2] in _HU_VOWELS:
            return s[:-1]
        if s[-1] == "i":
            return s[:-1]
    return s


def hungarian_light_stem(term: str) -> str:
    """HungarianLightStemmer.stem (``hu/HungarianLightStemmer.java:
    62-94``): fold → removeCase → removePossessive → removePlural →
    normalize."""
    s = term.translate(_HU_FOLD)
    s = _hu_remove_case(s)
    s = _hu_remove_possessive(s)
    # removePlural (:204-215): 'k' plural; the a/o/e fallthrough keeps
    # len-1 when the len>4 guard fails
    if len(s) > 3 and s[-1] == "k":
        s = s[:-2] if (s[-2] in "aoe" and len(s) > 4) else s[:-1]
    # normalize (:217-227)
    if len(s) > 3 and s[-1] in "aeio":
        s = s[:-1]
    return s


# ---------------------------------------------------------------------------
# Russian — RussianLightStemmer.java (Dolamic & Savoy, published)
# ---------------------------------------------------------------------------

_RU_3 = (
    "иям", "иях", "оях", "ями", "оям", "оьв", "ами", "его", "ему",
    "ери", "ими", "ого", "ому", "ыми", "оев",
)
_RU_2 = (
    "ая", "яя", "ях", "юю", "ах", "ею", "их", "ия", "ию", "ьв", "ою",
    "ую", "ям", "ых", "ея", "ам", "ем", "ей", "ём", "ев", "ий", "им",
    "ое", "ой", "ом", "ов", "ые", "ый", "ым", "ми",
)


def russian_light_stem(term: str) -> str:
    """RussianLightStemmer.stem (``ru/RussianLightStemmer.java:65-150``):
    case-ending strip then soft-sign / double-н normalization."""
    s = term
    n = len(s)
    if n > 6 and s[-4:] in ("иями", "оями"):
        s = s[:-4]
    elif n > 5 and s[-3:] in _RU_3:
        s = s[:-3]
    elif n > 4 and s[-2:] in _RU_2:
        s = s[:-2]
    elif n > 3 and s[-1] in "аеиоуйыяь":
        s = s[:-1]
    # normalize (:70-80)
    if len(s) > 3:
        if s[-1] in "ьи":
            s = s[:-1]
        elif s[-1] == "н" and s[-2] == "н":
            s = s[:-1]
    return s


# ---------------------------------------------------------------------------
# Finnish — FinnishLightStemmer.java (Savoy CLEF-2003)
# ---------------------------------------------------------------------------

_FI_FOLD = str.maketrans("äåö", "aao")
_FI_VOWELS = frozenset("aeiouy")


def _fi_step1(s: str) -> str:
    while len(s) > 8:
        if s.endswith("kin"):
            s = s[:-3]
            continue
        if s.endswith("ko"):
            s = s[:-2]
            continue
        break
    if len(s) > 11:
        if s.endswith("dellinen"):
            return s[:-8]
        if s.endswith("dellisuus"):
            return s[:-9]
    return s


def _fi_step2(s: str) -> str:
    n = len(s)
    if n > 5:
        if s[-3:] in ("lla", "tse", "sti"):
            return s[:-3]
        if s.endswith("ni"):
            return s[:-2]
        if s.endswith("aa"):
            return s[:-1]
    return s


def _fi_step3(s: str) -> str:
    n = len(s)
    if n > 8:
        if s.endswith("nnen"):
            return s[:-4] + "s"
        if s.endswith("ntena"):
            return s[:-5] + "s"
        if s.endswith("tten"):
            return s[:-4]
        if s.endswith("eiden"):
            return s[:-5]
    if n > 6:
        if s[-4:] in ("neen", "niin", "seen", "teen", "inen"):
            return s[:-4]
        if s[-3] == "h" and s[-2] in _FI_VOWELS and s[-1] == "n":
            return s[:-3]
        if s.endswith("den"):
            return s[:-3] + "s"
        if s.endswith("ksen"):
            return s[:-4] + "s"
        if s[-3:] in ("ssa", "sta", "lla", "lta", "tta", "ksi", "lle"):
            return s[:-3]
    if n > 5:
        if s[-2:] in ("na", "ne"):
            return s[:-2]
        if s.endswith("nei"):
            return s[:-3]
    if n > 4:
        if s[-2:] in ("ja", "ta"):
            return s[:-2]
        if s[-1] == "a":
            return s[:-1]
        if s[-1] == "n" and s[-2] in _FI_VOWELS:
            return s[:-2]
        if s[-1] == "n":
            return s[:-1]
    return s


def _fi_norm1(s: str) -> str:
    if len(s) > 5 and s.endswith("hde"):
        s = s[:-3] + "ksi"  # mutation WITHOUT return — falls through
    n = len(s)
    if n > 4 and (s.endswith("ei") or s.endswith("at")):
        return s[:-2]
    if n > 3 and s[-1] in "tsjeai":
        return s[:-1]
    return s


def _fi_norm2(s: str) -> str:
    if len(s) > 8 and s[-1] in "eou":
        s = s[:-1]
    if len(s) > 4:
        if s[-1] == "i":
            s = s[:-1]
        if len(s) > 4:
            # collapse consecutive duplicate k/p/t anywhere (:210-215)
            out = [s[0]]
            for c in s[1:]:
                if c == out[-1] and c in "kpt":
                    continue
                out.append(c)
            s = "".join(out)
    return s


def finnish_light_stem(term: str) -> str:
    """FinnishLightStemmer.stem (``fi/FinnishLightStemmer.java:64-220``):
    fold ä/å/ö, then the five-step cascade; len<4 untouched (and
    unfolded)."""
    if len(term) < 4:
        return term
    s = term.translate(_FI_FOLD)
    return _fi_norm2(_fi_norm1(_fi_step3(_fi_step2(_fi_step1(s)))))


# ---------------------------------------------------------------------------
# Norwegian — NorwegianLightStemmer.java (hand-crafted, flag-driven)
# ---------------------------------------------------------------------------


def norwegian_light_stem(term: str, *, bokmaal: bool = True, nynorsk: bool = False) -> str:
    """NorwegianLightStemmer.stem (``no/NorwegianLightStemmer.java:
    85-182``): possessive 's' drop + one ordered single-pass cascade;
    rule subsets gate on the BOKMAAL/NYNORSK flags exactly like the
    reference ctor (the NorwegianAnalyzer default is BOKMAAL)."""
    bm, nn = bokmaal, nynorsk
    s = term
    if len(s) > 4 and s[-1] == "s":
        s = s[:-1]
    n = len(s)
    if n > 7 and (
        (s.endswith(("heter", "heten")) and bm) or (s.endswith("heita") and nn)
    ):
        return s[:-5]
    if n > 8 and nn and s.endswith(("heiter", "leiken", "leikar")):
        return s[:-6]
    if n > 5 and (s.endswith("dom") or (s.endswith("het") and bm)):
        return s[:-3]
    if n > 6 and nn and s.endswith(("heit", "semd", "leik")):
        return s[:-4]
    if n > 7 and s.endswith(("elser", "elsen")):
        return s[:-5]
    if n > 6 and (
        (s.endswith("ende") and bm)
        or (s.endswith("ande") and nn)
        or s.endswith("else")
        or (s.endswith("este") and bm)
        or (s.endswith("aste") and nn)
        or (s.endswith("eren") and bm)
        or (s.endswith("aren") and nn)
    ):
        return s[:-4]
    if n > 5 and (
        (s.endswith("ere") and bm)
        or (s.endswith("are") and nn)
        or (s.endswith("est") and bm)
        or (s.endswith("ast") and nn)
        or s.endswith("ene")
        or (s.endswith("ane") and nn)
    ):
        return s[:-3]
    if n > 4 and (
        s.endswith(("er", "en", "et", "te"))
        or (s.endswith("ar") and nn)
        or (s.endswith("st") and bm)
    ):
        return s[:-2]
    if n > 3 and s[-1] in "aen":
        return s[:-1]
    return s


def _nynorsk_light(term: str) -> str:
    return norwegian_light_stem(term, bokmaal=False, nynorsk=True)


NORWEGIAN_LIGHT_SQL = (
    """CASE
        WHEN length(term) > 4 AND right(term, 1) = 's' THEN left(term, length(term)-1)
        ELSE term END""",
    # the Bokmål-flag cascade (NorwegianLightStemmer.java:90-182)
    """CASE
        WHEN length(term) > 7 AND right(term, 5) IN ('heter','heten') THEN left(term, length(term)-5)
        WHEN length(term) > 5 AND right(term, 3) IN ('dom','het') THEN left(term, length(term)-3)
        WHEN length(term) > 7 AND right(term, 5) IN ('elser','elsen') THEN left(term, length(term)-5)
        WHEN length(term) > 6 AND right(term, 4) IN ('ende','else','este','eren') THEN left(term, length(term)-4)
        WHEN length(term) > 5 AND right(term, 3) IN ('ere','est','ene') THEN left(term, length(term)-3)
        WHEN length(term) > 4 AND right(term, 2) IN ('er','en','et','st','te') THEN left(term, length(term)-2)
        WHEN length(term) > 3 AND right(term, 1) IN ('a','e','n') THEN left(term, length(term)-1)
        ELSE term END""",
)


#: name → per-distinct-term transform; "porter" stays special-cased in
#: callers for backward compatibility but is registered here too
STEMMERS: dict[str, object] = {
    "german_light": german_light_stem,
    "german": _german_chain,
    "french_light": french_light_stem,
    "spanish_light": spanish_light_stem,
    "german_normalize": german_normalize,
    "italian_light": italian_light_stem,
    "portuguese_light": portuguese_light_stem,
    "swedish_light": swedish_light_stem,
    "hungarian_light": hungarian_light_stem,
    "russian_light": russian_light_stem,
    "finnish_light": finnish_light_stem,
    "norwegian_light": norwegian_light_stem,  # BOKMAAL flags
    "nynorsk_light": _nynorsk_light,
}

#: named case-fold variants for the ``lowercase=`` seam — per-term
#: transforms that replace plain ``str.lower`` and run BEFORE the stop
#: filter (the custom LowerCaseFilter slot in the reference chains:
#: IrishLowerCaseFilter, TurkishLowerCaseFilter, the Arabic/Persian
#: LowerCase+DecimalDigit+normalization stacks). Applied once per
#: DISTINCT term by the batch kernel, like STEMMERS.
FOLDS: dict[str, object] = {
    "irish": irish_lower,
    "turkish": turkish_lower,
}


def resolve_fold(name: str):
    """``lowercase=<name>`` seam resolver (see :data:`FOLDS`)."""
    fn = FOLDS.get(name)
    if fn is None:
        raise ValueError(f"unknown lowercase fold {name!r} (one of {sorted(FOLDS)})")
    return fn


def _register_snowball() -> None:
    """Snowball family (oracle.snowball) — the DEFAULT stemmers of the
    Danish/Norwegian/Swedish analyzers; registered lazily at import so
    the two modules stay acyclic."""
    from lucene_solr_spark.oracle import snowball as _sb

    STEMMERS.update(
        {
            "swedish_snowball": _sb.swedish_snowball_stem,
            "norwegian_snowball": _sb.norwegian_snowball_stem,
            "danish_snowball": _sb.danish_snowball_stem,
            "russian_snowball": _sb.russian_snowball_stem,
            "porter2": _sb.porter2_stem,
            "german_snowball": _sb.german_snowball_stem,
            "dutch_snowball": _sb.dutch_snowball_stem,
            "romanian_snowball": _sb.romanian_snowball_stem,
            "irish_snowball": _sb.irish_snowball_stem,
            "hungarian_snowball": _sb.hungarian_snowball_stem,
            "finnish_snowball": _sb.finnish_snowball_stem,
            "spanish_snowball": _sb.spanish_snowball_stem,
            "portuguese_snowball": _sb.portuguese_snowball_stem,
            "italian_snowball": _sb.italian_snowball_stem,
            "german2_snowball": _sb.german2_snowball_stem,
            "nepali_snowball": _sb.nepali_snowball_stem,
            "turkish_snowball": _sb.turkish_snowball_stem,
            "lovins": _sb.lovins_stem,
            "kraaij_pohlmann": _sb.kraaij_pohlmann_stem,
        }
    )


_register_snowball()


def _register_lang_pack() -> None:
    """Hand-written CLEF stemmer pack (oracle.lang_pack) — the DEFAULT
    stemmers of the Czech/Bulgarian analyzers."""
    from lucene_solr_spark.oracle import lang_pack as _lp

    STEMMERS.update(
        {
            "czech": _lp.czech_stem,
            "bulgarian": _lp.bulgarian_stem,
            # ArabicAnalyzer's post-stop stages: the stop list is NOT
            # normalized (ar/ArabicAnalyzer.java:127-130), so
            # normalize+stem compose inside the stemmer seam
            "arabic": _lp.arabic_chain_stem,
            "latvian": _lp.latvian_stem,
            "indonesian": _lp.indonesian_stem,
            # SoraniAnalyzer stems AFTER its (normalized) stop list
            "sorani": _lp.sorani_chain_stem,
        }
    )
    from lucene_solr_spark.oracle import indic as _indic

    STEMMERS.update(
        {"hindi": _indic.hindi_stem, "bengali": _indic.bengali_stem}
    )
    from lucene_solr_spark.oracle import greek as _el

    STEMMERS.update({"greek": _el.greek_stem})
    from lucene_solr_spark.oracle import brazilian as _br

    # BrazilianStemFilter keeps the original on a null stem
    STEMMERS.update({"brazilian": _br.brazilian_chain_stem})
    from lucene_solr_spark.oracle import rslp as _rslp

    STEMMERS.update(
        {
            "galician": _rslp.galician_stem,
            # the pt RSLP variant (PortugueseStemFilter) — an alternative
            # to the analyzer-default portuguese_light
            "portuguese_rslp": _rslp.portuguese_rslp_stem,
            # the Plural-step-only minimal variants
            "portuguese_minimal": _rslp.portuguese_minimal_stem,
            "galician_minimal": _rslp.galician_minimal_stem,
        }
    )
    FOLDS.update(
        {
            "arabic": _lp.arabic_fold,
            "persian": _lp.persian_fold,
            "sorani": _lp.sorani_fold,
            "hindi": _indic.hindi_fold,
            "bengali": _indic.bengali_fold,
            "greek": _el.greek_lower,
            "serbian": _lp.serbian_fold,
            "serbian_regular": _lp.serbian_regular_fold,
        }
    )


_register_lang_pack()


def analyzer_config(name: str) -> dict:
    """Named analyzer → tokenizer-chain kwargs, mirroring the reference
    analyzer classes' default chains 1:1 where the default stem filter
    IS the light stemmer (GermanAnalyzer, FrenchAnalyzer,
    SpanishAnalyzer, ItalianAnalyzer, PortugueseAnalyzer — each builds
    StandardTokenizer → [Elision] → LowerCase → Stop → *LightStemFilter).
    The ``*_light`` names are the light-filter ALTERNATIVES for
    analyzers whose reference default is the Snowball stemmer
    (sv/no/fi/ru/hu) — same stop sets, light stem stage."""
    from lucene_solr_spark.oracle.cjk import CJK_STOP_WORDS
    from lucene_solr_spark.oracle.tokenizer import ENGLISH_STOP_WORDS

    configs: dict[str, dict] = {
        "standard": {},
        "english": dict(
            stopwords=ENGLISH_STOP_WORDS, strip_possessive=True, stemmer="porter"
        ),
        "german": dict(stopwords=GERMAN_STOP_WORDS, stemmer="german"),
        "french": dict(
            elide=FRENCH_ARTICLES,
            stopwords=FRENCH_STOP_WORDS,
            stemmer="french_light",
        ),
        "spanish": dict(stopwords=SPANISH_STOP_WORDS, stemmer="spanish_light"),
        "italian": dict(
            elide=ITALIAN_ARTICLES,
            stopwords=ITALIAN_STOP_WORDS,
            stemmer="italian_light",
        ),
        "portuguese": dict(
            stopwords=PORTUGUESE_STOP_WORDS, stemmer="portuguese_light"
        ),
        # sv/no/da reference defaults ARE the Snowball stemmers
        # (SwedishAnalyzer/NorwegianAnalyzer/DanishAnalyzer: Standard →
        # LowerCase → Stop → SnowballFilter)
        "swedish": dict(
            stopwords=SWEDISH_STOP_WORDS, stemmer="swedish_snowball"
        ),
        "norwegian": dict(
            stopwords=NORWEGIAN_STOP_WORDS, stemmer="norwegian_snowball"
        ),
        "danish": dict(stopwords=DANISH_STOP_WORDS, stemmer="danish_snowball"),
        "russian": dict(
            stopwords=RUSSIAN_STOP_WORDS, stemmer="russian_snowball"
        ),
        "dutch": dict(stopwords=DUTCH_STOP_WORDS, stemmer="dutch_snowball"),
        "romanian": dict(
            stopwords=ROMANIAN_STOP_WORDS, stemmer="romanian_snowball"
        ),
        # IrishAnalyzer.java:120-128: StopFilter(HYPHENATIONS) →
        # ElisionFilter(d/m/b) → IrishLowerCaseFilter → Stop → Snowball.
        # lowercase="irish" = the Irish fold runs AFTER elision (it needs
        # the original casing to spot the mutated-uppercase-vowel shape).
        "irish": dict(
            pre_stop=IRISH_HYPHENATIONS,
            elide=IRISH_ARTICLES,
            lowercase="irish",
            stopwords=IRISH_STOP_WORDS,
            stemmer="irish_snowball",
        ),
        # TurkishAnalyzer.java:109-118: ApostropheFilter →
        # TurkishLowerCaseFilter → Stop → SnowballFilter(TurkishStemmer)
        "turkish": dict(
            apostrophe=True,
            lowercase="turkish",
            stopwords=TURKISH_STOP_WORDS,
            stemmer="turkish_snowball",
        ),
        # CJKAnalyzer.java:95-103: CJKWidthFilter → LowerCase →
        # CJKBigramFilter → Stop (oracle/cjk.py)
        "cjk": dict(cjk_bigrams=True, stopwords=CJK_STOP_WORDS),
        "hungarian": dict(
            stopwords=HUNGARIAN_STOP_WORDS, stemmer="hungarian_snowball"
        ),
        "finnish": dict(
            stopwords=FINNISH_STOP_WORDS, stemmer="finnish_snowball"
        ),
        "swedish_light": dict(
            stopwords=SWEDISH_STOP_WORDS, stemmer="swedish_light"
        ),
        "norwegian_light": dict(
            stopwords=NORWEGIAN_STOP_WORDS, stemmer="norwegian_light"
        ),
        "finnish_light": dict(
            stopwords=FINNISH_STOP_WORDS, stemmer="finnish_light"
        ),
        "russian_light": dict(
            stopwords=RUSSIAN_STOP_WORDS, stemmer="russian_light"
        ),
        "hungarian_light": dict(
            stopwords=HUNGARIAN_STOP_WORDS, stemmer="hungarian_light"
        ),
    }
    # CzechAnalyzer.java:112-118 / BulgarianAnalyzer.java:106-112:
    # Standard → LowerCase → Stop → [keyword marker] → *StemFilter
    from lucene_solr_spark.oracle.lang_pack import (
        BULGARIAN_STOP_WORDS,
        CZECH_STOP_WORDS,
    )

    configs["czech"] = dict(stopwords=CZECH_STOP_WORDS, stemmer="czech")
    configs["bulgarian"] = dict(
        stopwords=BULGARIAN_STOP_WORDS, stemmer="bulgarian"
    )
    # ArabicAnalyzer.java:123-134: LowerCase → DecimalDigit → Stop
    # (UNnormalized list) → ArabicNormalization → ArabicStemFilter;
    # the "arabic" fold carries the pre-stop stages, the "arabic"
    # stemmer the post-stop ones.
    from lucene_solr_spark.oracle.lang_pack import (
        ARABIC_STOP_WORDS,
        PERSIAN_STOP_WORDS,
    )

    configs["arabic"] = dict(
        lowercase="arabic", stopwords=ARABIC_STOP_WORDS, stemmer="arabic"
    )
    # PersianAnalyzer.java:106-118: ZWNJ char filter → LowerCase →
    # DecimalDigit → ArabicNorm → PersianNorm → Stop (list ships
    # pre-normalized); no stem stage.
    configs["persian"] = dict(
        zwnj_to_space=True, lowercase="persian", stopwords=PERSIAN_STOP_WORDS
    )
    # LatvianAnalyzer.java:110-116 / IndonesianAnalyzer.java:105-112:
    # Standard → LowerCase → Stop → [keyword marker] → StemFilter
    from lucene_solr_spark.oracle.lang_pack import (
        INDONESIAN_STOP_WORDS,
        LATVIAN_STOP_WORDS,
    )

    configs["latvian"] = dict(stopwords=LATVIAN_STOP_WORDS, stemmer="latvian")
    configs["indonesian"] = dict(
        stopwords=INDONESIAN_STOP_WORDS, stemmer="indonesian"
    )
    # SoraniAnalyzer.java:106-118: Standard → SoraniNormalization →
    # LowerCase → DecimalDigit → Stop → [keyword] → SoraniStemFilter
    from lucene_solr_spark.oracle.lang_pack import SORANI_STOP_WORDS

    configs["sorani"] = dict(
        lowercase="sorani", stopwords=SORANI_STOP_WORDS, stemmer="sorani"
    )
    # HindiAnalyzer.java:114-124: Standard → LowerCase → DecimalDigit →
    # IndicNormalization → HindiNormalization → Stop → HindiStemFilter
    from lucene_solr_spark.oracle.indic import HINDI_STOP_WORDS

    configs["hindi"] = dict(
        lowercase="hindi", stopwords=HINDI_STOP_WORDS, stemmer="hindi"
    )
    # BengaliAnalyzer.java:112-123: same shape as Hindi with the bn
    # normalizer/stemmer pair
    from lucene_solr_spark.oracle.indic import BENGALI_STOP_WORDS

    configs["bengali"] = dict(
        lowercase="bengali", stopwords=BENGALI_STOP_WORDS, stemmer="bengali"
    )
    # GreekAnalyzer.java:103-109: Standard → GreekLowerCase → Stop →
    # GreekStemFilter (the stop list ships pre-folded)
    from lucene_solr_spark.oracle.greek import GREEK_STOP_WORDS

    configs["greek"] = dict(
        lowercase="greek", stopwords=GREEK_STOP_WORDS, stemmer="greek"
    )
    # BrazilianAnalyzer.java:101-108: Standard → LowerCase → Stop →
    # BrazilianStemFilter (the stemmer folds accents itself; the stop
    # list matches the merely-lowercased tokens)
    from lucene_solr_spark.oracle.brazilian import BRAZILIAN_STOP_WORDS

    configs["brazilian"] = dict(
        stopwords=BRAZILIAN_STOP_WORDS, stemmer="brazilian"
    )
    # GalicianAnalyzer.java:110-117: Standard → LowerCase → Stop →
    # GalicianStemFilter
    from lucene_solr_spark.oracle.rslp import GALICIAN_STOP_WORDS

    configs["galician"] = dict(
        stopwords=GALICIAN_STOP_WORDS, stemmer="galician"
    )
    got = configs.get(name)
    if got is None:
        raise ValueError(f"unknown analyzer {name!r} (one of {sorted(configs)})")
    return dict(got)


def resolve(name: str | None):
    """``stemmer=`` seam resolver shared by the batch tokenizer, the
    scalar ``oracle.tokenizer.analyze`` chain, and the offsets chain:
    name → per-term callable (or None for the identity). Every stemmer
    is applied once per DISTINCT term via dictionary-encode in the batch
    kernel, so registry growth never adds per-token Python."""
    if name is None:
        return None
    if name == "porter":
        from lucene_solr_spark.oracle.porter import porter_stem

        return porter_stem
    fn = STEMMERS.get(name)
    if fn is None:
        raise ValueError(
            f"unknown stemmer {name!r} (one of {('porter', *sorted(STEMMERS))})"
        )
    return fn


#: DuckDB-oracle SQL twins of the stemmers, each a chain of expressions
#: over a column named ``term`` (one tokens-CTE layer per entry — see
#: ``functions.bm25_sql.tokens_cte(term_expr=…)``). These make the
#: German/Spanish light-stemmed chains VALUE-exact against SQL (unlike
#: Porter, whose 60-rule machine stays pytest-pinned): the rule cascades
#: are short enough to state as CASE expressions.
_DE_S_ENDS = ", ".join(f"'{c}s'" for c in sorted(_DE_ST))
_DE_ST_ENDS = ", ".join(f"'{c}st'" for c in sorted(_DE_ST))

GERMAN_LIGHT_SQL = (
    # fold accented vowels (GermanLightStemmer.java:48-113)
    "translate(term, 'äàáâöòóôïìíîüùúû', 'aaaaooooiiiiuuuu')",
    # step 1 (:115-133)
    f"""CASE
        WHEN length(term) > 5 AND right(term, 3) = 'ern' THEN left(term, length(term)-3)
        WHEN length(term) > 4 AND right(term, 2) IN ('em','en','er','es') THEN left(term, length(term)-2)
        WHEN length(term) > 3 AND right(term, 1) = 'e' THEN left(term, length(term)-1)
        WHEN length(term) > 3 AND right(term, 2) IN ({_DE_S_ENDS}) THEN left(term, length(term)-1)
        ELSE term END""",
    # step 2 (:135-143)
    f"""CASE
        WHEN length(term) > 5 AND right(term, 3) = 'est' THEN left(term, length(term)-3)
        WHEN length(term) > 4 AND right(term, 2) IN ('er','en') THEN left(term, length(term)-2)
        WHEN length(term) > 4 AND right(term, 3) IN ({_DE_ST_ENDS}) THEN left(term, length(term)-2)
        ELSE term END""",
)

#: the regex-chain decomposition of the normalization FSM (fuzz-proven
#: equivalent in tests/test_light_stemmers.py)
GERMAN_NORMALIZE_SQL = (
    "replace(term, 'ß', 'ss')",
    r"regexp_replace(term, '([ao])e', '\1', 'g')",
    r"regexp_replace(term, '(^|[^aeiouqyäöü])ue', '\1u', 'g')",
    "translate(term, 'äöü', 'aou')",
)

_IT_F = "translate(term, 'àáâäòóôöèéêëùúûüìíîï', 'aaaaooooeeeeuuuuiiii')"
ITALIAN_LIGHT_SQL = (
    f"""CASE
        WHEN length(term) < 6 THEN term
        WHEN right({_IT_F}, 1) = 'e' AND substr({_IT_F}, length(term)-1, 1) IN ('i','h') THEN left({_IT_F}, length(term)-2)
        WHEN right({_IT_F}, 1) = 'i' AND substr({_IT_F}, length(term)-1, 1) IN ('h','i') THEN left({_IT_F}, length(term)-2)
        WHEN right({_IT_F}, 1) IN ('a','o') AND substr({_IT_F}, length(term)-1, 1) = 'i' THEN left({_IT_F}, length(term)-2)
        WHEN right({_IT_F}, 1) IN ('e','i','a','o') THEN left({_IT_F}, length(term)-1)
        ELSE {_IT_F} END""",
)

# Portuguese folds LAST and skips terms shorter than 4 ENTIRELY (incl.
# the fold), but a long term may SHRINK below 4 and must still fold —
# per-layer length checks can't tell the two apart. The twin therefore
# tags short terms with a chr(1) sentinel in layer 0 (prefix-safe: every
# rule matches suffixes; the tokenizer never emits control chars) and
# strips it unfolded in the final layer.
_PT_SKIP = "left(term, 1) = chr(1)"
PORTUGUESE_LIGHT_SQL = (
    "CASE WHEN length(term) < 4 THEN chr(1) || term ELSE term END",
    # removeSuffix (PortugueseLightStemmer.java:120-166)
    f"""CASE
        WHEN {_PT_SKIP} THEN term
        WHEN length(term) > 4 AND right(term, 3) IN ('res','ses','les','zes') THEN left(term, length(term)-2)
        WHEN length(term) > 3 AND right(term, 2) = 'ns' THEN left(term, length(term)-2) || 'm'
        WHEN length(term) > 4 AND right(term, 3) IN ('eis','éis') THEN left(term, length(term)-3) || 'el'
        WHEN length(term) > 4 AND right(term, 3) = 'ais' THEN left(term, length(term)-2) || 'l'
        WHEN length(term) > 4 AND right(term, 3) = 'óis' THEN left(term, length(term)-3) || 'ol'
        WHEN length(term) > 4 AND right(term, 2) = 'is' THEN left(term, length(term)-1) || 'l'
        WHEN length(term) > 3 AND right(term, 3) IN ('ões','ães') THEN left(term, length(term)-3) || 'ão'
        WHEN length(term) > 6 AND right(term, 5) = 'mente' THEN left(term, length(term)-5)
        WHEN length(term) > 3 AND right(term, 1) = 's' THEN left(term, length(term)-1)
        ELSE term END""",
    # normFeminine (:168-209), guarded on the still-ends-in-'a' branch
    f"""CASE
        WHEN {_PT_SKIP} THEN term
        WHEN NOT (length(term) > 3 AND right(term, 1) = 'a') THEN term
        WHEN length(term) > 7 AND right(term, 4) IN ('inha','iaca','eira') THEN left(term, length(term)-1) || 'o'
        WHEN length(term) > 6 AND right(term, 3) IN ('osa','ica','ida','ada','iva','ama') THEN left(term, length(term)-1) || 'o'
        WHEN length(term) > 6 AND right(term, 3) = 'ona' THEN left(term, length(term)-3) || 'ão'
        WHEN length(term) > 6 AND right(term, 3) = 'ora' THEN left(term, length(term)-1)
        WHEN length(term) > 6 AND right(term, 3) = 'esa' THEN left(term, length(term)-3) || 'ês'
        WHEN length(term) > 6 AND right(term, 2) = 'na' THEN left(term, length(term)-1) || 'o'
        ELSE term END""",
    # final-vowel drop (:71-79)
    f"""CASE
        WHEN {_PT_SKIP} THEN term
        WHEN length(term) > 4 AND right(term, 1) IN ('e','a','o') THEN left(term, length(term)-1)
        ELSE term END""",
    # unmark shorts (unfolded) / fold everything else (:79-116)
    f"""CASE
        WHEN {_PT_SKIP} THEN substr(term, 2)
        ELSE translate(term, 'àáâäãòóôöõèéêëùúûüìíîïç', 'aaaaaoooooeeeeuuuuiiiic') END""",
)

SWEDISH_LIGHT_SQL = (
    """CASE
        WHEN length(term) > 4 AND right(term, 1) = 's' THEN left(term, length(term)-1)
        ELSE term END""",
    """CASE
        WHEN length(term) > 7 AND right(term, 5) IN ('elser','heten') THEN left(term, length(term)-5)
        WHEN length(term) > 6 AND right(term, 4) IN ('arne','erna','ande','else','aste','orna','aren') THEN left(term, length(term)-4)
        WHEN length(term) > 5 AND right(term, 3) IN ('are','ast','het') THEN left(term, length(term)-3)
        WHEN length(term) > 4 AND right(term, 2) IN ('ar','er','or','en','at','te','et') THEN left(term, length(term)-2)
        WHEN length(term) > 3 AND right(term, 1) IN ('t','a','e','n') THEN left(term, length(term)-1)
        ELSE term END""",
)

_HU_V = "('a','e','i','o','u','y')"
HUNGARIAN_LIGHT_SQL = (
    "translate(term, 'áëéíóőõöúűũûü', 'aeeioooouuuuu')",
    # removeCase (HungarianLightStemmer.java:96-147); s[-k] in Java is
    # substr(term, length(term)-k+1, 1) here
    f"""CASE
        WHEN length(term) > 6 AND right(term, 4) = 'kent' THEN left(term, length(term)-4)
        WHEN length(term) > 5 AND right(term, 3) IN ('nak','nek','val','vel','ert','rol','ban','ben','bol','nal','nel','hoz','hez','tol') THEN left(term, length(term)-3)
        WHEN length(term) > 5 AND right(term, 2) IN ('al','el') AND substr(term, length(term)-2, 1) NOT IN {_HU_V} AND substr(term, length(term)-2, 1) = substr(term, length(term)-3, 1) THEN left(term, length(term)-3)
        WHEN length(term) > 4 AND right(term, 2) IN ('at','et','ot','va','ve','ra','re','ba','be','ul','ig') THEN left(term, length(term)-2)
        WHEN length(term) > 4 AND right(term, 2) IN ('on','en') AND substr(term, length(term)-2, 1) NOT IN {_HU_V} THEN left(term, length(term)-2)
        WHEN length(term) > 4 AND right(term, 1) IN ('t','n') THEN left(term, length(term)-1)
        WHEN length(term) > 4 AND right(term, 1) IN ('a','e') AND substr(term, length(term)-1, 1) = substr(term, length(term)-2, 1) AND substr(term, length(term)-1, 1) NOT IN {_HU_V} THEN left(term, length(term)-2)
        ELSE term END""",
    # removePossessive (:149-201)
    f"""CASE
        WHEN length(term) > 6 AND substr(term, length(term)-4, 1) NOT IN {_HU_V} AND right(term, 4) IN ('atok','otok','etek') THEN left(term, length(term)-4)
        WHEN length(term) > 6 AND right(term, 4) IN ('itek','itok') THEN left(term, length(term)-4)
        WHEN length(term) > 5 AND substr(term, length(term)-3, 1) NOT IN {_HU_V} AND right(term, 3) IN ('unk','tok','tek') THEN left(term, length(term)-3)
        WHEN length(term) > 5 AND substr(term, length(term)-3, 1) IN {_HU_V} AND right(term, 3) = 'juk' THEN left(term, length(term)-3)
        WHEN length(term) > 5 AND right(term, 3) = 'ink' THEN left(term, length(term)-3)
        WHEN length(term) > 4 AND substr(term, length(term)-2, 1) NOT IN {_HU_V} AND right(term, 2) IN ('am','em','om','ad','ed','od','uk') THEN left(term, length(term)-2)
        WHEN length(term) > 4 AND substr(term, length(term)-2, 1) IN {_HU_V} AND right(term, 2) IN ('nk','ja','je') THEN left(term, length(term)-2)
        WHEN length(term) > 4 AND right(term, 2) IN ('im','id','ik') THEN left(term, length(term)-2)
        WHEN length(term) > 3 AND right(term, 1) IN ('a','e') AND substr(term, length(term)-1, 1) NOT IN {_HU_V} THEN left(term, length(term)-1)
        WHEN length(term) > 3 AND right(term, 1) IN ('m','d') AND substr(term, length(term)-1, 1) IN {_HU_V} THEN left(term, length(term)-1)
        WHEN length(term) > 3 AND right(term, 1) = 'i' THEN left(term, length(term)-1)
        ELSE term END""",
    # removePlural (:204-215) incl. the a/o/e fallthrough to len-1
    """CASE
        WHEN length(term) > 4 AND right(term, 1) = 'k' AND substr(term, length(term)-1, 1) IN ('a','o','e') THEN left(term, length(term)-2)
        WHEN length(term) > 3 AND right(term, 1) = 'k' THEN left(term, length(term)-1)
        ELSE term END""",
    # normalize (:217-227)
    """CASE
        WHEN length(term) > 3 AND right(term, 1) IN ('a','e','i','o') THEN left(term, length(term)-1)
        ELSE term END""",
)

RUSSIAN_LIGHT_SQL = (
    # removeCase (RussianLightStemmer.java:82-150)
    """CASE
        WHEN length(term) > 6 AND right(term, 4) IN ('иями','оями') THEN left(term, length(term)-4)
        WHEN length(term) > 5 AND right(term, 3) IN ('иям','иях','оях','ями','оям','оьв','ами','его','ему','ери','ими','ого','ому','ыми','оев') THEN left(term, length(term)-3)
        WHEN length(term) > 4 AND right(term, 2) IN ('ая','яя','ях','юю','ах','ею','их','ия','ию','ьв','ою','ую','ям','ых','ея','ам','ем','ей','ём','ев','ий','им','ое','ой','ом','ов','ые','ый','ым','ми') THEN left(term, length(term)-2)
        WHEN length(term) > 3 AND right(term, 1) IN ('а','е','и','о','у','й','ы','я','ь') THEN left(term, length(term)-1)
        ELSE term END""",
    # normalize (:70-80)
    """CASE
        WHEN length(term) > 3 AND right(term, 1) IN ('ь','и') THEN left(term, length(term)-1)
        WHEN length(term) > 3 AND right(term, 1) = 'н' AND substr(term, length(term)-1, 1) = 'н' THEN left(term, length(term)-1)
        ELSE term END""",
)

# Finnish folds only terms of length >= 4 (FinnishLightStemmer.java:65)
# — same fold-skip shape as Portuguese, same chr(1) sentinel. step1's
# kin/ko recursion is unrolled 4× (each strip needs length > 8; the
# reference's own 50,000-word vocabulary never needs more than 1 —
# asserted in tests).
_FI_SKIP = "left(term, 1) = chr(1)"
_FI_V = "('a','e','i','o','u','y')"
_FI_STEP1_KINKO = f"""CASE
        WHEN {_FI_SKIP} THEN term
        WHEN length(term) > 8 AND right(term, 3) = 'kin' THEN left(term, length(term)-3)
        WHEN length(term) > 8 AND right(term, 2) = 'ko' THEN left(term, length(term)-2)
        ELSE term END"""
FINNISH_LIGHT_SQL = (
    "CASE WHEN length(term) < 4 THEN chr(1) || term ELSE term END",
    f"CASE WHEN {_FI_SKIP} THEN term ELSE translate(term, 'äåö', 'aao') END",
    _FI_STEP1_KINKO,
    _FI_STEP1_KINKO,
    _FI_STEP1_KINKO,
    _FI_STEP1_KINKO,
    f"""CASE
        WHEN {_FI_SKIP} THEN term
        WHEN length(term) > 11 AND right(term, 8) = 'dellinen' THEN left(term, length(term)-8)
        WHEN length(term) > 11 AND right(term, 9) = 'dellisuus' THEN left(term, length(term)-9)
        ELSE term END""",
    # step2 (:99-110)
    f"""CASE
        WHEN {_FI_SKIP} THEN term
        WHEN length(term) > 5 AND right(term, 3) IN ('lla','tse','sti') THEN left(term, length(term)-3)
        WHEN length(term) > 5 AND right(term, 2) = 'ni' THEN left(term, length(term)-2)
        WHEN length(term) > 5 AND right(term, 2) = 'aa' THEN left(term, length(term)-1)
        ELSE term END""",
    # step3 (:112-174)
    f"""CASE
        WHEN {_FI_SKIP} THEN term
        WHEN length(term) > 8 AND right(term, 4) = 'nnen' THEN left(term, length(term)-4) || 's'
        WHEN length(term) > 8 AND right(term, 5) = 'ntena' THEN left(term, length(term)-5) || 's'
        WHEN length(term) > 8 AND right(term, 4) = 'tten' THEN left(term, length(term)-4)
        WHEN length(term) > 8 AND right(term, 5) = 'eiden' THEN left(term, length(term)-5)
        WHEN length(term) > 6 AND right(term, 4) IN ('neen','niin','seen','teen','inen') THEN left(term, length(term)-4)
        WHEN length(term) > 6 AND substr(term, length(term)-2, 1) = 'h' AND substr(term, length(term)-1, 1) IN {_FI_V} AND right(term, 1) = 'n' THEN left(term, length(term)-3)
        WHEN length(term) > 6 AND right(term, 3) = 'den' THEN left(term, length(term)-3) || 's'
        WHEN length(term) > 6 AND right(term, 4) = 'ksen' THEN left(term, length(term)-4) || 's'
        WHEN length(term) > 6 AND right(term, 3) IN ('ssa','sta','lla','lta','tta','ksi','lle') THEN left(term, length(term)-3)
        WHEN length(term) > 5 AND right(term, 2) IN ('na','ne') THEN left(term, length(term)-2)
        WHEN length(term) > 5 AND right(term, 3) = 'nei' THEN left(term, length(term)-3)
        WHEN length(term) > 4 AND right(term, 2) IN ('ja','ta') THEN left(term, length(term)-2)
        WHEN length(term) > 4 AND right(term, 1) = 'a' THEN left(term, length(term)-1)
        WHEN length(term) > 4 AND right(term, 1) = 'n' AND substr(term, length(term)-1, 1) IN {_FI_V} THEN left(term, length(term)-2)
        WHEN length(term) > 4 AND right(term, 1) = 'n' THEN left(term, length(term)-1)
        ELSE term END""",
    # norm1 'hde'→'ksi' mutation falls through (:177-181)
    f"""CASE
        WHEN {_FI_SKIP} THEN term
        WHEN length(term) > 5 AND right(term, 3) = 'hde' THEN left(term, length(term)-3) || 'ksi'
        ELSE term END""",
    # norm1 tail (:183-196)
    f"""CASE
        WHEN {_FI_SKIP} THEN term
        WHEN length(term) > 4 AND right(term, 2) IN ('ei','at') THEN left(term, length(term)-2)
        WHEN length(term) > 3 AND right(term, 1) IN ('t','s','j','e','a','i') THEN left(term, length(term)-1)
        ELSE term END""",
    # norm2 e/o/u drop (:201-203)
    f"""CASE
        WHEN {_FI_SKIP} THEN term
        WHEN length(term) > 8 AND right(term, 1) IN ('e','o','u') THEN left(term, length(term)-1)
        ELSE term END""",
    # norm2 i drop (:205-206)
    f"""CASE
        WHEN {_FI_SKIP} THEN term
        WHEN length(term) > 4 AND right(term, 1) = 'i' THEN left(term, length(term)-1)
        ELSE term END""",
    # norm2 consecutive k/p/t collapse — ONE layer (the len>4 guard is
    # evaluated once in the reference, before any deletion) (:208-215)
    f"""CASE
        WHEN {_FI_SKIP} THEN term
        WHEN length(term) > 4 THEN regexp_replace(regexp_replace(regexp_replace(term, 'kk+', 'k', 'g'), 'pp+', 'p', 'g'), 'tt+', 't', 'g')
        ELSE term END""",
    f"CASE WHEN {_FI_SKIP} THEN substr(term, 2) ELSE term END",
)

_ES_F = "translate(term, 'àáâäòóôöèéêëùúûüìíîï', 'aaaaooooeeeeuuuuiiii')"
SPANISH_LIGHT_SQL = (
    f"""CASE
        WHEN length(term) < 5 THEN term
        WHEN right({_ES_F}, 1) IN ('o','a','e') THEN left({_ES_F}, length(term)-1)
        WHEN right({_ES_F}, 1) = 's' AND substr({_ES_F}, length(term)-3, 3) = 'ese' THEN left({_ES_F}, length(term)-2)
        WHEN right({_ES_F}, 1) = 's' AND substr({_ES_F}, length(term)-2, 2) = 'ce' THEN left({_ES_F}, length(term)-3) || 'z'
        WHEN right({_ES_F}, 1) = 's' AND substr({_ES_F}, length(term)-1, 1) IN ('o','a','e') THEN left({_ES_F}, length(term)-2)
        ELSE {_ES_F} END""",
)


def resolve_with_exclusions(name: str | None, exclusions: frozenset[str] | None):
    """``resolve`` plus SetKeywordMarkerFilter semantics
    (``miscellaneous/SetKeywordMarkerFilter.java`` + the stem filters'
    ``if (!keywordAttr.isKeyword())`` guards): terms in ``exclusions``
    skip STEMMING but NOT normalization — GermanNormalizationFilter has
    no keyword check (``de/GermanNormalizationFilter.java``), so the
    composed "german" chain still normalizes an excluded term. The
    marker matches the term BEFORE any stem-stage rewriting, exactly
    like the filter's position in the reference chains."""
    fn = resolve(name)
    if fn is None or not exclusions:
        return fn
    if name == "german":

        def wrapped(t: str) -> str:
            return german_normalize(t) if t in exclusions else fn(t)

    elif name == "arabic":
        # the marker filter sits AFTER ArabicNormalizationFilter
        # (ar/ArabicAnalyzer.java:130-133), so exclusions match the
        # NORMALIZED term and skip only the stem
        def wrapped(t: str) -> str:
            from lucene_solr_spark.oracle.lang_pack import (
                arabic_normalize,
                arabic_stem,
            )

            n = arabic_normalize(t)
            return n if n in exclusions else arabic_stem(n)

    else:

        def wrapped(t: str) -> str:
            return t if t in exclusions else fn(t)

    return wrapped


def sql_with_exclusions(sql_layers, exclusions: frozenset[str]):
    """SQL-twin form of :func:`resolve_with_exclusions`: mark excluded
    terms with a chr(1) sentinel BEFORE the stem layers (the marker sees
    the pre-fold term), skip every layer for marked terms, unmark last.
    Valid for stemmer chains that don't use the sentinel internally
    (i.e. not Portuguese/Finnish)."""
    for e in sql_layers:
        if "chr(1)" in e:
            raise ValueError("chain already uses the sentinel internally")
    lits = ", ".join("'" + w.replace("'", "''") + "'" for w in sorted(exclusions))
    skip = "left(term, 1) = chr(1)"
    out = [f"CASE WHEN term IN ({lits}) THEN chr(1) || term ELSE term END"]
    out.extend(
        f"CASE WHEN {skip} THEN term ELSE ({e}) END" for e in sql_layers
    )
    out.append(f"CASE WHEN {skip} THEN substr(term, 2) ELSE term END")
    return tuple(out)


def elision_regex(articles: frozenset[str]) -> str:
    """Longest-first anchored alternation for an article set — the
    vectorized (RE2-compatible) form of :func:`french_elide`, shared by
    the Arrow batch kernel and the DuckDB oracle gates. Valid only for
    lowercase ASCII-letter article sets (the reference default is)."""
    alts = "|".join(sorted(articles, key=lambda a: (-len(a), a)))
    return f"(?i)^(?:{alts})['’]"


# ---------------------------------------------------------------------------
# Default stop sets — parsed from the public Snowball-project lists the
# reference ships verbatim (``analysis/snowball/{french,german,spanish}_
# stop.txt``; loaded by ``FrenchAnalyzer.getDefaultStopSet`` etc. via
# WordlistLoader.getSnowballWordSet: '|' comments stripped, whitespace-
# split). The lists are data, not code — snowballstem.org, BSD license.
# ---------------------------------------------------------------------------
FRENCH_STOP_WORDS = frozenset(
(
    "ai aie aient aies ait au aurai auraient aurais aurait aurez "
    "auriez aurions aurons auront aux avaient avais avait avec avez "
    "aviez avons ayant ayez ayons c ce ceci cela celà ces cet cette "
    "d dans de des du elle en es et eu eue eues eurent eus eusse "
    "eussent eusses eussiez eussions eut eux eûmes eût eûtes furent "
    "fus fusse fussent fusses fussiez fussions fut fûmes fûtes ici "
    "il ils j je l la le les leur leurs lui m ma mais me mes moi mon "
    "même n ne nos notre nous on ont ou par pas pour qu que quel "
    "quelle quelles quels qui s sa sans se sera serai seraient "
    "serais serait seras serez seriez serions serons seront ses soi "
    "soient sois soit sont soyez soyons suis sur t ta te tes toi ton "
    "tu un une vos votre vous y à étaient étais était étant étiez "
    "étions étée étées êtes "
).split()
)

GERMAN_STOP_WORDS = frozenset(
(
    "aber alle allem allen aller alles als also am an ander andere "
    "anderem anderen anderer anderes anderm andern anderr anders "
    "auch auf aus bei bin bis bist da damit dann das dasselbe dazu "
    "daß dein deine deinem deinen deiner deines dem demselben den "
    "denn denselben der derer derselbe derselben des desselben "
    "dessen dich die dies diese dieselbe dieselben diesem diesen "
    "dieser dieses dir doch dort du durch ein eine einem einen einer "
    "eines einig einige einigem einigen einiger einiges einmal er es "
    "etwas euch euer eure eurem euren eurer eures für gegen gewesen "
    "hab habe haben hat hatte hatten hier hin hinter ich ihm ihn "
    "ihnen ihr ihre ihrem ihren ihrer ihres im in indem ins ist jede "
    "jedem jeden jeder jedes jene jenem jenen jener jenes jetzt kann "
    "kein keine keinem keinen keiner keines können könnte machen man "
    "manche manchem manchen mancher manches mein meine meinem meinen "
    "meiner meines mich mir mit muss musste nach nicht nichts noch "
    "nun nur ob oder ohne sehr sein seine seinem seinen seiner "
    "seines selbst sich sie sind so solche solchem solchen solcher "
    "solches soll sollte sondern sonst um und uns unse unsem unsen "
    "unser unses unter viel vom von vor war waren warst was weg weil "
    "weiter welche welchem welchen welcher welches wenn werde werden "
    "wie wieder will wir wird wirst wo wollen wollte während würde "
    "würden zu zum zur zwar zwischen über "
).split()
)

SPANISH_STOP_WORDS = frozenset(
(
    "a al algo algunas algunos ante antes como con contra cual "
    "cuando de del desde donde durante e el ella ellas ellos en "
    "entre era erais eran eras eres es esa esas ese eso esos esta "
    "estaba estabais estaban estabas estad estada estadas estado "
    "estados estamos estando estar estaremos estará estarán estarás "
    "estaré estaréis estaría estaríais estaríamos estarían estarías "
    "estas este estemos esto estos estoy estuve estuviera "
    "estuvierais estuvieran estuvieras estuvieron estuviese "
    "estuvieseis estuviesen estuvieses estuvimos estuviste "
    "estuvisteis estuviéramos estuviésemos estuvo está estábamos "
    "estáis están estás esté estéis estén estés fue fuera fuerais "
    "fueran fueras fueron fuese fueseis fuesen fueses fui fuimos "
    "fuiste fuisteis fuéramos fuésemos ha habida habidas habido "
    "habidos habiendo habremos habrá habrán habrás habré habréis "
    "habría habríais habríamos habrían habrías habéis había habíais "
    "habíamos habían habías han has hasta hay haya hayamos hayan "
    "hayas hayáis he hemos hube hubiera hubierais hubieran hubieras "
    "hubieron hubiese hubieseis hubiesen hubieses hubimos hubiste "
    "hubisteis hubiéramos hubiésemos hubo la las le les lo los me mi "
    "mis mucho muchos muy más mí mía mías mío míos nada ni no nos "
    "nosotras nosotros nuestra nuestras nuestro nuestros o os otra "
    "otras otro otros para pero poco por porque que quien quienes "
    "qué se sea seamos sean seas seremos será serán serás seré "
    "seréis sería seríais seríamos serían serías seáis sido siendo "
    "sin sobre sois somos son soy su sus suya suyas suyo suyos sí "
    "también tanto te tendremos tendrá tendrán tendrás tendré "
    "tendréis tendría tendríais tendríamos tendrían tendrías tened "
    "tenemos tenga tengamos tengan tengas tengo tengáis tenida "
    "tenidas tenido tenidos teniendo tenéis tenía teníais teníamos "
    "tenían tenías ti tiene tienen tienes todo todos tu tus tuve "
    "tuviera tuvierais tuvieran tuvieras tuvieron tuviese tuvieseis "
    "tuviesen tuvieses tuvimos tuviste tuvisteis tuviéramos "
    "tuviésemos tuvo tuya tuyas tuyo tuyos tú un una uno unos "
    "vosotras vosotros vuestra vuestras vuestro vuestros y ya yo él "
    "éramos "
).split()
)

ITALIAN_STOP_WORDS = frozenset(
(
    "a abbia abbiamo abbiano abbiate ad agl agli ai al all alla alle "
    "allo anche avemmo avendo avesse avessero avessi avessimo aveste "
    "avesti avete aveva avevamo avevano avevate avevi avevo avrai "
    "avranno avrebbe avrebbero avrei avremmo avremo avreste avresti "
    "avrete avrà avrò avuta avute avuti avuto c che chi ci coi col "
    "come con contro cui da dagl dagli dai dal dall dalla dalle "
    "dallo degl degli dei del dell della delle dello di dov dove e "
    "ebbe ebbero ebbi ed era erano eravamo eravate eri ero essendo "
    "faccia facciamo facciano facciate faccio facemmo facendo "
    "facesse facessero facessi facessimo faceste facesti faceva "
    "facevamo facevano facevate facevi facevo fai fanno farai "
    "faranno farebbe farebbero farei faremmo faremo fareste faresti "
    "farete farà farò fece fecero feci fosse fossero fossi fossimo "
    "foste fosti fu fui fummo furono gli ha hai hanno ho i il in io "
    "l la le lei li lo loro lui ma mi mia mie miei mio ne negl negli "
    "nei nel nell nella nelle nello noi non nostra nostre nostri "
    "nostro o per perché più quale quanta quante quanti quanto "
    "quella quelle quelli quello questa queste questi questo sarai "
    "saranno sarebbe sarebbero sarei saremmo saremo sareste saresti "
    "sarete sarà sarò se sei si sia siamo siano siate siete sono sta "
    "stai stando stanno starai staranno starebbe starebbero starei "
    "staremmo staremo stareste staresti starete starà starò stava "
    "stavamo stavano stavate stavi stavo stemmo stesse stessero "
    "stessi stessimo steste stesti stette stettero stetti stia "
    "stiamo stiano stiate sto su sua sue sugl sugli sui sul sull "
    "sulla sulle sullo suo suoi ti tra tu tua tue tuo tuoi tutti "
    "tutto un una uno vi voi vostra vostre vostri vostro è "
).split()
)

PORTUGUESE_STOP_WORDS = frozenset(
(
    "a ao aos aquela aquelas aquele aqueles aquilo as até com como "
    "da das de dela delas dele deles depois do dos e ela elas ele "
    "eles em entre era eram essa essas esse esses esta estamos estas "
    "estava estavam este esteja estejam estejamos estes esteve "
    "estive estivemos estiver estivera estiveram estiverem "
    "estivermos estivesse estivessem estivéramos estivéssemos estou "
    "está estávamos estão eu foi fomos for fora foram forem formos "
    "fosse fossem fui fôramos fôssemos haja hajam hajamos havemos "
    "hei houve houvemos houver houvera houveram houverei houverem "
    "houveremos houveria houveriam houvermos houverá houverão "
    "houveríamos houvesse houvessem houvéramos houvéssemos há hão "
    "isso isto já lhe lhes mais mas me mesmo meu meus minha minhas "
    "muito na nas nem no nos nossa nossas nosso nossos num numa não "
    "nós o os ou para pela pelas pelo pelos por qual quando que quem "
    "se seja sejam sejamos sem serei seremos seria seriam será serão "
    "seríamos seu seus somos sou sua suas são só também te tem temos "
    "tenha tenham tenhamos tenho terei teremos teria teriam terá "
    "terão teríamos teu teus teve tinha tinham tive tivemos tiver "
    "tivera tiveram tiverem tivermos tivesse tivessem tivéramos "
    "tivéssemos tu tua tuas tém tínhamos um uma você vocês vos à às "
    "éramos "
).split()
)

RUSSIAN_STOP_WORDS = frozenset(
(
    "а без более больше будет будто бы был была были было быть в вам "
    "вас вдруг ведь во вот впрочем все всегда всего всех всю вы где "
    "говорил да даже два для до другой его ее ей ему если есть еще ж "
    "же жизнь за зачем здесь и из или им иногда их к кажется как "
    "какая какой когда конечно кто куда ли лучше между меня мне "
    "много может можно мой моя мы на над надо наконец нас не него "
    "нее ней нельзя нет ни нибудь никогда ним них ничего но ну о об "
    "один он она они опять от перед по под после потом потому почти "
    "при про раз разве с сам свою себе себя сегодня сейчас сказал "
    "сказала сказать со совсем так такой там тебя тем теперь то "
    "тогда того тоже только том тот три тут ты у уж уже хорошо хоть "
    "чего человек чем через что чтоб чтобы чуть эти этого этой этом "
    "этот эту я "
).split()
)

FINNISH_STOP_WORDS = frozenset(
(
    "ei eivät emme en et ette että he heidän heidät heihin heille "
    "heillä heiltä heissä heistä heitä hän häneen hänelle hänellä "
    "häneltä hänen hänessä hänestä hänet häntä itse ja johon joiden "
    "joihin joiksi joilla joille joilta joina joissa joista joita "
    "joka joksi jolla jolle jolta jona jonka jos jossa josta jota "
    "jotka kanssa keiden keihin keiksi keille keillä keiltä keinä "
    "keissä keistä keitä keneen keneksi kenelle kenellä keneltä "
    "kenen kenenä kenessä kenestä kenet ketkä ketä koska kuin kuka "
    "kun me meidän meidät meihin meille meillä meiltä meissä meistä "
    "meitä mihin miksi mikä mille millä miltä minkä minua minulla "
    "minulle minulta minun minussa minusta minut minuun minä missä "
    "mistä mitkä mitä mukaan mutta ne niiden niihin niiksi niille "
    "niillä niiltä niin niinä niissä niistä niitä noiden noihin "
    "noiksi noilla noille noilta noin noina noissa noista noita nuo "
    "nyt näiden näihin näiksi näille näillä näiltä näinä näissä "
    "näistä näitä nämä ole olemme olen olet olette oli olimme olin "
    "olisi olisimme olisin olisit olisitte olisivat olit olitte "
    "olivat olla olleet ollut on ovat poikki se sekä sen siihen "
    "siinä siitä siksi sille sillä siltä sinua sinulla sinulle "
    "sinulta sinun sinussa sinusta sinut sinuun sinä sitä tai te "
    "teidän teidät teihin teille teillä teiltä teissä teistä teitä "
    "tuo tuohon tuoksi tuolla tuolle tuolta tuon tuona tuossa tuosta "
    "tuota tähän täksi tälle tällä tältä tämä tämän tänä tässä tästä "
    "tätä vaan vai vaikka yli "
).split()
)

SWEDISH_STOP_WORDS = frozenset(
(
    "alla allt att av blev bli blir blivit de dem den denna deras "
    "dess dessa det detta dig din dina ditt du där då efter ej eller "
    "en er era ert ett från för ha hade han hans har henne hennes "
    "hon honom hur här i icke ingen inom inte jag ju kan kunde man "
    "med mellan men mig min mina mitt mot mycket ni nu när någon "
    "något några och om oss på samma sedan sig sin sina sitta själv "
    "skulle som så sådan sådana sådant till under upp ut utan vad "
    "var vara varför varit varje vars vart vem vi vid vilka vilkas "
    "vilken vilket vår våra vårt än är åt över "
).split()
)

HUNGARIAN_STOP_WORDS = frozenset(
(
    "a abban ahhoz ahogy ahol aki akik akkor alatt amely amelyek "
    "amelyekben amelyeket amelyet amelynek ami amikor amit amolyan "
    "amíg annak arra arról az azok azon azonban azt aztán azután "
    "azzal azért be belül benne bár cikk cikkek cikkeket csak de e "
    "ebben eddig egy egyes egyetlen egyik egyre egyéb egész ehhez "
    "ekkor el ellen első elég elő először előtt emilyen ennek erre "
    "ez ezek ezen ezt ezzel ezért fel felé hanem hiszen hogy hogyan "
    "igen ill ill. illetve ilyen ilyenkor ismét ison itt jobban jó "
    "jól kell kellett keressünk keresztül ki kívül között közül "
    "legalább legyen lehet lehetett lenne lenni lesz lett maga magát "
    "majd meg mellett mely melyek mert mi mikor milyen minden "
    "mindenki mindent mindig mint mintha mit mivel miért most már "
    "más másik még míg nagy nagyobb nagyon ne nekem neki nem nincs "
    "néha néhány nélkül olyan ott pedig persze rá s saját sem semmi "
    "sok sokat sokkal szemben szerint szinte számára talán tehát "
    "teljes tovább továbbá több ugyanis utolsó után utána vagy "
    "vagyis vagyok valaki valami valamint való van vannak vele "
    "vissza viszont volna volt voltak voltam voltunk által általában "
    "át én éppen és így össze úgy új újabb újra ő ők őket "
).split()
)

NORWEGIAN_STOP_WORDS = frozenset(
(
    "alle at av bare begge ble blei bli blir blitt både båe da de "
    "deg dei deim deira deires dem den denne der dere deres det "
    "dette di din disse ditt du dykk dykkar då eg ein eit eitt eller "
    "elles en enn er et ett etter for fordi fra før ha hadde han "
    "hans har hennar henne hennes her hjå ho hoe honom hoss hossen "
    "hun hva hvem hver hvilke hvilken hvis hvor hvordan hvorfor i "
    "ikke ikkje ingen ingi inkje inn inni ja jeg kan kom korleis "
    "korso kun kunne kva kvar kvarhelst kven kvi kvifor man mange me "
    "med medan meg meget mellom men mi min mine mitt mot mykje ned "
    "no noe noen noka noko nokon nokor nokre nå når og også om opp "
    "oss over på samme seg selv si sia sidan siden sin sine sitt "
    "sjøl skal skulle slik so som somme somt så sånn til um upp ut "
    "uten var vart varte ved vere verte vi vil ville vore vors vort "
    "vår være vært å "
).split()
)
DANISH_STOP_WORDS = frozenset(
(
    "ad af alle alt anden at blev blive bliver da de dem den denne "
    "der deres det dette dig din disse dog du efter eller en end er "
    "et for fra ham han hans har havde have hende hendes her hos hun "
    "hvad hvis hvor i ikke ind jeg jer jo kunne man mange med meget "
    "men mig min mine mit mod ned noget nogle nu når og også om op "
    "os over på selv sig sin sine sit skal skulle som sådan thi til "
    "ud under var vi vil ville vor være været "
).split()
)
DUTCH_STOP_WORDS = frozenset(
(
    "aan al alles als altijd andere ben bij daar dan dat de der deze "
    "die dit doch doen door dus een eens en er ge geen geweest haar "
    "had heb hebben heeft hem het hier hij hoe hun iemand iets ik in "
    "is ja je kan kon kunnen maar me meer men met mij mijn moet na "
    "naar niet niets nog nu of om omdat onder ons ook op over reeds "
    "te tegen toch toen tot u uit uw van veel voor want waren was "
    "wat werd wezen wie wil worden wordt zal ze zelf zich zij zijn "
    "zo zonder zou "
).split()
)
#: RomanianAnalyzer stopwords.txt (Savoy BSD list, #-comments)
#: ``tr/stopwords.txt`` — the TurkishAnalyzer default stop set (209
#: words; loaded by ``TurkishAnalyzer.getDefaultStopSet`` with '#'
#: comments stripped).
TURKISH_STOP_WORDS = frozenset(
(
    "acaba altmış altı ama ancak arada aslında ayrıca bana bazı belki "
    "ben benden beni benim beri beş bile bin bir birçok biri birkaç "
    "birkez birşey birşeyi biz bize bizden bizi bizim böyle böylece "
    "bu buna bunda bundan bunlar bunları bunların bunu bunun burada "
    "çok çünkü da daha dahi de defa değil diğer diye doksan dokuz "
    "dolayı dolayısıyla dört edecek eden ederek edilecek ediliyor "
    "edilmesi ediyor eğer elli en etmesi etti ettiği ettiğini gibi "
    "göre halen hangi hatta hem henüz hep hepsi her herhangi herkesin "
    "hiç hiçbir için iki ile ilgili ise işte itibaren itibariyle "
    "kadar karşın katrilyon kendi kendilerine kendini kendisi "
    "kendisine kendisini kez ki kim kimden kime kimi kimse kırk "
    "milyar milyon mu mü mı nasıl ne neden nedenle nerde nerede "
    "nereye niye niçin o olan olarak oldu olduğu olduğunu "
    "olduklarını olmadı olmadığı olmak olması olmayan olmaz olsa "
    "olsun olup olur olursa oluyor on ona ondan onlar onlardan onları "
    "onların onu onun otuz oysa öyle pek rağmen sadece sanki sekiz "
    "seksen sen senden seni senin siz sizden sizi sizin şey şeyden "
    "şeyi şeyler şöyle şu şuna şunda şundan şunları şunu tarafından "
    "trilyon tüm üç üzere var vardı ve veya ya yani yapacak yapılan "
    "yapılması yapıyor yapmak yaptı yaptığı yaptığını yaptıkları "
    "yedi yerine yetmiş yine yirmi yoksa yüz zaten "
).split()
)

#: ``ga/stopwords.txt`` — the IrishAnalyzer default stop set (110 words;
#: loaded by ``IrishAnalyzer.getDefaultStopSet``). Includes the bare
#: elided-article forms ``b'``/``d'``/``m'``.
IRISH_STOP_WORDS = frozenset(
(
    "a ach ag agus an aon ar arna as b' ba beirt bhúr caoga ceathair "
    "ceathrar chomh chtó chuig chun cois céad cúig cúigear d' "
    "daichead dar de deich deichniúr den dhá do don dtí dá dár dó "
    "faoi faoin faoina faoinár fara fiche gach gan go gur haon hocht "
    "i iad idir in ina ins inár is le leis lena lenár m' mar mo mé "
    "na nach naoi naonúr ná ní níor nó nócha ocht ochtar os roimh sa "
    "seacht seachtar seachtó seasca seisear siad sibh sinn sna sé sí "
    "tar thar thú triúr trí trína trínár tríocha tú um ár é éis í ó "
    "ón óna ónár "
).split()
)

ROMANIAN_STOP_WORDS = frozenset(
(
    "acea aceasta această aceea acei aceia acel acela acele acelea "
    "acest acesta aceste acestea aceşti aceştia acolo acum ai aia "
    "aibă aici al ale alea altceva altcineva am ar are asemenea asta "
    "astea astăzi asupra au avea avem aveţi azi aş aşadar aţi bine "
    "bucur bună ca care ce cel ceva chiar cine cineva contra cu cum "
    "cumva curând curînd când cât câte câtva câţi cînd cît cîte "
    "cîtva cîţi că căci cărei căror cărui către da dacă dar datorită "
    "de deci deja deoarece departe deşi din dinaintea dintr dintre "
    "drept după dă ea ei el ele eram este eu eşti face fi fie "
    "fiecare fii fim fiţi fără iar ieri la le li lor lui lângă lîngă "
    "mea mei mele mereu meu mi mine mult multă mulţi mâine mă ne "
    "nici nicăieri nimeni nişte noastre noastră noi nostru noştri nu "
    "ori oricare orice oricine oricum oricând oricât oricînd oricît "
    "oriunde pe pentru peste poate pot prea prima primul prin printr "
    "până pînă sa sale sau se spre sub sunt suntem sunteţi sînt "
    "sîntem sînteţi să săi său ta tale te tine toate toată tot "
    "totuşi toţi tu tăi tău un una unde undeva unei unele uneori "
    "unor vi voastre voastră voi vostru vouă voştri vreo vreun vă îi "
    "îl îmi împotriva în înainte înaintea încotro încât încît între "
    "întrucât întrucît îţi ăla ălea ăsta ăstea ăştia şi ţi ţie "
).split()
)


# ---------------------------------------------------------------------------
# Minimal stemmers (Savoy, *Morphologie et recherche d'information*) —
# the reference's *MinimalStemmer.java companions to the light family.
# ---------------------------------------------------------------------------

_DE_MIN_FOLD = str.maketrans("äöü", "aou")


def german_minimal_stem(term: str) -> str:
    """de/GermanMinimalStemmer.java: umlaut fold + plural n/e/s/r tiers."""
    if len(term) < 5:
        return term
    s = term.translate(_DE_MIN_FOLD)
    n = len(s)
    if n > 6 and s.endswith("nen"):
        return s[:-3]
    if n > 5 and s[-2:] in ("en", "se", "es", "er"):
        return s[:-2]
    if s[-1] in "nesr":
        return s[:-1]
    return s


def french_minimal_stem(term: str) -> str:
    """fr/FrenchMinimalStemmer.java: x-plural rewrite then the
    s/r/e/é/double-letter truncation chain."""
    if len(term) < 6:
        return term
    s = term
    if s[-1] == "x":
        if s[-3] == "a" and s[-2] == "u":
            s = s[:-3] + "al"  # aux → al (u→l then drop x)
            return s
        return s[:-1]
    if s[-1] == "s":
        s = s[:-1]
    if s[-1] == "r":
        s = s[:-1]
    if s[-1] == "e":
        s = s[:-1]
    if s[-1] == "é":
        s = s[:-1]
    if len(s) >= 2 and s[-1] == s[-2] and s[-1].isalpha():
        s = s[:-1]
    return s


def norwegian_minimal_stem(
    term: str, *, bokmaal: bool = True, nynorsk: bool = False
) -> str:
    """no/NorwegianMinimalStemmer.java with the BOKMAAL/NYNORSK flags."""
    s = term
    if len(s) > 4 and s[-1] == "s":
        s = s[:-1]
    n = len(s)
    if n > 5 and (s.endswith("ene") or (nynorsk and s.endswith("ane"))):
        return s[:-3]
    if n > 4 and (
        s.endswith(("er", "en", "et")) or (nynorsk and s.endswith("ar"))
    ):
        return s[:-2]
    if n > 3 and s[-1] in "ae":
        return s[:-1]
    return s
