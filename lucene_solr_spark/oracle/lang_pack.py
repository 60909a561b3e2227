"""Hand-written (non-Snowball, non-UniNE-light) language stemmer pack.

The reference ships a family of short algorithmic stemmers published in
the CLEF literature that are neither Snowball machines nor the UniNE
"light" pack already in :mod:`lucene_solr_spark.oracle.light_stemmers`:

- Czech (``cz/CzechStemmer.java`` — Dolamic & Savoy, "Indexing and
  stemming approaches for the Czech language")
- Bulgarian (``bg/BulgarianStemmer.java`` — Savoy, "Searching
  Strategies for the Bulgarian Language")

Each is re-expressed here as a per-term Python callable (applied once
per DISTINCT term by the batch tokenizer's dictionary-encode, so no
per-token Python) plus a layered DuckDB SQL twin (a tuple of
expressions over a column named ``term``, one tokens-CTE layer each)
so the full analyzer chains are VALUE-exact checkable against SQL.
Registration into the ``stemmer=`` seam happens in
``light_stemmers._register_lang_pack``.
"""

from __future__ import annotations

__all__ = [
    "czech_stem",
    "bulgarian_stem",
    "CZECH_SQL",
    "BULGARIAN_SQL",
    "CZECH_STOP_WORDS",
    "BULGARIAN_STOP_WORDS",
]


# ---------------------------------------------------------------- Czech

def _cz_remove_case(s: str) -> str:
    """``CzechStemmer.removeCase`` (cz/CzechStemmer.java:46-113):
    longest-suffix cascade, first match wins."""
    L = len(s)
    if L > 7 and s.endswith("atech"):
        return s[:-5]
    if L > 6 and s.endswith(("ětem", "etem", "atům")):
        return s[:-4]
    if L > 5 and s.endswith(
        (
            "ech", "ich", "ích", "ého", "ěmi", "emi", "ému", "ěte", "ete",
            "ěti", "eti", "ího", "iho", "ími", "ímu", "imu", "ách", "ata",
            "aty", "ých", "ama", "ami", "ové", "ovi", "ými",
        )
    ):
        return s[:-3]
    if L > 4 and s.endswith(
        ("em", "es", "ém", "ím", "ům", "at", "ám", "os", "us", "ým", "mi", "ou")
    ):
        return s[:-2]
    if L > 3 and s[-1] in "aeiouůyáéíýě":
        return s[:-1]
    return s


def _cz_remove_possessives(s: str) -> str:
    """cz/CzechStemmer.java:115-120."""
    if len(s) > 5 and s.endswith(("ov", "in", "ův")):
        return s[:-2]
    return s


def _cz_normalize(s: str) -> str:
    """cz/CzechStemmer.java:122-154: palatalization fix-ups, first
    match wins (čt→ck, št→sk, c/č→k, z/ž→h, penultimate-e deletion,
    penultimate-ů→o)."""
    if s.endswith("čt"):
        return s[:-2] + "ck"
    if s.endswith("št"):
        return s[:-2] + "sk"
    c = s[-1]
    if c in "cč":
        return s[:-1] + "k"
    if c in "zž":
        return s[:-1] + "h"
    if len(s) > 1 and s[-2] == "e":
        return s[:-2] + s[-1]
    if len(s) > 2 and s[-2] == "ů":
        return s[:-2] + "o" + s[-1]
    return s


def czech_stem(term: str) -> str:
    """Light stemmer for Czech (``cz/CzechStemmer.java:37-44``):
    removeCase → removePossessives → normalize. Input is expected
    lowercase (the CzechAnalyzer chain lowercases first) but WITH
    diacritics."""
    s = _cz_remove_case(term)
    s = _cz_remove_possessives(s)
    if s:
        s = _cz_normalize(s)
    return s


def _sufx(words) -> str:
    return ", ".join(f"'{w}'" for w in words)


#: layered DuckDB twin of czech_stem — one tokens-CTE layer per stage.
CZECH_SQL = (
    # removeCase (cz/CzechStemmer.java:46-113)
    f"""CASE
        WHEN length(term) > 7 AND right(term, 5) = 'atech' THEN left(term, length(term)-5)
        WHEN length(term) > 6 AND right(term, 4) IN ({_sufx(('ětem', 'etem', 'atům'))}) THEN left(term, length(term)-4)
        WHEN length(term) > 5 AND right(term, 3) IN ({_sufx(('ech', 'ich', 'ích', 'ého', 'ěmi', 'emi', 'ému', 'ěte', 'ete', 'ěti', 'eti', 'ího', 'iho', 'ími', 'ímu', 'imu', 'ách', 'ata', 'aty', 'ých', 'ama', 'ami', 'ové', 'ovi', 'ými'))}) THEN left(term, length(term)-3)
        WHEN length(term) > 4 AND right(term, 2) IN ({_sufx(('em', 'es', 'ém', 'ím', 'ům', 'at', 'ám', 'os', 'us', 'ým', 'mi', 'ou'))}) THEN left(term, length(term)-2)
        WHEN length(term) > 3 AND right(term, 1) IN ({_sufx('aeiouůyáéíýě')}) THEN left(term, length(term)-1)
        ELSE term END""",
    # removePossessives (:115-120)
    """CASE
        WHEN length(term) > 5 AND right(term, 2) IN ('ov', 'in', 'ův') THEN left(term, length(term)-2)
        ELSE term END""",
    # normalize (:122-154)
    """CASE
        WHEN right(term, 2) = 'čt' THEN left(term, length(term)-2) || 'ck'
        WHEN right(term, 2) = 'št' THEN left(term, length(term)-2) || 'sk'
        WHEN right(term, 1) IN ('c', 'č') THEN left(term, length(term)-1) || 'k'
        WHEN right(term, 1) IN ('z', 'ž') THEN left(term, length(term)-1) || 'h'
        WHEN length(term) > 1 AND substr(term, length(term)-1, 1) = 'e' THEN left(term, length(term)-2) || right(term, 1)
        WHEN length(term) > 2 AND substr(term, length(term)-1, 1) = 'ů' THEN left(term, length(term)-2) || 'o' || right(term, 1)
        ELSE term END""",
)

#: cz/stopwords.txt ("#"-comment wordlist, 171 entries)
CZECH_STOP_WORDS = frozenset(
    (
        "a aby aj ale ani asi atd atp až bez bude budem budeš by byl "
        "byla byli bylo být co což cz další dnes do ho i jak jakmile "
        "jako jakož je jeho jehož jej jejich její jelikož jemu jen "
        "ještě jež ji jiné již jsem jseš jsme jsou jste já jí jíž k kam "
        "kde kdo když ke kterou která které který kteří mezi mi mne my "
        "má máte mít mě můj může na nad napište načež naši nebo neg "
        "nejsou není než nic nové nový nám nás němu němuž o od on ona "
        "oni ono ony pak po pod podle pokud pouze pravé pro proto "
        "protože proč první pta před přes při přičemž re s se si strana "
        "své svých svým svými ta tak také takže tato tedy ten tento "
        "teto tipy to tohle toho tohoto tom tomto tomu tomuto tu tuto "
        "ty tyto téma tím tímto těm těmu u už v vaše ve vy vám vás více "
        "však z za zda zde ze zprávy zpět či článku články"
    ).split()
)


# ------------------------------------------------------------ Bulgarian

def _bg_remove_article(s: str) -> str:
    """bg/BulgarianStemmer.java:77-96."""
    L = len(s)
    if L > 6 and s.endswith("ият"):
        return s[:-3]
    if L > 5 and s.endswith(("ът", "то", "те", "та", "ия")):
        return s[:-2]
    if L > 4 and s.endswith("ят"):
        return s[:-2]
    return s


def _bg_remove_plural(s: str) -> str:
    """bg/BulgarianStemmer.java:98-135."""
    L = len(s)
    if L > 6:
        if s.endswith("овци"):
            return s[:-3]  # keeps 'о'
        if s.endswith("ове"):
            return s[:-3]
        if s.endswith("еве"):
            return s[:-3] + "й"
    if L > 5:
        if s.endswith("ища"):
            return s[:-3]
        if s.endswith("та"):
            return s[:-2]
        if s.endswith("ци"):
            return s[:-2] + "к"
        if s.endswith("зи"):
            return s[:-2] + "г"
        if s[-3] == "е" and s[-1] == "и":
            return s[:-3] + "я" + s[-2]  # е→я, drop final и
    if L > 4:
        if s.endswith("си"):
            return s[:-2] + "х"
        if s.endswith("и"):
            return s[:-1]
    return s


def bulgarian_stem(term: str) -> str:
    """Light stemmer for Bulgarian (``bg/BulgarianStemmer.java:37-70``):
    entry guard len<4, the ища fast-exit, article → plural → final-vowel
    strips (я then а/о/е, both under ONE pre-strip len>3 guard) →
    ен→н → penultimate-ъ deletion."""
    s = term
    if len(s) < 4:
        return s
    if len(s) > 5 and s.endswith("ища"):
        return s[:-3]
    s = _bg_remove_article(s)
    s = _bg_remove_plural(s)
    if len(s) > 3:
        if s.endswith("я"):
            s = s[:-1]
        if s and s[-1] in "аое":
            s = s[:-1]
    if len(s) > 4 and s.endswith("ен"):
        s = s[:-2] + "н"
    if len(s) > 5 and s[-2] == "ъ":
        s = s[:-2] + s[-1]
    return s


_BG_SKIP = "left(term, 1) = chr(1)"

#: layered DuckDB twin of bulgarian_stem. The ища fast-exit marks the
#: term with a chr(1) sentinel (the Finnish/Portuguese fold-skip idiom)
#: so later layers pass it through; the final layer strips the mark.
#: The я + а/о/е pair shares ONE len>3 guard evaluated BEFORE the я
#: strip (matching the Java block), hence the nested CASE.
BULGARIAN_SQL = (
    # entry guard + ища fast-exit (bg/BulgarianStemmer.java:43-48)
    """CASE
        WHEN length(term) < 4 THEN chr(1) || term
        WHEN length(term) > 5 AND right(term, 3) = 'ища' THEN chr(1) || left(term, length(term)-3)
        ELSE term END""",
    # removeArticle (:77-96)
    f"""CASE
        WHEN {_BG_SKIP} THEN term
        WHEN length(term) > 6 AND right(term, 3) = 'ият' THEN left(term, length(term)-3)
        WHEN length(term) > 5 AND right(term, 2) IN ('ът', 'то', 'те', 'та', 'ия') THEN left(term, length(term)-2)
        WHEN length(term) > 4 AND right(term, 2) = 'ят' THEN left(term, length(term)-2)
        ELSE term END""",
    # removePlural (:98-135)
    f"""CASE
        WHEN {_BG_SKIP} THEN term
        WHEN length(term) > 6 AND right(term, 4) = 'овци' THEN left(term, length(term)-3)
        WHEN length(term) > 6 AND right(term, 3) = 'ове' THEN left(term, length(term)-3)
        WHEN length(term) > 6 AND right(term, 3) = 'еве' THEN left(term, length(term)-3) || 'й'
        WHEN length(term) > 5 AND right(term, 3) = 'ища' THEN left(term, length(term)-3)
        WHEN length(term) > 5 AND right(term, 2) = 'та' THEN left(term, length(term)-2)
        WHEN length(term) > 5 AND right(term, 2) = 'ци' THEN left(term, length(term)-2) || 'к'
        WHEN length(term) > 5 AND right(term, 2) = 'зи' THEN left(term, length(term)-2) || 'г'
        WHEN length(term) > 5 AND substr(term, length(term)-2, 1) = 'е' AND right(term, 1) = 'и' THEN left(term, length(term)-3) || 'я' || substr(term, length(term)-1, 1)
        WHEN length(term) > 4 AND right(term, 2) = 'си' THEN left(term, length(term)-2) || 'х'
        WHEN length(term) > 4 AND right(term, 1) = 'и' THEN left(term, length(term)-1)
        ELSE term END""",
    # я then а/о/е, both under one pre-strip len>3 guard (:52-59)
    f"""CASE
        WHEN {_BG_SKIP} OR length(term) <= 3 THEN term
        WHEN right(term, 1) = 'я' AND substr(term, length(term)-1, 1) IN ('а', 'о', 'е') THEN left(term, length(term)-2)
        WHEN right(term, 1) = 'я' THEN left(term, length(term)-1)
        WHEN right(term, 1) IN ('а', 'о', 'е') THEN left(term, length(term)-1)
        ELSE term END""",
    # ен → н (:61-67)
    f"""CASE
        WHEN {_BG_SKIP} THEN term
        WHEN length(term) > 4 AND right(term, 2) = 'ен' THEN left(term, length(term)-2) || 'н'
        ELSE term END""",
    # penultimate-ъ deletion (:69-72) + sentinel strip
    f"""CASE
        WHEN {_BG_SKIP} THEN substr(term, 2)
        WHEN length(term) > 5 AND substr(term, length(term)-1, 1) = 'ъ' THEN left(term, length(term)-2) || right(term, 1)
        ELSE term END""",
)

#: bg/stopwords.txt ("#"-comment wordlist, 190 entries)
BULGARIAN_STOP_WORDS = frozenset(
    (
        "а аз ако ала бе без беше би бил била били било близо бъдат "
        "бъде бяха в вас ваш ваша вероятно вече взема ви вие винаги все "
        "всеки всички всичко всяка във въпреки върху г ги главно го д "
        "да дали до докато докога дори досега доста е едва един ето за "
        "зад заедно заради засега затова защо защото и из или им има "
        "имат иска й каза как каква какво както какъв като кога когато "
        "което които кой който колко която къде където към ли м ме "
        "между мен ми мнозина мога могат може моля момента му н на над "
        "назад най направи напред например нас не него нея ни ние никой "
        "нито но някои някой няма обаче около освен особено от отгоре "
        "отново още пак по повече повечето под поне поради после почти "
        "прави пред преди през при пък първо с са само се сега си скоро "
        "след сме според сред срещу сте съм със също т тази така такива "
        "такъв там твой те тези ти тн то това тогава този той толкова "
        "точно трябва тук тъй тя тях у харесва ч че често чрез ще щом я"
    ).split()
)
