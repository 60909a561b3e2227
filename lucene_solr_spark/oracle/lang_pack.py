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
    "arabic_normalize",
    "arabic_stem",
    "persian_normalize",
    "decimal_digit_fold",
    "arabic_fold",
    "persian_fold",
    "CZECH_SQL",
    "BULGARIAN_SQL",
    "ARABIC_STEM_SQL",
    "ARABIC_NORMALIZE_SQL",
    "PERSIAN_NORMALIZE_SQL",
    "CZECH_STOP_WORDS",
    "BULGARIAN_STOP_WORDS",
    "ARABIC_STOP_WORDS",
    "PERSIAN_STOP_WORDS",
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


# --------------------------------------------------------------- Arabic

#: ArabicNormalizer.java:36-100 — hamza-seated alefs → bare alef,
#: dotless yeh → yeh, teh marbuta → heh; tatweel + harakat DELETED.
_AR_NORM_MAP = str.maketrans(
    {
        "\u0622": "\u0627",  # alef madda
        "\u0623": "\u0627",  # alef hamza above
        "\u0625": "\u0627",  # alef hamza below
        "\u0649": "\u064A",  # dotless yeh -> yeh
        "\u0629": "\u0647",  # teh marbuta -> heh
        "\u0640": None,  # tatweel
        "\u064B": None, "\u064C": None, "\u064D": None,  # -atan marks
        "\u064E": None, "\u064F": None, "\u0650": None,  # fatha/damma/kasra
        "\u0651": None, "\u0652": None,  # shadda/sukun
    }
)


def arabic_normalize(term: str) -> str:
    """``ar/ArabicNormalizer.java:66-98`` as one codepoint map."""
    return term.translate(_AR_NORM_MAP)


#: same map as SQL (translate deletes chars with no 'to' counterpart —
#: identical semantics in DuckDB)
ARABIC_NORMALIZE_SQL = (
    "translate(term, '\u0622\u0623\u0625\u0649\u0629"
    "\u0640\u064B\u064C\u064D\u064E\u064F\u0650\u0651\u0652', "
    "'\u0627\u0627\u0627\u064A\u0647')"
)

#: ArabicStemmer.java:46-67 — attached article/conjunction/preposition
#: prefixes (FIRST match strips, once) and the suffix list (EVERY match
#: strips, scanned in list order with the length re-checked each time)
_AR_PREFIXES = ("\u0627\u0644", "\u0648\u0627\u0644", "\u0628\u0627\u0644",
                "\u0643\u0627\u0644", "\u0641\u0627\u0644", "\u0644\u0644",
                "\u0648")
_AR_SUFFIXES = ("\u0647\u0627", "\u0627\u0646", "\u0627\u062A",
                "\u0648\u0646", "\u064A\u0646", "\u064A\u0647",
                "\u064A\u0629", "\u0647", "\u0629", "\u064A")


def arabic_stem(term: str) -> str:
    """``ar/ArabicStemmer.java:76-107``: one prefix strip (wa- needs
    len>=4, the rest len>=prefix+2), then the ordered suffix sweep
    (each suffix needs 2 chars left after stemming)."""
    s = term
    for p in _AR_PREFIXES:
        if len(p) == 1:
            if len(s) >= 4 and s.startswith(p):
                s = s[1:]
                break
        elif len(s) >= len(p) + 2 and s.startswith(p):
            s = s[len(p):]
            break
    for x in _AR_SUFFIXES:
        if len(s) >= len(x) + 2 and s.endswith(x):
            s = s[: -len(x)]
    return s


def _ar_suffix_layer(x: str) -> str:
    n = len(x)
    return (
        f"CASE WHEN length(term) >= {n + 2} AND right(term, {n}) = '{x}' "
        f"THEN left(term, length(term)-{n}) ELSE term END"
    )


#: layered DuckDB twin of arabic_stem: one prefix CASE + one layer per
#: suffix (the Java loop re-checks length after each strip — exactly a
#: layer chain)
ARABIC_STEM_SQL = (
    """CASE
        WHEN length(term) >= 5 AND left(term, 3) IN ('\u0648\u0627\u0644', '\u0628\u0627\u0644', '\u0643\u0627\u0644', '\u0641\u0627\u0644') THEN substr(term, 4)
        WHEN length(term) >= 4 AND left(term, 2) IN ('\u0627\u0644', '\u0644\u0644') THEN substr(term, 3)
        WHEN length(term) >= 4 AND left(term, 1) = '\u0648' THEN substr(term, 2)
        ELSE term END""",
) + tuple(_ar_suffix_layer(x) for x in _AR_SUFFIXES)


def decimal_digit_fold(term: str) -> str:
    """``core/DecimalDigitFilter.java``: every Unicode decimal digit
    (Nd) folds to its 0-9 equivalent."""
    if term.isascii():
        return term
    import unicodedata

    out = []
    for c in term:
        d = unicodedata.decimal(c, None)
        out.append(chr(0x30 + d) if d is not None and not "0" <= c <= "9" else c)
    return "".join(out)


def arabic_fold(term: str) -> str:
    """The ArabicAnalyzer pre-stop stages (``ar/ArabicAnalyzer.java:
    123-134``): LowerCaseFilter + DecimalDigitFilter. The stop list is
    NOT normalized, so ArabicNormalization runs AFTER the stop filter —
    it lives inside the "arabic" stemmer seam instead."""
    return decimal_digit_fold(term.lower())


def arabic_chain_stem(term: str) -> str:
    """The post-stop ArabicAnalyzer stages: normalize → stem."""
    return arabic_stem(arabic_normalize(term))


# --------------------------------------------------------------- Persian

#: PersianNormalizer.java:34-85 — farsi yeh / yeh barree → arabic yeh,
#: keheh → kaf, heh+yeh / heh goal → heh, hamza-above DELETED
_FA_NORM_MAP = str.maketrans(
    {
        "\u06CC": "\u064A",
        "\u06D2": "\u064A",
        "\u06A9": "\u0643",
        "\u06C0": "\u0647",
        "\u06C1": "\u0647",
        "\u0654": None,
    }
)


def persian_normalize(term: str) -> str:
    return term.translate(_FA_NORM_MAP)


PERSIAN_NORMALIZE_SQL = (
    "translate(term, '\u06CC\u06D2\u06A9\u06C0\u06C1\u0654', "
    "'\u064A\u064A\u0643\u0647\u0647')"
)


def persian_fold(term: str) -> str:
    """The PersianAnalyzer chain minus the stop filter
    (``fa/PersianAnalyzer.java:106-118``): LowerCase → DecimalDigit →
    ArabicNormalization → PersianNormalization, all BEFORE the stop
    filter (the fa stop list ships pre-normalized — the file header
    says to use arabic yeh). There is no Persian stem stage."""
    return persian_normalize(arabic_normalize(decimal_digit_fold(term.lower())))

#: ar/stopwords.txt ("#"-comment wordlist, 119 entries; UNnormalized forms)
ARABIC_STOP_WORDS = frozenset(
    (
        "أ ألا أما أن أنت أنه أنها أو أى أي أيضا إذا إلا إلى إلي إما "
        "إن إنه إنها ا اذا الآن الا الان التى التي الذى الذي الذين "
        "الى الي اما ان انت انه انها او اى اي ايضا ب بأن بان بعد بعض "
        "به بها بين بينما تكون تلك ثم جميع حتى حيث خلال ذلك ضمن على "
        "عليه عليها عن عند عندما غير ف فأن فان فما فهو فهى فهي في فيه "
        "فيها قبل قد كان كانت كل كما لا لدى لك لكن لم لن له لها ما مع "
        "من منذ منه منها نحو هذا هذه هناك هو هى هي و وأن وإن وان وفي "
        "وكان وكانت وكل ولا ولم ولن وما ومن وهو وهى وهي يكون "
    ).split()
)

#: fa/stopwords.txt ("#"-comment wordlist, 308 entries; ships pre-normalized)
PERSIAN_STOP_WORDS = frozenset(
    (
        "اباد اثر اره اري از است استفاده اش اكنون البته ام اما امد "
        "امده امروز امسال ان انان انجا اند انكه انها انچه او اورد "
        "اورده اول اي ايا ايد ايشان ايم اين اينكه اگر با بار باره "
        "باشد باشند باشيم بالا بالاي بايد بدون بر برابر براساس براي "
        "برخوردار برخي برداري بروز بسيار بسياري بعد بعري بعضي بلكه "
        "بله بلي بنابراين بندي به بهترين بود بودن بودند بوده بي بيرون "
        "بيست بيش بيشتر بيشتري بين تا تازه تاكنون تان تحت تر ترين "
        "تمام تمامي تنها تواند توانند توسط تول توي جا جاي جايي جدا "
        "جديد جريان جز جلوي جلوگيري حتي حدود حق خارج خدمات خواست "
        "خواهد خواهند خواهيم خود خويش خياه داد دادن دادند داده دارد "
        "دارند داريم داشت داشتن داشتند داشته دانست دانند در درباره "
        "دنبال ده دهد دهند دو دوم ديده ديروز ديگر ديگران ديگري را راه "
        "رفت رفته روب روزهاي روي ريزي زياد زير زيرا سابق ساخته سازي "
        "سراسر سري سعي سمت سوم سوي سپس شان شايد شد شدن شدند شده شش "
        "شما شناسي شود شوند صورت ضد ضمن طبق طريق طور طي عقب علت عنوان "
        "غير فقط فكر فوق قابل قبل قصد كجا كجاست كدام كرد كردم كردن "
        "كردند كرده كس كسي كل كمتر كنار كند كنم كنند كنيد كنيم كه كي "
        "لطفا ما مان مانند مثل مختلف مدتي مردم مرسي مقابل من مورد مي "
        "ميليارد ميليون مگر ناشي نام نبايد نبود نخست نخستين نخواهد "
        "ندارد ندارند نداشته نزد نزديك نشان نشده نظير نكرده نمايد نمي "
        "نه نوعي نيز نيست ه ها هاي هايي هر هرگز هزار هست هستند هستيم "
        "هفت هم همان همه همواره همين همچنان همچنين همچون هنوز هنگام "
        "هنگامي هيچ و وسط وقتي وقتيكه ولي وي وگو يا يابد يك يكديگر "
        "يكي پاعين پس پنج پيش چرا چطور چند چندين چنين چه چهار چون چيز "
        "چيزي چيست چگونه گذاري گذاشته گردد گرفت گرفته گروهي گفت گفته "
        "گويد گويند گيرد گيري "
    ).split()
)


#: one-expression SQL twin of persian_fold minus lower/digits (identity
#: on [a-z0-9]-derived gate corpora): ArabicNormalization then
#: PersianNormalization as nested translates (deleting chars absent
#: from the 'to' string, matching the Java delete cases)
PERSIAN_FOLD_SQL = (
    "translate(translate(term, "
    "'\u0622\u0623\u0625\u0649\u0629\u0640\u064B\u064C\u064D\u064E\u064F\u0650\u0651\u0652', "
    "'\u0627\u0627\u0627\u064A\u0647'), "
    "'\u06CC\u06D2\u06A9\u06C0\u06C1\u0654', '\u064A\u064A\u0643\u0647\u0647')"
)


# --------------------------------------------------------------- Latvian

#: lv/LatvianStemmer.java:51-72 — (affix, vowel-count threshold,
#: palatalizes) in priority order; numVowels is counted on the WHOLE
#: word once, and the stem must keep >= vc+? vowels (numVowels > vc)
#: and >= 3 chars beyond the affix
_LV_AFFIXES = (
    ("ajiem", 3, False), ("ajai", 3, False), ("ajam", 2, False),
    ("ajām", 2, False), ("ajos", 2, False), ("ajās", 2, False),
    ("iem", 2, True), ("ajā", 2, False), ("ais", 2, False),
    ("ai", 2, False), ("ei", 2, False), ("ām", 1, False),
    ("am", 1, False), ("ēm", 1, False), ("īm", 1, False),
    ("im", 1, False), ("um", 1, False), ("us", 1, True),
    ("as", 1, False), ("ās", 1, False), ("es", 1, False),
    ("os", 1, True), ("ij", 1, False), ("īs", 1, False),
    ("ēs", 1, False), ("is", 1, False), ("ie", 1, False),
    ("u", 1, True), ("a", 1, True), ("i", 1, True),
    ("e", 1, False), ("ā", 1, False), ("ē", 1, False),
    ("ī", 1, False), ("ū", 1, False), ("o", 1, False),
    ("s", 0, False), ("š", 0, False),
)

_LV_VOWELS = frozenset("aeiouāīēū")


def _lv_unpalatalize(t: str, removed0: str) -> str:
    """lv/LatvianStemmer.java:95-147: undo declension II/V/VI
    palatalization; the kš→kst / ņņ→nn pair fires only when the removed
    affix began with 'u' (gen. pl.)."""
    if removed0 == "u":
        if t.endswith("kš"):
            return t[:-1] + "st"
        if t.endswith("ņņ"):
            return t[:-2] + "nn"
    if t.endswith(("pj", "bj", "mj", "vj")):
        return t[:-1]
    if t.endswith("šņ"):
        return t[:-2] + "sn"
    if t.endswith("žņ"):
        return t[:-2] + "zn"
    if t.endswith("šļ"):
        return t[:-2] + "sl"
    if t.endswith("žļ"):
        return t[:-2] + "zl"
    if t.endswith("ļņ"):
        return t[:-2] + "ln"
    if t.endswith("ļļ"):
        return t[:-2] + "ll"
    if t.endswith("č"):
        return t[:-1] + "c"
    if t.endswith("ļ"):
        return t[:-1] + "l"
    if t.endswith("ņ"):
        return t[:-1] + "n"
    return t


def latvian_stem(term: str) -> str:
    """Light stemmer for Latvian (``lv/LatvianStemmer.java:36-48`` —
    Kreslin's algorithm, noun/adjective primary inflections only):
    first affix in priority order with enough whole-word vowels and a
    >=3-char remainder strips; declension II/V/VI strips unpalatalize."""
    nv = sum(1 for c in term if c in _LV_VOWELS)
    for affix, vc, pal in _LV_AFFIXES:
        if nv > vc and len(term) >= len(affix) + 3 and term.endswith(affix):
            t = term[: -len(affix)]
            return _lv_unpalatalize(t, affix[0]) if pal else t
    return term


#: one-pass SQL twin of latvian_stem, generated from _LV_AFFIXES:
#: layer 1 strips the first qualifying affix (vowel count computed on
#: the ORIGINAL term) and marks palatalizing strips with
#: chr(1)+removed-first-char; layer 2 applies the unpalatalization
#: rewrites and drops the mark.
_LV_VC = "(length(term) - length(translate(term, 'aeiouāīēū', '')))"


def _lv_layer1() -> str:
    branches = []
    for affix, vc, pal in _LV_AFFIXES:
        n = len(affix)
        strip = f"left(term, length(term)-{n})"
        if pal:
            strip = f"chr(1) || '{affix[0]}' || " + strip
        branches.append(
            f"WHEN {_LV_VC} > {vc} AND length(term) >= {n + 3} "
            f"AND right(term, {n}) = '{affix}' THEN {strip}"
        )
    return "CASE\n        " + "\n        ".join(branches) + "\n        ELSE term END"


_LV_S = "substr(term, 3)"  # the stem body behind the 2-char mark
_LV_C0 = "substr(term, 2, 1)"  # first char of the removed affix

LATVIAN_SQL = (
    _lv_layer1(),
    # unpalatalize (lv/LatvianStemmer.java:95-147) for marked terms
    f"""CASE WHEN left(term, 1) <> chr(1) THEN term ELSE
        CASE
        WHEN {_LV_C0} = 'u' AND right(term, 2) = 'kš' THEN left({_LV_S}, length(term)-3) || 'st'
        WHEN {_LV_C0} = 'u' AND right(term, 2) = 'ņņ' THEN left({_LV_S}, length(term)-4) || 'nn'
        WHEN right(term, 2) IN ('pj', 'bj', 'mj', 'vj') THEN left({_LV_S}, length(term)-3)
        WHEN right(term, 2) = 'šņ' THEN left({_LV_S}, length(term)-4) || 'sn'
        WHEN right(term, 2) = 'žņ' THEN left({_LV_S}, length(term)-4) || 'zn'
        WHEN right(term, 2) = 'šļ' THEN left({_LV_S}, length(term)-4) || 'sl'
        WHEN right(term, 2) = 'žļ' THEN left({_LV_S}, length(term)-4) || 'zl'
        WHEN right(term, 2) = 'ļņ' THEN left({_LV_S}, length(term)-4) || 'ln'
        WHEN right(term, 2) = 'ļļ' THEN left({_LV_S}, length(term)-4) || 'll'
        WHEN right(term, 1) = 'č' THEN left({_LV_S}, length(term)-3) || 'c'
        WHEN right(term, 1) = 'ļ' THEN left({_LV_S}, length(term)-3) || 'l'
        WHEN right(term, 1) = 'ņ' THEN left({_LV_S}, length(term)-3) || 'n'
        ELSE {_LV_S} END END""",
)

#: lv/stopwords.txt (161 word entries; the file has bare "#" comment lines that can never match a token)
LATVIAN_STOP_WORDS = frozenset(
    (
        "aiz ap apakš apakšpus ar arī augšpus bet bez bija biji biju "
        "bijām bijāt būs būsi būsiet būsim būt būšu caur diemžēl "
        "diezin droši dēļ esam esat esi esmu gan gar iekam iekams "
        "iekām iekāms iekš iekšpus ik ir it itin iz ja jau jeb jebšu "
        "jel jo jā ka kamēr kaut kolīdz kopš kā kļuva kļuvi kļuvu "
        "kļuvām kļuvāt kļūs kļūsi kļūsiet kļūsim kļūst kļūstam "
        "kļūstat kļūsti kļūstu kļūt kļūšu labad lai lejpus līdz "
        "līdzko ne nebūt nedz nekā nevis nezin no nu nē otrpus pa par "
        "pat pie pirms pret priekš pār pēc starp tad tak tapi taps "
        "tapsi tapsiet tapsim tapt tapāt tapšu taču te tiec tiek "
        "tiekam tiekat tieku tik tika tikai tiki tikko tiklab tiklīdz "
        "tiks tiksiet tiksim tikt tiku tikvien tikām tikāt tikšu "
        "tomēr topat turpretim turpretī tā tādēļ tālab tāpēc un uz "
        "vai var varat varēja varēji varēju varējām varējāt varēs "
        "varēsi varēsiet varēsim varēt varēšu vien virs virspus vis "
        "viņpus zem ārpus šaipus "
    ).split()
)

#: id/stopwords.txt ("#"-comment wordlist, 355 entries)
INDONESIAN_STOP_WORDS = frozenset(
    (
        "ada adalah adanya adapun agak agaknya agar akan akankah "
        "akhirnya aku akulah amat amatlah anda andalah antar antara "
        "antaranya apa apaan apabila apakah apalagi apatah atau "
        "ataukah ataupun bagai bagaikan bagaimana bagaimanakah "
        "bagaimanapun bagi bahkan bahwa bahwasanya banyak beberapa "
        "begini beginian beginikah beginilah begitu begitukah "
        "begitulah begitupun belum belumlah berapa berapakah "
        "berapalah berapapun bermacam bersama betulkah biasa biasanya "
        "bila bilakah bisa bisakah boleh bolehkah bolehlah buat bukan "
        "bukankah bukanlah bukannya cuma dahulu dalam dan dapat dari "
        "daripada dekat demi demikian demikianlah dengan depan di dia "
        "dialah diantara diantaranya dikarenakan dini diri dirinya "
        "disini disinilah dong dulu enggak enggaknya entah entahlah "
        "hal hampir hanya hanyalah harus haruslah harusnya hendak "
        "hendaklah hendaknya hingga ia ialah ibarat ingin inginkah "
        "inginkan ini inikah inilah itu itukah itulah jangan "
        "jangankan janganlah jika jikalau juga justru kala kalau "
        "kalaulah kalaupun kalian kami kamilah kamu kamulah kan kapan "
        "kapankah kapanpun karena karenanya ke kecil kemudian kenapa "
        "kepada kepadanya ketika khususnya kini kinilah kiranya kita "
        "kitalah kok lagi lagian lah lain lainnya lalu lama lamanya "
        "lebih macam maka makanya makin malah malahan mampu mampukah "
        "mana manakala manalagi masih masihkah masing mau maupun "
        "melainkan melalui memang mengapa mereka merekalah merupakan "
        "meski meskipun mungkin mungkinkah nah namun nanti nantinya "
        "nyaris oleh olehnya pada padahal padanya paling pantas para "
        "pasti pastilah per percuma pernah pula pun rupanya saat "
        "saatnya saja sajalah saling sama sambil sampai sana sangat "
        "sangatlah saya sayalah se sebab sebabnya sebagai sebagaimana "
        "sebagainya sebaliknya sebanyak sebegini sebegitu sebelum "
        "sebelumnya sebenarnya seberapa sebetulnya sebisanya sebuah "
        "sedang sedangkan sedemikian sedikit sedikitnya segala "
        "segalanya segera seharusnya sehingga sejak sejenak sekali "
        "sekalian sekaligus sekalipun sekarang seketika sekiranya "
        "sekitar sekitarnya sela selagi selain selaku selalu selama "
        "selamanya seluruh seluruhnya semacam semakin semasih "
        "semaunya sementara sempat semua semuanya semula sendiri "
        "sendirinya seolah seorang sepanjang sepantasnya "
        "sepantasnyalah seperti sepertinya sering seringnya serta "
        "serupa sesaat sesama sesegera sesekali seseorang sesuatu "
        "sesuatunya sesudah sesudahnya setelah seterusnya setiap "
        "setidaknya sewaktu siapa siapakah siapapun sini sinilah "
        "suatu sudah sudahkah sudahlah supaya tadi tadinya tak tanpa "
        "tapi telah tentang tentu tentulah tentunya terdiri terhadap "
        "terhadapnya terlalu terlebih tersebut tersebutlah tertentu "
        "tetapi tiap tidak tidakkah tidaklah toh waduh wah wahai "
        "walau walaupun wong yaitu yakni yang "
    ).split()
)


# ------------------------------------------------------------ Indonesian

#: suffix-stage flag guards (id/IndonesianStemmer.java:28-35); at
#: suffix time exactly ONE of these (or none) is set — first-order sets
#: one of KE/PENG/DI/MENG/TER, second-order BER/PE, and the two stages
#: never both precede the suffix stage
_ID_KE, _ID_PENG, _ID_DI, _ID_MENG, _ID_TER, _ID_BER, _ID_PE = (
    1, 2, 4, 8, 16, 32, 64,
)
_ID_VOWELS = frozenset("aeiou")


def _id_first_order(s: str, syl: int, flags: int):
    """id/IndonesianStemmer.java:110-186 (removeFirstOrderPrefix)."""
    if s.startswith("meng"):
        return s[4:], syl - 1, flags | _ID_MENG
    if s.startswith("meny") and len(s) > 4 and s[4] in _ID_VOWELS:
        return "s" + s[4:], syl - 1, flags | _ID_MENG
    if s.startswith("men"):
        return s[3:], syl - 1, flags | _ID_MENG
    if s.startswith("mem"):
        return s[3:], syl - 1, flags | _ID_MENG
    if s.startswith("me"):
        return s[2:], syl - 1, flags | _ID_MENG
    if s.startswith("peng"):
        return s[4:], syl - 1, flags | _ID_PENG
    if s.startswith("peny") and len(s) > 4 and s[4] in _ID_VOWELS:
        return "s" + s[4:], syl - 1, flags | _ID_PENG
    if s.startswith("peny"):
        return s[4:], syl - 1, flags | _ID_PENG
    if s.startswith("pen") and len(s) > 3 and s[3] in _ID_VOWELS:
        return "t" + s[3:], syl - 1, flags | _ID_PENG
    if s.startswith("pen"):
        return s[3:], syl - 1, flags | _ID_PENG
    if s.startswith("pem"):
        return s[3:], syl - 1, flags | _ID_PENG
    if s.startswith("di"):
        return s[2:], syl - 1, flags | _ID_DI
    if s.startswith("ter"):
        return s[3:], syl - 1, flags | _ID_TER
    if s.startswith("ke"):
        return s[2:], syl - 1, flags | _ID_KE
    return s, syl, flags


def _id_second_order(s: str, syl: int, flags: int):
    """id/IndonesianStemmer.java:188-224 (removeSecondOrderPrefix);
    'per' fires without setting a flag."""
    if s.startswith("ber"):
        return s[3:], syl - 1, flags | _ID_BER
    if len(s) == 7 and s.startswith("belajar"):
        return s[3:], syl - 1, flags | _ID_BER
    if (
        s.startswith("be")
        and len(s) > 4
        and s[2] not in _ID_VOWELS
        and s[3] == "e"
        and s[4] == "r"
    ):
        return s[2:], syl - 1, flags | _ID_BER
    if s.startswith("per"):
        return s[3:], syl - 1, flags
    if len(s) == 7 and s.startswith("pelajar"):
        return s[3:], syl - 1, flags
    if s.startswith("pe"):
        return s[2:], syl - 1, flags | _ID_PE
    return s, syl, flags


def _id_suffix(s: str, syl: int, flags: int):
    """id/IndonesianStemmer.java:226-252 (removeSuffix)."""
    if s.endswith("kan") and not flags & (_ID_KE | _ID_PENG | _ID_PE):
        return s[:-3], syl - 1, flags
    if s.endswith("an") and not flags & (_ID_DI | _ID_MENG | _ID_TER):
        return s[:-2], syl - 1, flags
    if (
        s.endswith("i")
        and not s.endswith("si")
        and not flags & (_ID_BER | _ID_KE | _ID_PENG)
    ):
        return s[:-1], syl - 1, flags
    return s, syl, flags


def indonesian_stem(term: str, *, stem_derivational: bool = True) -> str:
    """Stemmer for Indonesian (``id/IndonesianStemmer.java:45-71`` —
    Tala's algorithm): inflectional particles + possessive pronouns,
    then (derivational) first-order prefix; if it fired, suffix then —
    only if the suffix also fired — second-order prefix; if it did not
    fire, second-order prefix then suffix. Every stage gates on >2
    remaining syllables (vowel count, decremented per fired rule)."""
    s = term
    syl = sum(1 for c in s if c in _ID_VOWELS)
    flags = 0
    if syl > 2 and s.endswith(("kah", "lah", "pun")):
        syl -= 1
        s = s[:-3]
    if syl > 2:
        if s.endswith(("ku", "mu")):
            syl -= 1
            s = s[:-2]
        elif s.endswith("nya"):
            syl -= 1
            s = s[:-3]
    if not stem_derivational:
        return s
    old = len(s)
    if syl > 2:
        s, syl, flags = _id_first_order(s, syl, flags)
    if len(s) != old:
        old = len(s)
        if syl > 2:
            s, syl, flags = _id_suffix(s, syl, flags)
        if len(s) != old and syl > 2:
            s, syl, flags = _id_second_order(s, syl, flags)
    else:
        if syl > 2:
            s, syl, flags = _id_second_order(s, syl, flags)
        if syl > 2:
            s, syl, flags = _id_suffix(s, syl, flags)
    return s


#: state-encoded SQL twin of indonesian_stem (derivational): the term
#: rides through the layers as <syl><flag><body> where <syl> =
#: chr(48+remaining syllables) and <flag> marks which single suffix-
#: guard flag is live plus the path through stemDerivational's
#: conditionals ('0' none/path-B, '1' KE, '2' PENG, '3' DI, '4' MENG,
#: '5' TER, '6' BER, '7' PE, '8' path-A suffix fired, '9' path-A done).
_ID_SYL = "(unicode(left(term, 1)) - 48)"
_ID_FLAG = "substr(term, 2, 1)"
_ID_BODY = "substr(term, 3)"
_ID_DEC = "chr((unicode(left(term, 1)) - 1)::INT)"
_ID_V = "('a','e','i','o','u')"

INDONESIAN_SQL = (
    # L0: encode <syllables><flag=0><body>
    "chr((48 + length(term) - length(translate(term, 'aeiou', '')))::INT) || '0' || term",
    # L1: removeParticle (id/IndonesianStemmer.java:86-95)
    f"""CASE
        WHEN {_ID_SYL} > 2 AND right(term, 3) IN ('kah', 'lah', 'pun') THEN {_ID_DEC} || {_ID_FLAG} || left({_ID_BODY}, length(term)-5)
        ELSE term END""",
    # L2: removePossessivePronoun (:97-108)
    f"""CASE
        WHEN {_ID_SYL} > 2 AND right(term, 2) IN ('ku', 'mu') THEN {_ID_DEC} || {_ID_FLAG} || left({_ID_BODY}, length(term)-4)
        WHEN {_ID_SYL} > 2 AND right(term, 3) = 'nya' THEN {_ID_DEC} || {_ID_FLAG} || left({_ID_BODY}, length(term)-5)
        ELSE term END""",
    # L3: removeFirstOrderPrefix (:110-186); every branch sets its flag
    f"""CASE
        WHEN {_ID_SYL} <= 2 THEN term
        WHEN substr(term, 3, 4) = 'meng' THEN {_ID_DEC} || '4' || substr(term, 7)
        WHEN substr(term, 3, 4) = 'meny' AND length(term) > 6 AND substr(term, 7, 1) IN {_ID_V} THEN {_ID_DEC} || '4' || 's' || substr(term, 7)
        WHEN substr(term, 3, 3) = 'men' THEN {_ID_DEC} || '4' || substr(term, 6)
        WHEN substr(term, 3, 3) = 'mem' THEN {_ID_DEC} || '4' || substr(term, 6)
        WHEN substr(term, 3, 2) = 'me' THEN {_ID_DEC} || '4' || substr(term, 5)
        WHEN substr(term, 3, 4) = 'peng' THEN {_ID_DEC} || '2' || substr(term, 7)
        WHEN substr(term, 3, 4) = 'peny' AND length(term) > 6 AND substr(term, 7, 1) IN {_ID_V} THEN {_ID_DEC} || '2' || 's' || substr(term, 7)
        WHEN substr(term, 3, 4) = 'peny' THEN {_ID_DEC} || '2' || substr(term, 7)
        WHEN substr(term, 3, 3) = 'pen' AND length(term) > 5 AND substr(term, 6, 1) IN {_ID_V} THEN {_ID_DEC} || '2' || 't' || substr(term, 6)
        WHEN substr(term, 3, 3) = 'pen' THEN {_ID_DEC} || '2' || substr(term, 6)
        WHEN substr(term, 3, 3) = 'pem' THEN {_ID_DEC} || '2' || substr(term, 6)
        WHEN substr(term, 3, 2) = 'di' THEN {_ID_DEC} || '3' || substr(term, 5)
        WHEN substr(term, 3, 3) = 'ter' THEN {_ID_DEC} || '5' || substr(term, 6)
        WHEN substr(term, 3, 2) = 'ke' THEN {_ID_DEC} || '1' || substr(term, 5)
        ELSE term END""",
    # L4: path-A suffix (first-order fired ⇔ flag 1-5); '8' = fired,
    # '9' = path-A finished without a suffix strip (:42-48, 226-252)
    f"""CASE
        WHEN {_ID_FLAG} NOT IN ('1', '2', '3', '4', '5') THEN term
        WHEN {_ID_SYL} > 2 AND right(term, 3) = 'kan' AND {_ID_FLAG} NOT IN ('1', '2') THEN {_ID_DEC} || '8' || left({_ID_BODY}, length(term)-5)
        WHEN {_ID_SYL} > 2 AND right(term, 2) = 'an' AND {_ID_FLAG} NOT IN ('3', '4', '5') THEN {_ID_DEC} || '8' || left({_ID_BODY}, length(term)-4)
        WHEN {_ID_SYL} > 2 AND right(term, 1) = 'i' AND right(term, 2) <> 'si' AND {_ID_FLAG} NOT IN ('1', '2') THEN {_ID_DEC} || '8' || left({_ID_BODY}, length(term)-3)
        ELSE left(term, 1) || '9' || {_ID_BODY} END""",
    # L5: path-A second-order, only after a suffix strip (:47-48)
    f"""CASE
        WHEN {_ID_FLAG} <> '8' THEN term
        WHEN {_ID_SYL} > 2 AND substr(term, 3, 3) = 'ber' THEN {_ID_DEC} || '9' || substr(term, 6)
        WHEN {_ID_SYL} > 2 AND length(term) = 9 AND substr(term, 3) = 'belajar' THEN {_ID_DEC} || '9' || substr(term, 6)
        WHEN {_ID_SYL} > 2 AND substr(term, 3, 2) = 'be' AND length(term) > 6 AND substr(term, 5, 1) NOT IN {_ID_V} AND substr(term, 6, 1) = 'e' AND substr(term, 7, 1) = 'r' THEN {_ID_DEC} || '9' || substr(term, 5)
        WHEN {_ID_SYL} > 2 AND substr(term, 3, 3) = 'per' THEN {_ID_DEC} || '9' || substr(term, 6)
        WHEN {_ID_SYL} > 2 AND length(term) = 9 AND substr(term, 3) = 'pelajar' THEN {_ID_DEC} || '9' || substr(term, 6)
        WHEN {_ID_SYL} > 2 AND substr(term, 3, 2) = 'pe' THEN {_ID_DEC} || '9' || substr(term, 5)
        ELSE left(term, 1) || '9' || {_ID_BODY} END""",
    # L6: path-B second-order (first-order did NOT fire ⇔ flag '0');
    # 'per'/'pelajar' strip WITHOUT setting a flag (:188-224)
    f"""CASE
        WHEN {_ID_FLAG} <> '0' THEN term
        WHEN {_ID_SYL} > 2 AND substr(term, 3, 3) = 'ber' THEN {_ID_DEC} || '6' || substr(term, 6)
        WHEN {_ID_SYL} > 2 AND length(term) = 9 AND substr(term, 3) = 'belajar' THEN {_ID_DEC} || '6' || substr(term, 6)
        WHEN {_ID_SYL} > 2 AND substr(term, 3, 2) = 'be' AND length(term) > 6 AND substr(term, 5, 1) NOT IN {_ID_V} AND substr(term, 6, 1) = 'e' AND substr(term, 7, 1) = 'r' THEN {_ID_DEC} || '6' || substr(term, 5)
        WHEN {_ID_SYL} > 2 AND substr(term, 3, 3) = 'per' THEN {_ID_DEC} || '0' || substr(term, 6)
        WHEN {_ID_SYL} > 2 AND length(term) = 9 AND substr(term, 3) = 'pelajar' THEN {_ID_DEC} || '0' || substr(term, 6)
        WHEN {_ID_SYL} > 2 AND substr(term, 3, 2) = 'pe' THEN {_ID_DEC} || '7' || substr(term, 5)
        ELSE term END""",
    # L7: path-B suffix; BER blocks -i, PE blocks -kan (:226-252)
    f"""CASE
        WHEN {_ID_FLAG} NOT IN ('0', '6', '7') THEN term
        WHEN {_ID_SYL} > 2 AND right(term, 3) = 'kan' AND {_ID_FLAG} <> '7' THEN {_ID_DEC} || {_ID_FLAG} || left({_ID_BODY}, length(term)-5)
        WHEN {_ID_SYL} > 2 AND right(term, 2) = 'an' THEN {_ID_DEC} || {_ID_FLAG} || left({_ID_BODY}, length(term)-4)
        WHEN {_ID_SYL} > 2 AND right(term, 1) = 'i' AND right(term, 2) <> 'si' AND {_ID_FLAG} <> '6' THEN {_ID_DEC} || {_ID_FLAG} || left({_ID_BODY}, length(term)-3)
        ELSE term END""",
    # L8: drop the state header
    "substr(term, 3)",
)


# --------------------------------------------------------------- Sorani

_CKB_HARAKAT = "ـًٌٍَُِّْ"


def sorani_normalize(term: str) -> str:
    """SoraniNormalizer (``ckb/SoraniNormalizer.java:72-129``): yeh
    forms → farsi yeh, kaf → keheh, heh+ZWNJ → ae, final heh → ae, teh
    marbuta → ae, heh doachashmee → heh, initial reh / reh-with-v-above
    → rreh, harakat/tatweel/format chars deleted — a SEQUENTIAL scan
    (deletions shift, the final-heh test sees the CURRENT buffer)."""
    import unicodedata

    s = list(term)
    i = 0
    while i < len(s):
        c = s[i]
        if c in "يى":
            s[i] = "ی"
        elif c == "ك":
            s[i] = "ک"
        elif c == "‌":
            if i > 0 and s[i - 1] == "ه":
                s[i - 1] = "ە"
            del s[i]
            continue
        elif c == "ه":
            if i == len(s) - 1:
                s[i] = "ە"
        elif c == "ة":
            s[i] = "ە"
        elif c == "ھ":
            s[i] = "ه"
        elif c == "ر":
            if i == 0:
                s[i] = "ڕ"
        elif c == "ڒ":
            s[i] = "ڕ"
        elif c in _CKB_HARAKAT:
            del s[i]
            continue
        elif unicodedata.category(c) == "Cf":
            del s[i]
            continue
        i += 1
    return "".join(s)


def sorani_stem(term: str) -> str:
    """SoraniStemmer (``ckb/SoraniStemmer.java:31-110``): postposition
    block, possessive-pronoun block, then the first-match ezafe /
    definite / plural / demonstrative cascade."""
    s = term
    n = len(s)
    # postposition
    if n > 5 and s.endswith("دا"):  # -dA
        s = s[:-2]
    elif n > 4 and s.endswith("نا"):  # -nA: drops ONE char
        s = s[:-1]
    elif n > 6 and s.endswith("ەوە"):  # -awa
        s = s[:-3]
    n = len(s)
    # possessive pronoun
    if n > 6 and (
        s.endswith("مان")
        or s.endswith("یان")
        or s.endswith("تان")
    ):
        s = s[:-3]
    n = len(s)
    for cond, suf, cut in (
        (n > 6, "ێکی", 3),  # indefinite singular ezafe
        (n > 7, "یەکی", 4),
        (n > 5, "ێک", 2),  # indefinite singular
        (n > 6, "یەک", 3),
        (n > 6, "ەکە", 3),  # definite singular
        (n > 5, "کە", 2),
        (n > 7, "ەکان", 4),  # definite plural
        (n > 6, "کان", 3),
        (n > 7, "یانی", 4),  # indef plural ezafe
        (n > 6, "انی", 3),
        (n > 6, "یان", 3),  # indefinite plural
        (n > 5, "ان", 2),
        (n > 7, "یانە", 4),  # demonstrative plural
        (n > 6, "انە", 3),
        (n > 5, "ایە", 2),  # demonstrative singular -Aya
        (n > 5, "ەیە", 2),  # -aya
        (n > 4, "ە", 1),
        (n > 4, "ی", 1),  # absolute singular ezafe
    ):
        if cond and s.endswith(suf):
            return s[:-cut]
    return s


def sorani_fold(term: str) -> str:
    """The SoraniAnalyzer chain minus stop/stem
    (``ckb/SoraniAnalyzer.java:106-118``): SoraniNormalization →
    LowerCase → DecimalDigit, all BEFORE the stop filter."""
    return decimal_digit_fold(sorani_normalize(term).lower())


def sorani_chain_stem(term: str) -> str:
    """Stemmer slot for the named chain: the stop filter sees folded
    tokens, so only the stem composes here."""
    return sorani_stem(term)


#: ckb/stopwords.txt ("#"-comment wordlist, 63 word entries; the file
#: ships in normalized orthography)
SORANI_STOP_WORDS = frozenset(
    (
        "و کە ی کرد ئەوەی سەر دوو هەروەها لەو دەکات چەند هەر ئەو ئەم "
        "من ئێمە تۆ ئێوە ئەو ئەوان بە پێ بەبێ بەدەم بەلای بەپێی بەرلە "
        "بەرەوی بەرەوە بەردەم بێ بێجگە بۆ دە تێ دەگەڵ دوای جگە لە لێ "
        "لەبەر لەبەینی لەبابەت لەبارەی لەباتی لەبن لەبرێتی لەدەم "
        "لەگەڵ لەلایەن لەناو لەنێو لەپێناوی لەرەوی لەرێ لەرێگا لەسەر "
        "لەژێر ناو نێوان پاش پێش وەک "
    ).split()
)


#: one-expression SQL twin of sorani_fold for the gate corpora (no
#: exotic decimal digits): created-pair ھ+ZWNJ and plain ه+ZWNJ → ە
#: first (the ZWNJ case reads the CURRENT buffer), then the scan-time
#: final-heh test (BEFORE deletions/maps — a final ھ maps to ه, never
#: ە, and a heh followed by deletable marks stays ه), then the
#: map+delete translate (ZWNJ/ZWJ/LRM/RLM/ALM + tatweel/harakat
#: deleted — the enumerable Cf subset the corpora use), then the
#: initial-reh promotion on the deletion-shifted string.
SORANI_FOLD_SQL = (
    "regexp_replace(translate(regexp_replace(regexp_replace(term, "
    "'[\u06be\u0647][\u0640\u064b-\u0652\u200d-\u200f\u061c]*\u200c', '\u06d5', 'g'), "
    "'\u0647$', '\u06d5'), "
    "'\u064a\u0649\u0643\u0629\u06be\u0692"
    "\u200c\u200d\u200e\u200f\u061c"
    "\u0640\u064b\u064c\u064d\u064e\u064f\u0650\u0651\u0652', "
    "'\u06cc\u06cc\u06a9\u06d5\u0647\u0695'), "
    "'^\u0631', '\u0695')"
)

#: layered SQL twin of sorani_stem: postposition, possessive, cascade
SORANI_STEM_SQL = (
    # L1: postposition (ckb/SoraniStemmer.java:33-40)
    """CASE
      WHEN length(term) > 5 AND right(term, 2) = 'دا' THEN left(term, length(term)-2)
      WHEN length(term) > 4 AND right(term, 2) = 'نا' THEN left(term, length(term)-1)
      WHEN length(term) > 6 AND right(term, 3) = 'ەوە' THEN left(term, length(term)-3)
      ELSE term END""",
    # L2: possessive pronoun (:43-46)
    """CASE
      WHEN length(term) > 6 AND right(term, 3) IN ('مان', 'یان', 'تان')
      THEN left(term, length(term)-3)
      ELSE term END""",
    # L3: first-match cascade (:49-109)
    """CASE
      WHEN length(term) > 6 AND right(term, 3) = 'ـــ' THEN term
      WHEN length(term) > 6 AND right(term, 3) = 'ێکی' THEN left(term, length(term)-3)
      WHEN length(term) > 7 AND right(term, 4) = 'یەکی' THEN left(term, length(term)-4)
      WHEN length(term) > 5 AND right(term, 2) = 'ێک' THEN left(term, length(term)-2)
      WHEN length(term) > 6 AND right(term, 3) = 'یەک' THEN left(term, length(term)-3)
      WHEN length(term) > 6 AND right(term, 3) = 'ەکە' THEN left(term, length(term)-3)
      WHEN length(term) > 5 AND right(term, 2) = 'کە' THEN left(term, length(term)-2)
      WHEN length(term) > 7 AND right(term, 4) = 'ەکان' THEN left(term, length(term)-4)
      WHEN length(term) > 6 AND right(term, 3) = 'کان' THEN left(term, length(term)-3)
      WHEN length(term) > 7 AND right(term, 4) = 'یانی' THEN left(term, length(term)-4)
      WHEN length(term) > 6 AND right(term, 3) = 'انی' THEN left(term, length(term)-3)
      WHEN length(term) > 6 AND right(term, 3) = 'یان' THEN left(term, length(term)-3)
      WHEN length(term) > 5 AND right(term, 2) = 'ان' THEN left(term, length(term)-2)
      WHEN length(term) > 7 AND right(term, 4) = 'یانە' THEN left(term, length(term)-4)
      WHEN length(term) > 6 AND right(term, 3) = 'انە' THEN left(term, length(term)-3)
      WHEN length(term) > 5 AND right(term, 3) IN ('ایە', 'ەیە') THEN left(term, length(term)-2)
      WHEN length(term) > 4 AND right(term, 1) = 'ە' THEN left(term, length(term)-1)
      WHEN length(term) > 4 AND right(term, 1) = 'ی' THEN left(term, length(term)-1)
      ELSE term END""",
)


# -------------------------------------------------------------- Serbian

#: SerbianNormalizationFilter (sr/SerbianNormalizationFilter.java:40-166)
#: — Cyrillic AND regional-Latin → "bald" ASCII Latin, digraphs expand
_SR_BALD = {ord(k): v for k, v in {
    "а": "a", "б": "b", "в": "v", "г": "g", "д": "d",
    "ђ": "dj", "đ": "dj",
    "е": "e", "ж": "z", "з": "z", "ž": "z", "и": "i", "ј": "j",
    "к": "k", "л": "l", "љ": "lj", "м": "m", "н": "n", "њ": "nj",
    "о": "o", "п": "p", "р": "r", "с": "s", "т": "t",
    "ћ": "c", "ц": "c", "ч": "c", "č": "c", "ć": "c",
    "у": "u", "ф": "f", "х": "h", "џ": "dz", "ш": "s", "š": "s",
}.items()}

#: SerbianNormalizationRegularFilter (sr/SerbianNormalizationRegular
#: Filter.java:43-156) — Cyrillic → standard Latin orthography
_SR_REGULAR = {ord(k): v for k, v in {
    "а": "a", "б": "b", "в": "v", "г": "g", "д": "d", "ђ": "đ",
    "е": "e", "ж": "ž", "з": "z", "и": "i", "ј": "j", "к": "k",
    "л": "l", "љ": "lj", "м": "m", "н": "n", "њ": "nj", "о": "o",
    "п": "p", "р": "r", "с": "s", "т": "t", "ћ": "ć", "у": "u",
    "ф": "f", "х": "h", "ц": "c", "ч": "č", "џ": "dž", "ш": "š",
}.items()}


def serbian_normalize(term: str) -> str:
    """The 'bald' fold: expects lowercased input like the reference."""
    return term.translate(_SR_BALD)


def serbian_normalize_regular(term: str) -> str:
    """The standard-orthography Cyrillic→Latin fold."""
    return term.translate(_SR_REGULAR)


def serbian_fold(term: str) -> str:
    """LowerCase → SerbianNormalization chain slot."""
    return serbian_normalize(term.lower())


def serbian_regular_fold(term: str) -> str:
    return serbian_normalize_regular(term.lower())
