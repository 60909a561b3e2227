"""BrazilianStemmer — the Orengo/RSLP-style Brazilian Portuguese
stemmer (``analysis/common/src/java/org/apache/lucene/analysis/br/
BrazilianStemmer.java``) and the BrazilianAnalyzer stop set.

Steps 1 and 2 are TRANSPILED from the reference's flat if-chains
(preserving its quirks verbatim — including the ``logias`` rule whose
replaceSuffix result the reference drops, ``BrazilianStemmer.java:
398-401``); regions R1/R2/RV use the reference's own off-by-one loop
bounds (the final character never starts a region) and are captured
ONCE before step 1 and never recomputed. ``stem`` returns None for
unindexable terms (len<3 or >=30) — the filter then leaves the
original token untouched (``BrazilianStemFilter.java:58-62``).
"""

from __future__ import annotations

__all__ = ["brazilian_stem", "BRAZILIAN_STOP_WORDS"]

_VOWELS = set("aeiou")
_ACCENT_MAP = str.maketrans(
    "áâãéêíóôõúüçñ",
    "aaaeeiooouucn",
)


def _sfx(value, suffix):
    return value is not None and value.endswith(suffix)


def _rm(value, suffix):
    return value[: -len(suffix)] if _sfx(value, suffix) else value


def _repl(value, suffix, change_to):
    v = _rm(value, suffix)
    return value if v == value else v + change_to


def _sfx_prec(value, suffix, preceded):
    return _sfx(value, suffix) and _sfx(_rm(value, suffix), preceded)


def _get_r1(value):
    """BrazilianStemmer.getR1 (:116-148) — NOTE the reference's j < i
    bound: the last character can never start the region."""
    if value is None:
        return None
    i = len(value) - 1
    j = 0
    while j < i and value[j] not in _VOWELS:
        j += 1
    if not j < i:
        return None
    while j < i and value[j] in _VOWELS:
        j += 1
    if not j < i:
        return None
    return value[j + 1 :]


def _get_rv(value):
    """BrazilianStemmer.getRV (:164-217)."""
    if value is None:
        return None
    i = len(value) - 1
    if i > 0 and value[1] not in _VOWELS:
        j = 2
        while j < i and value[j] not in _VOWELS:
            j += 1
        if j < i:
            return value[j + 1 :]
    if i > 1 and value[0] in _VOWELS and value[1] in _VOWELS:
        j = 2
        while j < i and value[j] in _VOWELS:
            j += 1
        if j < i:
            return value[j + 1 :]
    if i > 2:
        return value[3:]
    return None


def _change_term(value):
    """lowercase + accent folds (:219-268)."""
    return value.lower().translate(_ACCENT_MAP)


def _create_ct(term):
    """:335-371 — strip one leading/trailing punctuation char."""
    ct = _change_term(term)
    if len(ct) < 2:
        return ct
    if ct[0] in "\"'-,;.?!":
        ct = ct[1:]
    if len(ct) < 2:
        return ct
    if ct[-1] in "-,;.?!'\"":
        ct = ct[:-1]
    return ct


def _step1(CT, R1, R2, RV):
    if CT is None:
        return CT, False
    if _sfx(CT, "uciones") and _sfx(R2, "uciones"):
        CT = _repl(CT, "uciones", "u")
        return CT, True
    if len(CT) >= 6 and _sfx(CT, "imentos") and _sfx(R2, "imentos"):
        CT = _rm(CT, "imentos")
        return CT, True
    if len(CT) >= 6 and _sfx(CT, "amentos") and _sfx(R2, "amentos"):
        CT = _rm(CT, "amentos")
        return CT, True
    if len(CT) >= 6 and _sfx(CT, "adores") and _sfx(R2, "adores"):
        CT = _rm(CT, "adores")
        return CT, True
    if len(CT) >= 6 and _sfx(CT, "adoras") and _sfx(R2, "adoras"):
        CT = _rm(CT, "adoras")
        return CT, True
    if len(CT) >= 6 and _sfx(CT, "logias") and _sfx(R2, "logias"):
        _repl(CT, "logias", "log")  # reference bug: result dropped
        return CT, True
    if len(CT) >= 6 and _sfx(CT, "encias") and _sfx(R2, "encias"):
        CT = _repl(CT, "encias", "ente")
        return CT, True
    if len(CT) >= 6 and _sfx(CT, "amente") and _sfx(R1, "amente"):
        CT = _rm(CT, "amente")
        return CT, True
    if len(CT) >= 6 and _sfx(CT, "idades") and _sfx(R2, "idades"):
        CT = _rm(CT, "idades")
        return CT, True
    if len(CT) >= 5 and _sfx(CT, "acoes") and _sfx(R2, "acoes"):
        CT = _rm(CT, "acoes")
        return CT, True
    if len(CT) >= 5 and _sfx(CT, "imento") and _sfx(R2, "imento"):
        CT = _rm(CT, "imento")
        return CT, True
    if len(CT) >= 5 and _sfx(CT, "amento") and _sfx(R2, "amento"):
        CT = _rm(CT, "amento")
        return CT, True
    if len(CT) >= 5 and _sfx(CT, "adora") and _sfx(R2, "adora"):
        CT = _rm(CT, "adora")
        return CT, True
    if len(CT) >= 5 and _sfx(CT, "ismos") and _sfx(R2, "ismos"):
        CT = _rm(CT, "ismos")
        return CT, True
    if len(CT) >= 5 and _sfx(CT, "istas") and _sfx(R2, "istas"):
        CT = _rm(CT, "istas")
        return CT, True
    if len(CT) >= 5 and _sfx(CT, "logia") and _sfx(R2, "logia"):
        CT = _repl(CT, "logia", "log")
        return CT, True
    if len(CT) >= 5 and _sfx(CT, "ucion") and _sfx(R2, "ucion"):
        CT = _repl(CT, "ucion", "u")
        return CT, True
    if len(CT) >= 5 and _sfx(CT, "encia") and _sfx(R2, "encia"):
        CT = _repl(CT, "encia", "ente")
        return CT, True
    if len(CT) >= 5 and _sfx(CT, "mente") and _sfx(R2, "mente"):
        CT = _rm(CT, "mente")
        return CT, True
    if len(CT) >= 5 and _sfx(CT, "idade") and _sfx(R2, "idade"):
        CT = _rm(CT, "idade")
        return CT, True
    if len(CT) >= 4 and _sfx(CT, "acao") and _sfx(R2, "acao"):
        CT = _rm(CT, "acao")
        return CT, True
    if len(CT) >= 4 and _sfx(CT, "ezas") and _sfx(R2, "ezas"):
        CT = _rm(CT, "ezas")
        return CT, True
    if len(CT) >= 4 and _sfx(CT, "icos") and _sfx(R2, "icos"):
        CT = _rm(CT, "icos")
        return CT, True
    if len(CT) >= 4 and _sfx(CT, "icas") and _sfx(R2, "icas"):
        CT = _rm(CT, "icas")
        return CT, True
    if len(CT) >= 4 and _sfx(CT, "ismo") and _sfx(R2, "ismo"):
        CT = _rm(CT, "ismo")
        return CT, True
    if len(CT) >= 4 and _sfx(CT, "avel") and _sfx(R2, "avel"):
        CT = _rm(CT, "avel")
        return CT, True
    if len(CT) >= 4 and _sfx(CT, "ivel") and _sfx(R2, "ivel"):
        CT = _rm(CT, "ivel")
        return CT, True
    if len(CT) >= 4 and _sfx(CT, "ista") and _sfx(R2, "ista"):
        CT = _rm(CT, "ista")
        return CT, True
    if len(CT) >= 4 and _sfx(CT, "osos") and _sfx(R2, "osos"):
        CT = _rm(CT, "osos")
        return CT, True
    if len(CT) >= 4 and _sfx(CT, "osas") and _sfx(R2, "osas"):
        CT = _rm(CT, "osas")
        return CT, True
    if len(CT) >= 4 and _sfx(CT, "ador") and _sfx(R2, "ador"):
        CT = _rm(CT, "ador")
        return CT, True
    if len(CT) >= 4 and _sfx(CT, "ivas") and _sfx(R2, "ivas"):
        CT = _rm(CT, "ivas")
        return CT, True
    if len(CT) >= 4 and _sfx(CT, "ivos") and _sfx(R2, "ivos"):
        CT = _rm(CT, "ivos")
        return CT, True
    if len(CT) >= 4 and _sfx(CT, "iras") and _sfx(RV, "iras") and _sfx_prec(CT, "iras", "e"):
        CT = _repl(CT, "iras", "ir")
        return CT, True
    if len(CT) >= 3 and _sfx(CT, "eza") and _sfx(R2, "eza"):
        CT = _rm(CT, "eza")
        return CT, True
    if len(CT) >= 3 and _sfx(CT, "ico") and _sfx(R2, "ico"):
        CT = _rm(CT, "ico")
        return CT, True
    if len(CT) >= 3 and _sfx(CT, "ica") and _sfx(R2, "ica"):
        CT = _rm(CT, "ica")
        return CT, True
    if len(CT) >= 3 and _sfx(CT, "oso") and _sfx(R2, "oso"):
        CT = _rm(CT, "oso")
        return CT, True
    if len(CT) >= 3 and _sfx(CT, "osa") and _sfx(R2, "osa"):
        CT = _rm(CT, "osa")
        return CT, True
    if len(CT) >= 3 and _sfx(CT, "iva") and _sfx(R2, "iva"):
        CT = _rm(CT, "iva")
        return CT, True
    if len(CT) >= 3 and _sfx(CT, "ivo") and _sfx(R2, "ivo"):
        CT = _rm(CT, "ivo")
        return CT, True
    if len(CT) >= 3 and _sfx(CT, "ira") and _sfx(RV, "ira") and _sfx_prec(CT, "ira", "e"):
        CT = _repl(CT, "ira", "ir")
        return CT, True
    return CT, False


def _step2(CT, R1, R2, RV):
    if RV is None:
        return CT, False
    if RV is not None and len(RV) >= 7 and _sfx(RV, "issemos"):
        CT = _rm(CT, "issemos")
        return CT, True
    if RV is not None and len(RV) >= 7 and _sfx(RV, "essemos"):
        CT = _rm(CT, "essemos")
        return CT, True
    if RV is not None and len(RV) >= 7 and _sfx(RV, "assemos"):
        CT = _rm(CT, "assemos")
        return CT, True
    if RV is not None and len(RV) >= 7 and _sfx(RV, "ariamos"):
        CT = _rm(CT, "ariamos")
        return CT, True
    if RV is not None and len(RV) >= 7 and _sfx(RV, "eriamos"):
        CT = _rm(CT, "eriamos")
        return CT, True
    if RV is not None and len(RV) >= 7 and _sfx(RV, "iriamos"):
        CT = _rm(CT, "iriamos")
        return CT, True
    if RV is not None and len(RV) >= 6 and _sfx(RV, "iremos"):
        CT = _rm(CT, "iremos")
        return CT, True
    if RV is not None and len(RV) >= 6 and _sfx(RV, "eremos"):
        CT = _rm(CT, "eremos")
        return CT, True
    if RV is not None and len(RV) >= 6 and _sfx(RV, "aremos"):
        CT = _rm(CT, "aremos")
        return CT, True
    if RV is not None and len(RV) >= 6 and _sfx(RV, "avamos"):
        CT = _rm(CT, "avamos")
        return CT, True
    if RV is not None and len(RV) >= 6 and _sfx(RV, "iramos"):
        CT = _rm(CT, "iramos")
        return CT, True
    if RV is not None and len(RV) >= 6 and _sfx(RV, "eramos"):
        CT = _rm(CT, "eramos")
        return CT, True
    if RV is not None and len(RV) >= 6 and _sfx(RV, "aramos"):
        CT = _rm(CT, "aramos")
        return CT, True
    if RV is not None and len(RV) >= 6 and _sfx(RV, "asseis"):
        CT = _rm(CT, "asseis")
        return CT, True
    if RV is not None and len(RV) >= 6 and _sfx(RV, "esseis"):
        CT = _rm(CT, "esseis")
        return CT, True
    if RV is not None and len(RV) >= 6 and _sfx(RV, "isseis"):
        CT = _rm(CT, "isseis")
        return CT, True
    if RV is not None and len(RV) >= 6 and _sfx(RV, "arieis"):
        CT = _rm(CT, "arieis")
        return CT, True
    if RV is not None and len(RV) >= 6 and _sfx(RV, "erieis"):
        CT = _rm(CT, "erieis")
        return CT, True
    if RV is not None and len(RV) >= 6 and _sfx(RV, "irieis"):
        CT = _rm(CT, "irieis")
        return CT, True
    if RV is not None and len(RV) >= 5 and _sfx(RV, "irmos"):
        CT = _rm(CT, "irmos")
        return CT, True
    if RV is not None and len(RV) >= 5 and _sfx(RV, "iamos"):
        CT = _rm(CT, "iamos")
        return CT, True
    if RV is not None and len(RV) >= 5 and _sfx(RV, "armos"):
        CT = _rm(CT, "armos")
        return CT, True
    if RV is not None and len(RV) >= 5 and _sfx(RV, "ermos"):
        CT = _rm(CT, "ermos")
        return CT, True
    if RV is not None and len(RV) >= 5 and _sfx(RV, "areis"):
        CT = _rm(CT, "areis")
        return CT, True
    if RV is not None and len(RV) >= 5 and _sfx(RV, "ereis"):
        CT = _rm(CT, "ereis")
        return CT, True
    if RV is not None and len(RV) >= 5 and _sfx(RV, "ireis"):
        CT = _rm(CT, "ireis")
        return CT, True
    if RV is not None and len(RV) >= 5 and _sfx(RV, "asses"):
        CT = _rm(CT, "asses")
        return CT, True
    if RV is not None and len(RV) >= 5 and _sfx(RV, "esses"):
        CT = _rm(CT, "esses")
        return CT, True
    if RV is not None and len(RV) >= 5 and _sfx(RV, "isses"):
        CT = _rm(CT, "isses")
        return CT, True
    if RV is not None and len(RV) >= 5 and _sfx(RV, "astes"):
        CT = _rm(CT, "astes")
        return CT, True
    if RV is not None and len(RV) >= 5 and _sfx(RV, "assem"):
        CT = _rm(CT, "assem")
        return CT, True
    if RV is not None and len(RV) >= 5 and _sfx(RV, "essem"):
        CT = _rm(CT, "essem")
        return CT, True
    if RV is not None and len(RV) >= 5 and _sfx(RV, "issem"):
        CT = _rm(CT, "issem")
        return CT, True
    if RV is not None and len(RV) >= 5 and _sfx(RV, "ardes"):
        CT = _rm(CT, "ardes")
        return CT, True
    if RV is not None and len(RV) >= 5 and _sfx(RV, "erdes"):
        CT = _rm(CT, "erdes")
        return CT, True
    if RV is not None and len(RV) >= 5 and _sfx(RV, "irdes"):
        CT = _rm(CT, "irdes")
        return CT, True
    if RV is not None and len(RV) >= 5 and _sfx(RV, "ariam"):
        CT = _rm(CT, "ariam")
        return CT, True
    if RV is not None and len(RV) >= 5 and _sfx(RV, "eriam"):
        CT = _rm(CT, "eriam")
        return CT, True
    if RV is not None and len(RV) >= 5 and _sfx(RV, "iriam"):
        CT = _rm(CT, "iriam")
        return CT, True
    if RV is not None and len(RV) >= 5 and _sfx(RV, "arias"):
        CT = _rm(CT, "arias")
        return CT, True
    if RV is not None and len(RV) >= 5 and _sfx(RV, "erias"):
        CT = _rm(CT, "erias")
        return CT, True
    if RV is not None and len(RV) >= 5 and _sfx(RV, "irias"):
        CT = _rm(CT, "irias")
        return CT, True
    if RV is not None and len(RV) >= 5 and _sfx(RV, "estes"):
        CT = _rm(CT, "estes")
        return CT, True
    if RV is not None and len(RV) >= 5 and _sfx(RV, "istes"):
        CT = _rm(CT, "istes")
        return CT, True
    if RV is not None and len(RV) >= 5 and _sfx(RV, "areis"):
        CT = _rm(CT, "areis")
        return CT, True
    if RV is not None and len(RV) >= 5 and _sfx(RV, "aveis"):
        CT = _rm(CT, "aveis")
        return CT, True
    if RV is not None and len(RV) >= 4 and _sfx(RV, "aria"):
        CT = _rm(CT, "aria")
        return CT, True
    if RV is not None and len(RV) >= 4 and _sfx(RV, "eria"):
        CT = _rm(CT, "eria")
        return CT, True
    if RV is not None and len(RV) >= 4 and _sfx(RV, "iria"):
        CT = _rm(CT, "iria")
        return CT, True
    if RV is not None and len(RV) >= 4 and _sfx(RV, "asse"):
        CT = _rm(CT, "asse")
        return CT, True
    if RV is not None and len(RV) >= 4 and _sfx(RV, "esse"):
        CT = _rm(CT, "esse")
        return CT, True
    if RV is not None and len(RV) >= 4 and _sfx(RV, "isse"):
        CT = _rm(CT, "isse")
        return CT, True
    if RV is not None and len(RV) >= 4 and _sfx(RV, "aste"):
        CT = _rm(CT, "aste")
        return CT, True
    if RV is not None and len(RV) >= 4 and _sfx(RV, "este"):
        CT = _rm(CT, "este")
        return CT, True
    if RV is not None and len(RV) >= 4 and _sfx(RV, "iste"):
        CT = _rm(CT, "iste")
        return CT, True
    if RV is not None and len(RV) >= 4 and _sfx(RV, "arei"):
        CT = _rm(CT, "arei")
        return CT, True
    if RV is not None and len(RV) >= 4 and _sfx(RV, "erei"):
        CT = _rm(CT, "erei")
        return CT, True
    if RV is not None and len(RV) >= 4 and _sfx(RV, "irei"):
        CT = _rm(CT, "irei")
        return CT, True
    if RV is not None and len(RV) >= 4 and _sfx(RV, "aram"):
        CT = _rm(CT, "aram")
        return CT, True
    if RV is not None and len(RV) >= 4 and _sfx(RV, "eram"):
        CT = _rm(CT, "eram")
        return CT, True
    if RV is not None and len(RV) >= 4 and _sfx(RV, "iram"):
        CT = _rm(CT, "iram")
        return CT, True
    if RV is not None and len(RV) >= 4 and _sfx(RV, "avam"):
        CT = _rm(CT, "avam")
        return CT, True
    if RV is not None and len(RV) >= 4 and _sfx(RV, "arem"):
        CT = _rm(CT, "arem")
        return CT, True
    if RV is not None and len(RV) >= 4 and _sfx(RV, "erem"):
        CT = _rm(CT, "erem")
        return CT, True
    if RV is not None and len(RV) >= 4 and _sfx(RV, "irem"):
        CT = _rm(CT, "irem")
        return CT, True
    if RV is not None and len(RV) >= 4 and _sfx(RV, "ando"):
        CT = _rm(CT, "ando")
        return CT, True
    if RV is not None and len(RV) >= 4 and _sfx(RV, "endo"):
        CT = _rm(CT, "endo")
        return CT, True
    if RV is not None and len(RV) >= 4 and _sfx(RV, "indo"):
        CT = _rm(CT, "indo")
        return CT, True
    if RV is not None and len(RV) >= 4 and _sfx(RV, "arao"):
        CT = _rm(CT, "arao")
        return CT, True
    if RV is not None and len(RV) >= 4 and _sfx(RV, "erao"):
        CT = _rm(CT, "erao")
        return CT, True
    if RV is not None and len(RV) >= 4 and _sfx(RV, "irao"):
        CT = _rm(CT, "irao")
        return CT, True
    if RV is not None and len(RV) >= 4 and _sfx(RV, "adas"):
        CT = _rm(CT, "adas")
        return CT, True
    if RV is not None and len(RV) >= 4 and _sfx(RV, "idas"):
        CT = _rm(CT, "idas")
        return CT, True
    if RV is not None and len(RV) >= 4 and _sfx(RV, "aras"):
        CT = _rm(CT, "aras")
        return CT, True
    if RV is not None and len(RV) >= 4 and _sfx(RV, "eras"):
        CT = _rm(CT, "eras")
        return CT, True
    if RV is not None and len(RV) >= 4 and _sfx(RV, "iras"):
        CT = _rm(CT, "iras")
        return CT, True
    if RV is not None and len(RV) >= 4 and _sfx(RV, "avas"):
        CT = _rm(CT, "avas")
        return CT, True
    if RV is not None and len(RV) >= 4 and _sfx(RV, "ares"):
        CT = _rm(CT, "ares")
        return CT, True
    if RV is not None and len(RV) >= 4 and _sfx(RV, "eres"):
        CT = _rm(CT, "eres")
        return CT, True
    if RV is not None and len(RV) >= 4 and _sfx(RV, "ires"):
        CT = _rm(CT, "ires")
        return CT, True
    if RV is not None and len(RV) >= 4 and _sfx(RV, "ados"):
        CT = _rm(CT, "ados")
        return CT, True
    if RV is not None and len(RV) >= 4 and _sfx(RV, "idos"):
        CT = _rm(CT, "idos")
        return CT, True
    if RV is not None and len(RV) >= 4 and _sfx(RV, "amos"):
        CT = _rm(CT, "amos")
        return CT, True
    if RV is not None and len(RV) >= 4 and _sfx(RV, "emos"):
        CT = _rm(CT, "emos")
        return CT, True
    if RV is not None and len(RV) >= 4 and _sfx(RV, "imos"):
        CT = _rm(CT, "imos")
        return CT, True
    if RV is not None and len(RV) >= 4 and _sfx(RV, "iras"):
        CT = _rm(CT, "iras")
        return CT, True
    if RV is not None and len(RV) >= 4 and _sfx(RV, "ieis"):
        CT = _rm(CT, "ieis")
        return CT, True
    if RV is not None and len(RV) >= 3 and _sfx(RV, "ada"):
        CT = _rm(CT, "ada")
        return CT, True
    if RV is not None and len(RV) >= 3 and _sfx(RV, "ida"):
        CT = _rm(CT, "ida")
        return CT, True
    if RV is not None and len(RV) >= 3 and _sfx(RV, "ara"):
        CT = _rm(CT, "ara")
        return CT, True
    if RV is not None and len(RV) >= 3 and _sfx(RV, "era"):
        CT = _rm(CT, "era")
        return CT, True
    if RV is not None and len(RV) >= 3 and _sfx(RV, "ira"):
        CT = _rm(CT, "ava")
        return CT, True
    if RV is not None and len(RV) >= 3 and _sfx(RV, "iam"):
        CT = _rm(CT, "iam")
        return CT, True
    if RV is not None and len(RV) >= 3 and _sfx(RV, "ado"):
        CT = _rm(CT, "ado")
        return CT, True
    if RV is not None and len(RV) >= 3 and _sfx(RV, "ido"):
        CT = _rm(CT, "ido")
        return CT, True
    if RV is not None and len(RV) >= 3 and _sfx(RV, "ias"):
        CT = _rm(CT, "ias")
        return CT, True
    if RV is not None and len(RV) >= 3 and _sfx(RV, "ais"):
        CT = _rm(CT, "ais")
        return CT, True
    if RV is not None and len(RV) >= 3 and _sfx(RV, "eis"):
        CT = _rm(CT, "eis")
        return CT, True
    if RV is not None and len(RV) >= 3 and _sfx(RV, "ira"):
        CT = _rm(CT, "ira")
        return CT, True
    if RV is not None and len(RV) >= 3 and _sfx(RV, "ear"):
        CT = _rm(CT, "ear")
        return CT, True
    if RV is not None and len(RV) >= 2 and _sfx(RV, "ia"):
        CT = _rm(CT, "ia")
        return CT, True
    if RV is not None and len(RV) >= 2 and _sfx(RV, "ei"):
        CT = _rm(CT, "ei")
        return CT, True
    if RV is not None and len(RV) >= 2 and _sfx(RV, "am"):
        CT = _rm(CT, "am")
        return CT, True
    if RV is not None and len(RV) >= 2 and _sfx(RV, "em"):
        CT = _rm(CT, "em")
        return CT, True
    if RV is not None and len(RV) >= 2 and _sfx(RV, "ar"):
        CT = _rm(CT, "ar")
        return CT, True
    if RV is not None and len(RV) >= 2 and _sfx(RV, "er"):
        CT = _rm(CT, "er")
        return CT, True
    if RV is not None and len(RV) >= 2 and _sfx(RV, "ir"):
        CT = _rm(CT, "ir")
        return CT, True
    if RV is not None and len(RV) >= 2 and _sfx(RV, "as"):
        CT = _rm(CT, "as")
        return CT, True
    if RV is not None and len(RV) >= 2 and _sfx(RV, "es"):
        CT = _rm(CT, "es")
        return CT, True
    if RV is not None and len(RV) >= 2 and _sfx(RV, "is"):
        CT = _rm(CT, "is")
        return CT, True
    if RV is not None and len(RV) >= 2 and _sfx(RV, "eu"):
        CT = _rm(CT, "eu")
        return CT, True
    if RV is not None and len(RV) >= 2 and _sfx(RV, "iu"):
        CT = _rm(CT, "iu")
        return CT, True
    if RV is not None and len(RV) >= 2 and _sfx(RV, "iu"):
        CT = _rm(CT, "iu")
        return CT, True
    if RV is not None and len(RV) >= 2 and _sfx(RV, "ou"):
        CT = _rm(CT, "ou")
        return CT, True
    return CT, False



def _step3(CT, RV):
    if RV is None:
        return CT
    if _sfx(RV, "i") and _sfx_prec(RV, "i", "c"):
        CT = _rm(CT, "i")
    return CT


def _step4(CT, RV):
    if RV is None:
        return CT
    for suf in ("os", "a", "i", "o"):
        if _sfx(RV, suf):
            return _rm(CT, suf)
    return CT


def _step5(CT, RV):
    if RV is None:
        return CT
    if _sfx(RV, "e"):
        if _sfx_prec(RV, "e", "gu"):
            return _rm(_rm(CT, "e"), "u")
        if _sfx_prec(RV, "e", "ci"):
            return _rm(_rm(CT, "e"), "i")
        return _rm(CT, "e")
    return CT


def brazilian_stem(term: str):
    """BrazilianStemmer.stem (:41-73). Returns the stem, or None when
    the changed term is unindexable (caller keeps the original)."""
    ct = _create_ct(term)
    if not (2 < len(ct) < 30):
        return None
    if not ct.isalpha():
        return ct
    r1 = _get_r1(ct)
    r2 = _get_r1(r1)
    rv = _get_rv(ct)
    ct, altered = _step1(ct, r1, r2, rv)
    if not altered:
        ct, altered = _step2(ct, r1, r2, rv)
    if altered:
        ct = _step3(ct, rv)
    else:
        ct = _step4(ct, rv)
    ct = _step5(ct, rv)
    return ct


def brazilian_chain_stem(term: str) -> str:
    """BrazilianStemFilter semantics (:58-62): a None/empty stem keeps
    the original token."""
    got = brazilian_stem(term)
    return term if not got else got


#: br/stopwords.txt ("#"-comment wordlist, 128 entries)
BRAZILIAN_STOP_WORDS = frozenset(
    (
        "a ainda alem ambas ambos antes ao aonde aos apos aquele aqueles "
        "as assim com como contra contudo cuja cujas cujo cujos da das de "
        "dela dele deles demais depois desde desta deste dispoe dispoem "
        "diversa diversas diversos do dos durante e ela elas ele eles em "
        "entao entre essa essas esse esses esta estas este estes ha isso "
        "isto logo mais mas mediante menos mesma mesmas mesmo mesmos na "
        "nas nao nas nem nesse neste nos o os ou outra outras outro "
        "outros pelas pelas pelo pelos perante pois por porque portanto "
        "proprio propios quais qual qualquer quando quanto que quem quer "
        "se seja sem sendo seu seus sob sobre sua suas tal tambem teu "
        "teus toda todas todo todos tua tuas tudo um uma umas uns "
    ).split()
)
